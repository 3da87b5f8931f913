"""As-of join vs brute force."""

import datetime

from extractors_geo_spark.operators.asof import asof_join


def _ts(m):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [("e1", "u1", _ts(10)), ("e2", "u1", _ts(30)), ("e3", "u2", _ts(5)), ("e4", "u3", _ts(50))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", _ts(0), 1.0, 100), ("u1", _ts(20), 2.0, 101), ("u1", _ts(40), 3.0, 102),
         ("u2", _ts(5), 9.0, 103)],
        ["user_id", "ts", "value", "event_id"],
    )
    out = {r["event_id"]: r["asof_value"] for r in
           asof_join(left, right, key="user_id", right_cols=("value",), tie_col="event_id").collect()}
    assert out == {"e1": 1.0, "e2": 2.0, "e3": 9.0, "e4": None}  # ties: ts<=, no-match -> null


def test_asof_tie_on_equal_ts_latest_tiecol_wins(spark):
    left = spark.createDataFrame([("e1", "u1", _ts(10))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [("u1", _ts(10), 1.0, 1), ("u1", _ts(10), 2.0, 2)],
        ["user_id", "ts", "value", "event_id"],
    )
    out = asof_join(left, right, key="user_id", right_cols=("value",), tie_col="event_id").collect()
    assert out[0]["asof_value"] == 2.0


def test_asof_brute_force_random(spark):
    import numpy as np

    rng = np.random.default_rng(21)
    lefts = [(f"e{i}", f"u{int(rng.integers(5))}", _ts(int(rng.integers(1000)))) for i in range(200)]
    rights = [(f"u{int(rng.integers(5))}", _ts(int(rng.integers(1000))), float(rng.random()), i)
              for i in range(300)]
    left = spark.createDataFrame(lefts, ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(rights, ["user_id", "ts", "value", "event_id"])
    got = {r["event_id"]: r["asof_value"] for r in
           asof_join(left, right, key="user_id", right_cols=("value",), tie_col="event_id").collect()}
    for eid, u, ts in lefts:
        cand = [r for r in rights if r[0] == u and r[1] <= ts]
        exp = max(cand, key=lambda r: (r[1], r[3]))[2] if cand else None
        assert got[eid] == exp, eid


def test_asof_null_value_in_matched_row_preserved(spark):
    # DuckDB ASOF semantics: the as-of match is the most recent right ROW;
    # if its value column is NULL, the result is NULL (not an older value).
    left = spark.createDataFrame([("e1", "u", 10)], "event_id string, user_id string, ts int")
    right = spark.createDataFrame(
        [("u", 1, 5.0), ("u", 8, None)], "user_id string, ts int, value double"
    )
    out = asof_join(left, right, key="user_id", right_cols=("value",)).collect()
    assert out[0]["asof_value"] is None
