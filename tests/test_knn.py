"""Grid kNN vs brute-force distances (SURVEY.md §5 item 4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from extractors_geo_spark.operators import knn

COS40_SQ = 0.7547095802227721


@pytest.fixture(scope="module")
def targets(spark):
    rng = np.random.default_rng(11)
    rows = [(f"t{i:05d}", float(lon), float(lat))
            for i, (lon, lat) in enumerate(zip(rng.uniform(-120, -70, 3000), rng.uniform(26, 48, 3000)))]
    return spark.createDataFrame(rows, ["image_id", "lon", "lat"]).cache()


@pytest.fixture(scope="module")
def queries(spark):
    rng = np.random.default_rng(12)
    rows = [(f"q{i:03d}", float(lon), float(lat))
            for i, (lon, lat) in enumerate(zip(rng.uniform(-118, -72, 40), rng.uniform(28, 46, 40)))]
    return spark.createDataFrame(rows, ["query_id", "lon", "lat"]).cache()


def brute_knn(queries_rows, target_rows, k):
    exp = {}
    t = np.array([(r["lon"], r["lat"]) for r in target_rows])
    ids = [r["image_id"] for r in target_rows]
    for q in queries_rows:
        dx = (q["lon"] - t[:, 0]) * COS40_SQ
        dy = q["lat"] - t[:, 1]
        d = dx * dx + dy * dy
        order = sorted(range(len(ids)), key=lambda i: (d[i], ids[i]))[:k]
        exp[q["query_id"]] = [ids[i] for i in order]
    return exp


def test_knn_matches_brute_force(spark, queries, targets):
    k = 5
    # res 7 cells are ~2.8 deg; ring=1 covers any neighbor within a cell edge
    out = knn.knn_join(queries, targets, k=k, res=7, ring=1).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["image_id"])
    exp = brute_knn(queries.collect(), targets.collect(), k)
    assert got == exp


def test_knn_coverage_report(spark, targets):
    # a query in an empty corner finds nothing; coverage surfaces it
    q = spark.createDataFrame([("lonely", 170.0, -80.0)], ["query_id", "lon", "lat"])
    out = knn.knn_join(q, targets, k=3, res=7, ring=1)
    cov = knn.knn_coverage(out, k=3)
    assert out.count() == 0
    # coverage lists queries with found<k; a zero-match query yields no rows
    # at all, so the caller checks the gap via anti-join:
    missing = q.join(out.select("query_id"), "query_id", "left_anti")
    assert missing.count() == 1


def test_knn_ensure_k_fills_sparse_queries(spark, targets):
    """VERDICT r04 #10: ensure_k escalates ONLY the under-filled remainder
    through coarser resolutions until every query has k neighbors."""
    qrows = [("lonely", 170.0, -80.0), ("q1", -100.0, 35.0)]
    q = spark.createDataFrame(qrows, ["query_id", "lon", "lat"])
    base = knn.knn_join(q, targets, k=3, res=7, ring=1)
    out = knn.knn_join(q, targets, k=3, res=7, ring=1, ensure_k=True).collect()
    per = {}
    for r in out:
        per.setdefault(r["query_id"], []).append((r["rank"], r["image_id"]))
    # the sparse-corner query now gets its k neighbors — and at the res
    # where it finally matches, the ring block holds the whole corpus, so
    # they are the exact global top-k
    assert len(per["lonely"]) == 3
    exp = brute_knn([{"query_id": "lonely", "lon": 170.0, "lat": -80.0}],
                    targets.collect(), 3)
    assert [i for _, i in sorted(per["lonely"])] == exp["lonely"]
    # satisfied queries keep their first-pass rows verbatim
    base_q1 = {(r["rank"], r["image_id"]) for r in base.collect()
               if r["query_id"] == "q1"}
    assert set(per["q1"]) == base_q1 and len(base_q1) == 3


def test_knn_ensure_k_exhausted_corpus(spark):
    """When the corpus has fewer than k rows, escalation bottoms out at
    min_res and returns what exists (never loops, never fabricates)."""
    t = spark.createDataFrame([("a", 0.0, 0.0), ("b", 10.0, 10.0)],
                              ["image_id", "lon", "lat"])
    q = spark.createDataFrame([("q", -170.0, 80.0)], ["query_id", "lon", "lat"])
    out = knn.knn_join(q, t, k=5, ensure_k=True).collect()
    assert sorted(r["image_id"] for r in out) == ["a", "b"]


def test_knn_ensure_k_escalation_input_is_remainder(spark, queries, targets):
    """Plan audit: when a remainder exists, the escalated pass's query
    side derives from a LeftAnti join (satisfied queries removed) and is
    broadcast; when no remainder exists the plan is the plain single-pass
    shape (the loop short-circuits without adding joins)."""
    lonely = spark.createDataFrame([("lonely", 170.0, -80.0)],
                                   ["query_id", "lon", "lat"])
    out = knn.knn_join(queries.unionByName(lonely), targets, k=5, res=7,
                       ring=1, ensure_k=True, broadcast_queries=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan  # escalated query side is broadcast
    # no remainder -> no escalation machinery in the plan
    clean = knn.knn_join(queries, targets, k=5, res=7, ring=1,
                         ensure_k=True, broadcast_queries=False)
    assert "LeftAnti" not in clean._jdf.queryExecution().executedPlan().toString()


def test_knn_ensure_k_property_every_query_filled(spark):
    """Property: for random sparse corpora, EVERY query receives
    min(k, corpus size) neighbors with ensure_k=True."""
    rng = np.random.default_rng(77)
    # clustered corpus + far-flung queries (worst case for ring coverage)
    t_rows = [(f"t{i}", float(lon), float(lat)) for i, (lon, lat) in enumerate(
        zip(rng.uniform(-5, 5, 40), rng.uniform(-5, 5, 40)))]
    q_rows = [(f"q{i}", float(lon), float(lat)) for i, (lon, lat) in enumerate(
        zip(rng.uniform(-179, 179, 25), rng.uniform(-85, 85, 25)))]
    t = spark.createDataFrame(t_rows, ["image_id", "lon", "lat"])
    q = spark.createDataFrame(q_rows, ["query_id", "lon", "lat"])
    k = 4
    out = knn.knn_join(q, t, k=k, res=7, ring=1, ensure_k=True).collect()
    counts = {}
    for r in out:
        counts[r["query_id"]] = counts.get(r["query_id"], 0) + 1
    assert set(counts) == {f"q{i}" for i in range(25)}
    assert all(c == k for c in counts.values())


def test_knn_dist_monotone_in_rank(spark, queries, targets):
    out = knn.knn_join(queries, targets, k=5).orderBy("query_id", "rank").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["dist_sq"])
    for dists in by_q.values():
        assert dists == sorted(dists)


def test_knn_ensure_k_leaves_no_cached_rdds(spark, targets):
    """ADVICE r6: escalation caches serve only the in-loop counts and are
    unpersisted before knn_join returns — no persisted RDDs survive the
    call (previously one leaked per escalation level)."""
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() == 0  # clean slate
    q = spark.createDataFrame([("lonely", 170.0, -80.0), ("q1", -100.0, 35.0)],
                              ["query_id", "lon", "lat"])
    out = knn.knn_join(q, targets, k=3, res=7, ring=1, ensure_k=True)
    assert jsc.getPersistentRDDs().size() == 0, "escalation leaked a cache"
    assert out.count() > 0  # result still evaluates correctly (by lineage)
    assert jsc.getPersistentRDDs().size() == 0
