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


def test_knn_dist_monotone_in_rank(spark, queries, targets):
    out = knn.knn_join(queries, targets, k=5).orderBy("query_id", "rank").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["dist_sq"])
    for dists in by_q.values():
        assert dists == sorted(dists)
