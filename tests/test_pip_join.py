"""PIP join vs brute-force double loop (SURVEY.md §5 item 4) across all
physical variants: broadcast, partitioned, salted, adaptive-split."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from extractors_geo_spark.functions import geo
from extractors_geo_spark.operators import cells, extract_meta, pip_join
from extractors_geo_spark.plans import planner


@pytest.fixture(scope="module")
def points(spark, images_small):
    return (
        extract_meta.valid_meta(extract_meta.extract_meta(images_small, with_stats=False))
        .select("image_id", "lon", "lat")
        .cache()
    )


@pytest.fixture(scope="module")
def expected_pairs(points, polygons):
    pts = points.collect()
    pls = polygons.collect()
    exp = set()
    for p in pts:
        for q in pls:
            ring = np.array(list(zip(q["xs"], q["ys"])))
            if geo.point_in_ring_np(np.array([p["lon"]]), np.array([p["lat"]]), ring)[0]:
                exp.add((p["image_id"], q["poly_id"]))
    return exp


def _pairs(df):
    return {(r["image_id"], r["poly_id"]) for r in df.collect()}


def test_broadcast_variant(points, polygons, expected_pairs):
    got = _pairs(pip_join.pip_join(points, polygons, broadcast_polys=True))
    assert got == expected_pairs


def test_partitioned_variant(points, polygons, expected_pairs):
    got = _pairs(pip_join.pip_join(points, polygons, broadcast_polys=False))
    assert got == expected_pairs


def test_salted_variant(points, polygons, expected_pairs):
    got = _pairs(pip_join.pip_join(points, polygons, broadcast_polys=False, salt=4))
    assert got == expected_pairs


def test_every_point_in_exactly_one_polygon(points, polygons):
    out = pip_join.pip_join(points, polygons)
    counts = out.groupBy("image_id").count().select(F.collect_set("count").alias("s")).first()["s"]
    assert counts == [1]  # the jittered lattice partitions CONUS


def test_resolution_invariance(points, polygons, expected_pairs):
    for res in (4, 8):
        got = _pairs(pip_join.pip_join(points, polygons, res=res))
        assert got == expected_pairs


def test_planner_broadcast_decision(points, polygons):
    pcs = pip_join.polygon_cells(polygons)
    assert planner.should_broadcast(pcs) is True
    assert planner.should_broadcast(pcs, limit=3) is False


def test_salt_factor(spark):
    density = spark.createDataFrame([(1, 10_000_000), (2, 100)], ["cell", "n"])
    assert planner.salt_factor(density, target_rows_per_task=2_000_000) == 5
    assert planner.salt_factor(density.filter(F.col("n") < 1000)) == 1


def test_split_hot_cells_preserves_pip(spark, points, polygons, expected_pairs):
    """Adaptive cell-splitting: hot cells re-encode finer; joining against
    a polygon side exploded at BOTH resolutions keeps results identical."""
    res = 6
    tagged = pip_join.tag_point_cells(points, res=res)
    density = cells.cell_density(tagged)
    split = planner.split_hot_cells(tagged, density, hot_threshold=5)
    pcs = pip_join.polygon_cells(polygons, res=res).unionByName(
        pip_join.polygon_cells(polygons, res=res + 1)
    )
    joined = split.join(F.broadcast(pcs), "cell").filter(
        (F.col("lon") >= F.col("minx")) & (F.col("lon") <= F.col("maxx"))
        & (F.col("lat") >= F.col("miny")) & (F.col("lat") <= F.col("maxy"))
    )
    refined = pip_join._raycast_refine(joined, "lon", "lat")
    got = {(r["image_id"], r["poly_id"]) for r in
           refined.select("image_id", "poly_id").dropDuplicates().collect()}
    assert got == expected_pairs
