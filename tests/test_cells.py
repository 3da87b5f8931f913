"""Geocell index: encode/decode, covering sets, ring/children algebra, and
the SQL twin used by the DuckDB oracle."""

import duckdb
import numpy as np
from pyspark.sql import functions as F

from extractors_geo_spark.operators import cells


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    for res in (0, 3, 7, 12):
        c = cells.cell_np(lon, lat, res)
        r, iy, ix = cells.cell_decode_np(c)
        assert (r == res).all()
        minx, miny, maxx, maxy = cells.cell_bounds_np(c)
        assert ((lon >= minx - 1e-9) & (lon <= maxx + 1e-9)).all()
        assert ((lat >= miny - 1e-9) & (lat <= maxy + 1e-9)).all()


def test_expr_matches_np(spark):
    pts = [(-124.7, 24.9), (-66.9, 49.4), (0.0, 0.0), (179.99, -89.99), (-180.0, 90.0)]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    for res in (4, 8):
        got = [r[0] for r in df.select(cells.cell_id(F.col("lon"), F.col("lat"), res)).collect()]
        exp = cells.cell_np([p[0] for p in pts], [p[1] for p in pts], res)
        assert got == list(exp)


def test_sql_twin_matches(spark):
    rng = np.random.default_rng(5)
    pts = [(float(a), float(b)) for a, b in zip(rng.uniform(-180, 180, 200), rng.uniform(-90, 90, 200))]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    res = 7
    got = [r[0] for r in df.select(cells.cell_id(F.col("lon"), F.col("lat"), res)).orderBy("lon").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE p(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    sql = cells.cell_id_sql("lon", "lat", res)
    exp = [r[0] for r in con.execute(f"SELECT {sql} FROM p ORDER BY lon").fetchall()]
    assert got == exp


def test_cover_bbox_contains_member_points(spark):
    df = spark.createDataFrame([(-110.0, 30.0, -100.0, 40.0)], ["minx", "miny", "maxx", "maxy"])
    res = 6
    cover = df.select(cells.cover_bbox(F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), res).alias("c")).collect()[0]["c"]
    rng = np.random.default_rng(1)
    lon = rng.uniform(-110, -100, 300)
    lat = rng.uniform(30, 40, 300)
    pts = set(cells.cell_np(lon, lat, res))
    assert pts.issubset(set(cover))


def test_children_partition_parent(spark):
    df = spark.createDataFrame([(-100.0, 35.0)], ["lon", "lat"])
    row = df.select(
        cells.cell_id(F.col("lon"), F.col("lat"), 5).alias("c")
    ).select(F.col("c"), cells.cell_children(F.col("c")).alias("kids")).collect()[0]
    r, iy, ix = cells.cell_decode_np(np.array([row["c"]]))
    for kid in row["kids"]:
        kr, kiy, kix = cells.cell_decode_np(np.array([kid]))
        assert kr[0] == r[0] + 1
        assert kiy[0] // 2 == iy[0] and kix[0] // 2 == ix[0]
    assert len(set(row["kids"])) == 4


def test_ring_block(spark):
    df = spark.createDataFrame([(-100.0, 35.0)], ["lon", "lat"])
    row = df.select(
        cells.cell_ring(cells.cell_id(F.col("lon"), F.col("lat"), 6), 1).alias("ring")
    ).collect()[0]
    assert len(row["ring"]) == 9  # interior cell: full 3x3
    rs, iys, ixs = cells.cell_decode_np(np.array(row["ring"]))
    assert (rs == 6).all()
    assert ixs.max() - ixs.min() == 2 and iys.max() - iys.min() == 2


def test_ring_clipped_at_edge(spark):
    df = spark.createDataFrame([(-179.999, 89.999)], ["lon", "lat"])  # corner cell
    row = df.select(
        cells.cell_ring(cells.cell_id(F.col("lon"), F.col("lat"), 6), 1).alias("ring")
    ).collect()[0]
    assert len(row["ring"]) == 4  # corner: 2x2 survive clipping


def test_tile_xyz_matches_sql(spark):
    rng = np.random.default_rng(9)
    pts = [(float(a), float(b)) for a, b in zip(rng.uniform(-179, 179, 100), rng.uniform(-84, 84, 100))]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    z = 8
    tx, ty = cells.tile_xyz(F.col("lon"), F.col("lat"), z)
    got = [(r["x"], r["y"]) for r in df.select(tx.alias("x"), ty.alias("y")).orderBy("lon").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE p(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    sx, sy = cells.tile_xyz_sql("lon", "lat", z)
    exp = con.execute(f"SELECT {sx}, {sy} FROM p ORDER BY lon").fetchall()
    assert got == [tuple(e) for e in exp]


def test_cover_bbox_antimeridian_wraps(spark):
    # minx > maxx means the box crosses the +-180 meridian: the x cover is
    # [x0, n-1] ++ [0, x1], never a silent negative-step sequence.
    from extractors_geo_spark.operators.cells import cover_bbox, cell_id

    row = (
        spark.range(1)
        .select(cover_bbox(F.lit(170.0), F.lit(-10.0), F.lit(-170.0), F.lit(10.0), 4).alias("c"))
        .collect()[0]
    )
    cells = set(row["c"])
    # the wrapped cover contains both an east-edge cell and a west-edge cell
    east = spark.range(1).select(cell_id(F.lit(175.0), F.lit(0.0), 4).alias("c")).collect()[0]["c"]
    west = spark.range(1).select(cell_id(F.lit(-175.0), F.lit(0.0), 4).alias("c")).collect()[0]["c"]
    mid = spark.range(1).select(cell_id(F.lit(0.0), F.lit(0.0), 4).alias("c")).collect()[0]["c"]
    assert east in cells and west in cells and mid not in cells
