"""Point-in-polygon join — the engine's core spatial join (SURVEY.md J1/J2).

Replaces the containment semantics the reference delegates to GeoServer's
WMS bbox rendering (preview.geotiff/gsclient.py:75-76) and pycsw's bbox
records (pycsw.extractor/pycswutils.py:89-109) with a native two-phase plan:

  coarse:  polygons explode to their covering geocell set;
           points encode to their containing cell;
           equi-join on `cell` (hash-partitionable, AQE-skew-splittable)
  refine:  exact even-odd ray cast, vectorized over the Arrow batch
           (flat-edge-array trick: all candidate pairs' edges in one numpy
           kernel — no per-row Python)

Physical strategy is chosen by plans.planner.choose_pip_strategy:
  * broadcast  — polygon side small (the common dims-vs-facts shape; the
    states layer is 49 rows): exploded polygon-cells are broadcast, the
    point side never shuffles AT ALL.
  * partitioned — both sides large: shuffle on `cell`; hot metro cells are
    handled by AQE skew-join plus optional salting (points add a salt from
    phash, polygon cells duplicate per salt).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cells

DEFAULT_RES = 6  # 64x64 world grid ≈ 0.9 deg cells at CONUS; tune per layer

# cover_bbox/cell_id expand to large expression trees whose construction is
# hundreds of py4j round trips (~0.25 s per pip_join plan build, measured in
# the flagship pipeline's timed region) — memoized via exprcache (r8).
from ..exprcache import memo_col as _memo_col


def polygon_cells(polygons: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """Explode each polygon to its covering cells (bbox cover — false
    positives removed by the exact refine)."""
    cell = _memo_col(
        ("poly_cells", res),
        lambda: F.explode(
            cells.cover_bbox(F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), res)
        ),
    )
    return polygons.withColumn("cell", cell)


def tag_point_cells(points: DataFrame, lon: str = "lon", lat: str = "lat", res: int = DEFAULT_RES) -> DataFrame:
    cell = _memo_col(("point_cell", lon, lat, res),
                     lambda: cells.cell_id(F.col(lon), F.col(lat), res))
    return points.withColumn("cell", cell)


def _cover_cells_n(minx: float, miny: float, maxx: float, maxy: float, res: int) -> int:
    """Exact cardinality of cells.cover_bbox for a non-wrapping bbox —
    the same clamped floor arithmetic, evaluated driver-side."""
    n = 1 << res

    def _ix(lon):
        return min(max(int(np.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)

    def _iy(lat):
        return min(max(int(np.floor((90.0 - lat) / 180.0 * n)), 0), n - 1)

    nx = _ix(maxx) - _ix(minx) + 1
    ny = _iy(miny) - _iy(maxy) + 1
    return nx * ny


def _raycast_refine(joined: DataFrame, lon: str, lat: str) -> DataFrame:
    """Exact even-odd ray cast on candidate (point, polygon) pairs.

    Vectorized across the whole Arrow batch: ragged (multi-)rings are
    flattened to one edge array with per-row segment ids; crossings are
    counted with a single bincount — zero per-row Python.

    Multi-ring geometries (multipolygon parts and holes, shapefile
    convention) pass `ring_lens`: edges bridging two rings are masked out,
    and even-odd over all rings yields the standard polygon-with-holes
    semantics. Single-ring callers omit the column."""
    has_lens = "ring_lens" in joined.columns

    @F.pandas_udf(T.BooleanType())
    def inside(px: pd.Series, py: pd.Series, xs: pd.Series, ys: pd.Series,
               ring_lens: pd.Series) -> pd.Series:
        n = len(px)
        if n == 0:
            return pd.Series([], dtype=bool)
        lens = np.fromiter((len(v) for v in xs), dtype=np.int64, count=n)
        flat_x = np.concatenate([np.asarray(v, np.float64) for v in xs])
        flat_y = np.concatenate([np.asarray(v, np.float64) for v in ys])
        row = np.repeat(np.arange(n), lens)
        # an edge starts at every vertex except each ring's last
        edge_mask = np.ones(flat_x.size, dtype=bool)
        row_starts = np.cumsum(lens) - lens
        ring_ends = []
        for i, rl in enumerate(ring_lens):
            ends = np.cumsum(np.asarray(rl, np.int64)) if rl is not None and len(rl) else np.array([lens[i]])
            ring_ends.append(row_starts[i] + ends - 1)
        edge_mask[np.concatenate(ring_ends)] = False
        e1 = np.nonzero(edge_mask)[0]
        e2 = e1 + 1
        er = row[e1]
        x1, y1, x2, y2 = flat_x[e1], flat_y[e1], flat_x[e2], flat_y[e2]
        ppx = px.to_numpy(np.float64)[er]
        ppy = py.to_numpy(np.float64)[er]
        cond = (y1 > ppy) != (y2 > ppy)
        # over="ignore": near-horizontal edges overflow the division but a
        # huge xin still compares correctly — suppress the log flood
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            xin = (x2 - x1) * (ppy - y1) / (y2 - y1) + x1
        crossing = cond & (ppx < xin)
        counts = np.bincount(er[crossing], minlength=n)
        return pd.Series(counts % 2 == 1)

    lens_col = F.col("ring_lens") if has_lens else F.array(F.size("xs"))
    return joined.filter(inside(F.col(lon), F.col(lat), F.col("xs"), F.col("ys"), lens_col))


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    res: int = DEFAULT_RES,
    broadcast_polys: bool | None = None,
    point_cols: tuple[str, ...] = ("image_id",),
    poly_cols: tuple[str, ...] = ("poly_id", "name"),
    exact: bool | str = "auto",
    salt: int | None = None,
    poly_cells_hint: int | None = None,
    cell_stats: dict | None = None,
    poly_stats: dict | None = None,
) -> DataFrame:
    """Return one row per (point, containing polygon).

    broadcast_polys=None lets the planner decide from the polygon count.
    exact='auto' (default) drops the ray-cast python stage when the layer
    is all axis-aligned rectangles (bbox refine is then already exact) —
    a plan rewrite, not an approximation. Pass True/False to force.
    `salt` (partitioned path only) spreads each hot cell over `salt`
    shuffle keys; the polygon side is duplicated per salt value, the point
    side picks pmod(phash-or-hash, salt). `poly_cells_hint` (expected
    exploded polygon-cell rows) skips the broadcast-probe job entirely.

    `cell_stats` / `poly_stats` (r7): ingest-time stats from
    plans.stats.stored_cell_stats / stored_poly_stats. With both
    provided, EVERY planner decision (exact, broadcast, salt) is a
    driver-side lookup — the plan builds with zero probe jobs; the
    probes remain the fallback for stat-less inputs."""
    from ..plans import planner

    if poly_stats is not None:
        if exact == "auto":
            exact = not poly_stats["all_rect"]
        if poly_cells_hint is None:
            poly_cells_hint = poly_stats["poly_cells"]
    # generation-time stats riding the DataFrame (datagen.polygons_df, r8):
    # same contract as poly_stats, but the cover cardinality is counted
    # here for THIS res from the stored bboxes — pure driver arithmetic,
    # zero probe jobs (measured ~0.3 s/plan on the flagship pipeline)
    gen_stats = getattr(polygons, "_egs_poly_stats", None)
    if gen_stats is not None:
        if exact == "auto":
            exact = not gen_stats["all_rect"]
        if poly_cells_hint is None:
            poly_cells_hint = sum(
                _cover_cells_n(mnx, mny, mxx, mxy, res)
                for mnx, mny, mxx, mxy in gen_stats["bboxes"]
            )
    if exact == "auto":
        exact = not planner.all_rectangles(polygons)
    # single select per side (r8): select-then-withColumn costs one extra
    # eagerly-analyzed Dataset op per side — fused into one projection
    # (~0.05 s/plan build; the flagship times plan construction)
    cell_col = _memo_col(("point_cell", lon, lat, res),
                         lambda: cells.cell_id(F.col(lon), F.col(lat), res))
    pts = points.select(*point_cols, lon, lat, cell_col.alias("cell"))
    geom_cols = ["xs", "ys", "minx", "miny", "maxx", "maxy"]
    if "ring_lens" in polygons.columns:
        geom_cols.append("ring_lens")
    pcs_cell = _memo_col(
        ("poly_cells", res),
        lambda: F.explode(
            cells.cover_bbox(F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), res)
        ),
    )
    pcs = polygons.select(*poly_cols, *geom_cols, pcs_cell.alias("cell"))

    if broadcast_polys is None:
        # poly_cells_hint (expected EXPLODED polygon-cell row count) makes
        # the decision free; otherwise a bounded count probes it
        broadcast_polys = planner.should_broadcast(pcs, size_hint=poly_cells_hint)
    if (salt is None and not broadcast_polys and cell_stats is not None
            and cell_stats.get("max_cell_n")):
        # stored hottest-cell bound -> salt factor with no probe job
        s_ = planner.salt_factor(None, max_hint=cell_stats["max_cell_n"])
        salt = s_ if s_ > 1 else None

    if broadcast_polys:
        joined = pts.join(F.broadcast(pcs), "cell")
    elif salt and salt > 1:
        # shuffle_hash hint: the partitioned path exists for polygon sides
        # too big to broadcast; without the hint Catalyst would silently
        # re-broadcast small test layers and hide partitioned-path bugs
        salted_pts = pts.withColumn("salt", F.pmod(F.xxhash64(*point_cols), F.lit(salt)))
        salted_pcs = pcs.withColumn("salt", F.explode(F.array(*[F.lit(s) for s in range(salt)])))
        joined = salted_pts.join(salted_pcs.hint("shuffle_hash"), ["cell", "salt"]).drop("salt")
    else:
        joined = pts.join(pcs.hint("shuffle_hash"), "cell")

    # cheap bbox refine first (pure Catalyst, prunes before the UDF)
    joined = joined.filter(
        (F.col(lon) >= F.col("minx")) & (F.col(lon) <= F.col("maxx"))
        & (F.col(lat) >= F.col("miny")) & (F.col(lat) <= F.col("maxy"))
    )
    if exact:
        joined = _raycast_refine(joined, lon, lat)
    return joined.select(*point_cols, lon, lat, *poly_cols)
