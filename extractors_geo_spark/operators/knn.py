"""Grid kNN — nearest captioned neighbors per query point (SURVEY.md J5).

Candidate generation by cell-ring expansion (each query point joins
targets in its (2k+1)^2 cell neighborhood — an equi-join on cell, hash
partitionable), then exact distance + per-query top-k via window ranking:
row_number() OVER (PARTITION BY query ORDER BY dist) <= k, the engine's
only ranking construct (SURVEY.md §2.5).

Completeness: a neighbor can only be missed if it lies outside the ring
block. With ring k and cell edge E, any point within distance E*k of the
query is guaranteed covered; callers pick (res, ring) so that the expected
k-th-neighbor distance << E*ring. knn_join reports how many queries
received fewer than k neighbors so callers can fall back to a coarser res
(no silent truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import cells


def sq_dist(lon1, lat1, lon2, lat2):
    """Squared equirectangular-scaled distance in degree^2, latitude-
    corrected at the CONUS mean latitude — monotone in true distance at
    regional scale, cheap, and exactly reproducible in ANSI SQL."""
    dx = (lon1 - lon2) * 0.7547095802227721  # cos(40 deg)
    dy = lat1 - lat2
    return dx * dx + dy * dy


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 5,
    res: int = 7,
    ring: int = 1,
    q_id: str = "query_id",
    t_id: str = "image_id",
    q_lon: str = "lon",
    q_lat: str = "lat",
    t_lon: str = "lon",
    t_lat: str = "lat",
    t_cols: tuple[str, ...] = (),
    broadcast_queries: bool | None = None,
    q_size_hint: int | None = None,
) -> DataFrame:
    """Top-k targets per query. Output: (query_id, image_id, dist_sq, rank,
    *t_cols). `q_size_hint` (known query count) makes the broadcast
    decision free (no probe job)."""
    q_base = queries.select(
        F.col(q_id), F.col(q_lon).alias("_qlon"), F.col(q_lat).alias("_qlat")
    )
    if broadcast_queries is None:
        # size probe BEFORE the (2k+1)^2 ring explode — counting after it
        # costs a ~9x-inflated extra job on the hot path (VERDICT r01 #6)
        ring_rows = (2 * ring + 1) ** 2
        cap = 1_000_000 // ring_rows
        if q_size_hint is not None:
            broadcast_queries = q_size_hint <= cap
        else:
            broadcast_queries = q_base.limit(cap + 1).count() <= cap
    q = q_base.withColumn(
        "cell", F.explode(cells.cell_ring(cells.cell_id(F.col("_qlon"), F.col("_qlat"), res), ring))
    )
    t = targets.select(
        F.col(t_id), F.col(t_lon).alias("_tlon"), F.col(t_lat).alias("_tlat"), *t_cols
    ).withColumn("cell", cells.cell_id(F.col("_tlon"), F.col("_tlat"), res))
    joined = t.join(F.broadcast(q) if broadcast_queries else q, "cell")

    d = sq_dist(F.col("_qlon"), F.col("_qlat"), F.col("_tlon"), F.col("_tlat"))
    w = Window.partitionBy(q_id).orderBy(F.col("dist_sq").asc(), F.col(t_id).asc())
    return (
        joined.withColumn("dist_sq", d)
        # a target can match several ring cells of the same query only if
        # queries duplicate cells (they don't: ring cells are distinct), so
        # no dedup needed before ranking
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, t_id, "dist_sq", "rank", *t_cols)
    )


def knn_coverage(knn_out: DataFrame, k: int, q_id: str = "query_id") -> DataFrame:
    """Queries that found fewer than k neighbors (ring too small / sparse
    region) — surfaced, never silently dropped."""
    return knn_out.groupBy(q_id).agg(F.count(F.lit(1)).alias("found")).filter(F.col("found") < k)
