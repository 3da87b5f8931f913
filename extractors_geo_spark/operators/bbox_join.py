"""bbox-intersection range join (SURVEY.md J1 in its general box-vs-box
form): which image footprints intersect which query windows — the WMS
GetMap contract (preview.geotiff/gsclient.py:75-76) as a native join.

Plan: both sides explode to covering geocells at a common resolution,
equi-join on cell, exact rectangle-overlap refine in Catalyst, and the
REFERENCE-CORNER dedup: a pair sharing k cells would emit k rows, so only
the row whose join cell contains the intersection's lower-left corner
survives — deduplication without a distinct/shuffle, entirely codegen.

Fully Catalyst: no python stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cells


def _split_antimeridian(df: DataFrame, minx: str, maxx: str) -> DataFrame:
    """Boxes given as minx > maxx wrap across the ±180 meridian; the
    interval predicates downstream (lmx <= rXx etc.) are meaningless for
    them, so split each wrapped box into its two non-wrapping pieces
    ([minx, 180] and [-180, maxx]) before the cover/join. Non-wrapped rows
    explode to a single piece — stays in codegen (GenerateExec)."""
    pieces = F.when(
        F.col(minx) > F.col(maxx),
        F.array(
            F.struct(F.col(minx).alias("x0"), F.lit(180.0).alias("x1")),
            F.struct(F.lit(-180.0).alias("x0"), F.col(maxx).alias("x1")),
        ),
    ).otherwise(F.array(F.struct(F.col(minx).alias("x0"), F.col(maxx).alias("x1"))))
    return (
        df.withColumn("_piece", F.explode(pieces))
        .withColumn(minx, F.col("_piece.x0"))
        .withColumn(maxx, F.col("_piece.x1"))
        .drop("_piece")
    )


def bbox_join(
    left: DataFrame,
    right: DataFrame,
    res: int = 6,
    l_id: str = "image_id",
    r_id: str = "query_id",
    l_cols: tuple[str, str, str, str] = ("minx", "miny", "maxx", "maxy"),
    r_cols: tuple[str, str, str, str] = ("minx", "miny", "maxx", "maxy"),
    broadcast_right: bool | None = None,
    r_size_hint: int | None = None,
) -> DataFrame:
    """One row per DISJOINT INTERSECTION RECTANGLE of a (left, right)
    pair — exactly one row for ordinary pairs; an antimeridian-wrapped box
    meeting a partner on BOTH sides of the seam yields two rows (one per
    rectangle). Touch-only boundaries count as intersecting (closed
    boxes, >= / <=), matching SQL BETWEEN semantics so the oracle is
    declarative. Consumers that need pair-level uniqueness over wrapped
    data should dropDuplicates([l_id, r_id])."""
    lmx, lmy, lXx, lXy = (F.col(f"l_{c}") for c in l_cols)
    rmx, rmy, rXx, rXy = (F.col(f"r_{c}") for c in r_cols)

    l = _split_antimeridian(
        left.select(
            F.col(l_id),
            *[F.col(c).alias(f"l_{c}") for c in l_cols],
        ),
        f"l_{l_cols[0]}",
        f"l_{l_cols[2]}",
    ).withColumn("cell", F.explode(cells.cover_bbox(lmx, lmy, lXx, lXy, res)))
    r_base = right.select(
        F.col(r_id),
        *[F.col(c).alias(f"r_{c}") for c in r_cols],
    )
    if broadcast_right is None:
        # probe BEFORE the cover explode (VERDICT r01 #6); assume a modest
        # cover fan-out when budgeting the broadcast. r_size_hint (known
        # right-side count) makes the decision free.
        if r_size_hint is not None:
            broadcast_right = r_size_hint <= 250_000
        else:
            broadcast_right = r_base.limit(250_001).count() <= 250_000
    r = _split_antimeridian(r_base, f"r_{r_cols[0]}", f"r_{r_cols[2]}").withColumn(
        "cell", F.explode(cells.cover_bbox(rmx, rmy, rXx, rXy, res))
    )
    joined = l.join(F.broadcast(r) if broadcast_right else r, "cell")

    intersects = (lmx <= rXx) & (lXx >= rmx) & (lmy <= rXy) & (lXy >= rmy)
    # reference corner: the intersection's lower-left point; the pair is
    # kept only in the cell containing it -> exactly one row per pair
    ix = F.greatest(lmx, rmx)
    iy = F.greatest(lmy, rmy)
    ref_cell = cells.cell_id(ix, iy, res)
    return (
        joined.filter(intersects & (F.col("cell") == ref_cell))
        .select(l_id, r_id,
                ix.alias("ix_minx"), iy.alias("ix_miny"),
                F.least(lXx, rXx).alias("ix_maxx"), F.least(lXy, rXy).alias("ix_maxy"))
    )
