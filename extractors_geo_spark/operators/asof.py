"""As-of (backward) join — the temporal join Spark lacks natively.

For each left row, attach the most recent right row with the same key and
right_ts <= left_ts. Classic union trick, all JVM-side:

  union(tagged left, tagged right)
  -> window per key ordered by (ts, src)   [right sorts before left at ties]
  -> last(right_col, ignorenulls) carried forward
  -> keep left rows

One shuffle on the key (the window's partitionBy); no per-row Python.
Right rows are deduplicated per (key, ts) latest-wins first so ties are
deterministic (matches DuckDB's native ASOF JOIN used as the oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    tie_col: str | None = None,
) -> DataFrame:
    """Returns left rows + `asof_<col>` for each right col (null when no
    prior right row exists). `tie_col` breaks duplicate right timestamps
    (latest tie_col wins)."""
    r = right.select(key, F.col(right_ts).alias("_ts"), *right_cols,
                     *([F.col(tie_col).alias("_tie")] if tie_col else [F.lit(0).alias("_tie")]))
    w_dedup = Window.partitionBy(key, "_ts").orderBy(F.col("_tie").desc())
    r = r.withColumn("_rn", F.row_number().over(w_dedup)).filter(F.col("_rn") == 1).drop("_rn", "_tie")

    # Carry ONE struct of all right values, non-null whenever a right ROW
    # exists — so a matched right row whose value columns are NULL is still
    # the carried match (DuckDB ASOF JOIN returns that row's NULLs; a
    # per-column last(ignorenulls) would skip it and resurrect older values).
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_src", F.lit(1))
    rt = r.withColumn("_src", F.lit(0))
    rstruct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    rt = rt.withColumn("_r_row", rstruct).drop(*right_cols)
    lt = lt.withColumn("_r_row", F.lit(None).cast(rt.schema["_r_row"].dataType))
    missing_in_rt = [c for c in lt.columns if c not in rt.columns]
    for c in missing_in_rt:
        rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    u = lt.select(*lt.columns).unionByName(rt.select(*lt.columns))

    w = Window.partitionBy(key).orderBy(F.col("_ts").asc(), F.col("_src").asc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u = u.withColumn("_asof_row", F.last("_r_row", ignorenulls=True).over(w))
    for c in right_cols:
        u = u.withColumn(f"asof_{c}", F.col("_asof_row")[c])
    return u.filter(F.col("_src") == 1).drop("_src", "_ts", "_r_row", "_asof_row")
