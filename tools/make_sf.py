"""Deterministic Nx scale-up of a driver testdata dir (default sf0.1 ->
.bench_data/sf1.0) for the VERDICT r03 #2 scale validation run.

Facts get N disjoint KEY-SHIFTED copies (every id/key column shifts by
k * 10^12), so per-copy join hit rates — and therefore per-row work —
match the source exactly while total volume scales by N. region/nation
stay single-copy dims. Two columns get content perturbation so the
WORKLOAD SHAPE stays scale-invariant instead of degenerating:

* documents.text — copies k>0 replace every 7th word with a copy-unique
  token. 10 verbatim copies of every document would put all of them in
  the same MinHash/LSH buckets (bucket sizes x10 -> candidate pairs
  x100): a data-shape change, not a scale-up. The perturbation drops
  cross-copy shingle Jaccard far below dedup thresholds while leaving
  each copy's internal near-dup structure untouched.
* embeddings.embedding — rotated by k positions (norm-preserving) so
  top-k isn't k identical ties.

Output is bench-only (gitignored .bench_data/); the correctness gate
stays on the driver's own sf0.01.

Usage: python tools/make_sf.py [src_dir] [dst_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from extractors_geo_spark.session import get_spark  # noqa: E402

SHIFT = 10**12
DIMS = ("region", "nation")  # stay single-copy
FACTS = ("customer", "supplier", "part", "orders", "lineitem",
         "events", "documents", "embeddings")
SHIFT_COLS = {  # fact-local ids / keys: shift by k*SHIFT, dims untouched
    "c_custkey", "doc_id", "vec_id", "event_id", "user_id",
    "l_orderkey", "o_orderkey", "o_custkey",
    "p_partkey", "l_partkey", "l_suppkey", "s_suppkey",
}


def scale_table(spark, src: str, dst: str, name: str, n_copies: int) -> int:
    df = spark.read.parquet(f"{src}/{name}.parquet")
    if name in DIMS:
        out = df
    else:
        copies = spark.range(n_copies).select(F.col("id").alias("_k"))
        out = df.crossJoin(copies)
        for c, t in df.dtypes:
            if c in SHIFT_COLS:
                out = out.withColumn(c, (F.col(c) + F.col("_k") * F.lit(SHIFT)).cast(t))
        if name == "documents":
            out = out.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w, i: F.when(
                            (F.col("_k") > 0) & (i % 7 == 0),
                            F.concat(F.lit("w"), F.col("_k"), F.lit("x"), i),
                        ).otherwise(w),
                    ),
                    " ",
                ),
            ).withColumn("n_chars", F.length("text"))
        if name == "embeddings":
            emb, k = F.col("embedding"), F.col("_k")
            dim = F.size(emb)
            out = out.withColumn(
                "embedding",
                F.when(k == 0, emb).otherwise(
                    F.concat(F.slice(emb, k + 1, dim - k), F.slice(emb, 1, k))
                ),
            )
        out = out.drop("_k")
    rows = out.count()
    parts = max(4, min(64, rows // 100_000 or 4))
    out.repartition(parts).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    return rows


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_data", "sf1.0")
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="make_sf", master="local[32]")
    for name in DIMS + FACTS:
        rows = scale_table(spark, src, dst, name, n)
        print(f"{name}: {rows} rows")
    spark.stop()


if __name__ == "__main__":
    main()
