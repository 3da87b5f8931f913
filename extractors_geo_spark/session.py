"""SparkSession factory tuned for the engine.

Local-mode testing uses local[N] threads, but every config here is chosen
for multi-executor scale: AQE on (runtime skew-split + partition coalesce),
Arrow on (all Python crossings are vectorized), shuffle partitions sized to
the parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "extractors_geo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Parse thread count out of local[N] to size shuffle partitions.
    if shuffle_partitions is None:
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = 32 if inner == "*" else max(8, int(inner))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # NOT the machine max: an oversized heap (e.g. 48g) makes G1 burn
        # 3-4x CPU in GC under the Arrow allocation churn of python stages
        # at high thread counts (measured: 300k-image pipeline 8.1s at 48g
        # vs 2.5s at 8g on local[32]). Real clusters size executor heaps
        # per-core anyway; 12g mirrors that.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # keep big binary rows from blowing up broadcast decisions
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
