"""SparkSession factory with scale-aware defaults.

Test/bench runs are ``local[N]`` (single JVM); the configs below are the
ones that matter identically on a 1000-executor cluster: AQE on (runtime
re-plan + skew-join splitting), Arrow batches sized so a pandas UDF batch
is big enough to amortize the Python round-trip, shuffle partitions set
explicitly (callers can override per job).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "bloom_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("BLOOM_SPARK_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("BLOOM_SPARK_DRIVER_MEM", "16g"))
        # a tree-merge's final fold collects ~P^(1/depth) sketch blobs (a
        # 10^9-key filter is ~256 MB each) — the 1g default kills the job
        .config("spark.driver.maxResultSize", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
