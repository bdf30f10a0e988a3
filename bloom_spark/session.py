"""SparkSession factory with scale-aware defaults.

Test/bench runs are ``local[N]`` (single JVM); the configs below are the
ones that matter identically on a 1000-executor cluster: AQE on (runtime
re-plan + skew-join splitting), Arrow batches sized so a pandas UDF batch
is big enough to amortize the Python round-trip, shuffle partitions set
explicitly (callers can override per job).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession

# library-wide logger: data-path operators emit WARNINGs here (e.g. a
# full cascade passing unique keys through unfiltered)
LOGGER = logging.getLogger("bloom_spark")


def silence_warnings(enabled: bool = True, spark: SparkSession | None = None) -> None:
    """F5 ≙ the reference's ``-sw`` flag (src/main.rs:300,
    src/bloom/process.rs:48-50): suppress per-record/operator warnings
    while keeping errors. Applies to the ``bloom_spark`` Python logger
    and, when a session is given, the JVM log level."""
    LOGGER.setLevel(logging.ERROR if enabled else logging.WARNING)
    if spark is not None:
        spark.sparkContext.setLogLevel("ERROR" if enabled else "WARN")


def get_session(
    app_name: str = "bloom_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("BLOOM_SPARK_MASTER", "local[*]")
    # Shuffle/spill scratch: RAM-backed /dev/shm is OPT-IN
    # (BLOOM_SPARK_SHM_SCRATCH=1, or point BLOOM_SPARK_LOCAL_DIR anywhere).
    # It helps single-box benches whose wide-row dedup shuffles are bound
    # by /tmp disk bandwidth, but tmpfs is typically capped at 50% RAM:
    # defaulting shuffle+spill into it would turn a bigger-than-RAM
    # shuffle into ENOSPC/OOM instead of spill-to-disk, so it must never
    # be the silent default (ADVICE r2). On a real cluster, leave unset —
    # spark.local.dir should be per-executor local NVMe.
    local_dir = os.environ.get("BLOOM_SPARK_LOCAL_DIR")
    if (
        local_dir is None
        and os.environ.get("BLOOM_SPARK_SHM_SCRATCH", "").lower() in ("1", "true", "yes")
        and os.path.isdir("/dev/shm")
    ):
        local_dir = "/dev/shm/bloom_spark_scratch"
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
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
