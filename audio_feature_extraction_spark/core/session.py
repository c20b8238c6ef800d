"""SparkSession factory with scale-oriented defaults.

Local mode is the test harness; the configs are chosen so the same job is
correct on a multi-executor cluster: AQE on (runtime coalesce + skew-split),
Arrow on (vectorized UDF transfer), shuffle partitions sized to parallelism
rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "audio_feature_extraction_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Parameters mirror what a cluster deploy would set via spark-submit; in
    the sandbox we drive parallelism via ``local[N]``.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # parse N from local[N] so shuffle width tracks parallelism
    if shuffle_partitions is None:
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if inner in ("", "*") else int(inner)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # bucketed-table support without polluting the CWD
        .config("spark.sql.warehouse.dir", "/tmp/afes_warehouse")
        # ContextCleaner frees dropped cache/localCheckpoint blocks only
        # after a JVM GC notices the dead references; the default
        # periodic System.gc() interval (30min) is longer than a whole
        # bench/pipeline process, so scratch blocks from earlier
        # operators pile up in the unified memory region and evict-churn
        # later operators. One minute keeps per-call scratch (hash
        # counts, band tables, postings, sorted runs) bounded on any
        # long-lived session — same value at cluster scale, where
        # sessions live far past 30 minutes anyway.
        .config("spark.cleaner.periodicGC.interval", "1min")
        # ANSI off: we rely on wrap-around-free integer ranges but want
        # slice()/element_at() permissive semantics identical to DuckDB's
        # list ops for the oracle comparisons.
        .config("spark.sql.ansi.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
