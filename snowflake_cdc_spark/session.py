"""SparkSession construction with scale-aware defaults.

Local testing runs on ``local[N]`` but every config here is chosen to also
be the right default on a 1000-executor cluster reading 100 TB:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast demotion/promotion) — the single highest-leverage setting at
  scale.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a real
  cluster AQE's coalescing makes the static number mostly irrelevant as
  long as it is high enough, so we set a floor of the parallelism.
- Arrow enabled for every Python<->JVM data exchange (Pandas UDFs,
  toPandas) — the only acceptable Python boundary at scale.
- UTC session timezone so timestamp semantics are reproducible across
  machines (and match the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "snowflake_cdc_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    In production the ``master`` would come from the cluster manager; here
    we default to ``local[$SPARK_GRAFT_CPUS]`` per the test environment.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # --- optimizer / execution ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- python boundary: always Arrow ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- reproducibility ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- local-mode resource shape (driver == executor in local) ---
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        # keep stdout clean for tools whose last line must be machine-parsed
        .config("spark.ui.showConsoleProgress", "false")
        # parquet scan parallelism: 128 MiB splits, the cluster default
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    # --- opt-in instrumentation (round 12, VERDICT item 2): both OFF by
    # default so the driver's bench runs exactly as before; set only when
    # diagnosing session outliers (GC pauses, per-stage timings).
    java_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    eventlog_dir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if eventlog_dir:
        os.makedirs(eventlog_dir, exist_ok=True)
        builder = builder.config("spark.eventLog.enabled", "true").config(
            "spark.eventLog.dir", eventlog_dir
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
