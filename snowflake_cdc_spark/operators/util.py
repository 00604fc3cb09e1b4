"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame

CKPT_MODE_KEY = "spark.snowflake_cdc.checkpoint.mode"
CKPT_DIR_KEY = "spark.snowflake_cdc.checkpoint.dir"


def _ckpt(df: DataFrame, eager: bool) -> DataFrame:
    """Lineage-truncating materialization with a production escape hatch.

    Every iterative/shared-subtree operator truncates lineage through
    this helper (via ``ckpt_eager``/``ckpt_lazy`` below). The default is
    ``localCheckpoint`` — cheapest, but its storage is NON-REPLICATED
    executor state: on a real cluster an executor loss kills the query
    instead of recomputing. ``spark.snowflake_cdc.checkpoint.mode``
    switches the posture session-wide without touching operator code:

    - ``local`` (default): ``localCheckpoint`` — bench/dev posture.
    - ``reliable``: ``DataFrame.checkpoint`` to the directory configured
      by ``spark.snowflake_cdc.checkpoint.dir`` (or a pre-set
      ``sparkContext.setCheckpointDir``) — survives executor loss; the
      production posture for long multi-round jobs.

    A ``persist(DISK_ONLY)`` variant was tried and rejected: persist
    keeps the logical plan, so for the iterative operators every round
    REGISTERS a growing nested plan in the CacheManager and every later
    analysis pays a deep plan-equality sweep against all of them —
    measured minutes of driver CPU in ``Project.equals`` on a 40-node
    toy graph. Lineage truncation is the point of these call sites;
    both remaining modes truncate.
    """
    spark = df.sparkSession
    mode = spark.conf.get(CKPT_MODE_KEY, "local")
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        sc = spark.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            ckpt_dir = spark.conf.get(CKPT_DIR_KEY, None)
            if not ckpt_dir:
                raise ValueError(
                    f"{CKPT_MODE_KEY}=reliable needs a checkpoint "
                    f"directory: set {CKPT_DIR_KEY} or call "
                    "sparkContext.setCheckpointDir()"
                )
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    raise ValueError(
        f"unknown {CKPT_MODE_KEY}={mode!r}; expected local|reliable"
    )


def ckpt_eager(df: DataFrame) -> DataFrame:
    """``df.transform(ckpt_eager)`` — materialize now, truncate lineage."""
    return _ckpt(df, eager=True)


def ckpt_lazy(df: DataFrame) -> DataFrame:
    """``df.transform(ckpt_lazy)`` — truncate lineage; the first action
    materializes (one job instead of two for loops whose convergence
    check is itself an action)."""
    return _ckpt(df, eager=False)


def ensure_persisted(df: DataFrame) -> DataFrame:
    """``persist()`` unless this plan is ALREADY in the cache.

    Operators with the leaked-persist lifecycle (dedup family: the
    returned DataFrame lazily reads the cached intermediates, callers
    clearCache between corpora) re-derive identical plans when two
    registry queries share a sub-pipeline over the same input — a second
    ``persist()`` on an already-cached plan is a no-op that logs
    ``CacheManager: Asked to cache already cached data``. The
    storage-level probe answers for the PLAN (Spark's CacheManager keys
    on the analyzed plan, not the DataFrame object), so the guard is
    exact."""
    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk:
        return df
    return df.persist()


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure CPU-bound per-row work gets cluster-wide parallelism.

    Small-but-expensive inputs (one parquet file of documents feeding
    millions of md5 calls; the probe side of a broadcast join) arrive as
    a handful of scan partitions — Spark sizes scans by *bytes*
    (maxPartitionBytes), not by downstream compute. One round-robin
    shuffle of the narrow input is noise next to the per-row work it
    parallelizes. No-op when the input is already wide enough (at real
    scale, a 100 TB scan has thousands of partitions and skips this)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Cheap wide-input short-circuit first (round 3): file count is pure
    # scan metadata — `df.rdd.getNumPartitions()` would force full plan
    # analysis through the RDD bridge on every call. A 100 TB input has
    # thousands of files and exits here without planning anything. The
    # exact partition probe only runs for few-file inputs (where a file
    # may still split into many partitions and repartition would wrongly
    # NARROW them) — and for exactly those small inputs the bridge is
    # cheap.
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
