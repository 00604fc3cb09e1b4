"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
