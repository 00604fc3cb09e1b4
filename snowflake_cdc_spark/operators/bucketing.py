"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §7 step 8).

At 100 TB the dominant cost of a fact-fact join is the shuffle. Bucketing
pre-shuffles ONCE at write time: both tables hash-partitioned into the
same bucket count on the join key, so every subsequent join/aggregation
on that key is Exchange-free (verify with ``assert_no_shuffle_join``).
This is Spark's native bucketing (hash = Murmur3 on the key, same scheme
the shuffle itself uses), persisted through the session catalog.

The CDC snapshot use case: bucket snapshots by the upsert key so the
merge's latest-by-key aggregation and downstream joins against the
snapshot reuse the bucketing instead of re-shuffling every micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table."""
    keys = [key] if isinstance(key, str) else key
    writer = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans as a
    SortMergeJoin with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def shuffle_exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchanges in the physical plan (broadcast exchanges
    excluded) — the assertion primitive for co-location tests."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
