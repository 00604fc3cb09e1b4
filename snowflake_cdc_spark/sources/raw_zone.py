"""Raw-zone landing conventions (SURVEY.md §7 step 8).

The reference's CDC source lands one multiplexed stream in cloud storage
(README.md:12,16) with no stated layout; at 100 TB the layout IS the
query plan. Landing the envelope hive-partitioned by

    p_table=<full_table_name> / p_seq_bucket=<seq div N>

turns the two dominant access patterns into partition-pruned scans:

* per-table demux (P1/K6): `WHERE data.full_table_name = 'db.t'` reads
  exactly one table's directories — a 500-table zone costs one table's
  bytes per pipeline, not 500;
* bounded replay (S2 AtTime / E3 backfill): a seq/time lower bound
  prunes old buckets instead of rescanning history.

Partition values are directory names, so the writer sanitizes the table
name; the original `data.*` columns are untouched — readers keep the
envelope contract and may ignore the partition columns entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["land_raw_zone", "read_raw_zone"]


def land_raw_zone(
    events_nested: DataFrame,
    path: str,
    seq_bucket_size: int = 1_000_000,
    mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """Write envelope rows hive-partitioned by (table, seq bucket).

    ``fmt``: any nested-capable Spark file format — ``parquet``
    (default), ``orc``, ``json``. The envelope is a nested struct, so
    flat-only formats (csv) are rejected by Spark itself. Partition
    layout — the part that carries the 100 TB pruning contract — is
    format-independent.
    """
    (
        events_nested.withColumn(
            "p_table",
            F.regexp_replace(F.col("data.full_table_name"), r"[^A-Za-z0-9_.]", "_"),
        )
        .withColumn(
            "p_seq_bucket", (F.col("seq") / F.lit(seq_bucket_size)).cast("long")
        )
        .write.mode(mode)
        .partitionBy("p_table", "p_seq_bucket")
        .format(fmt)
        .save(path)
    )


def read_raw_zone(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    min_seq: int | None = None,
    seq_bucket_size: int = 1_000_000,
    fmt: str = "parquet",
    schema=None,
) -> DataFrame:
    """Read the landed zone with partition-level pruning applied.

    ``table`` prunes to one table's directories; ``min_seq`` prunes seq
    buckets below the replay horizon (the residual row-level ``seq >=
    min_seq`` filter still applies inside the oldest kept bucket).
    ``schema`` is required for schema-less formats (json) to round-trip
    envelope types (timestamps, longs) exactly; self-describing formats
    (parquet/orc) ignore it.
    """
    reader = spark.read
    if schema is not None and fmt == "json":
        reader = reader.schema(schema)
    df = reader.format(fmt).load(path)
    if table is not None:
        df = df.filter(
            F.col("p_table") == F.regexp_replace(F.lit(table), r"[^A-Za-z0-9_.]", "_")
        )
    if min_seq is not None:
        df = df.filter(
            (F.col("p_seq_bucket") >= min_seq // seq_bucket_size)
            & (F.col("seq") >= min_seq)
        )
    return df.drop("p_table", "p_seq_bucket")
