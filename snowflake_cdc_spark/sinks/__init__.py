"""Sinks: local parquet snapshot store (test/dev) + Snowflake staged-MERGE
adapter (production, import-optional)."""

from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink

__all__ = ["ParquetSnapshotSink"]
