"""Structured-Streaming pipeline: one multiplexed CDC stream → N
materialized per-table snapshots."""

from snowflake_cdc_spark.streaming.pipeline import CdcPipeline

__all__ = ["CdcPipeline"]
