"""Live continuous micro-batch stream (S6 processing-time trigger): files
landing while the query runs are picked up on the cadence and merged
incrementally; clean stop."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from snowflake_cdc_spark.plans.spec import PipelineSpec
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.sources.cdc import cdc_events_nested
from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
from tests.conftest import SF_SMOKE


def test_live_processing_time_stream(spark, tmp_path):
    events = cdc_events_nested(spark, SF_SMOKE).persist()
    inserts = events.filter(F.col("data.old_row").isNull() & ~F.col("data.metadata.is_delete"))
    rest = events.filter(F.col("data.old_row").isNotNull() | F.col("data.metadata.is_delete"))

    raw = str(tmp_path / "raw")
    inserts.coalesce(1).write.mode("overwrite").parquet(raw)

    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    pipe = CdcPipeline(
        spark,
        [PipelineSpec("tpch.orders", use_synthetic_key=True)],
        sink,
    )
    q = pipe.start_stream(raw, checkpoint=str(tmp_path / "ckpt"), processing_time="1 seconds")
    try:
        deadline = time.time() + 120
        while not sink.exists("ORDERS") and time.time() < deadline:
            time.sleep(0.5)
        assert sink.exists("ORDERS"), "first micro-batch never materialized"
        assert sink.read(spark, "ORDERS").count() == 1500  # inserts only

        # land updates+deletes while the stream is live
        rest.coalesce(1).write.mode("append").parquet(raw)
        deadline = time.time() + 120
        while time.time() < deadline:
            if sink.exists("ORDERS") and sink.read(spark, "ORDERS").count() == 1285:
                break
            time.sleep(0.5)
        assert sink.read(spark, "ORDERS").count() == 1285  # after deletes
    finally:
        q.stop()
        events.unpersist()
