"""Per-spec AtTime replay horizons: two tables sharing one pipeline keep
independent start positions (a global filter would corrupt one of them)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from snowflake_cdc_spark.plans.spec import PipelineSpec, StartPosition
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.sources.cdc import cdc_events_nested
from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
from tests.conftest import SF_SMOKE


def test_per_spec_at_time_horizon(spark, tmp_path):
    cutoff = datetime(2024, 6, 1)
    events = cdc_events_nested(spark, SF_SMOKE).withColumn(
        "ingest_ts",
        F.when(F.col("seq") % 2 == 0, F.lit("2024-01-01"))
        .otherwise(F.lit("2024-12-01"))
        .cast("timestamp"),
    )
    raw = str(tmp_path / "raw")
    events.write.parquet(raw)

    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    specs = [
        # shard 0: full replay
        PipelineSpec("tpch.orders_part_0", use_synthetic_key=True, merge_shards=False),
        # shard 1: only events ingested after the cutoff
        PipelineSpec(
            "tpch.orders_part_1",
            use_synthetic_key=True,
            merge_shards=False,
            start_position=StartPosition.AT_TIME,
            start_time=cutoff,
            event_time_column="ingest_ts",
        ),
    ]
    CdcPipeline(spark, specs, sink).run_batch(raw)

    full = sink.read(spark, "ORDERS_PART_0")
    bounded = sink.read(spark, "ORDERS_PART_1")
    # the INPUT_START table is complete (even keys: 750 inserts − deletes)
    n_events_p0 = events.filter(F.col("data.full_table_name") == "tpch.orders_part_0").count()
    assert full.count() > 0 and n_events_p0 > full.count()  # deletes applied
    # the AT_TIME table saw only odd-seq (post-cutoff) events
    assert bounded.count() > 0
    max_even_seq = bounded.filter(F.col("seq") % 2 == 0).count()
    assert max_even_seq == 0, "AT_TIME table leaked pre-cutoff events"


def test_input_start_unaffected_by_sibling_at_time(spark, tmp_path):
    """Order of specs must not matter: the AT_TIME spec first, the
    INPUT_START spec second — the latter still gets full history."""
    cutoff = datetime(2024, 6, 1)
    events = cdc_events_nested(spark, SF_SMOKE).withColumn(
        "ingest_ts", F.lit("2024-12-01").cast("timestamp")
    )
    raw = str(tmp_path / "raw")
    events.write.parquet(raw)
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    specs = [
        PipelineSpec(
            "tpch.orders_part_1",
            use_synthetic_key=True,
            merge_shards=False,
            start_position=StartPosition.AT_TIME,
            start_time=cutoff,
            event_time_column="ingest_ts",
        ),
        PipelineSpec("tpch.orders_part_0", use_synthetic_key=True, merge_shards=False),
    ]
    CdcPipeline(spark, specs, sink).run_batch(raw)
    p0 = sink.read(spark, "ORDERS_PART_0").count()
    p1 = sink.read(spark, "ORDERS_PART_1").count()
    assert p0 > 0 and p1 > 0  # both materialized; neither truncated to zero
