"""CDC pipeline end-to-end (SURVEY.md §5.3): batch and streaming
(availableNow) runs over the same envelope input must produce identical
snapshots, matching the Q7/Q8 row_number oracle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.plans.spec import DeleteStrategy, PipelineSpec
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.sources.cdc import ORDER_COLS, cdc_events_nested
from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def raw_events_path(spark, tmp_path_factory):
    """Land the nested envelope fixture as the raw zone, in 3 chunks so the
    availableNow stream sees multiple files."""
    path = str(tmp_path_factory.mktemp("raw_zone"))
    events = cdc_events_nested(spark, SF_SMOKE)
    events.withColumn("__chunk", F.col("seq") % 3).repartition(3, "__chunk").drop(
        "__chunk"
    ).write.mode("overwrite").parquet(path)
    return path


def specs(strategy: DeleteStrategy) -> list[PipelineSpec]:
    return [
        PipelineSpec(
            full_table_name="tpch.orders",
            use_synthetic_key=True,
            delete_strategy=strategy,
        )
    ]


def snapshot_rows(sink, spark, table):
    df = sink.read(spark, table)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect()), cols


def oracle_snapshot(spark, hard: bool):
    """row_number-based oracle computed independently of the pipeline."""
    from pyspark.sql import Window

    from snowflake_cdc_spark.sources.cdc import cdc_events_flat

    flat = cdc_events_flat(spark, SF_SMOKE)
    w = Window.partitionBy("primary_key").orderBy(F.col("seq").desc())
    latest = flat.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    cols = ["primary_key", "seq"] + [f"row_{c}" for c in ORDER_COLS]
    if hard:
        out = latest.filter(~F.col("is_delete")).select(
            "primary_key", "seq", *[F.col(f"row_{c}").alias(c) for c in ORDER_COLS]
        )
    else:
        out = latest.select(
            "primary_key", "seq",
            *[F.col(f"row_{c}").alias(c) for c in ORDER_COLS],
            F.col("is_delete").alias("is_deleted"),
        )
    return out


@pytest.mark.parametrize("strategy", [DeleteStrategy.HARD, DeleteStrategy.LOGICAL])
def test_batch_matches_oracle(spark, raw_events_path, tmp_path, strategy):
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    pipe = CdcPipeline(spark, specs(strategy), sink)
    pipe.run_batch(raw_events_path)

    got = sink.read(spark, "ORDERS")
    want = oracle_snapshot(spark, hard=strategy is DeleteStrategy.HARD)
    assert sorted(got.columns) == sorted(want.columns)
    g = sorted(tuple(str(x) for x in r) for r in got.select(*sorted(got.columns)).collect())
    w = sorted(tuple(str(x) for x in r) for r in want.select(*sorted(want.columns)).collect())
    assert g == w


def test_streaming_batch_parity(spark, raw_events_path, tmp_path):
    """availableNow streaming over the same input == single batch run."""
    batch_sink = ParquetSnapshotSink(str(tmp_path / "batch_snap"))
    CdcPipeline(spark, specs(DeleteStrategy.HARD), batch_sink).run_batch(raw_events_path)

    stream_sink = ParquetSnapshotSink(str(tmp_path / "stream_snap"))
    pipe = CdcPipeline(spark, specs(DeleteStrategy.HARD), stream_sink)
    q = pipe.start_stream(
        raw_events_path,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
        max_files_per_trigger=1,  # force multiple micro-batches
    )
    q.awaitTermination(300)

    b, bc = snapshot_rows(batch_sink, spark, "ORDERS")
    s, sc = snapshot_rows(stream_sink, spark, "ORDERS")
    assert bc == sc
    assert b == s
    # multiple micro-batches actually happened (merge is incremental)
    assert stream_sink.current_version("ORDERS") > 0


def test_merge_idempotent_replay(spark, raw_events_path, tmp_path):
    """Replaying the same batch twice must not change the snapshot
    (exactly-once on top of at-least-once)."""
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    pipe = CdcPipeline(spark, specs(DeleteStrategy.HARD), sink)
    pipe.run_batch(raw_events_path)
    first, _ = snapshot_rows(sink, spark, "ORDERS")
    pipe.run_batch(raw_events_path)  # replay everything again
    second, _ = snapshot_rows(sink, spark, "ORDERS")
    assert first == second
