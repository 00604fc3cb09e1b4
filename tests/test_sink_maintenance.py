"""Snapshot-sink maintenance: time travel, vacuum, compaction — plus the
watermarked windowed aggregation's stream/batch parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from snowflake_cdc_spark.plans.spec import PipelineSpec
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.sources.cdc import cdc_events_nested
from snowflake_cdc_spark.sources.io import read_table
from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
from snowflake_cdc_spark.streaming.windows import windowed_counts
from tests.conftest import SF_SMOKE


def _pipeline(spark, tmp_path):
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    pipe = CdcPipeline(
        spark, [PipelineSpec("tpch.orders", use_synthetic_key=True)], sink
    )
    return pipe, sink


def test_time_travel_and_vacuum(spark, tmp_path):
    events = cdc_events_nested(spark, SF_SMOKE)
    pipe, sink = _pipeline(spark, tmp_path)
    # three merge generations: inserts, then updates, then deletes
    is_del = F.col("data.metadata.is_delete")
    generations = [
        F.col("data.old_row").isNull() & ~is_del,  # inserts
        F.col("data.old_row").isNotNull() & ~is_del,  # updates
        is_del,  # deletes
    ]
    for cond in generations:
        pipe.materialize_batch(events.filter(cond))

    versions = sink.versions("ORDERS")
    assert len(versions) == 3
    v_insert_only = sink.read_version(spark, "ORDERS", versions[0])
    current = sink.read(spark, "ORDERS")
    assert v_insert_only.count() == 1500  # all inserts, nothing deleted yet
    assert current.count() == 1285  # after deletes

    removed = sink.vacuum("ORDERS", keep_last=1)
    assert removed == versions[:-1]
    assert sink.versions("ORDERS") == [versions[-1]]
    assert sink.read(spark, "ORDERS").count() == 1285  # current untouched


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    events = cdc_events_nested(spark, SF_SMOKE)
    pipe, sink = _pipeline(spark, tmp_path)
    pipe.materialize_batch(events)
    before = sink.read(spark, "ORDERS").count()

    v = sink.compact(spark, "ORDERS", target_files=2)
    vdir = str(tmp_path / "snap" / "ORDERS" / f"v={v}")
    n_files = len([f for f in os.listdir(vdir) if f.endswith(".parquet")])
    assert n_files <= 2
    assert sink.read(spark, "ORDERS").count() == before


def test_zorder_compaction_clusters_and_preserves(spark, tmp_path):
    """compact(zorder_by=...) preserves the snapshot exactly and leaves
    every file covering a narrow slice of each z-column (footer-stat
    skipping works on both), unlike arrival-order compaction."""
    from snowflake_cdc_spark.operators.zorder import file_stat_ranges

    events = cdc_events_nested(spark, SF_SMOKE)
    pipe, sink = _pipeline(spark, tmp_path)
    pipe.materialize_batch(events)
    before = sorted(
        (r["primary_key"], r["seq"])
        for r in sink.read(spark, "ORDERS").collect()
    )

    v = sink.compact(
        spark, "ORDERS", target_files=4, zorder_by=["o_custkey", "o_orderkey"]
    )
    vdir = str(tmp_path / "snap" / "ORDERS" / f"v={v}")
    cov = file_stat_ranges(spark, vdir, ["o_custkey", "o_orderkey"])
    assert len(cov) >= 2
    avg = lambda cs, c: sum(f[c] for f in cs) / len(cs)
    # arrival-order files see ~the whole range of both columns (~1.0 each);
    # the z-ordered rewrite must be meaningfully tighter on BOTH
    v0dir = str(tmp_path / "snap" / "ORDERS" / f"v={v - 1}")
    cov0 = file_stat_ranges(spark, v0dir, ["o_custkey", "o_orderkey"])
    assert avg(cov, "o_custkey") < 0.85 * avg(cov0, "o_custkey")
    assert avg(cov, "o_orderkey") < 0.85 * avg(cov0, "o_orderkey")

    after = sorted(
        (r["primary_key"], r["seq"])
        for r in sink.read(spark, "ORDERS").collect()
    )
    assert after == before


def test_watermarked_window_stream_batch_parity(spark, tmp_path):
    events = read_table(spark, SF_SMOKE, "events").select("ts", "event_type")
    src = str(tmp_path / "src")
    events.coalesce(3).write.parquet(src)

    batch = {
        (str(r.win_start), r.event_type): r.n
        for r in windowed_counts(events, group_cols=["event_type"]).collect()
    }

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = {}

    def sink_batch(df, _):
        for r in df.collect():
            got[(str(r.win_start), r.event_type)] = r.n

    q = (
        windowed_counts(stream, group_cols=["event_type"])
        .writeStream.outputMode("update")
        .foreachBatch(sink_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert got == batch
