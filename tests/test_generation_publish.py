"""Atomic multi-table publish (VERDICT r08 #3): one generation manifest
commits N table versions; a mid-publish reader using the generation view
sees all-old or all-new, never mixed, and torn_transactions == 0 through
the sink path where per-table _CURRENT reads tear."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.snapshot import torn_transactions
from snowflake_cdc_spark.sinks.parquet_sink import (
    ConcurrentWriteError,
    ParquetSnapshotSink,
)


def _events(spark):
    """Multiplexed two-table log: every seq 1..10 is a transaction
    touching BOTH tables (the order-header/order-lines shape)."""
    rows = []
    for seq in range(1, 11):
        for table in ("A", "B"):
            rows.append((table, seq, seq * 10, False))
    return spark.createDataFrame(
        rows, "table_name string, seq bigint, pk bigint, is_delete boolean"
    )


def _apply(sink, events, table, hi):
    changes = events.filter(
        (F.col("table_name") == table) & (F.col("seq") <= hi)
    ).drop("table_name")
    sink.merge(changes, table, key_cols=["pk"], seq_col="seq")


def _max_seq(df):
    return df.agg(F.max("seq")).first()[0]


def test_generation_reader_never_mixed(spark, tmp_path):
    sink = ParquetSnapshotSink(str(tmp_path / "store"))
    ev = _events(spark)
    _apply(sink, ev, "A", 5)
    _apply(sink, ev, "B", 5)
    g0 = sink.publish_generation()
    assert g0 == 0 and sink.manifest() == {"A": 0, "B": 0}

    # mid-publish: A merged forward, B not yet
    _apply(sink, ev, "A", 8)
    snap = sink.read_all_at_generation(spark)
    assert _max_seq(snap["A"]) == 5 and _max_seq(snap["B"]) == 5  # all-old
    # the per-table _CURRENT view IS torn at this point
    assert _max_seq(sink.read(spark, "A")) == 8
    assert _max_seq(sink.read(spark, "B")) == 5

    _apply(sink, ev, "B", 8)
    snap = sink.read_all_at_generation(spark)
    assert _max_seq(snap["A"]) == 5 and _max_seq(snap["B"]) == 5  # still all-old

    g1 = sink.publish_generation()
    snap = sink.read_all_at_generation(spark)
    assert g1 == 1
    assert _max_seq(snap["A"]) == 8 and _max_seq(snap["B"]) == 8  # all-new


def test_torn_transactions_zero_through_sink_path(spark, tmp_path):
    sink = ParquetSnapshotSink(str(tmp_path / "store"))
    ev = _events(spark)
    _apply(sink, ev, "A", 5)
    _apply(sink, ev, "B", 5)
    sink.publish_generation()
    _apply(sink, ev, "A", 8)  # B lags — the lagging-replica state

    # visibility as a GENERATION reader observes it
    snap = sink.read_all_at_generation(spark)
    wm = {t: _max_seq(df) for t, df in snap.items()}
    vis_gen = F.when(F.col("table_name") == "A", F.col("seq") <= wm["A"]).otherwise(
        F.col("seq") <= wm["B"]
    )
    assert torn_transactions(ev, vis_gen).first()["n_torn"] == 0

    # visibility as a per-table _CURRENT reader observes it: torn
    wa = _max_seq(sink.read(spark, "A"))
    wb = _max_seq(sink.read(spark, "B"))
    vis_cur = F.when(F.col("table_name") == "A", F.col("seq") <= wa).otherwise(
        F.col("seq") <= wb
    )
    assert torn_transactions(ev, vis_cur).first()["n_torn"] == 3  # seqs 6,7,8


def test_publish_concurrency_and_vacuum_pin(spark, tmp_path):
    sink = ParquetSnapshotSink(str(tmp_path / "store"))
    ev = _events(spark)
    _apply(sink, ev, "A", 5)
    sink.publish_generation()
    with pytest.raises(ConcurrentWriteError):
        # a publisher derived from a stale generation loses loudly
        sink.publish_generation(expected_generation=-1)

    # vacuum never drops the generation-pinned version
    _apply(sink, ev, "A", 6)
    _apply(sink, ev, "A", 7)
    _apply(sink, ev, "A", 8)  # versions 0..3, generation pins v0
    removed = sink.vacuum("A", keep_last=1)
    assert 0 not in removed
    assert _max_seq(sink.read_generation(spark, "A")) == 5  # still readable
    sink.publish_generation()
    removed = sink.vacuum("A", keep_last=1)
    assert 0 in removed  # unpinned once the generation moved on


def test_pipeline_publishes_generation_per_batch(spark, tmp_path):
    from snowflake_cdc_spark.plans.spec import DeleteStrategy, PipelineSpec
    from snowflake_cdc_spark.sources.cdc import cdc_events_nested
    from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
    from tests.conftest import SF_SMOKE

    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    pipe = CdcPipeline(
        spark,
        [
            PipelineSpec(
                full_table_name="tpch.orders",
                use_synthetic_key=True,
                delete_strategy=DeleteStrategy.HARD,
            )
        ],
        sink,
    )
    events = cdc_events_nested(spark, SF_SMOKE)
    pipe.materialize_batch(events, batch_id=0)
    assert sink.current_generation() == 0
    assert sink.manifest() == {"ORDERS": sink.current_version("ORDERS")}
    store = pipe.read_store_consistent()
    assert store["ORDERS"].count() == sink.read(spark, "ORDERS").count()
    pipe.materialize_batch(events, batch_id=1)
    assert sink.current_generation() == 1


def test_stream_publishes_generation_per_microbatch(spark, tmp_path):
    """The availableNow stream path: every foreachBatch turn commits one
    generation, and the final consistent read equals the _CURRENT read."""
    from pyspark.sql import functions as F

    from snowflake_cdc_spark.plans.spec import DeleteStrategy, PipelineSpec
    from snowflake_cdc_spark.sources.cdc import cdc_events_nested
    from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
    from tests.conftest import SF_SMOKE

    raw = str(tmp_path / "raw")
    events = cdc_events_nested(spark, SF_SMOKE)
    events.withColumn("__c", F.col("seq") % 2).repartition(2, "__c").drop(
        "__c"
    ).write.mode("overwrite").parquet(raw)
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    pipe = CdcPipeline(
        spark,
        [
            PipelineSpec(
                full_table_name="tpch.orders",
                use_synthetic_key=True,
                delete_strategy=DeleteStrategy.HARD,
            )
        ],
        sink,
    )
    q = pipe.start_stream(
        raw, checkpoint=str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(300)
    g = sink.current_generation()
    assert g >= 0
    assert sink.manifest(g)["ORDERS"] == sink.current_version("ORDERS")
    snap = pipe.read_store_consistent()
    assert snap["ORDERS"].count() == sink.read(spark, "ORDERS").count()


def test_orphaned_claim_recovery(spark, tmp_path):
    """A publisher dying between the manifest claim and the pointer
    flip must not wedge the store: the orphan (gen file present,
    pointer behind) is replaced and the next publish succeeds."""
    import os

    sink = ParquetSnapshotSink(str(tmp_path / "store"))
    ev = _events(spark)
    _apply(sink, ev, "A", 5)
    sink.publish_generation()  # gen 0 committed
    # simulate a crash mid-publish of gen 1: claim exists, pointer at 0
    os.makedirs(os.path.join(sink.root, "_generations"), exist_ok=True)
    with open(os.path.join(sink.root, "_generations", "gen=1.json"), "w") as fh:
        fh.write('{"A": 999}')
    assert sink.current_generation() == 0
    g = sink.publish_generation()  # recovers: replaces the orphan
    assert g == 1
    assert sink.manifest(1) == {"A": sink.current_version("A")}
    # a COMMITTED generation's claim is still protected (pointer >= g)
    with pytest.raises(ConcurrentWriteError):
        sink.publish_generation(expected_generation=0)
