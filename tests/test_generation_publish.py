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

    # vacuum never drops a generation-pinned version — for EVERY
    # retained manifest, not just the current one (VERDICT r09 #2)
    _apply(sink, ev, "A", 6)
    _apply(sink, ev, "A", 7)
    _apply(sink, ev, "A", 8)  # versions 0..3, generation 0 pins v0
    removed = sink.vacuum("A", keep_last=1)
    assert 0 not in removed
    assert _max_seq(sink.read_generation(spark, "A")) == 5  # still readable
    sink.publish_generation()
    # gen 0's manifest is still retained, so v0 stays pinned until the
    # retention policy prunes it — manifests and versions in lockstep
    removed = sink.vacuum("A", keep_last=1)
    assert 0 not in removed
    assert _max_seq(sink.read_generation(spark, "A", gen=0)) == 5
    pruned = sink.prune_generations(keep_generations=1)
    assert pruned == [0]
    removed = sink.vacuum("A", keep_last=1)
    assert 0 in removed  # unpinned once retention moved on


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
    """A publisher dying between the manifest claim and the commit
    marker must not wedge the store: the next publisher ADOPTS the
    orphan (commits exactly what the dead writer staged — claims are
    link-atomic, so the content is always complete) and then commits
    its own manifest at the next number. Nothing is ever deleted or
    replaced, so no interleaving can leave a committed generation
    pointing at a missing or swapped manifest (ADVICE r09)."""
    import os

    sink = ParquetSnapshotSink(str(tmp_path / "store"))
    ev = _events(spark)
    _apply(sink, ev, "A", 5)
    sink.publish_generation()  # gen 0 committed
    # simulate a crash mid-publish of gen 1: claim staged, no marker
    os.makedirs(os.path.join(sink.root, "_generations"), exist_ok=True)
    with open(os.path.join(sink.root, "_generations", "gen=1.json"), "w") as fh:
        fh.write('{"A": 0, "_publisher": "deadbeef"}')
    assert sink.current_generation() == 0
    g = sink.publish_generation()  # adopts the orphan, lands at 2
    assert g == 2
    assert sink.current_generation() == 2
    assert sink.manifest(1) == {"A": 0}  # the orphan's content, verbatim
    assert sink.manifest(2) == {"A": sink.current_version("A")}
    # a publisher holding a stale view still loses loudly (strict CAS)
    with pytest.raises(ConcurrentWriteError):
        sink.publish_generation(expected_generation=0)


def test_strict_cas_on_live_claim(spark, tmp_path):
    """Strict mode (explicit expected_generation) on a claim conflict
    adopts the conflicting claim and raises — the caller derived its
    versions from a stale read and must re-derive."""
    import os

    sink = ParquetSnapshotSink(str(tmp_path / "store"))
    ev = _events(spark)
    _apply(sink, ev, "A", 5)
    sink.publish_generation()
    os.makedirs(os.path.join(sink.root, "_generations"), exist_ok=True)
    with open(os.path.join(sink.root, "_generations", "gen=1.json"), "w") as fh:
        fh.write('{"A": 0, "_publisher": "racer"}')
    with pytest.raises(ConcurrentWriteError):
        sink.publish_generation(expected_generation=0)
    # the adoption committed the racer's manifest — never lost, never torn
    assert sink.current_generation() == 1
    assert sink.manifest(1) == {"A": 0}


def test_generation_retention_contract(spark, tmp_path):
    """VERDICT r09 #2 done-criterion: vacuum between three published
    generations keeps churn over the retained horizon working, while a
    pruned horizon raises a purpose-built error naming the retention
    setting."""
    from snowflake_cdc_spark.sinks.parquet_sink import GenerationRetentionError
    from snowflake_cdc_spark.streaming.convergence import ConvergenceMonitor

    sink = ParquetSnapshotSink(str(tmp_path / "store"))
    ev = _events(spark)
    gens = []
    for hi in (3, 5, 8):
        _apply(sink, ev, "A", hi)
        _apply(sink, ev, "B", hi)
        gens.append(sink.publish_generation())
    assert gens == [0, 1, 2]

    # maintenance: retain the last two generations, then vacuum
    pruned = sink.prune_generations(keep_generations=2)
    assert pruned == [0]
    assert sink.retained_generations() == [1, 2]
    for t in ("A", "B"):
        sink.vacuum(t, keep_last=1)
    # both retained generations stay fully readable post-vacuum
    assert _max_seq(sink.read_generation(spark, "A", gen=1)) == 5
    assert _max_seq(sink.read_generation(spark, "B", gen=2)) == 8

    mon = ConvergenceMonitor(sink)
    churn = {
        (r["table_name"], r["metric"]): r["n"]
        for r in mon.churn_between_generations(
            spark, 1, 2, key_cols=["pk"], compare_cols=[]
        ).collect()
    }
    assert churn[("A", "rows_added")] == 3  # seqs 6,7,8
    assert churn[("B", "rows_added")] == 3

    # the pruned horizon fails loudly, naming the retention policy
    with pytest.raises(GenerationRetentionError, match="prune_generations"):
        sink.read_generation(spark, "A", gen=0)
    with pytest.raises(GenerationRetentionError, match="keep_generations"):
        mon.churn_between_generations(spark, 0, 2, key_cols=["pk"])
    # a generation that NEVER existed is a plain not-found, not retention
    with pytest.raises(FileNotFoundError, match="does not exist"):
        sink.manifest(99)


def test_generation_view_facade(spark, tmp_path):
    """VERDICT r09 #7 done-criterion: the consistent-cut read is one
    user-facing call; a view taken mid-publish stays all-old."""
    from snowflake_cdc_spark.engine import Engine

    sink = ParquetSnapshotSink(str(tmp_path / "store"))
    ev = _events(spark)
    _apply(sink, ev, "A", 5)
    _apply(sink, ev, "B", 5)
    sink.publish_generation()

    eng = Engine(spark)
    view = eng.at_generation(sink)
    _apply(sink, ev, "A", 8)  # mid-publish: A advanced, B not yet
    # the frozen view stays all-old even though _CURRENT moved
    assert _max_seq(view.table("A")) == 5
    assert _max_seq(view.table("b")) == 5  # case-normalized lookup
    assert view.tables() == ["A", "B"]
    _apply(sink, ev, "B", 8)
    sink.publish_generation()
    assert _max_seq(view.table("A")) == 5  # still pinned to its gen
    new = eng.at_generation(sink)
    assert _max_seq(new.table("A")) == 8

    # SQL surface: the cut is queryable through Engine.sql
    eng.register_generation(sink, gen=view.generation, prefix="g0_")
    assert (
        spark.sql("SELECT max(seq) AS m FROM g0_A").first()["m"] == 5
    )
    with pytest.raises(KeyError):
        view.table("NOPE")


def test_generation_view_raises_retention_error_after_prune(spark, tmp_path):
    """The documented error contract (round-10 review finding): a view
    whose generation is pruned raises GenerationRetentionError on every
    read — never a bare version-not-found, never a silent success."""
    from snowflake_cdc_spark.engine import Engine
    from snowflake_cdc_spark.sinks.parquet_sink import GenerationRetentionError

    sink = ParquetSnapshotSink(str(tmp_path / "store"))
    ev = _events(spark)
    _apply(sink, ev, "A", 5)
    sink.publish_generation()
    view = Engine(spark).at_generation(sink)
    _apply(sink, ev, "A", 8)
    sink.publish_generation()
    sink.prune_generations(keep_generations=1)  # drops the view's gen
    with pytest.raises(GenerationRetentionError, match="pruned"):
        view.table("A")
    sink.vacuum("A", keep_last=1)
    with pytest.raises(GenerationRetentionError):
        view.table("A")
    # a live view still reads fine after maintenance
    assert _max_seq(Engine(spark).at_generation(sink).table("A")) == 8
