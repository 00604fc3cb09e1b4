"""Consistent cross-table snapshot cut (VERDICT r07 #3):
operators/snapshot.py unit semantics + the CdcPipeline.snapshot_all_tables
composition over demuxed envelope tables."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.snapshot import (
    consistent_cut,
    torn_transactions,
)
from snowflake_cdc_spark.plans.spec import DeleteStrategy, PipelineSpec
from snowflake_cdc_spark.sources.cdc import cdc_events_nested
from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
from tests.conftest import SF_SMOKE

# (seq, table, key, value, is_delete): seqs 5 and 6 are MULTI-TABLE
# transactions (same seq in A and B)
LOG = [
    (1, "A", "k1", 10, False),
    (2, "B", "k2", 20, False),
    (3, "A", "k3", 30, False),
    (4, "B", "k2", 21, False),
    (5, "A", "k1", 100, False),
    (5, "B", "k2", 200, False),
    (6, "A", "k1", 999, False),
    (6, "B", "k2", 888, False),
    (7, "A", "k3", 0, True),
]
SCHEMA = "seq long, table_name string, primary_key string, v long, is_delete boolean"


def _log(spark):
    return spark.createDataFrame(LOG, SCHEMA)


def _state(df):
    return {
        (r["table_name"], r["primary_key"]): r["v"] for r in df.collect()
    }


def test_cut_applies_transaction_atomically(spark):
    ev = _log(spark)
    # horizon INSIDE txn 5: both sides of the same-seq pair visible
    at5 = _state(consistent_cut(ev, 5))
    assert at5 == {("A", "k1"): 100, ("B", "k2"): 200, ("A", "k3"): 30}
    # horizon before it: neither side
    at4 = _state(consistent_cut(ev, 4))
    assert at4 == {("A", "k1"): 10, ("B", "k2"): 21, ("A", "k3"): 30}
    # delete applied at the final horizon
    at7 = _state(consistent_cut(ev, 7))
    assert at7 == {("A", "k1"): 999, ("B", "k2"): 888}


def test_torn_counts(spark):
    ev = _log(spark)
    # any global horizon: zero torn
    for s in (4, 5, 6, 7):
        n = torn_transactions(ev, F.col("seq") <= s).collect()[0]["n_torn"]
        assert n == 0, f"global cut at {s} must not tear"
    # lagging per-table watermark: A at 6, B at 5 → txn 6 is torn
    lag = F.col("seq") <= F.when(
        F.col("table_name") == "A", 6
    ).otherwise(5)
    assert torn_transactions(ev, lag).collect()[0]["n_torn"] == 1
    # both multi-table txns torn when B lags to 4
    lag2 = F.col("seq") <= F.when(
        F.col("table_name") == "A", 6
    ).otherwise(4)
    assert torn_transactions(ev, lag2).collect()[0]["n_torn"] == 2


def test_pipeline_snapshot_all_tables_matches_per_table_replay(spark):
    """snapshot_all_tables over the demuxed two-table envelope fixture
    equals the independent per-table row_number replay at the same
    horizon — and uses ONE horizon for both tables."""
    from snowflake_cdc_spark.sources.cdc import ORDER_COLS, cdc_events_flat

    events = cdc_events_nested(spark, SF_SMOKE)
    flat = cdc_events_flat(spark, SF_SMOKE)
    m = flat.agg(F.max("seq")).collect()[0][0]
    horizon = (m * 2) // 3  # inside the update band: real mixed state
    specs = [
        PipelineSpec(
            full_table_name=f"tpch.orders_part_{i}",
            use_synthetic_key=True,
            delete_strategy=DeleteStrategy.HARD,
            merge_shards=False,
        )
        for i in (0, 1)
    ]
    pipe = CdcPipeline(spark, specs, sink=None)
    snaps = pipe.snapshot_all_tables(events, horizon)
    assert set(snaps) == {"ORDERS_PART_0", "ORDERS_PART_1"}

    w = Window.partitionBy("primary_key").orderBy(F.col("seq").desc())
    for i in (0, 1):
        want = (
            flat.filter(
                (F.col("table_name") == f"orders_part_{i}")
                & (F.col("seq") <= horizon)
            )
            .withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & ~F.col("is_delete"))
            .select(
                "primary_key",
                "seq",
                F.col("row_o_totalprice").alias("o_totalprice"),
            )
        )
        got = snaps[f"ORDERS_PART_{i}"].select(
            "primary_key", "seq", "o_totalprice"
        )
        g = sorted(map(tuple, got.collect()))
        e = sorted(map(tuple, want.collect()))
        assert g == e and len(g) > 0


def test_scd2_seq_axis_composition(spark):
    """The history-based read equals the log-replay read: SCD2 built on
    the seq axis (scd2_from_changes(ts_col='seq')), read AS OF the same
    global horizon, reproduces consistent_cut exactly — the composition
    the pipeline uses for history-keeping tables (hard deletes excluded:
    SCD2 models value churn, not row removal)."""
    from snowflake_cdc_spark.operators.scd import scd2_as_of, scd2_from_changes

    ev = _log(spark).filter(~F.col("is_delete"))
    hist = scd2_from_changes(
        ev,
        key_cols=["table_name", "primary_key"],
        attr_col="v",
        ts_col="seq",
        tiebreak_col="seq",
    )
    for s in (1, 2, 4, 5, 6):
        via_history = {
            (r["table_name"], r["primary_key"]): r["v"]
            for r in scd2_as_of(hist, s).collect()
        }
        via_cut = _state(consistent_cut(ev, s))
        assert via_history == via_cut, f"horizon {s}"
