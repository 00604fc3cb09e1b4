"""Cross-generation churn (VERDICT r08 #6): the ConvergenceMonitor's
generation-to-generation report, computed purely from retained sink
versions, equals the batch q231-style cut-churn (table_diff between two
consistent cuts of the change log) on a planted multi-batch drive where
each micro-batch applies one seq-horizon slice."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.diff import table_diff
from snowflake_cdc_spark.plans.spec import DeleteStrategy, PipelineSpec
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.sources.cdc import cdc_events_flat, cdc_events_nested
from snowflake_cdc_spark.streaming.convergence import ConvergenceMonitor
from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
from tests.conftest import SF_SMOKE


def test_generation_churn_matches_batch_cut_diff(spark, tmp_path):
    events = cdc_events_nested(spark, SF_SMOKE).persist()
    try:
        m = cdc_events_flat(spark, SF_SMOKE).agg(F.max("seq")).first()[0]
        s1, s2 = m // 2, m
        specs = [
            PipelineSpec(
                full_table_name=f"tpch.orders_part_{i}",
                use_synthetic_key=True,
                delete_strategy=DeleteStrategy.HARD,
                merge_shards=False,
            )
            for i in (0, 1)
        ]
        sink = ParquetSnapshotSink(str(tmp_path / "snap"))
        mon = ConvergenceMonitor(sink)
        pipe = CdcPipeline(spark, specs, sink, convergence=mon)

        # two micro-batches = two seq-horizon slices = two generations
        pipe.materialize_batch(events.filter(F.col("seq") <= s1), batch_id=0)
        g1 = sink.current_generation()
        pipe.materialize_batch(
            events.filter((F.col("seq") > s1) & (F.col("seq") <= s2)), batch_id=1
        )
        g2 = sink.current_generation()
        assert (g1, g2) == (0, 1)

        got = {
            (r["table_name"], r["metric"]): r["n"]
            for r in mon.churn_between_generations(
                spark, g1, g2, key_cols=["primary_key"]
            ).collect()
            if not r["metric"].startswith("col_changed")
        }

        # independent batch derivation: table_diff between the two
        # consistent cuts of the LOG (the q231 composition)
        want = {}
        for i in (0, 1):
            t = f"ORDERS_PART_{i}"
            old = pipe.snapshot_all_tables(events, s1)[t]
            new = pipe.snapshot_all_tables(events, s2)[t]
            for r in table_diff(old, new, ["primary_key"]).collect():
                if not r["metric"].startswith("col_changed"):
                    want[(t, r["metric"])] = r["n"]

        assert got == want
        assert any(n > 0 for (t, m_), n in got.items() if m_ == "rows_changed")
    finally:
        events.unpersist()
