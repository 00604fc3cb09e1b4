"""Bucketed co-located joins: the join and the aggregation on the bucket
key must plan without a shuffle Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.bucketing import (
    bucketed_join,
    shuffle_exchanges_in_plan,
    write_bucketed,
)
from snowflake_cdc_spark.sources.io import read_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    orders = read_table(spark, SF_SMOKE, "orders")
    lineitem = read_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        buckets=8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "o_orderkey")
    assert shuffle_exchanges_in_plan(joined) == 0, "bucketed join must not shuffle"
    # and it computes the same thing as the plain join
    orders = read_table(spark, SF_SMOKE, "orders")
    lineitem = read_table(spark, SF_SMOKE, "lineitem")
    want = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert joined.count() == want


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over raw parquet shuffles (broadcast
    disabled to force the comparison)."""
    orders = read_table(spark, SF_SMOKE, "orders").hint("merge")
    lineitem = read_table(spark, SF_SMOKE, "lineitem")
    joined = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    assert shuffle_exchanges_in_plan(joined) > 0


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    _, rt = bucketed_tables
    agg = spark.table(rt).groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert shuffle_exchanges_in_plan(agg) == 0, "group-by on bucket key must not shuffle"


def test_contamination_bench_side_is_broadcast(spark):
    """q108 decontamination (round-3 plan assertion): the benchmark
    shingle set must reach the overlap join as a broadcast build, so the
    (skewed — boilerplate shingles) train stream is never shuffled on the
    shingle key; its only shuffle is the well-distributed doc_id groupBy."""
    import io
    from contextlib import redirect_stdout

    from snowflake_cdc_spark.queries import REGISTRY, _load_extended

    _load_extended()
    df = REGISTRY["q108_contamination"].spark_fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


class TestIvmBucketed:
    """VERDICT r03 #4: JoinViewMaintainer wired to bucketed state — the
    per-batch recompute + splice plan must contain ZERO shuffle
    Exchanges (fact bucketed by join_col, dim by dim_key, view by
    fact_key; change-driven key sets broadcast), and the maintained view
    must stay bit-identical to a from-scratch join."""

    def _changes(self, spark, rows, cols):
        return spark.createDataFrame(rows, cols)

    def test_zero_exchange_maintenance_and_parity(self, spark):
        from snowflake_cdc_spark.operators.ivm import BucketSpec, JoinViewMaintainer

        fcols = "fk int, jk int, val string, seq bigint, is_delete boolean"
        dcols = "dk int, attr string, seq bigint, is_delete boolean"
        m = JoinViewMaintainer(
            "fk", "jk", "dk", bucket_spec=BucketSpec(prefix="ivm_bt", buckets=8)
        )
        try:
            batches = [
                (  # seed
                    [(i, 10 * (1 + i % 3), f"v{i}", 1, False) for i in range(200)],
                    [(10, "x", 1, False), (20, "y", 1, False), (30, "z", 1, False)],
                ),
                (  # fact update + delete, dim update (fans out to many facts)
                    [(1, 20, "v1b", 2, False), (2, 20, "gone", 2, True)],
                    [(20, "y2", 2, False)],
                ),
                (  # dim delete cascades; new fact arrives
                    [(500, 10, "new", 3, False)],
                    [(30, None, 3, True)],
                ),
            ]
            for i, (frows, drows) in enumerate(batches):
                view = m.apply_batch(
                    self._changes(spark, frows, fcols),
                    self._changes(spark, drows, dcols),
                )
                assert m.last_exchange_count == 0, (
                    f"batch {i}: {m.last_exchange_count} shuffle Exchanges"
                )
                # parity: maintained view == from-scratch join of snapshots
                scratch = m.fact.join(
                    m.dim.withColumnRenamed("dk", "jk"), "jk"
                )
                assert sorted(
                    map(tuple, view.select(*scratch.columns).collect())
                ) == sorted(map(tuple, scratch.collect()))
            # spot semantics: deleted fact 2 and dim-30 facts are gone,
            # dim-20 facts carry the updated attr
            rows = {(r.fk, r.jk, r.attr) for r in m.view.collect()}
            assert (2, 20, "y2") not in rows and (1, 20, "y2") in rows
            assert not any(jk == 30 for _, jk, _ in rows)
            assert (500, 10, "x") in rows
        finally:
            m.drop_bucketed_tables()
