"""E4 extra key column + approx_count_distinct accuracy bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.plans.spec import PipelineSpec
from snowflake_cdc_spark.queries import REGISTRY, _load_extended
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.sources.cdc import cdc_events_nested
from snowflake_cdc_spark.sources.io import read_table
from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
from tests.conftest import SF_SMOKE

_load_extended()


def test_e4_extra_key_column(spark, tmp_path):
    """The configured constant column lands on every row and joins the
    upsert key (EXTRA_PK_COLUMN, add_output.py:9-18)."""
    events = cdc_events_nested(spark, SF_SMOKE)
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    spec = PipelineSpec(
        "tpch.orders",
        use_synthetic_key=True,
        extra_key_column=("ksname", "tenant_a"),
    )
    pipe = CdcPipeline(spark, [spec], sink)
    assert pipe._key_cols(spec) == ["primary_key", "ksname"]
    pipe.materialize_batch(events)
    snap = sink.read(spark, "ORDERS")
    assert "ksname" in snap.columns
    assert snap.filter(F.col("ksname") != "tenant_a").count() == 0
    assert snap.count() == 1285  # same snapshot semantics as without E4


def test_approx_distinct_within_rsd(spark):
    """q49's round-3 bounded-error form computes the HLL-vs-exact check
    IN the plan: every group must report within_bound=True, and the
    exact_parts column must equal an independent count_distinct."""
    rows = REGISTRY["q49_approx_distinct"].spark_fn(spark, SF_SMOKE).collect()
    assert rows and all(r.within_bound for r in rows)
    exact = {
        r.l_returnflag: r.n
        for r in read_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    assert {r.l_returnflag: r.exact_parts for r in rows} == exact


class TestDeterministicHll:
    def test_estimate_accuracy_and_layout_invariance(self, spark):
        from snowflake_cdc_spark.operators.sketches import hll_estimate, hll_sketch

        df = spark.range(0, 10_000).select(F.col("id").alias("k"))
        est = hll_estimate(hll_sketch(df, "k")).first()["hll_estimate"]
        assert abs(est - 10_000) / 10_000 < 0.15  # m=256 -> ~6.5% typical
        est2 = hll_estimate(hll_sketch(df.repartition(17), "k")).first()[
            "hll_estimate"
        ]
        assert est == est2  # bit-identical under re-partitioning

    def test_union_merge_law(self, spark):
        from snowflake_cdc_spark.operators.sketches import hll_estimate, hll_sketch

        a = spark.range(0, 3000).select(F.col("id").alias("k"))
        b = spark.range(2000, 6000).select(F.col("id").alias("k"))
        merged = (
            hll_sketch(a, "k")
            .unionByName(hll_sketch(b, "k"))
            .groupBy("bucket")
            .agg(F.max("reg").alias("reg"))
        )
        direct = hll_sketch(a.unionByName(b), "k")
        assert hll_estimate(merged).first() == hll_estimate(direct).first()

    def test_small_range_linear_counting_branch(self, spark):
        from snowflake_cdc_spark.operators.sketches import hll_estimate, hll_sketch

        df = spark.range(0, 12).select(F.col("id").alias("k"))
        est = hll_estimate(hll_sketch(df, "k")).first()["hll_estimate"]
        assert abs(est - 12) < 2  # linear counting is near-exact here


class TestKmvIntersection:
    def _sk(self, spark, keys, k=16):
        from snowflake_cdc_spark.operators.sketches import kmv_sketch

        df = spark.createDataFrame([(x,) for x in keys], "k long").withColumn(
            "g", F.lit(1)
        )
        return kmv_sketch(df, "k", "g", k=k)

    def test_exact_below_k_and_estimate_above(self, spark):
        from snowflake_cdc_spark.operators.sketches import kmv_intersection_estimate

        # small sets: sketches lossless -> exact intersection
        a = self._sk(spark, range(0, 10))
        b = self._sk(spark, range(5, 15))
        est = kmv_intersection_estimate(a, b, k=16).first()["kmv_inter_est"]
        assert est == 5.0
        # large overlapping sets: estimate within a loose band
        a2 = self._sk(spark, range(0, 3000), k=64)
        b2 = self._sk(spark, range(1000, 4000), k=64)
        from snowflake_cdc_spark.operators.sketches import (
            kmv_intersection_estimate as kie,
        )

        e2 = kie(a2, b2, k=64).first()["kmv_inter_est"]
        assert 800 <= e2 <= 3600, e2  # true 2000, k=64 theta variance

    def test_disjoint_sets_estimate_zero_or_tiny(self, spark):
        from snowflake_cdc_spark.operators.sketches import kmv_intersection_estimate

        a = self._sk(spark, range(0, 500), k=32)
        b = self._sk(spark, range(10_000, 10_500), k=32)
        e = kmv_intersection_estimate(a, b, k=32).first()["kmv_inter_est"]
        assert e == 0.0
