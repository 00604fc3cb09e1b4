"""Bloom-filter join pruning (operators/bloom.py): zero false
negatives, exact join preservation under forced false positives, and
determinism of the md5 position family."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.bloom import bloom_prefilter, build_bloom
from snowflake_cdc_spark.sources.io import read_table
from tests.conftest import SF_SMOKE


def test_no_false_negatives_and_join_preserved(spark):
    cust = read_table(spark, SF_SMOKE, "customer")
    orders = read_table(spark, SF_SMOKE, "orders")
    dim = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey").distinct()
    bloom = build_bloom(dim, "c_custkey")
    passed = bloom_prefilter(orders, "o_custkey", bloom)
    # every truly-matching row survives the prefilter...
    true_rows = orders.join(
        F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left_semi"
    )
    assert true_rows.join(
        passed.select("o_orderkey"), "o_orderkey", "left_anti"
    ).count() == 0
    # ...and the join AFTER pruning equals the join without it
    j_pruned = passed.join(F.broadcast(dim), passed.o_custkey == dim.c_custkey)
    j_full = orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
    assert sorted(r.o_orderkey for r in j_pruned.collect()) == sorted(
        r.o_orderkey for r in j_full.collect()
    )


def test_tiny_filter_forces_false_positives_but_never_wrong_joins(spark):
    # m=16 bits for hundreds of keys -> filter saturates; the prefilter
    # passes nearly everything (false positives), yet the join result is
    # still exact — Bloom errs only toward keeping
    cust = read_table(spark, SF_SMOKE, "customer")
    orders = read_table(spark, SF_SMOKE, "orders")
    dim = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey").distinct()
    bloom = build_bloom(dim, "c_custkey", k=2, m=16)
    passed = bloom_prefilter(orders, "o_custkey", bloom, k=2, m=16)
    n_true = orders.join(
        F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left_semi"
    ).count()
    assert passed.count() > n_true  # false positives exist
    j = passed.join(F.broadcast(dim), passed.o_custkey == dim.c_custkey)
    assert j.count() == orders.join(
        F.broadcast(dim), orders.o_custkey == dim.c_custkey
    ).count()


def test_positions_deterministic_and_bounded(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    b1 = sorted(r.pos for r in build_bloom(keys, "k", k=4, m=64).collect())
    b2 = sorted(r.pos for r in build_bloom(keys.repartition(7), "k", k=4, m=64).collect())
    assert b1 == b2  # layout-invariant
    assert len(b1) <= 64 and all(0 <= p < 64 for p in b1)
