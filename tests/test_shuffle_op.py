"""Deterministic global shuffle (operators/shuffle.py): exactness of the
bucket decomposition and the no-global-sort plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.shuffle import deterministic_shuffle, shuffle_key
from snowflake_cdc_spark.sources.io import read_table
from tests.conftest import SF_SMOKE


def test_rank_independent_of_bucket_count(spark):
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id")
    a = sorted(map(tuple, deterministic_shuffle(docs, "doc_id", 7, n_buckets=4).collect()))
    b = sorted(map(tuple, deterministic_shuffle(docs, "doc_id", 7, n_buckets=256).collect()))
    assert a == b
    # ranks are a dense 1..n permutation
    assert sorted(r for _, r in a) == list(range(1, len(a) + 1))
    # and a different seed produces a different permutation
    c = sorted(map(tuple, deterministic_shuffle(docs, "doc_id", 8, n_buckets=4).collect()))
    assert c != a


def test_rank_matches_naive_global_sort(spark):
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id")
    from pyspark.sql import Window

    naive = docs.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(shuffle_key("doc_id", 7), "doc_id"))
        .alias("shuffle_rank"),
    )
    got = deterministic_shuffle(docs, "doc_id", 7)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_no_global_sort_in_plan(spark):
    """The whole point: the plan must not contain a range-partitioning
    exchange (the physical footprint of a global ORDER BY) — only hash
    exchanges on the bucket key."""
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id")
    plan = (
        deterministic_shuffle(docs, "doc_id", 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower(), plan
