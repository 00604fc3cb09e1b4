"""Skew helpers agree with their single-phase equivalents, including on a
deliberately hot-keyed input."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.skew import (
    count_distinct_two_phase,
    salted_latest_by_key,
)
from snowflake_cdc_spark.operators.upsert import latest_by_key


def test_salted_latest_matches_plain(spark):
    # hot key: 10k changes on key 0, a few on others
    df = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(0)).otherwise(F.col("id") % 7).alias("key"),
        F.col("id").alias("seq"),
        (F.col("id") * 3 % 101).alias("value"),
    )
    a = {(r.key, r.seq, r.value) for r in latest_by_key(df, ["key"]).collect()}
    b = {(r.key, r.seq, r.value) for r in salted_latest_by_key(df, ["key"]).collect()}
    assert a == b


def test_two_phase_count_distinct_matches(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 123).alias("v")
    )
    want = {
        (r.g, r.n)
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("n")).collect()
    }
    got = {(r.g, r.n) for r in count_distinct_two_phase(df, ["g"], "v").collect()}
    assert got == want


def test_window_variant_has_partial_group_limit(spark):
    """Spark >= 3.5 plans WindowGroupLimit Partial below the Exchange for
    row_number()==1 — the map-side top-1 that makes the window variant of
    latest_by_key skew-resistant WITHOUT salting (docs/PLANS.md round-8
    probe: salting loses at every skew level because of this rule). If a
    plan change ever drops the partial limit, the skew decision must be
    revisited — this assertion is the tripwire."""
    from pyspark.sql import functions as F

    from snowflake_cdc_spark.operators.upsert import latest_by_key

    df = spark.range(1000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("seq")
    )
    plan = (
        latest_by_key(df, ["k"], "seq", use_window=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    partial = [
        ln
        for ln in plan.splitlines()
        if "WindowGroupLimit" in ln and "Partial" in ln
    ]
    assert partial, f"no partial WindowGroupLimit in plan:\n{plan}"
