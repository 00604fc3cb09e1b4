"""q204 attribution accounting closure + table_diff unit semantics
(operators/diff.py): planted adds/removes/changes, NULL transitions,
multi-column keys, identical-snapshot zero report."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.diff import table_diff


class TestTableDiff:
    def test_planted_changes(self, spark):
        a = spark.createDataFrame(
            [(1, "x", 10), (2, "y", 20), (3, "z", 30)], "k long, s string, v long"
        )
        b = spark.createDataFrame(
            [(1, "x", 10), (2, "Y", 20), (4, "n", 0)], "k long, s string, v long"
        )
        got = {r.metric: r.n for r in table_diff(a, b, ["k"]).collect()}
        assert got == {
            "rows_added": 1,       # k=4
            "rows_removed": 1,     # k=3
            "rows_common": 2,
            "rows_changed": 1,     # k=2 (s changed)
            "col_changed:s": 1,
            "col_changed:v": 0,
        }

    def test_null_transitions_count(self, spark):
        a = spark.createDataFrame([(1, None), (2, "b")], "k long, s string")
        b = spark.createDataFrame([(1, "a"), (2, None)], "k long, s string")
        got = {r.metric: r.n for r in table_diff(a, b, ["k"]).collect()}
        assert got["col_changed:s"] == 2 and got["rows_changed"] == 2

    def test_identical_snapshots_zero(self, spark):
        a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
        got = {r.metric: r.n for r in table_diff(a, a, ["k"]).collect()}
        assert got == {
            "rows_added": 0,
            "rows_removed": 0,
            "rows_common": 2,
            "rows_changed": 0,
            "col_changed:s": 0,
        }

    def test_composite_key(self, spark):
        a = spark.createDataFrame(
            [(1, "a", 5), (1, "b", 6)], "k1 long, k2 string, v long"
        )
        b = spark.createDataFrame(
            [(1, "a", 5), (1, "b", 7)], "k1 long, k2 string, v long"
        )
        got = {
            r.metric: r.n for r in table_diff(a, b, ["k1", "k2"]).collect()
        }
        assert got["rows_common"] == 2 and got["col_changed:v"] == 1


def test_attribution_linear_closure(spark):
    """Every purchase's linear credits sum EXACTLY to cents*1e6 — the
    remainder-to-first-touch rule closes the accounting; and total
    first/last cents equal total purchase cents (q204 at sf0.001)."""
    from snowflake_cdc_spark.queries_round6_ext import q204
    from snowflake_cdc_spark.queries import _t

    sf = "/root/testdata/sf0.001"
    out = q204(spark, sf).collect()
    ev = _t(spark, sf, "events")
    total_cents = (
        ev.filter("event_type = 'purchase'")
        .agg(
            F.sum(
                F.floor(F.col("value").cast("double") * 100.0 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
        )
        .collect()[0][0]
    )
    assert sum(r.first_cents for r in out) == total_cents
    assert sum(r.last_cents for r in out) == total_cents
    assert sum(r.linear_cents_micro for r in out) == total_cents * 1000000
    assert sum(r.n_first for r in out) == sum(r.n_last for r in out)
