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

    def test_key_only_diff(self, spark):
        """ADVICE r06: two tables sharing ONLY key columns (or an
        explicit compare_cols=[]) still produce the add/remove/common
        report instead of crashing at plan-build time."""
        a = spark.createDataFrame([(1,), (2,), (3,)], "k long")
        b = spark.createDataFrame([(2,), (3,), (4,)], "k long")
        got = {r.metric: r.n for r in table_diff(a, b, ["k"]).collect()}
        assert got == {
            "rows_added": 1,
            "rows_removed": 1,
            "rows_common": 2,
            "rows_changed": 0,
        }
        a2 = spark.createDataFrame([(1, "x")], "k long, s string")
        got2 = {
            r.metric: r.n
            for r in table_diff(a2, a2, ["k"], compare_cols=[]).collect()
        }
        assert got2["rows_common"] == 1 and got2["rows_changed"] == 0

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


def test_attribution_last_only_channel_kept(spark, tmp_path):
    """ADVICE r06: a channel that is NEVER a first touch (every journey
    is [view..., click]) must still carry its last-touch and linear
    credit — the channel universe is a FULL outer join, not a LEFT join
    keyed on first-touch channels."""
    import datetime

    from snowflake_cdc_spark.queries_round6_ext import q204

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def s(mins):
        return t0 + datetime.timedelta(minutes=mins)

    rows = [
        # user 7: view -> click -> purchase($1.00): first=view, last=click
        (1, s(0), 7, "view", 0.0, None),
        (2, s(1), 7, "click", 0.0, None),
        (3, s(2), 7, "purchase", 1.0, None),
        # user 8: view -> view -> click -> purchase($2.00)
        (4, s(0), 8, "view", 0.0, None),
        (5, s(1), 8, "view", 0.0, None),
        (6, s(2), 8, "click", 0.0, None),
        (7, s(3), 8, "purchase", 2.0, None),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    # single parquet FILE (the sources/io.py read_table layout)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = {r.channel: r for r in q204(spark, str(tmp_path)).collect()}
    # 'click' is never a first touch but owns ALL the last-touch credit
    assert "click" in out
    click = out["click"]
    assert click.n_first == 0 and click.first_cents == 0
    assert click.n_last == 2 and click.last_cents == 300
    assert click.linear_cents_micro > 0
    # accounting closure holds across the full channel universe
    assert sum(r.first_cents for r in out.values()) == 300
    assert sum(r.last_cents for r in out.values()) == 300
    assert sum(r.linear_cents_micro for r in out.values()) == 300 * 1000000
