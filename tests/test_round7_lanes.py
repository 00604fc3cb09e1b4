"""Round-7 lane invariants (q210-q213) beyond the oracle hash gate:
exact split-count arithmetic, budget-selection feasibility/maximality,
repetition-score bounds, field-report parity with the A1/A2 operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.queries import _t
from snowflake_cdc_spark.queries_round7_ext import q210, q211, q212, q213

SF = "/root/testdata/sf0.001"


def test_split_counts_exact(spark):
    """Per source: train+val+test == n, and each split is AT the exact
    integer boundary — train == 8n DIV 10, train+val == 9n DIV 10."""
    out = q210(spark, SF).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, {})[r.split] = r.n_docs
    docs = _t(spark, SF, "documents")
    want_n = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(per) == set(want_n)
    for src, splits in per.items():
        n = want_n[src]
        assert sum(splits.values()) == n
        assert splits.get("train", 0) == (8 * n) // 10
        assert splits.get("train", 0) + splits.get("val", 0) == (9 * n) // 10


def test_budget_selection_matches_python_reference(spark):
    """Independent Python reference: rank (score DESC, md5(id), id),
    take the maximal prefix with cum <= budget — per-source aggregates
    must match, and the next-ranked doc must NOT fit."""
    import hashlib

    out = {r.source: r for r in q211(spark, SF).collect()}
    docs = _t(spark, SF, "documents")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit(UNICODE_WORD), 0)
    rows = docs.select(
        "doc_id",
        "source",
        F.size(ws).cast("bigint").alias("t"),
        F.size(F.array_distinct(ws)).cast("bigint").alias("s"),
    ).collect()
    pool = sorted(
        (r for r in rows if r.s >= 1),
        key=lambda r: (
            -r.s,
            hashlib.md5(str(r.doc_id).encode()).hexdigest(),
            r.doc_id,
        ),
    )
    cum, sel = 0, []
    cut_next = None
    for r in pool:
        if cum + r.t <= 20_000:
            cum += r.t
            sel.append(r)
        else:
            cut_next = r
            break
    want = {}
    for r in sel:
        n, t, s = want.get(r.source, (0, 0, None))
        want[r.source] = (n + 1, t + r.t, r.s if s is None else min(s, r.s))
    assert {
        src: (v.n_selected, v.tokens_selected, v.min_score)
        for src, v in out.items()
    } == want
    if cut_next is not None:
        assert cum + cut_next.t > 20_000  # maximal prefix


def test_repetition_score_bounds(spark):
    out = q212(spark, SF).collect()
    for r in out:
        assert r.n_grams > r.n_distinct >= 1
        assert r.n_repeats == r.n_grams - r.n_distinct
        assert 0 < r.rep_ppm < 1_000_000


def test_field_report_matches_a1_a2(spark):
    """q213's stacked report == the A1 value_distribution counts and
    the A2 first/last-seen for the event_type field."""
    out = {
        (r.field, r.val): r for r in q213(spark, SF).collect()
    }
    ev = _t(spark, SF, "events")
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for et, n in want.items():
        assert out[("event_type", et)].cnt == n
    # A2 parity on one value
    et0 = sorted(want)[0]
    fl = (
        ev.filter(F.col("event_type") == et0)
        .agg(
            F.date_trunc("second", F.min("ts").cast("timestamp")).alias("lo"),
            F.date_trunc("second", F.max("ts").cast("timestamp")).alias("hi"),
        )
        .collect()[0]
    )
    assert out[("event_type", et0)].first_seen == fl.lo
    assert out[("event_type", et0)].last_seen == fl.hi


def test_contamination_bounds_and_coverage(spark):
    from snowflake_cdc_spark.queries_round7_ext import q214

    out = q214(spark, SF).collect()
    assert out, "no test-split docs"
    for r in out:
        assert 0 <= r.n_contam <= r.n_grams
        assert r.contam_ppm == r.n_contam * 1_000_000 // r.n_grams
    # coverage: exactly the test split's >=5-word docs are audited
    splits = {
        (row.source, row.split): row.n_docs
        for row in __import__(
            "snowflake_cdc_spark.queries_round7_ext", fromlist=["q210"]
        ).q210(spark, SF).collect()
    }
    n_test = sum(n for (src, sp), n in splits.items() if sp == "test")
    assert len(out) <= n_test
