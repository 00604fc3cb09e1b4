"""Exact set-similarity join (operators/setsim.py): completeness vs
brute force (prefix filtering must lose NOTHING), threshold boundary
exactness, and shingle construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.setsim import prefix_filter_join, shingle_sets
from snowflake_cdc_spark.sources.io import read_table
from tests.conftest import SF_ORACLE


def _brute_force(toks, tn, td):
    a = toks.select(F.col("doc_id").alias("da"), "tok")
    b = toks.select(F.col("doc_id").alias("db"), "tok")
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        a.join(b, "tok")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sa")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("sb")), "db")
        .filter(td * F.col("ni") >= tn * (F.col("sa") + F.col("sb") - F.col("ni")))
        .select("da", "db")
    )


def test_matches_brute_force_exactly(spark):
    docs = read_table(spark, SF_ORACLE, "documents")
    toks = shingle_sets(docs, n=3).persist()
    try:
        got = {(r.doc_a, r.doc_b) for r in prefix_filter_join(toks, 6, 10).collect()}
        want = {(r.da, r.db) for r in _brute_force(toks, 6, 10).collect()}
        assert got == want and len(want) > 0
    finally:
        toks.unpersist()


def test_threshold_boundary_is_exact(spark):
    # planted sets: |A∩B|=3, |A∪B|=5 -> J=0.6 EXACTLY: must match at
    # t=0.6 (>=) and must not at t=0.61 — the integer verify has no
    # float boundary
    rows = [(1, t) for t in "abc"] + [(1, "x"), (2, "y")] + [(2, t) for t in "abc"]
    toks = spark.createDataFrame(rows, "doc_id long, tok string")
    at = prefix_filter_join(toks, 6, 10).collect()
    assert [(r.doc_a, r.doc_b, r.n_inter, r.n_union) for r in at] == [(1, 2, 3, 5)]
    above = prefix_filter_join(toks, 61, 100).collect()
    assert above == []


def test_shingles_are_distinct_word_trigrams(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d a b c d")], "doc_id long, text string"
    )
    toks = {r.tok for r in shingle_sets(docs, n=3).collect()}
    assert toks == {"a b c", "b c d", "c d a", "d a b"}


def test_prefix_form_equals_direct_form(spark):
    from snowflake_cdc_spark.operators.setsim import allpairs_jaccard_join

    docs = read_table(spark, SF_ORACLE, "documents")
    toks = shingle_sets(docs, n=3).persist()
    try:
        a = sorted(map(tuple, prefix_filter_join(toks, 6, 10).collect()))
        b = sorted(map(tuple, allpairs_jaccard_join(toks, 6, 10).collect()))
        assert a == b and len(a) > 0
    finally:
        toks.unpersist()


def test_planted_boilerplate_bounds_prefix_postings(spark):
    """The scale claim, adversarially (triangles-hub pattern): a shingle
    shared by EVERY document makes the direct token join quadratic
    (C(n,2) wedges from one posting list); the rarest-first prefix
    excludes it from every prefix, so prefix candidates stay linear-ish
    — while the final answer is identical."""
    from snowflake_cdc_spark.operators.setsim import (
        allpairs_jaccard_join,
        prefix_candidates,
    )

    n = 300
    rows = []
    for d in range(n):
        rows.append((d, "BOILER"))  # universal boilerplate shingle
        for j in range(6):  # unique content
            rows.append((d, f"u{d}_{j}"))
    # one planted near-dup pair sharing 6 of 8 distinct shingles
    rows += [(n, "BOILER")] + [(n, f"u0_{j}") for j in range(5)] + [(n, "z")]
    toks = spark.createDataFrame(rows, "doc_id long, tok string").persist()
    try:
        direct_wedges = (n + 1) * n // 2  # from the BOILER posting alone
        n_cand = prefix_candidates(toks, 6, 10).count()
        assert n_cand < direct_wedges / 100  # >100x candidate reduction
        a = sorted(map(tuple, prefix_filter_join(toks, 6, 10).collect()))
        b = sorted(map(tuple, allpairs_jaccard_join(toks, 6, 10).collect()))
        assert a == b
        assert (0, n) in {(x[0], x[1]) for x in a}  # the planted pair found
    finally:
        toks.unpersist()


def test_hot_shingle_prefix_prunes_all_candidates(spark):
    """VERDICT r06 #4 skew posture: a boilerplate token shared by every
    doc (max doc-frequency) never enters any prefix, so it generates
    ZERO candidates — the raw postings self-join would emit C(n,2) rows
    from it. Truth set equality on a planted near-dup pair is preserved."""
    from pyspark.sql import functions as F

    from snowflake_cdc_spark.operators.setsim import (
        prefix_candidates,
        prefix_filter_join,
    )

    rows = []
    for d in range(50):
        rows.append((d, "hot"))
        for j in range(9):
            rows.append((d, f"u{d}_{j}"))
    # planted near-dup pair: docs 100/101 share 9 of 10 tokens (j=0.82)
    for j in range(9):
        rows.append((100, f"p{j}"))
        rows.append((101, f"p{j}"))
    rows.append((100, "x100"))
    rows.append((101, "x101"))
    toks = spark.createDataFrame(rows, "doc_id long, tok string")
    raw = (
        toks.select(F.col("doc_id").alias("a"), "tok")
        .join(toks.select(F.col("doc_id").alias("b"), "tok"), "tok")
        .filter("a < b")
        .count()
    )
    assert raw >= 50 * 49 // 2  # the hot shingle alone is quadratic
    cand = prefix_candidates(toks, 4, 5).collect()
    assert {(r.da, r.db) for r in cand} == {(100, 101)}
    got = prefix_filter_join(toks, 4, 5).collect()
    assert [(r.doc_a, r.doc_b, r.n_inter, r.n_union) for r in got] == [
        (100, 101, 9, 11)
    ]
