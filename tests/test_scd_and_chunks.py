"""Operator-level tests for the round-3 additions: SCD2 history
materialization (operators/scd.py) and chunk-level corpus dedup
(operators/chunk_dedup.py). Query-level hash checks run in
test_queries.py via the registry; here we pin the semantic invariants
and the physical-plan shape."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.bucketing import shuffle_exchanges_in_plan
from snowflake_cdc_spark.operators.chunk_dedup import chunk_dedup, explode_chunks
from snowflake_cdc_spark.operators.scd import scd2_from_changes


def _changes(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, ts=ts, seq=seq) for (k, v, ts, seq) in rows],
        "k int, v string, ts int, seq int",
    )


class TestSCD2:
    def test_consecutive_equal_values_collapse(self, spark):
        out = scd2_from_changes(
            _changes(
                spark,
                [(1, "a", 10, 0), (1, "a", 20, 1), (1, "b", 30, 2), (1, "b", 40, 3)],
            ),
            ["k"], "v", "ts", "seq",
        ).orderBy("valid_from").collect()
        assert [(r.v, r.valid_from, r.valid_to, r.is_current) for r in out] == [
            ("a", 10, 30, False),
            ("b", 30, None, True),
        ]

    def test_value_flapping_reopens_versions(self, spark):
        out = scd2_from_changes(
            _changes(spark, [(1, "a", 10, 0), (1, "b", 20, 1), (1, "a", 30, 2)]),
            ["k"], "v", "ts", "seq",
        ).orderBy("valid_from").collect()
        assert [(r.v, r.is_current) for r in out] == [
            ("a", False), ("b", False), ("a", True)
        ]

    def test_simultaneous_changes_break_ties_on_seq(self, spark):
        # same ts: seq decides the order, so version history is stable
        out = scd2_from_changes(
            _changes(spark, [(1, "x", 10, 2), (1, "y", 10, 1)]),
            ["k"], "v", "ts", "seq",
        ).orderBy("valid_from", "v").collect()
        # y (seq 1) precedes x (seq 2): y closed at ts 10, x current
        by_v = {r.v: r for r in out}
        assert by_v["y"].is_current is False and by_v["x"].is_current is True

    def test_null_attribute_forms_runs(self, spark):
        out = scd2_from_changes(
            _changes(spark, [(1, None, 10, 0), (1, None, 20, 1), (1, "a", 30, 2)]),
            ["k"], "v", "ts", "seq",
        ).orderBy("valid_from").collect()
        assert [(r.v, r.is_current) for r in out] == [(None, False), ("a", True)]

    def test_exactly_one_current_version_per_key(self, spark):
        rows = [
            (k, v, ts, i)
            for i, (k, v, ts) in enumerate(
                (k, "v%d" % ((k * ts) % 3), ts) for k in range(5) for ts in range(8)
            )
        ]
        out = scd2_from_changes(_changes(spark, rows), ["k"], "v", "ts", "seq")
        per_key = (
            out.groupBy("k")
            .agg(F.sum(F.col("is_current").cast("int")).alias("n_current"))
            .collect()
        )
        assert all(r.n_current == 1 for r in per_key)

    def test_single_exchange_in_plan(self, spark):
        # both window passes partition on the key: Catalyst must plan ONE
        # shuffle (the second window reuses the first's distribution)
        out = scd2_from_changes(
            _changes(spark, [(1, "a", 10, 0)]), ["k"], "v", "ts", "seq"
        )
        assert shuffle_exchanges_in_plan(out) == 1


class TestChunkDedup:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id int, text string")

    def test_exact_copy_loses_every_chunk(self, spark):
        docs = self._docs(
            spark, [(1, "a b c d e f"), (2, "a b c d e f")]
        )
        out = {r.doc_id: r for r in chunk_dedup(docs, "doc_id", "text", 3).collect()}
        assert out[1].n_kept == 2 and out[2].n_kept == 0

    def test_survivor_text_reassembles_in_order(self, spark):
        docs = self._docs(spark, [(1, "a b c d e f g")])
        out = chunk_dedup(docs, "doc_id", "text", 3).collect()[0]
        # unique doc: everything survives, md5 equals md5(original text)
        expected = (
            spark.range(1).select(F.md5(F.lit("a b c d e f g"))).collect()[0][0]
        )
        assert out.n_chunks == 3 and out.n_kept == 3 and out.kept_md5 == expected

    def test_shared_span_suppressed_at_second_occurrence(self, spark):
        # doc 2 shares its FIRST 3-word window with doc 1's first window
        docs = self._docs(spark, [(1, "a b c x y z"), (2, "a b c q r s")])
        out = {r.doc_id: r for r in chunk_dedup(docs, "doc_id", "text", 3).collect()}
        assert out[1].n_kept == 2
        assert out[2].n_kept == 1  # only "q r s" survives
        expected = spark.range(1).select(F.md5(F.lit("q r s"))).collect()[0][0]
        assert out[2].kept_md5 == expected

    def test_ragged_tail_is_its_own_chunk(self, spark):
        rows = explode_chunks(
            self._docs(spark, [(1, "a b c d")]), "doc_id", "text", 3
        ).orderBy("chunk_idx").collect()
        assert [(r.chunk_idx, r.chunk) for r in rows] == [(0, "a b c"), (1, "d")]

    def test_fully_deduplicated_doc_hashes_empty_string(self, spark):
        docs = self._docs(spark, [(1, "a b c"), (2, "a b c")])
        out = {r.doc_id: r for r in chunk_dedup(docs, "doc_id", "text", 3).collect()}
        expected = spark.range(1).select(F.md5(F.lit(""))).collect()[0][0]
        assert out[2].n_kept == 0 and out[2].kept_md5 == expected

    def test_chunk_explode_plans_no_shuffle(self, spark):
        docs = self._docs(spark, [(1, "a b c")])
        assert (
            shuffle_exchanges_in_plan(
                explode_chunks(docs, "doc_id", "text", 3)
            )
            == 0
        )


def test_scd2_keep_cols_carries_opening_row(spark):
    out = scd2_from_changes(
        _changes(spark, [(1, "a", 10, 7), (1, "a", 20, 8), (1, "b", 30, 9)]),
        ["k"], "v", "ts", "seq", keep_cols=["seq"],
    ).orderBy("valid_from").collect()
    # each history row carries the seq of its OPENING change
    assert [(r.v, r.seq) for r in out] == [("a", 7), ("b", 9)]


class TestLinkage:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, nm string")

    def test_planted_match_resolves_to_original(self, spark):
        from snowflake_cdc_spark.operators.linkage import link_records

        clean = self._df(
            spark, [(1, "small ring economy BrandA"), (2, "small bolt economy BrandA")]
        )
        dirty = self._df(spark, [(100, "small ring economy")])
        out = link_records(clean, dirty, "id", "nm").collect()
        assert [(r.dirty_id, r.clean_id, r.n_inter, r.n_union) for r in out] == [
            (100, 1, 3, 4)
        ]

    def test_tie_breaks_to_smallest_clean_id(self, spark):
        from snowflake_cdc_spark.operators.linkage import link_records

        clean = self._df(
            spark, [(7, "red widget standard X"), (3, "red widget standard Y")]
        )
        dirty = self._df(spark, [(100, "red widget standard")])
        out = link_records(clean, dirty, "id", "nm").collect()
        assert out[0].clean_id == 3  # equal jaccard 3/4 -> min clean id

    def test_below_threshold_unmatched(self, spark):
        from snowflake_cdc_spark.operators.linkage import link_records

        clean = self._df(spark, [(1, "alpha beta gamma delta")])
        dirty = self._df(spark, [(100, "alpha beta zzz www qqq rrr")])
        # shares bigram "alpha beta" so it IS a candidate; jaccard 2/8 < 1/2
        out = link_records(clean, dirty, "id", "nm").collect()
        assert out == []

    def test_no_shared_bigram_never_compared(self, spark):
        from snowflake_cdc_spark.operators.linkage import link_records, token_bigrams
        from pyspark.sql import functions as F

        # same token SET, different adjacency — blocking is bigram-level
        clean = self._df(spark, [(1, "a b c")])
        dirty = self._df(spark, [(100, "c a b")])  # bigrams: "c a","a b"
        out = link_records(clean, dirty, "id", "nm").collect()
        # shares "a b" -> candidate; jaccard 3/3 = 1 -> matches
        assert out[0].clean_id == 1
        # single-token name has NO bigrams -> never a candidate
        single = self._df(spark, [(200, "a")])
        assert link_records(clean, single, "id", "nm").collect() == []
        bg = spark.range(1).select(token_bigrams(F.lit("solo")).alias("b")).collect()
        assert bg[0].b == []
