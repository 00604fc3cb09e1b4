"""Sort-free global rank (operators/rank.py): exact equality with the
naive single-sort rank where tie orders coincide, tie-block invariance
where they do not, and bucket-boundary stress (all-equal values, Zipf
counts, singletons)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.rank import (
    rangebucket_rank,
    skewed_count_rank,
)


class TestRangebucketRank:
    def test_equals_naive_sort_rank(self, spark):
        rng = random.Random(7)
        rows = [(rng.randint(0, 500), i) for i in range(400)]
        df = spark.createDataFrame(rows, "v long, id long")
        got = {
            (r.v, r.id): r.rn
            for r in rangebucket_rank(df, "v", "id").collect()
        }
        want = {
            (v, i): rk + 1
            for rk, (v, i) in enumerate(sorted(rows))
        }
        assert got == want

    def test_all_equal_values_tie_bucket_fallback(self, spark):
        # span == 0: buckets come from the TIE column (ADVICE r06 — a
        # value-derived bucket would single-partition the whole relation)
        df = spark.createDataFrame([(5, i) for i in range(20)], "v long, id long")
        got = {r.id: r.rn for r in rangebucket_rank(df, "v", "id").collect()}
        assert got == {i: i + 1 for i in range(20)}

    def test_all_equal_values_string_tie(self, spark):
        ids = [f"k{i:03d}" for i in range(30)] + ["", "zz"]
        df = spark.createDataFrame(
            [(7, t) for t in ids], "v long, id string"
        )
        got = {r.id: r.rn for r in rangebucket_rank(df, "v", "id").collect()}
        want = {t: rk + 1 for rk, t in enumerate(sorted(ids))}
        assert got == want

    def test_all_equal_values_null_ties_first(self, spark):
        df = spark.createDataFrame(
            [(5, None), (5, 10), (5, 2), (5, None)], "v long, id long"
        )
        out = sorted(
            rangebucket_rank(df, "v", "id").collect(), key=lambda r: r.rn
        )
        # NULL ties sort first (Spark ASC default), then 2, then 10
        assert [r.id for r in out] == [None, None, 2, 10]
        assert [r.rn for r in out] == [1, 2, 3, 4]

    def test_all_equal_values_and_ties(self, spark):
        # every sort key identical: any assignment valid, ranks 1..N
        df = spark.createDataFrame([(5, 1)] * 8, "v long, id long")
        out = rangebucket_rank(df, "v", "id").collect()
        assert sorted(r.rn for r in out) == list(range(1, 9))

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 1), (None, 2), (3, 3)], "v long, id long"
        )
        got = sorted(
            (r.v, r.rn) for r in rangebucket_rank(df, "v", "id").collect()
        )
        assert got == [(1, 1), (3, 2)]

    def test_keeps_extra_columns(self, spark):
        df = spark.createDataFrame(
            [(10, 1, "a"), (20, 2, "b")], "v long, id long, tag string"
        )
        rows = {r.tag: r.rn for r in rangebucket_rank(df, "v", "id").collect()}
        assert rows == {"a": 1, "b": 2}


def _naive_count_ranks(rows, ascending):
    """(count, tie) -> rank under (count asc/desc, md5-free tie order).
    Only the rank SET per count block is checkable (tie-block contract),
    so return {count: sorted rank list}."""
    key = (lambda cv: cv[0]) if ascending else (lambda cv: -cv[0])
    ordered = sorted(rows, key=lambda cv: (key(cv), cv[1]))
    blocks: dict[int, list[int]] = {}
    for rk, (c, _) in enumerate(ordered, start=1):
        blocks.setdefault(c, []).append(rk)
    return blocks


class TestSkewedCountRank:
    def _check(self, spark, rows, ascending):
        df = spark.createDataFrame(rows, "c long, w string")
        out = skewed_count_rank(df, "c", "w", ascending=ascending).collect()
        got_blocks: dict[int, list[int]] = {}
        for r in out:
            got_blocks.setdefault(r.c, []).append(r.rn)
        want_blocks = _naive_count_ranks(rows, ascending)
        assert {c: sorted(v) for c, v in got_blocks.items()} == want_blocks
        # and every rank appears exactly once
        assert sorted(r.rn for r in out) == list(range(1, len(rows) + 1))

    def test_zipf_ascending_rank_sets(self, spark):
        rng = random.Random(11)
        # Zipfy: many 1s, a long-count head crossing the exact_max=64
        # regime boundary in both directions
        rows = [(1, f"w{i}") for i in range(120)]
        rows += [(rng.randint(2, 64), f"m{i}") for i in range(60)]
        rows += [(c, f"h{c}") for c in (65, 100, 4096, 10**9)]
        self._check(spark, rows, ascending=True)

    def test_zipf_descending_rank_sets(self, spark):
        rows = [(1, f"w{i}") for i in range(80)]
        rows += [(64, f"b{i}") for i in range(10)]  # boundary count
        rows += [(65, "edge"), (2**40, "giant")]
        self._check(spark, rows, ascending=False)

    def test_tie_block_invariance_gini(self, spark):
        # Σ rn·c must equal the naive (c, w)-ordered window's Σ rn·c
        # even though per-row ranks inside tie blocks differ (md5 order)
        rows = [(1, f"a{i}") for i in range(50)] + [(3, "x"), (3, "y"), (7, "z")]
        df = spark.createDataFrame(rows, "c long, w string")
        got = (
            skewed_count_rank(df, "c", "w", ascending=True)
            .agg(F.sum(F.col("rn") * F.col("c")).alias("s"))
            .collect()[0]
            .s
        )
        ordered = sorted(rows)
        want = sum((rk + 1) * c for rk, (c, _) in enumerate(ordered))
        assert got == want


class TestGroupedHashRank:
    """grouped_hash_rank (VERDICT r10 #2): must equal
    row_number() OVER (PARTITION BY group ORDER BY hash, tie) exactly —
    the stratified-split rank contract — with the sorted regions being
    (group, hex-prefix-bucket) slices, never a whole group."""

    def _window_rank(self, rows):
        """naive per-group (h, tie) rank."""
        out = {}
        by_g: dict[str, list] = {}
        for g, h, t in rows:
            by_g.setdefault(g, []).append((h, t))
        for g, items in by_g.items():
            for rk, (h, t) in enumerate(sorted(items), start=1):
                out[(g, t)] = rk
        return out

    def test_equals_window_rank(self, spark):
        import hashlib

        rng = random.Random(3)
        rows = []
        for i in range(500):
            g = f"s{rng.randint(0, 3)}"
            h = hashlib.md5(str(i).encode()).hexdigest()
            rows.append((g, h, i))
        df = spark.createDataFrame(rows, "source string, h string, doc_id long")
        from snowflake_cdc_spark.operators.rank import grouped_hash_rank

        got = {
            (r.source, r.doc_id): r.rk
            for r in grouped_hash_rank(
                df, ["source"], "h", "doc_id", rank_col="rk"
            ).collect()
        }
        assert got == self._window_rank(rows)

    def test_two_sources_skew_shape(self, spark):
        """The 100-TB regime: TWO sources — the rank must not put a
        whole source in one sorted region. Checked structurally: the
        plan's row_number window partitions by (source, __hb), and the
        output still equals the window rank."""
        import hashlib

        rows = [
            (f"s{i % 2}", hashlib.md5(str(i).encode()).hexdigest(), i)
            for i in range(2000)
        ]
        df = spark.createDataFrame(rows, "source string, h string, doc_id long")
        from snowflake_cdc_spark.operators.rank import grouped_hash_rank

        out = grouped_hash_rank(df, ["source"], "h", "doc_id", rank_col="rk")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the data-sized window is keyed by (source, bucket), not source
        assert "__hb" in plan
        got = {(r.source, r.doc_id): r.rk for r in out.collect()}
        assert got == self._window_rank(rows)

    def test_stratified_split_matches_window_form(self, spark):
        """operators/splits.py end-to-end vs the literal window SQL."""
        import hashlib

        rows = [
            (i, f"s{i % 3}", hashlib.md5(str(i).encode()).hexdigest())
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, h string")
        from snowflake_cdc_spark.operators.splits import stratified_split

        got = {
            r.doc_id: r.split for r in stratified_split(df).collect()
        }
        df.createOrReplaceTempView("__ghr_docs")
        want = {
            r.doc_id: r.split
            for r in spark.sql(
                """
                SELECT doc_id,
                       CASE WHEN rk <= (8 * n) DIV 10 THEN 'train'
                            WHEN rk <= (9 * n) DIV 10 THEN 'val'
                            ELSE 'test' END AS split
                FROM (SELECT doc_id,
                             row_number() OVER (PARTITION BY source
                                                ORDER BY h, doc_id) AS rk,
                             count(*) OVER (PARTITION BY source) AS n
                      FROM __ghr_docs)
                """
            ).collect()
        }
        assert got == want
