"""Sequence packing (operators/packing.py): invariants on a synthetic
corpus + determinism across partition layouts."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.packing import pack_sequences, packing_stats

CAP = 10


def _docs(spark, n=40):
    # token counts 1..13 cycling: plenty of bin-boundary crossings at CAP=10
    rows = [(i, (i % 13) + 1) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_toks long")


def test_pack_invariants(spark):
    out = pack_sequences(_docs(spark), "doc_id", "n_toks", CAP, n_buckets=4).collect()
    assert len(out) == 40
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            # first/last bin and offset derive exactly from the prefix sum
            assert r.first_bin == cum // CAP
            assert r.offset_in_bin == cum % CAP
            cum += r.n_tokens
            assert r.last_bin == (cum - 1) // CAP
            assert r.straddles == (r.first_bin != r.last_bin)


def test_stats_consistency(spark):
    docs = _docs(spark)
    stats = {r.bucket: r for r in
             packing_stats(docs, "doc_id", "n_toks", CAP, n_buckets=4).collect()}
    packed = pack_sequences(docs, "doc_id", "n_toks", CAP, n_buckets=4).collect()
    for b, s in stats.items():
        rows = [r for r in packed if r.bucket == b]
        total = sum(r.n_tokens for r in rows)
        assert s.n_docs == len(rows)
        assert s.total_tokens == total
        assert s.n_bins == -(-total // CAP)  # ceil
        assert s.n_split_docs == sum(1 for r in rows if r.straddles)
        assert s.pad_tokens == s.n_bins * CAP - total
        # every produced bin index is < n_bins
        assert max(r.last_bin for r in rows) == s.n_bins - 1


def test_layout_invariance(spark):
    """Same assignment regardless of how the input is partitioned."""
    docs = _docs(spark)
    a = sorted(map(tuple, pack_sequences(docs, "doc_id", "n_toks", CAP).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(
                docs.repartition(7, F.col("n_toks")), "doc_id", "n_toks", CAP
            ).collect(),
        )
    )
    assert a == b


def test_pack_invariants_fuzzed(spark):
    """Property check across arbitrary corpora/capacities: for every
    bucket, bins tile the token stream exactly — each doc's span starts
    where the previous ended, window indices derive from the prefix sum,
    and stats reconcile. Driven by hypothesis over (token counts,
    capacity, bucket count)."""
    from hypothesis import given
    from hypothesis import strategies as st

    from conftest import prop_settings

    @prop_settings(12)
    @given(
        # min_value=0: zero-token documents are legal input (round-3 fix —
        # an empty doc at an exact capacity boundary used to report a
        # spurious straddle via last_bin = first_bin - 1)
        toks=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
        cap=st.integers(min_value=1, max_value=64),
        nb=st.integers(min_value=1, max_value=8),
    )
    def check(toks, cap, nb):
        docs = spark.createDataFrame(
            list(enumerate(toks)), "doc_id long, n_toks long"
        )
        packed = pack_sequences(docs, "doc_id", "n_toks", cap, n_buckets=nb).collect()
        assert len(packed) == len(toks)
        by_bucket: dict[int, list] = {}
        for r in packed:
            by_bucket.setdefault(r.bucket, []).append(r)
        for rows in by_bucket.values():
            rows.sort(key=lambda r: r.doc_id)
            cum = 0
            for r in rows:
                assert r.first_bin == cum // cap
                assert r.offset_in_bin == cum % cap
                cum += r.n_tokens
                # an empty doc occupies (degenerately) its start window
                assert r.last_bin == max(r.first_bin, (cum - 1) // cap)
                assert r.straddles == (r.first_bin != r.last_bin)
                if r.n_tokens == 0:
                    assert not r.straddles and r.last_bin == r.first_bin

    check()


class TestBpePacking:
    """q209 (VERDICT r06 #6): packing invariants at BPE granularity —
    budgets in real trained-tokenizer tokens."""

    def test_bpe_packing_invariants(self, spark):
        from snowflake_cdc_spark.queries_round7_ext import q209

        out = q209(spark, "/root/testdata/sf0.001").collect()
        assert out, "no shards produced"
        cap = 2048
        for r in out:
            # window count is exactly ceil(total/capacity)
            assert r.n_bins == -(-r.total_tokens // cap)
            # padding closes the last window exactly
            assert r.pad_tokens == r.n_bins * cap - r.total_tokens
            assert 0 <= r.pad_tokens < cap or r.total_tokens == 0
            # a doc can straddle at most (its windows - 1); loose sanity:
            assert 0 <= r.n_split_docs <= r.n_docs
        # every document is packed exactly once (zero-token docs too)
        from snowflake_cdc_spark.queries import _t

        n_docs = _t(spark, "/root/testdata/sf0.001", "documents").count()
        assert sum(r.n_docs for r in out) == n_docs

    def test_zero_token_doc_still_packed(self, spark):
        """A doc with no [a-z]+ words gets n_tokens=0 and a shard
        assignment (the LEFT-join contract)."""
        from snowflake_cdc_spark.operators.packing import pack_sequences

        df = spark.createDataFrame(
            [(1, 0), (2, 100), (3, 0)], "doc_id long, n_toks long"
        )
        out = {r.doc_id: r for r in pack_sequences(df, "doc_id", "n_toks", 64, 4).collect()}
        assert set(out) == {1, 2, 3}
        assert all(not out[d].straddles for d in (1, 3))
