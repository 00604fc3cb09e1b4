"""Shard-manifest operator (operators/sharding.py) + mixing-weights
branch coverage: naive-reference equality, bucket-count invariance,
shard-size bounds, and the q202 over-sampling flag."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.sharding import shard_manifest


def _docs(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_manifest(texts, shard_tokens, seed=42):
    toks = {
        i: len([w for w in t.lower().split() if w.isalpha()])
        for i, t in enumerate(texts)
    }
    order = sorted(
        toks, key=lambda i: (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i)
    )
    out = {}
    before = 0
    for rank, i in enumerate(order, start=1):
        sid = before // shard_tokens
        d = out.setdefault(sid, [0, 0, rank, rank])
        d[0] += 1
        d[1] += toks[i]
        d[3] = rank
        before += toks[i]
    return {
        sid: (v[0], v[1], v[2], v[3]) for sid, v in out.items()
    }


class TestShardManifest:
    def test_matches_naive_reference(self, spark):
        rng = random.Random(9)
        texts = [
            " ".join(rng.choice(["alpha", "beta", "gamma", "delta"]) for _ in range(rng.randint(3, 40)))
            for _ in range(60)
        ]
        got = {
            r.shard_id: (r.n_docs, r.n_tokens, r.first_rank, r.last_rank)
            for r in shard_manifest(_docs(spark, texts), shard_tokens=50).collect()
        }
        assert got == _ref_manifest(texts, 50)

    def test_invariant_to_bucket_count(self, spark):
        texts = [f"w{i} " * (i % 7 + 1) for i in range(40)]
        df = _docs(spark, texts)
        a = {
            tuple(r)
            for r in shard_manifest(df, shard_tokens=20, n_buckets=4).collect()
        }
        b = {
            tuple(r)
            for r in shard_manifest(df, shard_tokens=20, n_buckets=97).collect()
        }
        assert a == b

    def test_shard_token_bound(self, spark):
        # every shard except possibly the last starts strictly inside
        # its token budget: n_tokens < shard_tokens + max single doc
        rng = random.Random(4)
        texts = [
            " ".join("tok" for _ in range(rng.randint(1, 30)))
            for _ in range(80)
        ]
        rows = shard_manifest(_docs(spark, texts), shard_tokens=100).collect()
        max_doc = 30
        for r in rows:
            assert r.n_tokens < 100 + max_doc
        # ranks tile the corpus contiguously
        spans = sorted((r.first_rank, r.last_rank) for r in rows)
        assert spans[0][0] == 1
        for (a0, a1), (b0, _) in zip(spans, spans[1:]):
            assert b0 == a1 + 1


def test_mixing_needs_cap_branch(spark):
    """q202's over-sampling flag fires for a source so small that a
    uniform mixture would repeat it > 4 epochs."""
    from snowflake_cdc_spark.queries_round6_ext import q202

    big = [(i, "word " * 200, "en", "big", 1000) for i in range(20)]
    tiny = [(100, "word word word", "en", "tiny", 14)]
    df = spark.createDataFrame(
        big + tiny,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp()
    # read_table expects a parquet FILE at {sf_dir}/documents.parquet
    df.toPandas().to_parquet(os.path.join(d, "documents.parquet"))
    out = {r.source: (r.epochs_ppm, r.needs_cap) for r in q202(spark, d).collect()}
    assert out["tiny"][1] is True and out["big"][1] is False
    # uniform target = 1/2 each; tiny has 3 of 4003 tokens ->
    # epochs = 4003*1e6 // (2*3)
    assert out["tiny"][0] == 4003 * 1000000 // 6


def test_assignments_roll_up_to_manifest(spark):
    """shard_assignments is the exact per-doc relation the manifest
    aggregates: rolling it up reproduces shard_manifest row for row,
    and every doc appears exactly once."""
    from pyspark.sql import functions as F

    from snowflake_cdc_spark.operators.sharding import (
        shard_assignments,
        shard_manifest,
    )
    from snowflake_cdc_spark.queries import _t

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    a = shard_assignments(docs, shard_tokens=2000, seed=42)
    assert a.count() == docs.count()
    assert a.select("doc_id").distinct().count() == docs.count()
    rolled = {
        r.shard_id: (r.n_docs, r.n_tokens, r.first_rank, r.last_rank)
        for r in a.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("n_tokens"),
            F.min("shuffle_rank").cast("bigint").alias("first_rank"),
            F.max("shuffle_rank").cast("bigint").alias("last_rank"),
        )
        .collect()
    }
    manifest = {
        r.shard_id: (r.n_docs, r.n_tokens, r.first_rank, r.last_rank)
        for r in shard_manifest(docs, shard_tokens=2000, seed=42).collect()
    }
    assert rolled == manifest
