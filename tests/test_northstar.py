"""North-star operator behavior beyond the oracle checks: planted-dup
recall, multimodal batch shape, ANN bucketing sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.lsh import cosine_topk_bucketed
from snowflake_cdc_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
)
from snowflake_cdc_spark.queries import REGISTRY, _load_extended
from snowflake_cdc_spark.queries_northstar import planted_docs, planted_vectors
from snowflake_cdc_spark.sources.io import read_table
from tests.conftest import SF_SMOKE

_load_extended()


def test_minhash_finds_all_planted_pairs(spark):
    """Every planted exact copy (jaccard 1.0) and near copy (n/(n+1) ≈ .97)
    must be recalled — LSH banding cannot lose jaccard ≥ 0.8 twins here."""
    pairs = REGISTRY["q25_minhash_lsh"].spark_fn(spark, SF_SMOKE).collect()
    got = {(r.a, r.b) for r in pairs}
    docs = read_table(spark, SF_SMOKE, "documents")
    exact_ids = [r.doc_id for r in docs.filter(F.col("doc_id") % 10 == 0).collect()]
    missing = [(i, i + 100000) for i in exact_ids if (i, i + 100000) not in got]
    assert not missing, f"exact twins missed by LSH: {missing[:5]}"
    exact = {p for p in pairs if p.jaccard == 1.0}
    assert len(exact) >= len(exact_ids)


def test_simhash_exact_copies_hamming_zero(spark):
    pairs = REGISTRY["q26_simhash"].spark_fn(spark, SF_SMOKE).collect()
    zero = {(r.a, r.b) for r in pairs if r.hamming == 0}
    docs = read_table(spark, SF_SMOKE, "documents")
    exact_ids = [r.doc_id for r in docs.filter(F.col("doc_id") % 10 == 0).collect()]
    for i in exact_ids:
        assert (i, i + 100000) in zero


def test_embedding_neardup_recalls_scaled_copies(spark):
    pairs = REGISTRY["q28_embedding_neardup"].spark_fn(spark, SF_SMOKE).collect()
    got = {(r.a, r.b): r.sim for r in pairs}
    vecs = planted_vectors(spark, SF_SMOKE)
    planted = [r.vec_id for r in vecs.filter(F.col("vec_id") >= 100000).collect()]
    for v in planted:
        assert (v - 100000, v) in got
        assert got[(v - 100000, v)] >= 0.9999  # scaled copy ⇒ cosine == 1


def test_multimodal_feature_shape_and_determinism(spark):
    media = documents_as_media(read_table(spark, SF_SMOKE, "documents"))
    feats = extract_features(media, dim=8)
    rows = feats.orderBy("media_id").limit(20).collect()
    assert all(len(r.feature) == 8 for r in rows)
    assert all(abs(sum(r.feature) - 1.0) < 1e-6 for r in rows)  # normalized
    rows2 = extract_features(media, dim=8).orderBy("media_id").limit(20).collect()
    assert [r.feature for r in rows] == [r.feature for r in rows2]


def test_ann_bucketed_self_exclusion(spark):
    """A query vector always shares its own bucket; with exclusion off it
    ranks first at sim=1.0, and by DEFAULT it never appears (a corpus
    query must not waste a k slot on itself)."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    raw = cosine_topk_bucketed(emb, queries, k=1, dims=6, exclude_self=False).collect()
    for r in raw:
        assert r.query_id == r.vec_id and r.sim == 1.0
    out = cosine_topk_bucketed(emb, queries, k=3, dims=6).collect()
    assert out and all(r.query_id != r.vec_id for r in out)
