"""Round-11 lane semantics: the embedding outlier screen (q247) and
the embedding-space split-leakage audit (q248) — plant recall and
clean-corpus specificity beyond the oracle hash check."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.queries import queries
from tests.conftest import SF_SMOKE


def test_outlier_screen_catches_all_plants_and_only_plants(spark):
    qs = queries()
    rows = qs["q247_embedding_outliers"](spark, SF_SMOKE).collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n_plants = emb.filter(F.col("vec_id") % 53 == 0).count()
    assert n_plants > 0
    flagged_plants = sum(r.planted for r in rows)
    # every 3x-magnitude plant sits far outside its cell's mean radius
    assert flagged_plants == n_plants
    # the clean synthetic corpus has no organic 2x-mean outliers — a
    # false positive here means the threshold algebra drifted
    assert all(r.planted for r in rows)


def test_split_leakage_catches_every_planted_near_copy(spark):
    qs = queries()
    rows = qs["q248_embedding_split_leakage"](spark, SF_SMOKE).collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    is_test = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) == "0"
    n_plants = emb.filter((F.col("vec_id") % 71 == 0) & ~is_test).count()
    assert n_plants > 0
    # every planted near-copy pairs with (at least) its own source
    own = {
        r.train_vec
        for r in rows
        if r.planted and r.test_vec - 20_000_000 == r.train_vec
    }
    assert len(own) == n_plants
    # and only cross-split pairs are reported (bipartite contract)
    for r in rows:
        assert r.test_vec != r.train_vec
