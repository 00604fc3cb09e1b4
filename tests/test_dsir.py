"""DSIR importance weighting (q221): planted-corpus sanity — a document
written in the target subcorpus's vocabulary must outweigh one written
in disjoint vocabulary, and the oracle-checked lane must select under
budget in weight order."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.queries import REGISTRY, _load_extended
from tests.conftest import SF_SMOKE


def _weights(spark, rows):
    """Compute the q221 per-doc importance weights on a planted corpus
    (target = lang 'en'), mirroring the lane's algebra at B=256."""
    from snowflake_cdc_spark.queries_round8_ext import _DSIR_BUCKETS

    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit(UNICODE_WORD), 0)
    d = docs.select("doc_id", "lang", ws.alias("ws"))
    n = F.size("ws")
    uni = d.select("doc_id", "lang", F.explode("ws").alias("g"))
    big = d.filter(n >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, n - 1),
                F.slice(F.col("ws"), 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("g"),
    )
    grams = uni.unionByName(big)
    b = (
        F.conv(F.substring(F.md5("g"), 1, 13), 16, 10).cast("long")
        % _DSIR_BUCKETS
    )
    db = grams.withColumn("b", b).groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tb = db.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", F.col("c")).otherwise(0)).alias(
            "t_b"
        ),
        F.sum("c").alias("r_b"),
    )
    tot = tb.agg(F.sum("t_b").alias("t"), F.sum("r_b").alias("r"))
    ratio = (
        (F.col("t_b") + 1).cast("double") / (F.col("r_b") + 1).cast("double")
    ) * (
        (F.col("r") + _DSIR_BUCKETS).cast("double")
        / (F.col("t") + _DSIR_BUCKETS).cast("double")
    )
    lr = tb.crossJoin(F.broadcast(tot)).select(
        "b", F.floor(F.log(ratio) * 1e6 + 0.5).cast("bigint").alias("lr")
    )
    w = (
        db.filter(F.col("lang") != "en")
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lr")).alias("logw"))
    )
    return {r["doc_id"]: r["logw"] for r in w.collect()}


def test_target_like_doc_outweighs_disjoint(spark):
    target_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "en", target_text),
        (2, "en", "the quick brown fox likes the lazy dog"),
        # candidate 10: written in the target vocabulary
        (10, "de", "the quick brown fox jumps over the lazy dog"),
        # candidate 11: disjoint vocabulary
        (11, "de", "zug bahnhof strasse himmel wolke berg tal fluss"),
    ]
    w = _weights(spark, rows)
    assert set(w) == {10, 11}
    assert w[10] > w[11]
    # per-token normalization isn't applied, but the docs are same-length
    # so the raw-sum comparison is fair; the disjoint doc's weight must
    # be negative (its buckets are raw-only, so every lr < 0)
    assert w[11] < 0


def test_q221_budget_is_respected(spark):
    from snowflake_cdc_spark.queries_round8_ext import _DSIR_BUDGET

    _load_extended()
    rows = (
        REGISTRY["q221_dsir_selection"].spark_fn(spark, SF_SMOKE).collect()
    )
    assert rows, "selection must be non-empty at the smoke SF"
    total = sum(r["tokens_selected"] for r in rows)
    assert 0 < total <= _DSIR_BUDGET
    # target lang is excluded from the candidate pool
    assert all(r["lang"] != "en" for r in rows)
