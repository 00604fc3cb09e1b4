"""Deterministic Naive Bayes text classifier (VERDICT r08 #4) — the
fastText/CCNet-style quality/domain filter as exact-integer algebra.

GPT-3's and CCNet's curation pipelines train a classifier to recognize
target-domain text and threshold the crawl on its score. This is that
operator with the repo's hash-checkability discipline (q160/q172):

- train: Laplace-smoothed per-word log-likelihood ratios
  ``llr_w = ln(((c_w1+1)/(N1+V)) / ((c_w0+1)/(N0+V)))`` — ONE libm
  ``ln`` per train word, quantized ONCE to integer micro-nats; plus a
  class-prior term and an unseen-word constant (one ``ln`` each);
- score: ``score(doc) = prior + sum_w count_w(doc) * llr_w`` with
  unseen words taking the constant — exact BIGINT arithmetic;
- threshold at 0 (ties -> negative, deterministic).

Scale shape: token counts are map-side-combined groupBys; scoring is a
vocab-keyed equi-join (never doc x vocab); the model is three
relations (vocab llr + two scalars) that broadcast at any corpus size
where the vocab fits an executor — the standard posture for a word-
level NB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LLR_EXPR = (
    "CAST(floor(ln((CAST(c1 + 1 AS DOUBLE) * CAST(n0 + v AS DOUBLE))"
    " / (CAST(c0 + 1 AS DOUBLE) * CAST(n1 + v AS DOUBLE)))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)
_PRIOR_EXPR = (
    "CAST(floor(ln(CAST(d1 AS DOUBLE) / CAST(d0 AS DOUBLE))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)
_UNSEEN_EXPR = (
    "CAST(floor(ln(CAST(n0 + v AS DOUBLE) / CAST(n1 + v AS DOUBLE))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)


def check_two_classes(d1: int, d0: int) -> None:
    """Fail FAST on a single-class training set: the prior is
    ln(d1/d0), and a zero class count would flow Inf through the
    micro-nat quantization — Spark's non-ANSI CAST(Inf AS BIGINT)
    silently saturates while DuckDB errors, so the failure must be a
    loud driver-side error, not engine-divergent garbage."""
    if d1 <= 0 or d0 <= 0:
        raise ValueError(
            f"NB training needs both classes: got {d1} positive / "
            f"{d0} negative docs"
        )


def nb_train(train: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train on (doc_id, pos boolean, ws array<string>): returns
    (lr, k) where lr = (w, llr micro-nats) and k = one row
    (prior, unseen) micro-nat scalars."""
    tr = train.select("doc_id", "pos", F.explode("ws").alias("w"))
    cls = train.agg(
        F.sum(F.col("pos").cast("bigint")).cast("bigint").alias("d1"),
        F.sum((~F.col("pos")).cast("bigint")).cast("bigint").alias("d0"),
    )
    row = cls.first()
    check_two_classes(row["d1"] or 0, row["d0"] or 0)
    wc = tr.groupBy("w").agg(
        F.sum(F.col("pos").cast("bigint")).cast("bigint").alias("c1"),
        F.sum((~F.col("pos")).cast("bigint")).cast("bigint").alias("c0"),
    )
    nv = wc.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c0").cast("bigint").alias("n0"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    lr = wc.crossJoin(F.broadcast(nv)).select("w", F.expr(_LLR_EXPR).alias("llr"))
    k = cls.crossJoin(F.broadcast(nv)).select(
        F.expr(_PRIOR_EXPR).alias("prior"),
        F.expr(_UNSEEN_EXPR).alias("unseen"),
    )
    return lr, k


def nb_score(docs: DataFrame, lr: DataFrame, k: DataFrame) -> DataFrame:
    """Score (doc_id, ws [, extra cols]) against a trained model:
    appends (score_unat BIGINT, pred_pos boolean). Carries every
    non-ws input column through, and every input ROW: a zero-token
    document scores prior-only (the NB semantics — explode alone would
    silently drop it, leaving the doc neither kept nor rejected)."""
    carry = [c for c in docs.columns if c != "ws"]
    tc = (
        docs.select(*carry, F.explode("ws").alias("w"))
        .groupBy(*carry, "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wsum = (
        tc.join(lr, "w", "left")
        .crossJoin(F.broadcast(k))
        .groupBy(*carry)
        .agg(
            F.sum(F.col("c") * F.coalesce(F.col("llr"), F.col("unseen")))
            .cast("bigint")
            .alias("__wsum")
        )
    )
    return (
        docs.select(*carry)
        .join(wsum, carry, "left")
        .crossJoin(F.broadcast(k))
        .select(
            *carry,
            (F.coalesce(F.col("__wsum"), F.lit(0)) + F.col("prior"))
            .cast("bigint")
            .alias("score_unat"),
        )
        .withColumn("pred_pos", F.col("score_unat") > 0)
    )
