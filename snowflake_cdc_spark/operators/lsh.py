"""Embedding-space near-duplicate detection + bucketed ANN
(SURVEY.md §2.8 N2/N3 scale path).

Random-hyperplane LSH is the textbook approach; for oracle parity we use
the degenerate-but-deterministic variant where the "hyperplanes" are the
coordinate axes: bucket = sign bits of the first ``dims`` components.
Near-identical vectors (the near-dup regime, cosine ≈ 1) agree on almost
every sign, so they share a bucket; the bucket join replaces the O(n²)
cross product. ``cosine_topk_bucketed`` generalizes to query sets too
large to broadcast-cross-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.vectors import dot_product, l2_norm


def sign_bucket(vec: Column | str, dims: int = 16) -> Column:
    """Sign-bit bucket id over the first ``dims`` components (packed int)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    # 2^(i-1) via pow (exact in double up to 2^52); the Python shiftleft
    # API can't take a lambda-variable shift amount
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(dims)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.element_at(v, i).cast("double") > 0,
            F.pow(F.lit(2.0), (i - 1).cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.999,
    dims: int = 16,
    round_to: int | None = 4,
) -> DataFrame:
    """Pairs with cosine ≥ threshold found via sign-bucket blocking.
    Output (a, b, sim), a < b."""
    # per-row norm pre-projected before the self-join (round 11): one
    # HOF (the dot) per pair instead of three — bit-identical sim
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(vec_col).alias("n"),
        sign_bucket(vec_col, dims).alias("bucket"),
    )
    x, y = base.alias("x"), base.alias("y")
    sim = dot_product(F.col("x.v"), F.col("y.v")) / (F.col("x.n") * F.col("y.n"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"), sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .orderBy("a", "b")
    )


def cosine_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    dims: int = 8,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: join corpus and queries on the sign bucket
    (coarse, ``2**dims`` cells) instead of a cross product — the scale
    path when the query set itself is large. Recall is bucket-bound; use
    fewer dims for higher recall. ``exclude_self`` drops the guaranteed
    sim=1.0 self match when queries are drawn from the corpus (matching
    ``cosine_topk``'s default — otherwise every query wastes one of its
    k slots on itself). Output (query_id, vec_id, sim)."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(corpus_id).alias(corpus_id),
        F.col(corpus_vec).alias("__cv"),
        l2_norm(corpus_vec).alias("__cn"),
        sign_bucket(corpus_vec, dims).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id).alias(query_id),
        F.col(query_vec).alias("__qv"),
        l2_norm(query_vec).alias("__qn"),
        sign_bucket(query_vec, dims).alias("__bucket"),
    )
    joined = c.join(q, "__bucket")
    if exclude_self:
        joined = joined.filter(F.col(corpus_id) != F.col(query_id))
    scored = joined.select(
        query_id,
        corpus_id,
        F.round(
            dot_product(F.col("__cv"), F.col("__qv"))
            / (F.col("__cn") * F.col("__qn")),
            4,
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
