"""Similarity search over embedding columns (SURVEY.md §2.8 N3).

Two tiers:

- ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  one pass over the corpus, per-query top-k via min-heap-like window.
  At 100 TB this is a single scan with no shuffle of the corpus (the
  window partitions by query id, and only rows surviving a local
  ``row_number`` cut shuffle) — the right baseline when queries are few.
- ``cosine_topk_lsh`` (operators/lsh.py) — random-hyperplane LSH
  pre-filter for when the query set itself is large: bucket-join instead
  of full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.vectors import dot_product, l2_norm


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = True,
    round_to: int | None = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Output: (query_id, vec_id, sim) with ties broken by ``vec_id``.
    ``queries`` must be small enough to broadcast — enforced with an
    explicit ``broadcast`` hint so the corpus is never shuffled.
    """
    # Pre-project each side's norm BEFORE the cross join (round 11):
    # cosine = dot/(na·nb) evaluates three 64-element HOF aggregates per
    # PAIR, but the norms depend only on their own row — computing them
    # once per corpus/query row leaves one HOF (the dot) in the
    # |corpus|x|queries| hot stage (measured 2.6x on the scoring stage;
    # same IEEE ops in the same order, so sim is bit-identical).
    joined = corpus.withColumn("__cn", l2_norm(corpus_vec)).crossJoin(
        F.broadcast(queries.withColumn("__qn", l2_norm(query_vec)))
    )
    if exclude_self:
        joined = joined.filter(F.col(corpus_id) != F.col(query_id))
    sim = dot_product(corpus_vec, query_vec) / (F.col("__cn") * F.col("__qn"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = joined.select(F.col(query_id), F.col(corpus_id), sim.alias("sim"))
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
