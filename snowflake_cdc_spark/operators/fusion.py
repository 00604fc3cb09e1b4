"""Reciprocal-rank fusion (RRF, Cormack 2009) — the standard hybrid-
retrieval combiner: merge rankings produced by INCOMMENSURABLE scorers
(BM25's lexical score, ANN's cosine, a recency prior) by summing
``1 / (k0 + rank)`` per system. Rank positions, not raw scores, cross
systems — no score normalization problem.

Determinism: input ranks are integers (each source ranking is itself a
deterministic total order), the per-system contributions are combined
in a FIXED order (one coalesced term per system, the q130 BM25
fixed-order-sum discipline — never a float sum over an unordered
group), an absent document contributes 0 from that system, and the
fused score is round_half_up'd with ranking on the rounded value.

Scale: one full-outer join chain across the (top-N-sized, tiny by
construction) ranking relations — fusion cost is bounded by the
rankings, never by the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.vectors import round_half_up


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k0: int = 60,
    topn: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Fuse rankings (each: (id, rank) with rank 1-based) into
    (id, rrf_score, fused_rank). Ties break by id."""
    joined = None
    for i, r in enumerate(rankings):
        r = r.select(F.col(id_col), F.col(rank_col).alias(f"__r{i}"))
        joined = r if joined is None else joined.join(r, id_col, "full_outer")
    score = None
    for i in range(len(rankings)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"__r{i}").cast("double")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    fused = joined.select(
        id_col, round_half_up(score, round_to).alias("rrf_score")
    )
    w = Window.orderBy(F.desc("rrf_score"), id_col)
    out = fused.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
    if topn is not None:
        out = out.filter(F.col("fused_rank") <= topn)
    return out.orderBy("fused_rank")
