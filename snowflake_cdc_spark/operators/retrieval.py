"""BM25 keyword retrieval scoring over a document corpus.

The reference's engine feeds warehouse tables that users query for
search-style workloads; BM25 is the canonical lexical ranking function
(Robertson/Walker; the Lucene ``ln(1 + (N - df + 0.5)/(df + 0.5))``
idf variant, which is always positive). This implements corpus-level
scoring as pure DataFrame algebra:

- one explode + ``isin(terms)`` filter (selectivity applied BEFORE the
  aggregation, so the shuffle carries only rows mentioning a query
  term — at 100 TB the shuffled relation is proportional to the
  postings of the query terms, not the corpus),
- per-(doc, term) tf in one hash aggregation (map-side combine),
- per-term df derived from the same relation (tiny; broadcast back),
- corpus stats (N, avgdl) as a 1-row broadcast,
- the score assembled with a FIXED-ORDER sum over the query terms
  (conditional-max pivot + ``coalesce(.., 0.0)`` chain) so IEEE
  addition order is identical in any re-implementation — float sums
  over a ``groupBy`` would be order-nondeterministic.

Determinism contract (COVERAGE.md round-3 amendment): the only libm
call is ``ln`` (shared with q89 tf-idf); every other step is exact
integer arithmetic or correctly-rounded IEEE double ops written
token-identically in the DuckDB oracle, and the final projection uses
the tie-robust ``round_half_up`` form.

Reference parity note: the reference (a control-plane client,
``add_output.py``) has no retrieval surface; this extends the
north-star text-analysis lane (SURVEY.md §2.8 N5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from snowflake_cdc_spark.functions.vectors import round_half_up


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    scale: int = 4,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for the bag-of-words query
    ``terms``. Tokenization is whitespace split (matches the corpus
    fixtures and the N5 lane). Returns ``(id_col, bm25)`` ordered by
    the ROUNDED score desc, id asc — ranking on the canonical rounded
    value keeps the cut deterministic across engines."""
    base = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    dl = F.size(F.split(F.col("_text"), " ")).cast("bigint")

    # Corpus stats: one row, broadcast. avgdl = exact-int sum / exact-int
    # count -> a single correctly-rounded division.
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        (
            F.sum(F.size(F.split(F.col("_text"), " ")).cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_avgdl"),
    )

    # Postings of the query terms only: filter before the aggregation.
    tf = (
        base.select(
            "_id",
            dl.alias("_dl"),
            F.explode(F.split(F.col("_text"), " ")).alias("_term"),
        )
        .filter(F.col("_term").isin(list(terms)))
        .groupBy("_id", "_term")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"), F.max("_dl").alias("_dl"))
    )

    # Per-term document frequency: |terms| rows, broadcast back.
    dfs = tf.groupBy("_term").agg(
        F.count_distinct("_id").cast("double").alias("_df")
    )

    scored = tf.join(F.broadcast(dfs), "_term").join(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0) + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    contrib = (
        idf
        * (F.col("_tf") * F.lit(k1 + 1.0))
        / (
            F.col("_tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("_dl").cast("double") / F.col("_avgdl"))
            )
        )
    )
    per_term = scored.select("_id", "_term", contrib.alias("_c"))

    # Fixed-order sum: one conditional-max column per query term, added
    # in the order the caller listed the terms.
    pivot = per_term.groupBy("_id").agg(
        *[
            F.max(F.when(F.col("_term") == F.lit(t), F.col("_c"))).alias(f"_c{i}")
            for i, t in enumerate(terms)
        ]
    )
    score = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(terms)):
        score = score + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))

    return (
        pivot.select(
            F.col("_id").alias(id_col), round_half_up(score, scale).alias("bm25")
        )
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )
