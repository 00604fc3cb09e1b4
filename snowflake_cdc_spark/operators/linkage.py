"""Record linkage / entity resolution: fuzzy-match dirty records back to
a clean reference table (the "same real-world entity, different bytes"
problem every CDC consolidation hits when two sources disagree on a
name).

Pipeline (the standard blocking → verify → resolve shape):

1. **blocking** on adjacent-token bigrams of the name — single tokens
   are too common (token df ~ n/vocab, candidate volume Σ df² goes
   quadratic at scale) while bigram df falls by ~vocab×, keeping the
   inverted-index join at Σ df² ≈ linear. Same bounded-candidates
   doctrine as the near-dup family (operators/dedup.py): NEVER compare
   all pairs.
2. **verify** each candidate pair with exact token-set Jaccard,
   integer-thresholded (``2·|∩| ≥ |∪|`` for 0.5) so engines can't
   disagree on a float boundary.
3. **resolve**: best clean match per dirty record — highest Jaccard,
   ties to the smallest clean key (a total order, so the assignment is
   deterministic under any partitioning).

Scale notes: the bigram join shuffles (bigram, id) pairs only; the
verify join carries token arrays for candidate pairs only (bounded by
blocking); resolution is one window over dirty_id. Hot bigrams can be
capped with ``operators/dedup._drop_oversized_buckets`` if a corpus
has degenerate name distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["token_bigrams", "link_records"]


def token_bigrams(name_col: str | F.Column) -> F.Column:
    """Adjacent-token bigram array of a space-tokenized name."""
    toks = F.split(name_col if isinstance(name_col, F.Column) else F.col(name_col), " ")
    return F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", toks[i], toks[i + 1]),
        )
    )


def link_records(
    clean: DataFrame,
    dirty: DataFrame,
    id_col: str,
    name_col: str,
    min_jaccard_num: int = 1,
    min_jaccard_den: int = 2,
    min_shared_blocks: int = 1,
) -> DataFrame:
    """Match each dirty record to its best clean record.

    Returns ``(dirty_id, clean_id, n_inter, n_union, jaccard)`` — one
    row per dirty record that has a candidate with Jaccard ≥
    ``min_jaccard_num/min_jaccard_den`` (threshold compared in integers:
    ``den·|∩| ≥ num·|∪|``).

    ``min_shared_blocks``: candidate pairs must share at least this many
    DISTINCT blocking bigrams. The single hottest bigram in a corpus is
    typically a category marker shared by a large fraction of records
    (measured on the part catalog at sf0.1: 1.94M of 57M possible pairs
    blocked on ≥1 bigram, ~30× fewer on ≥2) — multi-block agreement is
    the standard cheap refinement before paying the verify join.
    """
    def keyed(df, side):
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.array_distinct(F.split(F.col(name_col), " ")).alias(f"{side}_toks"),
            F.explode(token_bigrams(name_col)).alias("bg"),
        )

    cand = (
        keyed(clean, "clean")
        .select("clean_id", "bg")
        .join(keyed(dirty, "dirty").select("dirty_id", "bg"), "bg")
        .groupBy("clean_id", "dirty_id")
        .agg(F.count_distinct("bg").alias("_nbg"))
        .filter(F.col("_nbg") >= min_shared_blocks)
        .select("clean_id", "dirty_id")
    )
    c_toks = clean.select(
        F.col(id_col).alias("clean_id"),
        F.array_distinct(F.split(F.col(name_col), " ")).alias("c_toks"),
    )
    d_toks = dirty.select(
        F.col(id_col).alias("dirty_id"),
        F.array_distinct(F.split(F.col(name_col), " ")).alias("d_toks"),
    )
    scored = (
        cand.join(c_toks, "clean_id")
        .join(d_toks, "dirty_id")
        .select(
            "dirty_id",
            "clean_id",
            F.size(F.array_intersect("c_toks", "d_toks")).cast("bigint").alias("n_inter"),
            F.size(F.array_union("c_toks", "d_toks")).cast("bigint").alias("n_union"),
        )
        .filter(
            F.col("n_inter") * min_jaccard_den >= F.col("n_union") * min_jaccard_num
        )
    )
    best = Window.partitionBy("dirty_id").orderBy(
        # one IEEE division as the sort key is engine-identical on exact
        # integer inputs; clean_id breaks exact-ratio ties totally
        (F.col("n_inter") / F.col("n_union")).desc(), F.col("clean_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select(
            "dirty_id",
            "clean_id",
            "n_inter",
            "n_union",
            (F.col("n_inter").cast("double") / F.col("n_union").cast("double")).alias(
                "jaccard"
            ),
        )
    )
