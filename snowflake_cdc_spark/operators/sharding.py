"""Training-shard manifest generation — the last batch step of a
pre-training data pipeline: assign every document to a ~fixed-token
shard along the seeded pseudo-random corpus order, so a 1000-node
training job reads shard files instead of a table.

Composes two existing sort-free pieces:

- the corpus order is ``operators/shuffle.py::deterministic_shuffle``'s
  seeded md5 rank (q120 — range-bucket + broadcast-offset, no global
  sort);
- the shard boundary needs the RUNNING TOKEN TOTAL along that order —
  a global cumulative sum, decomposed the same way: dense ranks bucket
  evenly by ``(rank-1)·B DIV N``, per-bucket token sums make a B-row
  broadcast offsets table, and the only windows are the B-row running
  sum and the per-bucket intra cumsum.

Reference parity: the reference materializes tables on an
``output_interval`` cadence (add_output.py:447); shard manifests are the
same materialize-for-consumers step for a training reader.

``shard_id = tokens_before DIV shard_tokens``: documents are never
split, so a shard holds ~shard_tokens ± one document (the q114 packer
then packs sequences WITHIN a shard). Deterministic for a given
(seed, shard_tokens) and independent of layout/bucket count — the
oracle recomputes it with the naive single-sort window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.operators.shuffle import deterministic_shuffle
from snowflake_cdc_spark.operators.util import ckpt_eager

__all__ = ["shard_assignments", "shard_manifest"]


def shard_assignments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_tokens: int = 2000,
    seed: int | str = 42,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-document shard assignment: (<id_col>, tok, shuffle_rank,
    shard_id) — the relation :func:`shard_manifest` rolls up, exposed so
    downstream audits (per-shard source mixture q218, shard-local
    packing q114) can join document attributes back onto the layout."""
    toks = docs.select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(UNICODE_WORD), 0)
        )
        .cast("bigint")
        .alias("tok"),
    )
    ranked = deterministic_shuffle(docs.select(id_col), id_col, seed).join(
        toks, id_col
    )
    # count from the source relation: counting `ranked` would re-plan
    # the whole shuffle subtree a second time just for the scalar
    n = docs.agg(F.count(F.lit(1)).alias("__n"))
    # integer DIV: exact bucket boundaries (any contiguous-rank
    # bucketing yields the identical cumsum, but stay float-free).
    # Materialize ONCE (q179 pattern): both the bucket-sum and the
    # assignment branches consume the ranked relation, and without the
    # checkpoint the whole shuffle-rank subtree would run twice.
    keyed = (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(
            "__rb",
            F.expr(
                f"CAST(((shuffle_rank - 1) * {n_buckets}) DIV __n AS BIGINT)"
            ),
        )
        .transform(ckpt_eager)
    )
    per_bucket = keyed.groupBy("__rb").agg(F.sum("tok").alias("__bt"))
    offsets = per_bucket.select(
        "__rb",
        (F.sum("__bt").over(Window.orderBy("__rb")) - F.col("__bt")).alias(
            "__off"
        ),
    )
    w_intra = (
        Window.partitionBy("__rb")
        .orderBy("shuffle_rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = (
        keyed.join(F.broadcast(offsets), "__rb")
        .withColumn(
            "__before",
            F.col("__off") + F.coalesce(F.sum("tok").over(w_intra), F.lit(0)),
        )
        .withColumn(
            "shard_id", F.expr(f"CAST(__before DIV {shard_tokens} AS BIGINT)")
        )
    )
    return assigned.select(id_col, "tok", "shuffle_rank", "shard_id")


def shard_manifest(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_tokens: int = 2000,
    seed: int | str = 42,
    n_buckets: int = 256,
) -> DataFrame:
    """(shard_id, n_docs, n_tokens, first_rank, last_rank): the shard
    layout of the corpus along the seeded shuffle order."""
    assigned = shard_assignments(
        docs, id_col, text_col, shard_tokens, seed, n_buckets
    )
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("n_tokens"),
            F.min("shuffle_rank").cast("bigint").alias("first_rank"),
            F.max("shuffle_rank").cast("bigint").alias("last_rank"),
        )
        .orderBy("shard_id")
    )
