"""Sequence packing: assign documents to fixed-capacity context windows
(the concat-and-chunk step of an LLM pre-training pipeline).

The standard packing recipe concatenates tokenized documents in a
deterministic order and slices the stream every ``capacity`` tokens; a
document whose span crosses a slice boundary is split across two windows.
A single global concatenation order would serialize at 100 TB (one
cumulative sum over everything), so — as real packers do — the corpus is
first sharded into ``n_buckets`` deterministic hash buckets and each
bucket packs independently: one shuffle on the bucket key, then a
window-function prefix sum *within* the bucket. Bucket count scales with
the cluster (each bucket ≈ one worker's packing unit), the per-bucket
window is the only ordered region, and the whole operator is
expression-level (no Python).

Everything is derived from the running token count, so the output is
deterministic for a given (ordering column, bucket count, capacity) and
independently reproducible in SQL — which is exactly how the oracle
checks it.

The reference has no packing operator (it is a CDC ingestion client);
this extends the engine's training-data lane (SURVEY.md §2 LLM ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "packing_stats"]


def _bucket(id_col: str, n_buckets: int):
    """Deterministic, layout-invariant shard key (md5-derived, matches
    the oracle's arithmetic exactly)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast(
            "bigint"
        ),
        F.lit(n_buckets),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    capacity: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-document packing assignment.

    Output columns: ``<id_col>``, ``bucket``, ``n_tokens``,
    ``first_bin`` (window index of the document's first token within its
    bucket), ``last_bin`` (window of its last token), ``offset_in_bin``
    (token offset of the document's start inside ``first_bin``), and
    ``straddles`` (true when the document is split across windows).

    Documents are concatenated in ascending ``id_col`` order within each
    bucket; window ``b`` of a bucket holds tokens ``[b*capacity,
    (b+1)*capacity)`` of that bucket's stream.
    """
    w = Window.partitionBy("bucket").orderBy(id_col)
    toks = F.col(n_tokens_col).cast("bigint")
    return (
        df.select(
            F.col(id_col),
            _bucket(id_col, n_buckets).alias("bucket"),
            toks.alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "bucket",
            "n_tokens",
            F.floor((F.col("cum") - F.col("n_tokens")) / capacity).alias("first_bin"),
            # greatest() guards the zero-token edge: with n_tokens = 0 and
            # cum landing exactly on a capacity boundary, floor((cum-1)/cap)
            # is first_bin - 1, which would flag a spurious straddle; an
            # empty document occupies (degenerately) its start window. For
            # n_tokens >= 1 the floor term is always >= first_bin, so the
            # guard is an identity there.
            F.greatest(
                F.floor((F.col("cum") - F.col("n_tokens")) / capacity),
                F.floor((F.col("cum") - 1) / capacity),
            ).alias("last_bin"),
            ((F.col("cum") - F.col("n_tokens")) % capacity).alias("offset_in_bin"),
        )
        .withColumn("straddles", F.col("first_bin") != F.col("last_bin"))
    )


def packing_stats(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    capacity: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-bucket packing summary: documents, tokens, windows produced
    (= ceil(total/capacity)), split documents, and the padding wasted in
    the final partial window — the numbers a pipeline owner watches to
    size ``capacity`` and ``n_buckets``."""
    packed = pack_sequences(df, id_col, n_tokens_col, capacity, n_buckets)
    total = F.sum("n_tokens")
    n_bins = F.ceil(total / capacity)
    return (
        packed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            total.alias("total_tokens"),
            n_bins.alias("n_bins"),
            F.sum(F.col("straddles").cast("bigint")).alias("n_split_docs"),
            (n_bins * capacity - total).alias("pad_tokens"),
        )
        .orderBy("bucket")
    )
