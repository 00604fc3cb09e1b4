"""Corpus-wide chunk-level exact dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better" — the practical word-window
variant of suffix-array substring dedup).

Doc-level dedup (operators/dedup.py) drops whole documents; real crawls
also repeat *spans* across otherwise-distinct documents (boilerplate
headers, license blocks, quoted passages). This operator splits each
document into consecutive ``chunk_words``-word windows, keeps only the
corpus-wide FIRST occurrence of each distinct chunk (first = smallest
``(doc_id, chunk_idx)``), and reassembles the surviving text per
document.

Scale notes: the only data-wide shuffle is the first-occurrence window,
partitioned by the chunk hash — at 100 TB that is a hash repartition of
(chunk_hash, doc_id, chunk_idx, chunk) tuples with no global sort; the
per-bucket sort is bounded by the occurrence count of one chunk.
Reassembly groups by doc_id (second shuffle) carrying only surviving
chunks; ``sort_array(collect_list(struct(idx, chunk)))`` restores
order deterministically without a window. Hot chunks (the boilerplate
that motivates the operator) concentrate on one bucket each; the window
computes only row_number==1, which AQE skew-split handles because rank
within a duplicate-chunk group only needs the bucket-local order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["explode_chunks", "chunk_dedup"]


def explode_chunks(
    docs: DataFrame, id_col: str, text_col: str, chunk_words: int
) -> DataFrame:
    """``(id_col, chunk_idx, chunk)`` — consecutive word windows, last
    window ragged. Single projection, no shuffle."""
    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(words, i * chunk_words + 1, chunk_words)
            ).alias("chunk"),
        ),
    )
    return docs.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).select(id_col, "_c.chunk_idx", "_c.chunk")


def chunk_dedup(
    docs: DataFrame, id_col: str, text_col: str, chunk_words: int = 16
) -> DataFrame:
    """Per-document dedup report after corpus-wide chunk dedup.

    Returns ``(id_col, n_chunks, n_kept, kept_md5)`` where ``kept_md5``
    is the md5 of the surviving text (space-joined surviving chunks in
    original order; md5('') for fully-deduplicated documents).
    """
    chunks = explode_chunks(docs, id_col, text_col, chunk_words)
    first = Window.partitionBy("chunk").orderBy(
        F.col(id_col).asc(), F.col("chunk_idx").asc()
    )
    ranked = chunks.withColumn("_rn", F.row_number().over(first))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("_rn") == 1).cast("bigint")).alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.when(
                                    F.col("_rn") == 1,
                                    F.struct("chunk_idx", "chunk"),
                                )
                            )
                        ),
                        lambda s: s["chunk"],
                    ),
                )
            ).alias("kept_md5"),
        )
    )
