"""Round-7 extension lanes — tokenizer-aware shaping of the training
pipeline:

- q209 BPE-token sequence packing (VERDICT r06 #6): the q114
  concat-and-chunk packer re-run at REAL trained-tokenizer
  granularity, composing the exact q145/q146 BPE lane.

All lanes keep the standing disciplines: token-identical DuckDB
oracles (BPE token counts are exact integers, so the composition
inherits the complete oracle), md5-only randomness, no global sorts
(the packer's only ordered region is the per-bucket prefix sum; the
BPE rounds touch vocab-sized relations only).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.bpe import (
    _bpe_chain_ctes,
    apply_bpe,
    train_bpe,
    word_frequencies,
)
from snowflake_cdc_spark.operators.packing import packing_stats
from snowflake_cdc_spark.queries import _t, register

# --------------------------------------------------------------------------
# Q209 — tokenizer-aware sequence packing (q114 × q145/q146)
# --------------------------------------------------------------------------


def _bpe_packing_oracle(
    rounds: int = 8, capacity: int = 2048, n_buckets: int = 16
) -> str:
    """q114's packing decomposition with per-doc token counts from the
    q145/q146 BPE chain instead of whitespace splitting. Documents with
    no [a-z]+ words keep n_tokens = 0 via the LEFT join — every doc
    gets a shard assignment."""
    ctes = _bpe_chain_ctes(rounds, "documents")
    ctes.append(
        f"tok AS (SELECT word, CAST(len(string_split(w, chr(30))) - 1 AS BIGINT) "
        f"AS n_tok FROM w{rounds})"
    )
    ctes.append(
        "docw AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word "
        "FROM documents)"
    )
    ctes.append(
        "dw AS (SELECT doc_id, CAST(sum(n_tok) AS BIGINT) AS n_tokens "
        "FROM docw JOIN tok USING (word) GROUP BY 1)"
    )
    ctes.append(
        "perdoc AS (SELECT d.doc_id, coalesce(dw.n_tokens, 0) AS n_tokens, "
        "CAST(CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) "
        f"AS UBIGINT) % {n_buckets} AS BIGINT) AS bucket "
        "FROM documents d LEFT JOIN dw ON dw.doc_id = d.doc_id)"
    )
    ctes.append(
        "c AS (SELECT bucket, doc_id, n_tokens, "
        "sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
        "FROM perdoc)"
    )
    ctes.append(
        "p AS (SELECT bucket, n_tokens, "
        f"CAST(floor((cum - n_tokens) / {capacity}.0) AS BIGINT) AS first_bin, "
        f"CAST(greatest(floor((cum - n_tokens) / {capacity}.0), "
        f"floor((cum - 1) / {capacity}.0)) AS BIGINT) AS last_bin "
        "FROM c)"
    )
    return (
        f"WITH {', '.join(ctes)} "
        "SELECT bucket, count(*) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, "
        f"CAST(ceil(sum(n_tokens) / {capacity}.0) AS BIGINT) AS n_bins, "
        "CAST(sum(CASE WHEN first_bin <> last_bin THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_split_docs, "
        f"CAST(CAST(ceil(sum(n_tokens) / {capacity}.0) AS BIGINT) * {capacity} "
        "- sum(n_tokens) AS BIGINT) AS pad_tokens "
        "FROM p GROUP BY bucket ORDER BY bucket"
    )


@register(
    "q209_bpe_packing",
    _bpe_packing_oracle(),
    "tokenizer-aware sequence packing (VERDICT r06 #6, q114 × "
    "q145/q146): shard and window budgets measured in REAL trained-"
    "tokenizer tokens — the number a training job actually consumes — "
    "instead of whitespace tokens. Eight BPE merges are learned on the "
    "word-frequency table (corpus scanned once; every training round "
    "touches vocab-sized relations), applied at VOCAB level, broadcast-"
    "joined back to per-doc word streams for exact per-document BIGINT "
    "token counts (docs with no [a-z]+ words keep count 0 via the LEFT "
    "join — every doc is packed), then the q114 packer assigns 2048-"
    "BPE-token context windows inside 16 md5 shards. The whole "
    "composition is exact integer algebra end to end, so the oracle "
    "re-derives the merges (q145 CTE chain), the tokenization, every "
    "per-doc count, and the identical packing prefix sums",
)
def q209(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    words = word_frequencies(docs)
    merges = train_bpe(words, rounds=8).collect()
    tok = apply_bpe(words, [tuple(m) for m in merges])
    docw = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    dw = (
        docw.join(F.broadcast(tok), "word")
        .groupBy("doc_id")
        .agg(F.sum("n_bpe_tokens").cast("bigint").alias("n_tokens"))
    )
    perdoc = (
        docs.select("doc_id")
        .join(dw, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_toks"),
        )
    )
    return packing_stats(perdoc, "doc_id", "n_toks", capacity=2048, n_buckets=16)
