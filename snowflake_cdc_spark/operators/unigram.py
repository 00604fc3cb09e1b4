"""Unigram-LM (SentencePiece-style) tokenizer — the third member of
the tokenizer family beside char-BPE and byte-BPE (operators/bpe.py):
vocabulary = the corpus's most frequent substrings (+ the single-char
closure so every word segments), segmentation = the Viterbi path
minimizing total piece cost, cost = -ln p(piece) quantized ONCE to
integer micro-nats (the NB idiom: one libm ln per vocab piece, pure
BIGINT after — cross-engine hash-safe).

Reference parity: the reference (add_output.py) is a REST control-plane
client with no tokenizer; this is part of the training-data surface the
engine adds (Kudo 2018, "Subword Regularization", simplified to the
frequency-initialized vocabulary without EM pruning rounds).

Spark-first shapes, all exact:

- ``piece_counts``: one map-side-combined groupBy over the
  DISTINCT-word relation — never per occurrence.
- ``costed_vocab``: the top-V rank rides ``rangebucket_rank`` (no
  global sort), and the winner set (<= V + |alphabet| rows, bounded by
  the PARAMETER, never the data) is collected once and rebroadcast as
  a literal — the BPE-merge / k-seed control-plane discipline; the
  corpus aggregation runs exactly once and no window reaches consumer
  plans.
- ``viterbi_segment``: the DP best[i] = min over l<=max_plen of
  best[i-l] + cost(substr(w, i-l+1, l)) runs as pure JVM EXPRESSIONS
  over the distinct-word relation, encoded in one BIGINT
  comp = SCALE*cost + n_tokens (n_tokens <= MAX_WLEN < SCALE, so
  min(comp) is lexicographic (cost, n_tokens) and the decode is
  positive-operand div/mod — no negative-division cross-engine traps).
  Catalyst collapses adjacent Projects and would inline each DP level
  into the next (max_plen^max_wlen expression blowup), so a Generate
  barrier (explode of a 1-element array) seals every 3 levels.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "MAX_PLEN",
    "MAX_WLEN",
    "SCALE",
    "VOCAB_SIZE",
    "INF",
    "pieces_of",
    "piece_counts",
    "costed_vocab",
    "viterbi_segment",
]

MAX_WLEN = 12
MAX_PLEN = 4
VOCAB_SIZE = 512
INF = 10**12
SCALE = 32


def pieces_of(w, max_plen: int = MAX_PLEN):
    """Array expression of ALL substrings of length 1..max_plen
    (duplicates kept — each occurrence weights the count)."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_plen), F.length(w) - i + 1)
                ),
                lambda l: w.substr(i, l),
            ),
        )
    )


def piece_counts(wt: DataFrame, max_plen: int = MAX_PLEN) -> DataFrame:
    """(piece, cnt): occurrence-weighted substring counts from the
    distinct-word relation ``wt(w, c)``."""
    return (
        wt.select(
            "c", F.explode(pieces_of(F.col("w"), max_plen)).alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("c").cast("bigint").alias("cnt"))
    )


def costed_vocab(
    spark: SparkSession, pc: DataFrame, vocab_size: int = VOCAB_SIZE
) -> DataFrame:
    """(piece, cnt, cost): top-``vocab_size`` pieces by (cnt DESC,
    piece) plus every single character, cost = -ln(cnt/total) in
    integer micro-nats — collected once (parameter-bounded model
    artifact) and returned as a literal relation."""
    from snowflake_cdc_spark.operators.rank import rangebucket_rank

    vr = rangebucket_rank(pc.withColumn("neg", -F.col("cnt")), "neg", "piece")
    vb = vr.filter(
        (F.col("rn") <= vocab_size) | (F.length("piece") == 1)
    ).select("piece", "cnt")
    vrows = sorted(vb.collect(), key=lambda r: r.piece)
    total = sum(r.cnt for r in vrows)
    return spark.createDataFrame(
        [
            (
                r.piece,
                r.cnt,
                int(math.floor(math.log(total / r.cnt) * 1000000.0 + 0.5)),
            )
            for r in vrows
        ],
        "piece string, cnt bigint, cost bigint",
    )


def _barrier(df: DataFrame) -> DataFrame:
    # Generate barrier: a 1-element explode seals the subtree against
    # Catalyst's project-collapse inlining (the codegen discipline)
    return df.select(
        F.explode(F.array(F.struct(*df.columns))).alias("s")
    ).select("s.*")


def viterbi_segment(
    wt: DataFrame,
    vc: DataFrame,
    max_wlen: int = MAX_WLEN,
    max_plen: int = MAX_PLEN,
) -> DataFrame:
    """(w, c, comp): per distinct word the minimum-cost segmentation
    into ``vc`` pieces, comp = SCALE*cost + n_tokens. ``wt`` rows with
    words longer than ``max_wlen`` are the caller's to filter."""
    pw = wt.select(
        "w",
        F.explode(F.array_distinct(pieces_of(F.col("w"), max_plen))).alias(
            "piece"
        ),
    )
    pm = (
        pw.join(F.broadcast(vc.select("piece", "cost")), "piece")
        .groupBy("w")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("piece", "cost"))
            ).alias("m")
        )
    )
    d = wt.join(pm, "w")
    for i in range(1, max_wlen + 1):
        terms = []
        for l in range(1, min(max_plen, i) + 1):
            prev = (
                F.lit(0).cast("bigint") if i - l == 0 else F.col(f"c{i - l}")
            )
            terms.append(
                prev
                + SCALE
                * F.coalesce(
                    F.try_element_at(
                        "m", F.col("w").substr(F.lit(i - l + 1), F.lit(l))
                    ),
                    F.lit(INF),
                )
                + 1
            )
        d = d.withColumn(
            f"c{i}", F.least(*terms) if len(terms) > 1 else terms[0]
        )
        if i % 3 == 0:
            d = _barrier(d)
    comp = F.element_at(
        F.array(*[F.col(f"c{i}") for i in range(1, max_wlen + 1)]),
        F.length("w").cast("int"),
    )
    return d.select("w", "c", comp.alias("comp"))
