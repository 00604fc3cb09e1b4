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
from snowflake_cdc_spark.operators.util import ckpt_lazy

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

    # materialize the piece counts once (round 11): rangebucket_rank
    # reads its input from three plan branches (extent agg, intra-bucket
    # rank, bucket counts), so the substring explode + groupBy subtree
    # would otherwise execute ~3x for the one vocab collect
    pc = pc.transform(ckpt_lazy)
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


# ---------------------------------------------------------------- paths

CHOICE = 8  # piece-length slot: l <= MAX_PLEN < 8


def viterbi_segment_paths(
    wt: DataFrame,
    vc: DataFrame,
    max_wlen: int = MAX_WLEN,
    max_plen: int = MAX_PLEN,
) -> DataFrame:
    """(w, c, core, segmentation): like ``viterbi_segment`` but with the
    winning PIECE SEQUENCE reconstructed, not just its cost — the
    tokenizer's user-facing output. The DP encodes the argmin choice in
    the low bits (comp = CHOICE*(SCALE*cost + n_tokens) + l, so min is
    lexicographic (cost, n_tokens, smallest piece length) and the
    backtrack is pure positive-integer arithmetic), then an unrolled
    walk from position length(w) down prepends each chosen piece to the
    segmentation string. Everything stays JVM expressions over the
    distinct-word relation; Generate barriers seal both the DP and the
    backtrack against Catalyst's project-collapse inlining."""
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
            prev_core = (
                F.lit(0).cast("bigint")
                if i - l == 0
                else F.expr(f"c{i - l} div {CHOICE}")
            )
            terms.append(
                (
                    prev_core
                    + SCALE
                    * F.coalesce(
                        F.try_element_at(
                            "m",
                            F.col("w").substr(F.lit(i - l + 1), F.lit(l)),
                        ),
                        F.lit(INF),
                    )
                    + 1
                )
                * CHOICE
                + l
            )
        d = d.withColumn(
            f"c{i}", F.least(*terms) if len(terms) > 1 else terms[0]
        )
        if i % 3 == 0:
            d = _barrier(d)
    d = d.select(
        "w",
        "c",
        F.array(*[F.col(f"c{i}") for i in range(1, max_wlen + 1)]).alias(
            "cs"
        ),
    ).withColumn(
        "core",
        F.expr(f"element_at(cs, CAST(length(w) AS INT)) div {CHOICE}"),
    )
    # backtrack: walk pos from length(w) to 0, prepending each chosen
    # piece — left-to-right order falls out of the right-to-left walk
    d = d.withColumn("pos", F.length("w").cast("bigint")).withColumn(
        "seg", F.lit("")
    )
    for step in range(max_wlen):
        d = (
            d.withColumn(
                "li",
                F.when(
                    F.col("pos") > 0,
                    F.expr(
                        f"element_at(cs, CAST(pos AS INT)) % {CHOICE}"
                    ),
                ).otherwise(F.lit(0).cast("bigint")),
            )
            .withColumn(
                "seg",
                F.when(
                    F.col("pos") > 0,
                    F.concat(
                        F.expr("substring(w, CAST(pos - li + 1 AS INT),"
                               " CAST(li AS INT))"),
                        F.when(F.col("seg") == "", F.lit("")).otherwise(
                            F.lit(" ")
                        ),
                        F.col("seg"),
                    ),
                ).otherwise(F.col("seg")),
            )
            .withColumn("pos", F.col("pos") - F.col("li"))
            .drop("li")
        )
        if step % 3 == 2:
            d = _barrier(d)
    return d.select("w", "c", "core", F.col("seg").alias("segmentation"))
