"""Exact-substring duplicate-span detection (Lee et al., "Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499 — the
suffix-array ExactSubstr variant, re-expressed for a distributed
engine; reference parity: the reference's pipeline stages at
``add_output.py:421-448`` land raw CDC text that a downstream curation
run dedups exactly like this).

``chunk_dedup.py`` removes duplicates at a FIXED chunk grid: a span
repeated at a different word offset in two documents never aligns to
the same chunk boundaries and escapes. This operator detects repeated
spans at ARBITRARY boundaries:

- every ``k``-word window (overlapping shingle, stride 1) is hashed;
- a window whose hash occurs ≥2 times corpus-wide is a *duplicated
  window*; the corpus-wide FIRST occurrence (smallest ``(doc_id,
  pos)``) is the keeper, every other occurrence is *removable* —
  exactly the keep-first contract of ``chunk_dedup`` / Lee et al.;
- per document, removable windows are merged into MAXIMAL spans of
  covered word positions (gaps-and-islands over window starts: two
  windows merge when their covered ranges touch, ``pos ≤ prev_end+1``)
  — the arbitrary-boundary part: a 37-word repeat surfaces as one
  37-word span wherever it starts.

Any repeated substring of ``≥ k`` words contains only duplicated
windows, so it is covered end-to-end; substrings ``< k`` words are
below the resolution (the standard ExactSubstr min-match-length knob,
50 BPE tokens in the paper).

Scale notes (100 TB): posting volume is ~1 row per corpus WORD — the
single data-wide shuffle hashes ``(shingle_hash, doc_id, pos)`` to
rank first-occurrences; there is NO global sort and the per-bucket
sort is bounded by one shingle's occurrence count (hot boilerplate
shingles are exactly the skew AQE splits, as in ``chunk_dedup``).
Span merging shuffles only the REMOVABLE windows (the duplicated
fraction) partitioned by doc. For corpora where even 1-row-per-word is
too much, :func:`duplicate_spans_minimized` is the winnowing scale
path (Schleimer et al., SIGMOD'03): per-document minimizer selection
(expression-level, no shuffle) cuts the exploded volume to ~2/(w+1)
of the words; docs sharing a repeated minimizer are candidates, and
the exact lane reruns on candidates only. Guarantees (both fuzz-tested
against the exact lane in ``tests/test_substring_dedup.py``):

- *soundness*: every word position the minimized lane marks duplicated
  is marked by the exact lane (candidate-restricted first-occurrence
  ranking can only PROMOTE occurrences to keeper, never demote);
- *completeness*: every NON-FIRST copy of a repeated span of
  ``≥ k+w-1`` words is fully covered (each copy then contains a whole
  minimizer window over identical content, so all its docs are
  anchored, and the earliest candidate copy out-ranks the later ones
  window by window) — the keep-first contract's removal set is intact
  at and above the length bound; shorter spans are removed when their
  docs happen to be anchored anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "shingle_windows",
    "duplicate_spans",
    "duplicate_spans_minimized",
]


def _words(text_col: str):
    return F.split(F.col(text_col), " ")


def shingle_windows(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """``(id_col, pos, sh)``: every k-word window's md5, stride 1,
    0-based word position. One projection + explode, no shuffle; docs
    shorter than ``k`` words contribute no windows."""
    words = _words(text_col)
    n = F.size(words)
    wins = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.md5(F.concat_ws(" ", F.slice(words, i + 1, k))).alias("sh"),
            ),
        ),
    ).otherwise(F.array())
    return docs.select(F.col(id_col), F.explode(wins).alias("_w")).select(
        id_col, "_w.pos", "_w.sh"
    )


def _spans_from_windows(
    docs: DataFrame,
    windows: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
) -> DataFrame:
    """Shared tail: rank first-occurrence per shingle, merge removable
    windows into maximal spans, report per doc (docs with no removable
    span report 0/0)."""
    first = Window.partitionBy("sh").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    ranked = windows.withColumn("_rn", F.row_number().over(first)).withColumn(
        "_cnt", F.count(F.lit(1)).over(Window.partitionBy("sh"))
    )
    removable = ranked.filter((F.col("_cnt") >= 2) & (F.col("_rn") > 1)).select(
        id_col, "pos"
    )

    # gaps-and-islands over window STARTS: windows cover [pos, pos+k-1];
    # a new island starts when this window's range no longer touches the
    # running coverage (pos > max(prev pos)+k: prev_end+1 = prev_pos+k)
    byd = Window.partitionBy(id_col).orderBy("pos")
    prev_max = F.max("pos").over(byd.rowsBetween(Window.unboundedPreceding, -1))
    islanded = removable.withColumn(
        "_new",
        F.when(prev_max.isNull() | (F.col("pos") > prev_max + k), 1).otherwise(0),
    ).withColumn(
        "_isl",
        F.sum("_new").over(byd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islanded.groupBy(id_col, "_isl").agg(
        F.min("pos").alias("s"), (F.max("pos") + k - 1).alias("e")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("n_dup_words"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "e"))),
                    lambda x: F.concat_ws(
                        ":", x["s"].cast("string"), x["e"].cast("string")
                    ),
                ),
            )
        ).alias("spans_md5"),
    )
    base = docs.select(
        F.col(id_col), F.size(_words(text_col)).cast("bigint").alias("n_words")
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_words",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("n_dup_words", F.lit(0)).cast("bigint").alias("n_dup_words"),
            F.coalesce("spans_md5", F.md5(F.lit(""))).alias("spans_md5"),
        )
    )


def duplicate_spans(
    docs: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Exact lane: per-document report of maximal removable duplicated
    spans at word granularity.

    Returns ``(id_col, n_words, n_spans, n_dup_words, spans_md5)`` —
    ``spans_md5`` hashes the ordered ``start:end`` list (md5('') when
    no span), so the full span structure is oracle-checkable, not just
    the counts."""
    return _spans_from_windows(
        docs, shingle_windows(docs, id_col, text_col, k), id_col, text_col, k
    )


def minimizer_anchors(
    docs: DataFrame, id_col: str, text_col: str, k: int, w: int
) -> DataFrame:
    """``(id_col, pos, sh)`` winnowing minimizers: for each run of ``w``
    consecutive window hashes, the (leftmost) minimal hash is selected.
    Entirely expression-level per document — no shuffle, no explode of
    the full shingle stream; output volume ≈ 2/(w+1) of the words."""
    words = _words(text_col)
    n = F.size(words)
    sh_arr = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    docs = docs.select(F.col(id_col), sh_arr.alias("_sh"))
    m = F.size(F.col("_sh"))
    # windows of w hashes; short docs (fewer than w windows) anchor on
    # their single global minimum so no doc is invisible to the index
    sel = F.when(
        m >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), m - w),
                lambda j: F.struct(
                    (
                        j
                        + F.array_position(
                            F.slice(F.col("_sh"), j + 1, w),
                            F.array_min(F.slice(F.col("_sh"), j + 1, w)),
                        )
                        - 1
                    )
                    .cast("int")
                    .alias("pos"),
                    F.array_min(F.slice(F.col("_sh"), j + 1, w)).alias("sh"),
                ),
            )
        ),
    ).otherwise(
        F.when(
            m >= 1,
            F.array(
                F.struct(
                    (F.array_position(F.col("_sh"), F.array_min(F.col("_sh"))) - 1)
                    .cast("int")
                    .alias("pos"),
                    F.array_min(F.col("_sh")).alias("sh"),
                )
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,sh:string>>"))
    )
    return docs.select(F.col(id_col), F.explode(sel).alias("_m")).select(
        id_col, "_m.pos", "_m.sh"
    )


def duplicate_spans_minimized(
    docs: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """Winnowing scale path: anchor candidate documents through the
    minimizer index, then run the exact lane on candidates only.

    Output rows are IDENTICAL to :func:`duplicate_spans` for every
    document containing a span of ``≥ k+w-1`` words (guaranteed
    anchored); non-candidate docs report 0 spans. Shorter cross-doc
    spans are reported exactly when both endpoint docs are anchored —
    the documented operating point, equivalence fuzz-tested in
    ``tests/test_substring_dedup.py``."""
    anchors = minimizer_anchors(docs, id_col, text_col, k, w)
    # an anchor value seen at ≥2 distinct (doc, pos) slots marks every
    # doc holding it as a candidate (intra-doc repeats anchor too:
    # two positions in one doc)
    dup_anchor = (
        anchors.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("sh")
    )
    cand_ids = (
        anchors.join(dup_anchor, "sh", "left_semi").select(id_col).distinct()
    )
    cand_docs = docs.join(cand_ids, id_col, "left_semi")
    got = _spans_from_windows(
        cand_docs,
        shingle_windows(cand_docs, id_col, text_col, k),
        id_col,
        text_col,
        k,
    )
    rest = docs.join(cand_ids, id_col, "left_anti").select(
        F.col(id_col),
        F.size(_words(text_col)).cast("bigint").alias("n_words"),
        F.lit(0).cast("bigint").alias("n_spans"),
        F.lit(0).cast("bigint").alias("n_dup_words"),
        F.md5(F.lit("")).alias("spans_md5"),
    )
    return got.unionByName(rest)
