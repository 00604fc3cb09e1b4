"""Exact phrase search over positional postings — the IR lane beside
BM25 (q130) and the dedup/fingerprint family: find every occurrence of
a multi-word phrase in a document corpus without re-scanning full text
per query.

The shipped form is an **offset vote**: tokenize once, keep only
postings of words that appear in ANY queried phrase (scan-side filter —
the exploded relation never materializes the full vocabulary), map each
posting to the phrase-start position it would imply for each (phrase,
offset) slot its word fills, then ONE groupBy over (phrase, doc, start)
counting filled slots — a start where every slot of an m-word phrase is
filled is an exact occurrence. Properties that matter at 100 TB:

- ONE data-wide shuffle for ALL phrases together (the classic m-way
  postings-intersection join chain is m-1 shuffles PER phrase);
- overlapping occurrences and repeated phrase words fall out correctly:
  a posting fills every slot its word occupies ("table table" over
  "table table table" yields both starts);
- the slot map is a broadcast literal (phrases are query-sized), so the
  only exchange is the vote aggregation, partitioned by (phrase, doc,
  start) — no skew beyond the corpus' own word skew, and a stopword-
  heavy phrase can be prefiltered by its rarest word's doc set before
  the vote when that ever dominates (documented, not needed here).

Pure integer positions and counts end-to-end — nothing to quantize.
The oracle runs the INDEPENDENT window-scan algorithm (every k-window
of every doc compared to the phrase), so the cross-engine hash check
proves the postings formulation equivalent to the definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD


def phrase_search(
    docs: DataFrame,
    phrases: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(phrase, doc_id, n_occ, first_pos) for every document containing
    each phrase; positions are 1-based token indexes; overlapping
    occurrences all count. ``phrases`` maps a label -> space-separated
    lowercase phrase."""
    slot_rows = []  # (word, phrase_label, offset, m)
    for label, phrase in phrases.items():
        words = phrase.split()
        for off, w in enumerate(words):
            slot_rows.append((w, label, off, len(words)))
    slots = F.broadcast(
        docs.sparkSession.createDataFrame(
            slot_rows, "w string, phrase string, off int, m int"
        )
    )
    wanted = sorted({r[0] for r in slot_rows})

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(UNICODE_WORD), 0)
        ).alias("pos", "w"),
    ).filter(F.col("w").isin(wanted))

    votes = toks.join(slots, "w").select(
        "phrase",
        "doc_id",
        (F.col("pos") - F.col("off")).alias("start"),
        "m",
    )
    hits = (
        votes.groupBy("phrase", "doc_id", "start", "m")
        .agg(F.count(F.lit(1)).alias("filled"))
        .filter(F.col("filled") == F.col("m"))
    )
    return hits.groupBy("phrase", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        (F.min("start") + F.lit(1)).cast("bigint").alias("first_pos"),
    )
