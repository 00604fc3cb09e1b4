"""Round-5 extension q171+: the remaining training-data curation lanes
from the round-4 verdict — exact-substring duplicate-span detection at
arbitrary boundaries (the Lee et al. ExactSubstr mode chunk_dedup's
fixed grid cannot express) and a smoothed bigram language-model
perplexity filter extending q160's unigram surprisal.

Reference parity: the reference (``add_output.py:421-448``) lands raw
CDC text into the warehouse; these are the corpus-hygiene passes a
training-data pipeline runs over that landing zone daily.

Determinism contract (memory: determinism-contract): pure integer word
positions and counts; span structure hashed as md5 of the ordered
``start:end`` list; LM scores quantized to exact integer micro-nats
before any cross-engine compare (the q160 discipline) — the only libm
call is ``ln``, computed on integer ratios both engines derive from
identical counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.substring_dedup import duplicate_spans
from snowflake_cdc_spark.queries import _t, register

# --------------------------------------------------------------------------
# Q171 — exact-substring duplicate spans (suffix-array-style dedup,
# arbitrary boundaries; operators/substring_dedup.py)
# --------------------------------------------------------------------------

_SUBSTR_ORACLE = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws,
                  len(string_split(text, ' ')) AS n
           FROM documents),
w AS (SELECT doc_id, unnest(generate_series(0, n - 8)) AS pos, ws
      FROM d WHERE n >= 8),
sh AS (SELECT doc_id, pos,
              array_to_string(ws[pos + 1 : pos + 8], ' ') AS s
       FROM w),
r AS (SELECT doc_id, pos,
             row_number() OVER (PARTITION BY s ORDER BY doc_id, pos) AS rn,
             count(*) OVER (PARTITION BY s) AS c
      FROM sh),
rem AS (SELECT doc_id, pos FROM r WHERE c >= 2 AND rn > 1),
isl AS (SELECT doc_id, pos,
               CASE WHEN pos > coalesce(max(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1000000) + 8
                    THEN 1 ELSE 0 END AS brk
        FROM rem),
isl2 AS (SELECT doc_id, pos,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
         FROM isl),
sp AS (SELECT doc_id, g, min(pos) AS s, max(pos) + 7 AS e
       FROM isl2 GROUP BY 1, 2),
pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
              CAST(sum(e - s + 1) AS BIGINT) AS n_dup_words,
              md5(string_agg(CAST(s AS VARCHAR) || ':' || CAST(e AS VARCHAR),
                             ',' ORDER BY s)) AS spans_md5
       FROM sp GROUP BY 1)
SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_words,
       coalesce(pd.n_spans, 0) AS n_spans,
       coalesce(pd.n_dup_words, 0) AS n_dup_words,
       coalesce(pd.spans_md5, md5('')) AS spans_md5
FROM d LEFT JOIN pd USING (doc_id)
ORDER BY doc_id
"""


@register(
    "q171_substring_dedup",
    _SUBSTR_ORACLE,
    "Exact-substring duplicate-span report (operators/substring_dedup.py; "
    "Lee et al. ExactSubstr, arXiv:2107.06499): every 8-word window is "
    "hashed, windows repeated corpus-wide mark their non-first occurrences "
    "removable (keep-first = smallest (doc_id,pos), the chunk_dedup "
    "contract), and removable windows merge into MAXIMAL spans at "
    "arbitrary word boundaries via per-doc gaps-and-islands — a repeat at "
    "a shifted offset that chunk_dedup's fixed grid misses surfaces here "
    "as one exact span. ONE data-wide shuffle (first-occurrence ranking "
    "partitioned by window hash, per-bucket sort bounded by one hash's "
    "occurrence count); span merging shuffles only the removable windows. "
    "Spark hashes windows (md5) while the oracle keys on raw window TEXT "
    "— the hash family drops out of the result, so the check pins "
    "semantics, not hashing. spans_md5 hashes the ordered start:end list, "
    "making the full span structure cross-engine-checkable. The winnowed "
    "minimizer lane (duplicate_spans_minimized) is the 100 TB path: "
    "~2/(w+1) of the postings, soundness + >=k+w-1 completeness "
    "fuzz-tested in tests/test_substring_dedup.py",
)
def q171(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return duplicate_spans(docs, "doc_id", "text", k=8).orderBy("doc_id")
