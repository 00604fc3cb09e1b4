"""Round-8 extension lanes — multilingual correctness and
importance-weighted selection:

- q220 Unicode tokenization audit (VERDICT r07 #1): the per-script
  token census over planted Cyrillic/CJK/accented text, proving the
  repo's ASCII ``[a-z]+`` convention returns a DIFFERENT (wrong)
  answer on non-Latin corpora — the cyrillic/cjk rows carry
  ``ascii_capturable = 0`` while ``n_tokens > 0``. The planted rows
  are generated in-query from doc_id (the q119 PII pattern) so the
  fixture needn't change; the regex class and codepoint probes are
  the shared Java/RE2 subset (``functions/text.py::UNICODE_WORD``).

All lanes keep the standing disciplines: token-identical DuckDB
oracles, md5-only randomness, no global sorts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import (
    UNICODE_WORD,
    script_of,
)
from snowflake_cdc_spark.queries import _t, register

# --------------------------------------------------------------------------
# Q220 — Unicode tokenization audit (the multilingual lane)
# --------------------------------------------------------------------------

#: Deterministic multilingual augmentation: doc_id % 4 picks the planted
#: phrase, so every script bucket is populated at every SF without
#: touching the fixture. Uppercase forms exercise the cross-engine
#: ``lower`` contract (Cyrillic МИР, accented Zürich/Straße).
_PHRASES = [
    "Data Quality Report",
    "Привет МИР Москва Россия",
    "你好世界 数据 质量 审核",
    "Öl Über Étude Straße",
]

_UNICODE_ORACLE = f"""
WITH aug AS (SELECT lower(text || ' ' ||
                    CASE CAST(doc_id % 4 AS BIGINT)
                      WHEN 0 THEN '{_PHRASES[0]}'
                      WHEN 1 THEN '{_PHRASES[1]}'
                      WHEN 2 THEN '{_PHRASES[2]}'
                      ELSE '{_PHRASES[3]}' END) AS t
             FROM documents),
toks AS (SELECT unnest(regexp_extract_all(t, '[\\p{{L}}\\p{{M}}]+')) AS w
         FROM aug),
sc AS (SELECT w,
              CASE WHEN unicode(w) < 128 THEN 'latin'
                   WHEN unicode(w) < 1024 THEN 'latin_ext'
                   WHEN unicode(w) < 1280 THEN 'cyrillic'
                   WHEN unicode(w) >= 11904 THEN 'cjk'
                   ELSE 'other' END AS script
       FROM toks)
SELECT script,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT w) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN regexp_matches(w, '^[a-z]+$') THEN 1 ELSE 0 END)
            AS BIGINT) AS ascii_capturable
FROM sc
GROUP BY script
ORDER BY script
"""


@register(
    "q220_unicode_tokens",
    _UNICODE_ORACLE,
    "Unicode tokenization audit (VERDICT r07 #1): per-script token "
    "census of a deterministically multilingual-augmented corpus, "
    "tokenized with the \\p{L}\\p{M} letter-run class instead of the "
    "repo's ASCII [a-z]+ convention. ascii_capturable counts the "
    "tokens the ASCII lane would have seen: 0 on the cyrillic and cjk "
    "rows with n_tokens > 0 is the in-output proof that [a-z]+ "
    "silently zeroes every text metric on non-Latin corpora. Script "
    "bucketing is leading-codepoint ranges (Spark ascii ≡ DuckDB "
    "unicode) because Java and RE2 spell script CLASSES differently "
    "(\\p{IsCyrillic} vs \\p{Cyrillic}) — ranges are the shared "
    "subset. One projection + one explode + one map-side-combined "
    "aggregation: embarrassingly parallel, no window, no join.",
)
def q220(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    phrase = F.element_at(
        F.array(*[F.lit(p) for p in _PHRASES]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    aug = docs.select(
        F.lower(F.concat(F.col("text"), F.lit(" "), phrase)).alias("t")
    )
    toks = aug.select(
        F.explode(
            F.regexp_extract_all(F.col("t"), F.lit(UNICODE_WORD), F.lit(0))
        ).alias("w")
    )
    return (
        toks.withColumn("script", script_of("w"))
        .groupBy("script")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("w").cast("bigint").alias("n_distinct"),
            F.sum(
                F.when(F.col("w").rlike("^[a-z]+$"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("ascii_capturable"),
        )
        .orderBy("script")
    )
