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

- q221 DSIR importance-weighted data selection (VERDICT r07 #2, Xie
  et al. 2023 "Data Selection for Language Models via Importance
  Resampling"): hashed-n-gram bag features (md5 buckets, the
  determinism-contract slice), target-vs-raw importance log-ratios in
  exact micro-nat integers (the q160/q172 discipline), per-doc
  weights, and a token-budget top-selection through the q211
  sort-free rank + bucketed cumsum.

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


# --------------------------------------------------------------------------
# Q221 — DSIR importance-weighted data selection
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 256  # hashed n-gram feature buckets (B)
_DSIR_BUDGET = 8_000  # token budget for the selection prefix
_DSIR_SEL_BUCKETS = 256  # range buckets for the sort-free cumsum

_DSIR_ORACLE = f"""
WITH d AS (SELECT doc_id, lang,
                  regexp_extract_all(lower(text), '[a-z]+') AS ws
           FROM documents),
g AS (SELECT doc_id, lang, unnest(ws) AS g FROM d
      UNION ALL
      SELECT doc_id, lang,
             unnest(list_transform(range(2, len(ws) + 1),
                                   i -> ws[i-1] || ' ' || ws[i])) AS g
      FROM d),
hb AS (SELECT doc_id, lang,
              CAST(('0x' || substr(md5(g), 1, 13)) AS BIGINT)
                % {_DSIR_BUCKETS} AS b
       FROM g),
db AS (SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS c
       FROM hb GROUP BY 1, 2, 3),
tb AS (SELECT b,
              CAST(sum(CASE WHEN lang = 'en' THEN c ELSE 0 END)
                   AS BIGINT) AS t_b,
              CAST(sum(c) AS BIGINT) AS r_b
       FROM db GROUP BY 1),
tot AS (SELECT CAST(sum(t_b) AS BIGINT) AS t,
               CAST(sum(r_b) AS BIGINT) AS r FROM tb),
lr AS (SELECT b,
              CAST(floor(ln((CAST(t_b + 1 AS DOUBLE)
                             / CAST(r_b + 1 AS DOUBLE))
                            * (CAST(r + {_DSIR_BUCKETS} AS DOUBLE)
                               / CAST(t + {_DSIR_BUCKETS} AS DOUBLE)))
                         * 1000000.0 + 0.5) AS BIGINT) AS lr
       FROM tb CROSS JOIN tot),
w AS (SELECT db.doc_id, CAST(sum(db.c * lr.lr) AS BIGINT) AS logw
      FROM db JOIN lr USING (b)
      WHERE db.lang <> 'en'
      GROUP BY 1),
pool AS (SELECT w.doc_id, d2.lang, d2.n_toks, w.logw
         FROM w JOIN (SELECT doc_id, lang,
                             CAST(len(ws) AS BIGINT) AS n_toks
                      FROM d) d2 USING (doc_id)),
r2 AS (SELECT *,
              row_number() OVER (ORDER BY logw DESC,
                                 md5(CAST(doc_id AS VARCHAR)),
                                 doc_id) AS rk
       FROM pool),
c2 AS (SELECT *,
              sum(n_toks) OVER (ORDER BY rk
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
       FROM r2),
sel AS (SELECT * FROM c2 WHERE cum <= {_DSIR_BUDGET})
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_selected,
       CAST(sum(n_toks) AS BIGINT) AS tokens_selected,
       CAST(min(logw) AS BIGINT) AS min_logw_unat,
       CAST(max(logw) AS BIGINT) AS max_logw_unat
FROM sel GROUP BY lang ORDER BY lang
"""


@register(
    "q221_dsir_selection",
    _DSIR_ORACLE,
    "DSIR importance-weighted data selection (Xie et al. 2023): score "
    "every candidate document by how target-like its hashed-n-gram "
    "distribution is, then take the best docs under a token budget. "
    "Features are unigram+bigram md5-hash buckets (B=256, the "
    "determinism-contract 52-bit md5 slice); the target distribution "
    "is the lang='en' subcorpus, raw is the whole corpus, and the "
    "per-bucket importance log-ratio ln(((T_b+1)/(R_b+1)) * "
    "((R+B)/(T+B))) is quantized ONCE to integer micro-nats (q160/"
    "q172 discipline) — the argument is computed as a product of two "
    "double divisions so it never overflows BIGINT at warehouse "
    "scale. Per-doc weight = SUM(count_b * lr_b), exact integers. "
    "Selection reuses q211's machinery end to end: sort-free "
    "skewed_count_rank on the (min-shifted) weight with md5 tie "
    "order, then the 256-range-bucket broadcast-offset cumsum — the "
    "only unpartitioned windows are constant-bounded offset tables. "
    "The lr table is B-bounded (256 rows) and broadcast to the "
    "doc-bucket counts: the scoring pass is one shuffle-free map-side "
    "join however large the corpus",
)
def q221(spark, sf_dir):
    from pyspark.sql import Window

    from snowflake_cdc_spark.operators.rank import skewed_count_rank

    docs = _t(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    d = docs.select("doc_id", "lang", ws.alias("ws"))
    n = F.size("ws")
    uni = d.select("doc_id", "lang", F.explode("ws").alias("g"))
    big = d.filter(n >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, n - 1),
                F.slice(F.col("ws"), 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("g"),
    )
    grams = uni.unionByName(big)
    b = (
        F.conv(F.substring(F.md5("g"), 1, 13), 16, 10).cast("long")
        % _DSIR_BUCKETS
    )
    db = grams.withColumn("b", b).groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tb = db.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("t_b"),
        F.sum("c").cast("bigint").alias("r_b"),
    )
    tot = tb.agg(
        F.sum("t_b").cast("bigint").alias("t"),
        F.sum("r_b").cast("bigint").alias("r"),
    )
    ratio = (
        (F.col("t_b") + 1).cast("double") / (F.col("r_b") + 1).cast("double")
    ) * (
        (F.col("r") + _DSIR_BUCKETS).cast("double")
        / (F.col("t") + _DSIR_BUCKETS).cast("double")
    )
    lr = tb.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(F.log(ratio) * 1000000.0 + 0.5).cast("bigint").alias("lr"),
    )
    w = (
        db.filter(F.col("lang") != "en")
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lr")).cast("bigint").alias("logw"))
    )
    pool = w.join(
        d.select("doc_id", "lang", n.cast("bigint").alias("n_toks")),
        "doc_id",
    )
    # skewed_count_rank needs a positive integer count: min-shift the
    # weight (monotone, so the (logw DESC, md5, id) order is unchanged)
    m = pool.agg(F.min("logw").alias("__m"))
    shifted = pool.crossJoin(F.broadcast(m)).withColumn(
        "score", F.col("logw") - F.col("__m") + 1
    )
    ranked = skewed_count_rank(
        shifted, "score", "doc_id", ascending=False, rank_col="rk"
    )
    cnt = pool.agg(F.count(F.lit(1)).alias("__n"))
    keyed = (
        ranked.crossJoin(F.broadcast(cnt))
        .withColumn(
            "__rb",
            F.expr(f"CAST(((rk - 1) * {_DSIR_SEL_BUCKETS}) DIV __n AS BIGINT)"),
        )
        .localCheckpoint(eager=True)  # both branches read the rank subtree
    )
    per_bucket = keyed.groupBy("__rb").agg(F.sum("n_toks").alias("__bt"))
    offsets = per_bucket.select(
        "__rb",
        (F.sum("__bt").over(Window.orderBy("__rb")) - F.col("__bt")).alias(
            "__off"
        ),
    )
    w_intra = (
        Window.partitionBy("__rb")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = (
        keyed.join(F.broadcast(offsets), "__rb")
        .withColumn("cum", F.col("__off") + F.sum("n_toks").over(w_intra))
        .filter(F.col("cum") <= _DSIR_BUDGET)
    )
    return (
        sel.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_selected"),
            F.sum("n_toks").cast("bigint").alias("tokens_selected"),
            F.min("logw").cast("bigint").alias("min_logw_unat"),
            F.max("logw").cast("bigint").alias("max_logw_unat"),
        )
        .orderBy("lang")
    )
