"""Round-5 extension q171-q178: the remaining curation lanes from the
round-4 verdict plus corpus/governance diagnostics —

- q171 exact-substring duplicate spans at arbitrary boundaries (the
  Lee et al. ExactSubstr mode chunk_dedup's fixed grid cannot express;
  ``operators/substring_dedup.py``, winnowing scale path included);
- q172 held-out bigram LM perplexity scoring with stupid backoff
  (extends q160's unigram surprisal);
- q173 PMI collocations, q174 Zipf rank-frequency slope (corpus
  diagnostics);
- q175 exact median+MAD robust outliers, q176 blocked edit-distance
  fuzzy pairs (data quality);
- q177 k-anonymity audit, q178 Benford first-digit audit (governance).

Reference parity: the reference (``add_output.py:421-448``) lands raw
CDC text into the warehouse; these are the corpus-hygiene, quality and
governance passes a training-data pipeline runs over that landing zone
daily.

Determinism contract (memory: determinism-contract): pure integer word
positions, counts and ranks everywhere; span structure hashed as md5
of the ordered ``start:end`` list; every float-valued score (LM
probabilities, PMI, Benford expectation, log-log coordinates) is one
token-identical IEEE expression quantized ONCE to integer micro/milli
units before any sum or compare (the q160 discipline) — the only libm
call is ``ln`` on identically-derived doubles; digit extraction stays
in the integer domain (never double-to-string).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
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


# --------------------------------------------------------------------------
# Q172 — bigram LM perplexity filter with stupid backoff (held-out)
# --------------------------------------------------------------------------

_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+') AS ws
  FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(2, len(ws)),
                i -> struct_pack(prev := ws[i-1], cur := ws[i]))) AS b
  FROM toks WHERE len(ws) >= 2),
bge AS (SELECT doc_id, b.prev AS prev, b.cur AS cur FROM bg),
c2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2
       FROM bge WHERE doc_id % 2 = 0 GROUP BY 1, 2),
c1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
        FROM (SELECT doc_id, unnest(ws) AS w FROM toks WHERE doc_id % 2 = 0)
        GROUP BY 1),
nv AS (SELECT CAST(sum(cu) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
       FROM uni),
pos AS (
  SELECT s.doc_id,
         CASE WHEN c2.c2 IS NOT NULL
              THEN CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE)
              ELSE 0.4 * (CAST(coalesce(uni.cu, 0) AS DOUBLE) + 1.0)
                       / (CAST(nv.n AS DOUBLE) + CAST(nv.v AS DOUBLE))
         END AS score,
         CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END AS is_backoff
  FROM bge s
  LEFT JOIN c2 ON c2.prev = s.prev AND c2.cur = s.cur
  LEFT JOIN c1 ON c1.prev = s.prev
  LEFT JOIN uni ON uni.w = s.cur
  CROSS JOIN nv
  WHERE s.doc_id % 2 = 1),
scored AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(is_backoff) AS BIGINT) AS n_backoff,
         CAST(sum(CAST(floor(-ln(score) * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS total_unat
  FROM pos GROUP BY 1)
SELECT doc_id, n_bigrams, n_backoff, total_unat,
       total_unat // n_bigrams AS mean_unat
FROM (SELECT *, row_number() OVER (
        ORDER BY total_unat // n_bigrams DESC, doc_id) AS rn
      FROM scored)
WHERE rn <= 10 ORDER BY doc_id
"""


@register(
    "q172_bigram_lm_score",
    _BIGRAM_ORACLE,
    "Held-out bigram language-model scoring with stupid backoff (Brants "
    "et al., EMNLP'07 — the standard perplexity quality filter): the "
    "model trains on even doc_ids (bigram counts c2, context counts c1 "
    "= sum of c2 over continuations, +1-smoothed unigrams) and scores "
    "odd doc_ids, so unseen bigrams genuinely hit the backoff branch "
    "(0.4 * smoothed-unigram) instead of trivially matching their own "
    "counts. Extends q160's exact-integer discipline to a CONDITIONAL "
    "float: each position's score is one double division of exact "
    "BIGINT counts (or one backoff product), quantized ONCE to integer "
    "micro-nats, then summed order-free; ranking and the mean are "
    "integer ops. Bigrams are built array-side (zip_with of shifted "
    "slices) — no per-doc window shuffle; model tables join broadcast "
    "here (vocab-sized), bucketed/shuffle join at 100 TB vocabularies. "
    "n_backoff lands in the output, so the backoff path's firing count "
    "itself is hash-checked",
)
def q172(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit(UNICODE_WORD), 0)
    toks = docs.select("doc_id", ws.alias("ws"))
    n = F.size("ws")
    bge = (
        toks.filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, n - 1),
                    F.slice(F.col("ws"), 2, n - 1),
                    lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
                )
            ).alias("b"),
        )
        .select("doc_id", "b.prev", "b.cur")
    )
    train = bge.filter(F.col("doc_id") % 2 == 0)
    c2 = train.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    )
    c1 = c2.groupBy("prev").agg(F.sum("c2").cast("bigint").alias("c1"))
    uni = (
        toks.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    )
    nv = uni.agg(
        F.sum("cu").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    score = F.when(
        F.col("c2").isNotNull(),
        F.col("c2").cast("double") / F.col("c1").cast("double"),
    ).otherwise(
        F.lit(0.4)
        * (F.coalesce(F.col("cu"), F.lit(0)).cast("double") + F.lit(1.0))
        / (F.col("n").cast("double") + F.col("v").cast("double"))
    )
    pos = (
        bge.filter(F.col("doc_id") % 2 == 1)
        .join(F.broadcast(c2), ["prev", "cur"], "left")
        .join(F.broadcast(c1), "prev", "left")
        .join(F.broadcast(uni), F.col("cur") == F.col("w"), "left")
        .crossJoin(F.broadcast(nv))
        .select(
            "doc_id",
            F.floor(-F.log(score) * F.lit(1000000.0) + F.lit(0.5))
            .cast("bigint")
            .alias("unat"),
            F.col("c2").isNull().cast("bigint").alias("is_backoff"),
        )
    )
    scored = pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("is_backoff").cast("bigint").alias("n_backoff"),
        F.sum("unat").cast("bigint").alias("total_unat"),
    ).withColumn("mean_unat", F.expr("total_unat div n_bigrams"))
    # top-10 via orderBy().limit(): TakeOrderedAndProject (per-partition
    # top-k + driver merge) — identical rows to row_number()<=10 under
    # the same total order, with no single-partition global window
    # (VERDICT r05 #1)
    return (
        scored.orderBy(F.desc("mean_unat"), "doc_id")
        .limit(10)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Q173 — PMI collocations (corpus diagnostics)
# --------------------------------------------------------------------------

_PMI_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+') AS ws
  FROM documents),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
        FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY 1),
n1 AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM uni),
bg AS (
  SELECT unnest(list_transform(generate_series(2, len(ws)),
                i -> struct_pack(prev := ws[i-1], cur := ws[i]))) AS b
  FROM toks WHERE len(ws) >= 2),
c2 AS (SELECT b.prev AS prev, b.cur AS cur, CAST(count(*) AS BIGINT) AS c2
       FROM bg GROUP BY 1, 2),
n2 AS (SELECT CAST(sum(c2) AS BIGINT) AS n FROM c2),
pmi AS (
  SELECT prev, cur, c2,
         CAST(floor(ln((CAST(c2 AS DOUBLE) * CAST(n1.n AS DOUBLE)
                        * CAST(n1.n AS DOUBLE))
                       / (CAST(n2.n AS DOUBLE) * CAST(a.cu AS DOUBLE)
                          * CAST(b.cu AS DOUBLE)))
                    * 1000000.0 + 0.5) AS BIGINT) AS pmi_unat
  FROM c2
  JOIN uni a ON a.w = c2.prev
  JOIN uni b ON b.w = c2.cur
  CROSS JOIN n1 CROSS JOIN n2
  WHERE c2 >= 5)
SELECT prev, cur, c2 AS n_pair, pmi_unat
FROM (SELECT *, row_number() OVER (
        ORDER BY pmi_unat DESC, prev, cur) AS rn
      FROM pmi)
WHERE rn <= 25 ORDER BY prev, cur
"""


@register(
    "q173_pmi_collocations",
    _PMI_ORACLE,
    "Pointwise-mutual-information collocations (Church & Hanks 1990): "
    "the standard corpus-diagnostics ranking of word pairs that co-occur "
    "far above chance (named entities, fixed phrases — what a tokenizer "
    "or phrase-mining pass should learn). PMI = ln(p(a,b)/(p(a)p(b))) "
    "computed as ONE ln over a product/quotient of exact BIGINT counts "
    "written token-identically in both engines (left-assoc double "
    "multiplies, one division — the q155 bit-match discipline), then "
    "quantized once to integer micro-nats; min-support c2 >= 5 kills "
    "the low-count PMI explosion. Vocab-sized relations everywhere "
    "after the one corpus scan; top-25 by (pmi, prev, cur) total order",
)
def q173(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit(UNICODE_WORD), 0)
    toks = docs.select(ws.alias("ws"))
    uni = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    )
    n1 = uni.agg(F.sum("cu").cast("bigint").alias("n1"))
    n = F.size("ws")
    c2 = (
        toks.filter(n >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, n - 1),
                    F.slice(F.col("ws"), 2, n - 1),
                    lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
                )
            ).alias("b")
        )
        .select("b.prev", "b.cur")
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    n2 = c2.agg(F.sum("c2").cast("bigint").alias("n2"))
    pmi = (
        c2.filter(F.col("c2") >= 5)
        .join(F.broadcast(uni.select(F.col("w").alias("prev"), F.col("cu").alias("ca"))), "prev")
        .join(F.broadcast(uni.select(F.col("w").alias("cur"), F.col("cu").alias("cb"))), "cur")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "prev",
            "cur",
            F.col("c2").alias("n_pair"),
            F.floor(
                F.log(
                    (
                        F.col("c2").cast("double")
                        * F.col("n1").cast("double")
                        * F.col("n1").cast("double")
                    )
                    / (
                        F.col("n2").cast("double")
                        * F.col("ca").cast("double")
                        * F.col("cb").cast("double")
                    )
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("pmi_unat"),
        )
    )
    # top-25 via orderBy().limit(): TakeOrderedAndProject, not a
    # single-partition global window (VERDICT r05 #1)
    return (
        pmi.orderBy(F.desc("pmi_unat"), "prev", "cur")
        .limit(25)
        .orderBy("prev", "cur")
    )


# --------------------------------------------------------------------------
# Q174 — Zipf rank-frequency slope (corpus health diagnostic)
# --------------------------------------------------------------------------

_ZIPF_ORACLE = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+')) AS w
  FROM documents),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM toks GROUP BY 1),
ranked AS (
  SELECT CAST(floor(ln(CAST(row_number() OVER (ORDER BY cu DESC, w) AS DOUBLE))
                    * 1000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(cu AS DOUBLE)) * 1000.0 + 0.5) AS BIGINT) AS y
  FROM uni),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM ranked)
SELECT n AS n_vocab,
       n * sxy - sx * sy AS slope_num,
       n * sxx - sx * sx AS slope_den
FROM s
"""


@register(
    "q174_zipf_slope",
    _ZIPF_ORACLE,
    "Zipf rank-frequency slope (corpus health diagnostic: natural text "
    "runs slope ~ -1 in log-log; template/synthetic floods bend it): "
    "vocabulary ranked by the (count DESC, word) total order, ln(rank) "
    "and ln(count) quantized once to integer MILLI-nats (coarse enough "
    "that the OLS cross-products stay far from BIGINT overflow at "
    "100 TB vocabularies: x,y < 4e4 even at count 2^63, so n*Sxy fits "
    "to ~1e10 words), then the q162 exact-rational OLS: slope emitted "
    "as its (numerator, denominator) BIGINT pair — no float summation "
    "anywhere. One corpus scan, a SORT-FREE vocabulary rank "
    "(operators/rank.py skewed_count_rank: exact-count + md5 "
    "sub-buckets below cu=64, log2 buckets above — tied-count blocks "
    "rank in md5 order, invisible to the OLS statistics, so the "
    "oracle's (cu DESC, w) window aggregates identically), "
    "map-side-combined sufficient statistics",
)
def q174(spark, sf_dir):
    from snowflake_cdc_spark.operators.rank import skewed_count_rank

    docs = _t(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower(F.col("text")), F.lit(UNICODE_WORD), 0)
    uni = (
        docs.select(F.explode(ws).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    )
    # sort-free vocabulary rank (VERDICT r05 #1): exact-count buckets +
    # md5 sub-buckets below cu=64, log2 buckets above — never an
    # unpartitioned window over the whole vocabulary. Ranks inside a
    # tied-count block land in md5(w) order rather than w order, which
    # the OLS statistics cannot see (the block's rank SET is fixed and
    # y is constant per block — operators/rank.py tie-block contract),
    # so the oracle's (cu DESC, w) ranking aggregates identically
    ranked = skewed_count_rank(
        uni, "cu", "w", ascending=False, rank_col="__rn"
    ).select(
        F.floor(
            F.log(F.col("__rn").cast("double")) * F.lit(1000.0) + F.lit(0.5)
        )
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("cu").cast("double")) * F.lit(1000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    ).select(
        F.col("n").alias("n_vocab"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("slope_den"),
    )


# --------------------------------------------------------------------------
# Q175 — robust outlier report: exact median + MAD per group
# --------------------------------------------------------------------------

_MAD_ORACLE = """
WITH x AS (SELECT lang, n_chars AS v FROM documents),
r1 AS (SELECT lang, v,
              row_number() OVER (PARTITION BY lang ORDER BY v) AS rn,
              count(*) OVER (PARTITION BY lang) AS n
       FROM x),
med AS (SELECT lang, v AS m FROM r1 WHERE rn = (n + 1) // 2),
dev AS (SELECT x.lang, x.v, abs(x.v - med.m) AS d, med.m
        FROM x JOIN med USING (lang)),
r2 AS (SELECT lang, d, m,
              row_number() OVER (PARTITION BY lang ORDER BY d) AS rn,
              count(*) OVER (PARTITION BY lang) AS n
       FROM dev),
mad AS (SELECT lang, d AS mad FROM r2 WHERE rn = (n + 1) // 2)
SELECT dev.lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(dev.m) AS BIGINT) AS median,
       CAST(max(mad.mad) AS BIGINT) AS mad,
       CAST(sum(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad USING (lang)
GROUP BY 1 ORDER BY 1
"""


@register(
    "q175_mad_outliers",
    _MAD_ORACLE,
    "Robust per-group outlier report via exact median + MAD (median "
    "absolute deviation — the dispersion measure that, unlike stddev, a "
    "single corrupt row cannot drag): per-language document-length "
    "median and MAD are both EXACT lower medians (value at integer rank "
    "(n+1) div 2 of a bounded per-group window sort — layout-invariant "
    "because the value at a fixed rank of a sorted multiset does not "
    "depend on how ties were numbered), outliers are |x - med| > 3*MAD "
    "in pure BIGINT comparison. Two bounded per-group sorts, broadcast "
    "median join-back, no float anywhere — where a stddev-based z-score "
    "would be an order-dependent float sum, this lane hash-matches",
)
def q175(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").alias("v")
    )

    def lower_median(df, col, out):
        wr = Window.partitionBy("lang").orderBy(col)
        wn = Window.partitionBy("lang")
        return (
            df.withColumn("__rn", F.row_number().over(wr))
            .withColumn("__n", F.count(F.lit(1)).over(wn))
            .filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
            .select("lang", F.col(col).alias(out))
        )

    med = lower_median(docs, "v", "m")
    dev = docs.join(F.broadcast(med), "lang").withColumn(
        "d", F.abs(F.col("v") - F.col("m"))
    )
    mad = lower_median(dev.select("lang", F.col("d").alias("v")), "v", "mad")
    return (
        dev.join(F.broadcast(mad), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("m").cast("bigint").alias("median"),
            F.max("mad").cast("bigint").alias("mad"),
            F.sum((F.col("d") > 3 * F.col("mad")).cast("bigint"))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q176 — blocked fuzzy-match pairs via edit distance
# --------------------------------------------------------------------------

_LEV_ORACLE = """
WITH p AS (SELECT p_partkey, p_name, p_brand, p_type FROM part)
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM p a JOIN p b
  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3
ORDER BY part_a, part_b
"""


@register(
    "q176_fuzzy_name_pairs",
    _LEV_ORACLE,
    "Blocked fuzzy-match pair detection via edit distance — the "
    "catalog-hygiene complement of the token-set linkage lane (q128: "
    "Jaccard catches word reorders; Levenshtein catches typos and "
    "character-level drift Jaccard is blind to). Candidate pairs come "
    "only from (brand, type) blocks — never an all-pairs name compare — "
    "and the unit-cost edit distance is an exact integer both engines "
    "define identically. At 100 TB catalogs the block join IS the "
    "standard posture; oversized blocks would take the q131 hash-cap "
    "treatment",
)
def q176(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand", "p_type")
    a = p.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_name").alias("name_a"),
        "p_brand",
        "p_type",
    )
    b = p.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_name").alias("name_b"),
        "p_brand",
        "p_type",
    )
    return (
        a.join(b, ["p_brand", "p_type"])
        .filter(F.col("part_a") < F.col("part_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("dist") <= 3)
        .select("part_a", "part_b", "name_a", "name_b", "dist")
        .orderBy("part_a", "part_b")
    )


# --------------------------------------------------------------------------
# Q177 — k-anonymity audit (privacy governance)
# --------------------------------------------------------------------------

_KANON_ORACLE = """
WITH cls AS (SELECT c_nationkey, c_mktsegment,
                    CAST(count(*) AS BIGINT) AS sz
             FROM customer GROUP BY 1, 2),
tot AS (SELECT CAST(sum(sz) AS BIGINT) AS n,
               CAST(min(sz) AS BIGINT) AS k_actual
        FROM cls)
SELECT k,
       CAST((SELECT count(*) FROM cls) AS BIGINT) AS n_classes,
       CAST((SELECT count(*) FROM cls WHERE sz < k) AS BIGINT)
         AS n_classes_violating,
       CAST(coalesce((SELECT sum(sz) FROM cls WHERE sz < k), 0) AS BIGINT)
         AS n_rows_at_risk,
       CAST(1000000 * coalesce((SELECT sum(sz) FROM cls WHERE sz < k), 0)
            // (SELECT n FROM tot) AS BIGINT) AS risk_ppm,
       (SELECT k_actual FROM tot) AS k_actual
FROM (SELECT unnest([5, 10, 20]) AS k)
ORDER BY k
"""


@register(
    "q177_k_anonymity",
    _KANON_ORACLE,
    "k-anonymity audit (Sweeney 2002 — the privacy-governance "
    "complement of the q119 PII lane: PII detection finds direct "
    "identifiers; this measures re-identification risk through "
    "QUASI-identifiers): equivalence classes over (nation, segment), "
    "then for each policy k in {5,10,20} the violating-class count, "
    "rows at risk, and exact integer risk_ppm, plus k_actual = the "
    "table's real anonymity level (min class size). ONE scan + one "
    "class-level aggregation; everything after is over the tiny class "
    "table (broadcast), all BIGINT — at 100 TB the class table is the "
    "only shuffle and the multi-k summary never rescans",
)
def q177(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    cls = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    tot = cls.agg(
        F.sum("sz").cast("bigint").alias("n"),
        F.min("sz").cast("bigint").alias("k_actual"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
    )
    ks = cust.sparkSession.createDataFrame([(5,), (10,), (20,)], "k int")
    return (
        ks.crossJoin(F.broadcast(cls))
        .groupBy("k")
        .agg(
            F.sum((F.col("sz") < F.col("k")).cast("bigint"))
            .cast("bigint")
            .alias("n_classes_violating"),
            F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_at_risk"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_classes",
            "n_classes_violating",
            "n_rows_at_risk",
            F.expr("1000000 * n_rows_at_risk div n").cast("bigint").alias("risk_ppm"),
            "k_actual",
        )
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# Q178 — Benford first-digit audit (fraud / synthetic-data screen)
# --------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
  FROM orders WHERE o_totalprice > 0),
dig AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS d FROM cents),
obs AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM dig GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs)
SELECT ds.d AS digit,
       CAST(coalesce(obs.n, 0) AS BIGINT) AS n,
       CAST(1000000 * coalesce(obs.n, 0) // tot.t AS BIGINT) AS observed_ppm,
       CAST(floor(ln(1.0 + 1.0 / CAST(ds.d AS DOUBLE)) / ln(10.0)
                  * 1000000.0 + 0.5) AS BIGINT) AS expected_ppm,
       CAST(1000000 * coalesce(obs.n, 0) // tot.t
            - floor(ln(1.0 + 1.0 / CAST(ds.d AS DOUBLE)) / ln(10.0)
                    * 1000000.0 + 0.5) AS BIGINT) AS dev_ppm
FROM (SELECT unnest(generate_series(1, 9)) AS d) ds
LEFT JOIN obs ON obs.d = ds.d
CROSS JOIN tot
ORDER BY digit
"""


@register(
    "q178_benford_audit",
    _BENFORD_ORACLE,
    "Benford first-significant-digit audit (Hill 1995 — the standard "
    "fabricated/synthetic-amounts screen a data-quality pass runs over "
    "monetary columns): digits are extracted in the INTEGER domain "
    "(exact cents via floor(x*100+0.5), then integer-to-string — never "
    "double-to-string or log10-of-double, whose libm/rendering edges "
    "engines disagree on; scaling by 100 preserves the leading "
    "significant digit), observed shares as exact integer ppm, Benford "
    "expectation ln(1+1/d)/ln(10) quantized once per digit. One scan + "
    "one 9-row aggregation; all-digit rows emitted via a 9-row literal "
    "left join so missing digits report 0, not absence",
)
def q178(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    dig = orders.filter(F.col("o_totalprice") > 0).select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    obs = dig.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = obs.agg(F.sum("n").cast("bigint").alias("t"))
    ds = orders.sparkSession.createDataFrame([(i,) for i in range(1, 10)], "d int")
    expected = F.floor(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
        / F.log(F.lit(10.0))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        ds.select(F.col("d").alias("digit"))
        .join(F.broadcast(obs.withColumnRenamed("d", "digit")), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.expr("1000000 * coalesce(n, 0) div t")
            .cast("bigint")
            .alias("observed_ppm"),
            expected.alias("expected_ppm"),
            (
                F.expr("1000000 * coalesce(n, 0) div t") - expected
            )
            .cast("bigint")
            .alias("dev_ppm"),
        )
        .orderBy("digit")
    )
