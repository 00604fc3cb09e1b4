"""Training-data pipeline extension q108-q111 (north-star N5 applied):
benchmark-contamination detection, Gopher-style repetition filtering,
corpus composition reporting, and temperature-scaled sampling weights.

These are the corpus-curation operations a large-scale training-data
pipeline runs over raw document dumps (reference scope: the engine side
of Upsolver/snowflake-cdc's data-prep surface, SURVEY.md §2.8):

- q108: decontamination — find training documents sharing word-3-gram
  shingles with a held-out benchmark slice (the train/test overlap check
  every pretraining corpus needs). Inverted-index join on the shingle,
  never a pairwise document comparison.
- q109: repetition filtering (Gopher quality rules: duplicate-token
  fraction and most-frequent-token fraction per document).
- q110: composition report per language — doc counts, token totals,
  exact interpolated token-count percentiles.
- q111: temperature resampling weights w_l ∝ tokens_l^alpha (the
  multilingual sampling correction, alpha=0.3).

Determinism: ratios divide exact BIGINT counts in double; both engines
evaluate identical IEEE expressions on identical integers. TRUE-ratio
outputs (q115 boilerplate_frac, q117 keep_rate) use the round-3
tie-robust canonical form floor(x*10^4 + 0.5)/10^4 token-identically on
both engines instead of engine ROUND — see COVERAGE.md round-3 contract.
Tokenization is the fixtures' single-space convention on both sides.

Scale notes: q108's shingle join shuffles on the shingle value — the
benchmark side is orders of magnitude smaller than the training side, so
AQE picks a broadcast build there; hot shingles (corpus boilerplate) are
the classic skew key, which the count-distinct-per-doc aggregation
absorbs because partial aggregation collapses them map-side. q109/q110
are one explode + map-side-combined aggregations; q111 aggregates to one
row per language before any driver-visible step.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import word_shingles
from snowflake_cdc_spark.functions.vectors import round_half_up
from snowflake_cdc_spark.operators.packing import packing_stats
from snowflake_cdc_spark.queries import _t, register

_TRIGRAM_SQL = """
    SELECT DISTINCT doc_id, source, w[1] || ' ' || w[2] || ' ' || w[3] AS s
    FROM (SELECT doc_id, source,
                 unnest(list_zip(ws[1:len(ws)-2], ws[2:len(ws)-1], ws[3:len(ws)])) AS w
          FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
                FROM documents))
"""


@register(
    "q108_contamination",
    f"""WITH sh AS ({_TRIGRAM_SQL}),
            bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
            train AS (SELECT doc_id, s FROM sh WHERE source <> 'src0')
        SELECT train.doc_id,
               CAST(count(DISTINCT train.s) AS BIGINT) AS n_shared
        FROM train JOIN bench ON train.s = bench.s
        GROUP BY train.doc_id
        HAVING count(DISTINCT train.s) >= 5
        ORDER BY n_shared DESC, doc_id""",
    "train/test decontamination: training docs sharing >=5 word-3-grams "
    "with the benchmark slice (source='src0') — inverted-index shingle "
    "join, count-distinct overlap per doc",
)
def q108(spark, sf_dir):
    sh = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.explode(word_shingles("text", 3)).alias("s"),
    )
    bench = sh.filter(F.col("source") == "src0").select("s").distinct()
    train = sh.filter(F.col("source") != "src0").select("doc_id", "s")
    # benchmark shingle sets are small by definition (the eval slice) and
    # the train shingle stream is skewed (boilerplate shingles) — broadcast
    # the bench side so the train side never shuffles on `s`; asserted in
    # the physical plan by tests/test_bucketing.py::
    # test_contamination_bench_side_is_broadcast
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
        .orderBy(F.desc("n_shared"), "doc_id")
    )


@register(
    "q109_repetition",
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents),
            c AS (SELECT doc_id, w, count(*) AS n FROM w GROUP BY doc_id, w),
            d AS (SELECT doc_id,
                         CAST(sum(n) AS BIGINT) AS total,
                         CAST(count(*) AS BIGINT) AS n_distinct,
                         CAST(max(n) AS BIGINT) AS top
                  FROM c GROUP BY doc_id)
       SELECT doc_id, total AS n_words, n_distinct,
              ROUND(1 - CAST(n_distinct AS DOUBLE) / CAST(total AS DOUBLE), 4)
                AS rep_ratio,
              ROUND(CAST(top AS DOUBLE) / CAST(total AS DOUBLE), 4)
                AS top_word_frac
       FROM d ORDER BY rep_ratio DESC, doc_id LIMIT 50""",
    "Gopher-style repetition metrics per document: duplicate-token "
    "fraction and most-frequent-token fraction; top-50 most repetitive",
)
def q109(spark, sf_dir):
    counts = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d = counts.groupBy("doc_id").agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").alias("top"),
    )
    rep = F.round(
        1 - F.col("n_distinct").cast("double") / F.col("total").cast("double"), 4
    )
    top_frac = F.round(F.col("top").cast("double") / F.col("total").cast("double"), 4)
    return (
        d.select(
            "doc_id",
            F.col("total").alias("n_words"),
            "n_distinct",
            rep.alias("rep_ratio"),
            top_frac.alias("top_word_frac"),
        )
        .orderBy(F.desc("rep_ratio"), "doc_id")
        .limit(50)
    )


@register(
    "q110_corpus_report",
    """WITH t AS (SELECT lang, len(string_split(text, ' ')) AS toks
                  FROM documents)
       SELECT lang,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(toks) AS BIGINT) AS total_tokens,
              ROUND(avg(CAST(toks AS DOUBLE)), 4) AS avg_tokens,
              ROUND(quantile_cont(CAST(toks AS DOUBLE), 0.50), 4) AS p50_tokens,
              ROUND(quantile_cont(CAST(toks AS DOUBLE), 0.95), 4) AS p95_tokens
       FROM t GROUP BY lang ORDER BY lang""",
    "corpus composition per language: doc count, token totals, exact "
    "interpolated token-count percentiles (mixture design input)",
)
def q110(spark, sf_dir):
    toks = _t(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ")).cast("double").alias("toks")
    )
    pct = F.percentile(F.col("toks"), F.lit([0.50, 0.95]))
    return (
        toks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("toks").cast("long")).alias("total_tokens"),
            F.round(F.avg("toks"), 4).alias("avg_tokens"),
            pct.alias("_p"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "avg_tokens",
            F.round(F.col("_p")[0], 4).alias("p50_tokens"),
            F.round(F.col("_p")[1], 4).alias("p95_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "q111_sample_weights",
    """WITH t AS (SELECT lang,
                         CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS tok
                  FROM documents GROUP BY lang)
       SELECT lang,
              ROUND(pow(tok, 0.3) / (SELECT sum(pow(tok, 0.3)) FROM t), 4)
                AS weight
       FROM t ORDER BY lang""",
    "temperature-scaled sampling weights per language, w_l proportional "
    "to tokens_l^0.3 — the multilingual resampling correction",
)
def q111(spark, sf_dir):
    t = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).cast("double").alias("tok"))
    )
    total = t.agg(F.sum(F.pow("tok", F.lit(0.3))).alias("z"))
    return (
        t.join(F.broadcast(total))
        .select("lang", F.round(F.pow("tok", F.lit(0.3)) / F.col("z"), 4).alias("weight"))
        .orderBy("lang")
    )


@register(
    "q114_sequence_packing",
    """WITH d AS (SELECT doc_id,
                         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                         CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                                   AS UBIGINT) % 16 AS BIGINT) AS bucket
                  FROM documents),
       c AS (SELECT bucket, n_tokens,
                    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum
             FROM d),
       p AS (SELECT bucket, n_tokens,
                    CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS first_bin,
                    CAST(greatest(floor((cum - n_tokens) / 2048.0),
                                  floor((cum - 1) / 2048.0)) AS BIGINT) AS last_bin
             FROM c)
       SELECT bucket,
              count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
              CAST(ceil(sum(n_tokens) / 2048.0) AS BIGINT) AS n_bins,
              CAST(sum(CASE WHEN first_bin <> last_bin THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_split_docs,
              CAST(CAST(ceil(sum(n_tokens) / 2048.0) AS BIGINT) * 2048
                   - sum(n_tokens) AS BIGINT) AS pad_tokens
       FROM p GROUP BY bucket ORDER BY bucket""",
    "sequence packing (operators/packing.py): concat-and-chunk documents "
    "into 2048-token context windows inside 16 deterministic md5 shards — "
    "per-shard window counts, split-document counts, and final-window "
    "padding; the oracle rebuilds identical packing from the same prefix "
    "sums",
)
def q114(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_toks")
    )
    return packing_stats(docs, "doc_id", "n_toks", capacity=2048, n_buckets=16)


@register(
    "q115_boilerplate_fraction",
    f"""WITH sh AS ({_TRIGRAM_SQL}),
       df AS (SELECT s, count(*) AS nd FROM sh GROUP BY s),
       per AS (SELECT sh.doc_id,
                      count(*) AS n_shingles,
                      sum(CASE WHEN nd >= 20 THEN 1 ELSE 0 END) AS n_common
               FROM sh JOIN df USING (s)
               GROUP BY sh.doc_id)
       SELECT doc_id,
              CAST(n_shingles AS BIGINT) AS n_shingles,
              CAST(n_common AS BIGINT) AS n_common,
              floor(CAST(n_common AS DOUBLE) / n_shingles * 10000.0 + 0.5)
                / 10000.0 AS boilerplate_frac
       FROM per ORDER BY doc_id""",
    "corpus-boilerplate screen (C4-style common-span removal, doc level): "
    "fraction of each document's distinct word-3-grams that are corpus-"
    "common (appear in >=20 docs). Inverted index on the shingle — the "
    "document-frequency table aggregates map-side, the join back to the "
    "(doc, shingle) pairs shuffles on the shingle, never a doc-pair join; "
    "hot boilerplate shingles collapse in the partial agg",
)
def q115(spark, sf_dir):
    sh = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(word_shingles("text", 3)).alias("s"))
        .distinct()
        .persist()  # reused by the doc-frequency table and the join back
    )
    df_tab = sh.groupBy("s").agg(F.count(F.lit(1)).alias("nd"))
    return (
        sh.join(df_tab, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("nd") >= 20, 1).otherwise(0)).cast("bigint").alias("n_common"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_common",
            # true-ratio output: tie-robust canonical rounding (identical
            # IEEE expression on both engines) instead of engine ROUND
            round_half_up(
                F.col("n_common").cast("double") / F.col("n_shingles"), 4
            ).alias("boilerplate_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "q117_quality_gate",
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
                  FROM documents),
       d AS (SELECT doc_id, source,
                    len(ws) AS n,
                    1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS rep,
                    CAST(len(list_filter(ws,
                         x -> list_contains(['the','a','of','and','is'], x)))
                         AS DOUBLE) / len(ws) AS swr
             FROM w),
       g AS (SELECT source,
                    CASE WHEN n BETWEEN 30 AND 80
                          AND rep <= 0.55 AND swr >= 0.02
                         THEN 1 ELSE 0 END AS keep
             FROM d)
       SELECT source,
              count(*) AS n_docs,
              CAST(sum(keep) AS BIGINT) AS n_keep,
              floor(CAST(sum(keep) AS DOUBLE) / count(*) * 10000.0 + 0.5)
                / 10000.0 AS keep_rate
       FROM g GROUP BY source ORDER BY source""",
    "the curation keep/drop decision as one gate: length window (30-80 "
    "tokens) AND duplicate-token fraction <= 0.55 AND stopword ratio >= "
    "0.02, reported as per-source keep rates — the artifact a quality "
    "filter run hands to the mixture designer. Pure expression-level "
    "scan + one aggregation; no joins, no Python",
)
def q117(spark, sf_dir):
    ws = F.split("text", " ")
    n = F.size(ws)
    rep = F.lit(1.0) - F.size(F.array_distinct(ws)).cast("double") / n
    swr = (
        F.size(F.filter(ws, lambda x: x.isin("the", "a", "of", "and", "is"))).cast(
            "double"
        )
        / n
    )
    keep = F.when(
        n.between(30, 80) & (rep <= 0.55) & (swr >= 0.02), 1
    ).otherwise(0)
    return (
        _t(spark, sf_dir, "documents")
        .select("source", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").cast("bigint").alias("n_keep"),
            round_half_up(
                F.sum("keep").cast("double") / F.count(F.lit(1)), 4
            ).alias("keep_rate"),
        )
        .orderBy("source")
    )


@register(
    "q119_pii_scrub",
    """WITH planted AS (
         SELECT doc_id, source,
                text
                || CASE WHEN doc_id % 5 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                        ELSE '' END
                || CASE WHEN doc_id % 7 = 0
                        THEN ' call 555-123-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                        ELSE '' END
                || CASE WHEN doc_id % 11 = 0
                        THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                        ELSE '' END AS text
         FROM documents)
       SELECT doc_id,
              CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_email,
              CAST(len(regexp_extract_all(text, '\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}')) AS INT) AS n_phone,
              CAST(len(regexp_extract_all(text, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b')) AS INT) AS n_ipv4,
              md5(regexp_replace(regexp_replace(regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}', '<PHONE>', 'g'),
                    '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '<IPV4>', 'g')) AS scrubbed_md5
       FROM planted ORDER BY doc_id""",
    "PII detection + redaction (functions/text.py::pii_counts/scrub_pii) — "
    "the scrubbing pass a public-crawl training pipeline runs first. "
    "Deterministic PII is planted in-query (emails/phones/IPs keyed on "
    "doc_id) so the operator is tested against real positives AND the "
    "unplanted corpus as negatives; the oracle replants identically and "
    "checks both the per-kind match counts and the md5 of the fully "
    "redacted text. Pure expression-level regexes in the Java/RE2 common "
    "subset — no Python, no shuffle beyond the scan",
)
def q119(spark, sf_dir):
    from snowflake_cdc_spark.functions.text import pii_counts, scrub_pii

    d = F.col("doc_id")
    planted = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 5 == 0,
                F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                d % 7 == 0,
                F.concat(F.lit(" call 555-123-"), (d % 9000 + 1000).cast("string")),
            ).otherwise(F.lit("")),
            F.when(
                d % 11 == 0,
                F.concat(F.lit(" from 10.0."), (d % 256).cast("string"), F.lit(".7")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    counts = pii_counts("text")
    return planted.select(
        "doc_id",
        counts["email"].cast("int").alias("n_email"),
        counts["phone"].cast("int").alias("n_phone"),
        counts["ipv4"].cast("int").alias("n_ipv4"),
        F.md5(scrub_pii("text")).alias("scrubbed_md5"),
    ).orderBy("doc_id")


@register(
    "q120_global_shuffle",
    """SELECT doc_id,
              CAST(row_number() OVER (ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)),
                                      doc_id) AS BIGINT) AS shuffle_rank
       FROM documents ORDER BY doc_id""",
    "deterministic global shuffle (operators/shuffle.py): the seeded "
    "pseudo-random total order a pre-training pipeline fixes before "
    "packing. The engine computes the rank WITHOUT a global sort — "
    "md5-prefix range buckets, per-bucket row_number, tiny broadcast "
    "offset table — while the oracle computes the naive single-sort "
    "row_number; the two must agree rank-for-rank, proving the "
    "decomposition exact (and n_buckets-independent)",
)
def q120(spark, sf_dir):
    from snowflake_cdc_spark.operators.shuffle import deterministic_shuffle

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return (
        deterministic_shuffle(docs, "doc_id", seed=42, n_buckets=64)
        .select("doc_id", F.col("shuffle_rank").cast("bigint").alias("shuffle_rank"))
        .orderBy("doc_id")
    )
