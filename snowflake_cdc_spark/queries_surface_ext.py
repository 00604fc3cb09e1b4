"""Scalar/aggregate surface extension q82-q89 (SURVEY.md §2.4/§2.6 +
north-star N5): unpivot, exact-moment dispersion statistics + median,
JSON key introspection, regexp_extract_all, calendar gap-fill via
sequence generation, order-insensitive collected sets, corpus bigrams,
and tf-idf term scoring.

Determinism: dispersion stats are computed from exact DECIMAL moments and
only cross into double for the final division/sqrt (then ROUND 4), so
both engines evaluate the identical IEEE expression on identical inputs;
collected sets are sorted before joining; every float output is ROUND 4.

Scale notes: the explode-heavy text queries (q88/q89) materialize the
split array once in a projection barrier before fan-out so the
tokenization runs once per row, then aggregate with map-side partial
combine; the calendar dimension of q86 is generated (366 rows) and
broadcast, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_cdc_spark.queries import DEC, _t, register

DEC4 = T.DecimalType(18, 4)


@register(
    "q82_unpivot",
    """WITH g AS (SELECT l_returnflag,
                         ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
                         ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
                         ROUND(CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_tax
                  FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM g
       UNION ALL
       SELECT l_returnflag, 'sum_price' AS metric, sum_price AS val FROM g
       UNION ALL
       SELECT l_returnflag, 'sum_tax' AS metric, sum_tax AS val FROM g
       ORDER BY l_returnflag, metric""",
    "unpivot (wide→long): grouped metrics melted to (group, metric, val) "
    "rows — one aggregation, no re-scan per metric",
)
def q82(spark, sf_dir):
    g = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double"), 2).alias("sum_price"),
            F.round(F.sum(F.col("l_tax").cast(DEC)).cast("double"), 2).alias("sum_tax"),
        )
    )
    return g.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_tax"], "metric", "val"
    ).orderBy("l_returnflag", "metric")


@register(
    "q83_dispersion_stats",
    """SELECT event_type, n,
              ROUND((ss - s * s / n) / (n - 1), 4) AS var_samp,
              ROUND(sqrt((ss - s * s / n) / (n - 1)), 4) AS stddev_samp,
              ROUND(med, 4) AS median_value
       FROM (SELECT event_type,
                    CAST(count(*) AS DOUBLE) AS n,
                    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
                    CAST(sum(CAST(value AS DECIMAL(18,2))
                             * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss,
                    median(value) AS med
             FROM events WHERE value IS NOT NULL GROUP BY event_type)
       ORDER BY event_type""",
    "A4 dispersion statistics: sample variance/stddev from exact decimal "
    "moments (double only at the boundary) + exact median",
)
def q83(spark, sf_dir):
    v = F.col("value").cast(DEC)
    base = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(v).cast("double").alias("s"),
            F.sum(v * v).cast("double").alias("ss"),
            F.median("value").alias("med"),
        )
    )
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    return base.select(
        "event_type",
        "n",
        F.round(var, 4).alias("var_samp"),
        F.round(F.sqrt(var), 4).alias("stddev_samp"),
        F.round("med", 4).alias("median_value"),
    ).orderBy("event_type")


@register(
    "q84_json_keys",
    """SELECT k, count(*) AS n
       FROM (SELECT unnest(json_keys(props)) AS k FROM events)
       GROUP BY k ORDER BY n DESC, k""",
    "JSON introspection: explode the key set of a JSON-string column "
    "(schema-on-read over DbVariant columns, SURVEY.md §1.2)",
)
def q84(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .select(F.explode(F.json_object_keys("props")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "k")
    )


@register(
    "q85_regexp_extract_all",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(text, '[aeiou][a-z]+')) AS BIGINT) AS n_vowel_words,
              coalesce(regexp_extract_all(text, '[aeiou][a-z]+')[1], '') AS first_match
       FROM documents ORDER BY doc_id""",
    "regexp_extract_all (§2.6 strings): multi-match extraction + "
    "first-match element access",
)
def q85(spark, sf_dir):
    arr = F.regexp_extract_all("text", F.lit("[aeiou][a-z]+"), 0)
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(arr).cast("bigint").alias("n_vowel_words"),
            F.coalesce(F.element_at(arr, 1), F.lit("")).alias("first_match"),
        )
        .orderBy("doc_id")
    )


@register(
    "q86_calendar_gap_fill",
    """WITH cal AS (SELECT unnest(generate_series(DATE '1997-01-01',
                                                  DATE '1997-12-31',
                                                  INTERVAL 1 DAY))::DATE AS d),
            daily AS (SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS n
                      FROM lineitem
                      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                        AND l_shipdate < TIMESTAMP '1998-01-01'
                      GROUP BY 1)
       SELECT CAST(EXTRACT(month FROM cal.d) AS BIGINT) AS month,
              count(CASE WHEN daily.n IS NOT NULL THEN 1 END) AS days_with,
              count(CASE WHEN daily.n IS NULL THEN 1 END) AS days_without
       FROM cal LEFT JOIN daily ON cal.d = daily.d
       GROUP BY 1 ORDER BY 1""",
    "generated calendar dimension (sequence/explode) left-joined to fact "
    "days — gap detection over a time series without a stored date dim",
)
def q86(spark, sf_dir):
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("date"),
                F.lit("1997-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    daily = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        cal.join(daily, "d", "left_outer")
        .groupBy(F.month("d").cast("bigint").alias("month"))
        .agg(
            F.count(F.when(F.col("n").isNotNull(), 1)).alias("days_with"),
            F.count(F.when(F.col("n").isNull(), 1)).alias("days_without"),
        )
        .orderBy("month")
    )


@register(
    "q87_sorted_collect",
    """SELECT user_id,
              array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
              count(DISTINCT event_type) AS n_types
       FROM events GROUP BY user_id ORDER BY user_id""",
    "collected sets made deterministic: sort before join — the only safe "
    "way to expose collect_set cross-engine (A5 distinct surface)",
)
def q87(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types"),
            F.count_distinct("event_type").alias("n_types"),
        )
        .orderBy("user_id")
    )


@register(
    "q88_bigrams",
    """SELECT b, count(*) AS n FROM (
         SELECT w[1] || ' ' || w[2] AS b FROM (
           SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS w
           FROM (SELECT string_split(text, ' ') AS ws FROM documents)))
       GROUP BY b ORDER BY n DESC, b LIMIT 20""",
    "N5 text: corpus bigram counts — tokenize once behind a projection "
    "barrier, pair via slice+zip_with (no per-element re-tokenization), "
    "then one map-side-combined aggregation",
)
def q88(spark, sf_dir):
    # Materialize the split once; zip adjacent slices rather than using a
    # positional-lambda HOF (two-arg transform binds (element, index)).
    docs = _t(spark, sf_dir, "documents").select(F.split("text", " ").alias("ws"))
    bigrams = docs.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, F.size("ws") - 1),
                F.slice(F.col("ws"), 2, F.size("ws") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("b")
    )
    return (
        bigrams.groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "b")
        .limit(20)
    )


@register(
    "q89_tfidf",
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents),
            agg AS (SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
                    FROM w GROUP BY term)
       SELECT term,
              ROUND(CAST(tf AS DOUBLE)
                    * ln((CAST((SELECT count(*) FROM documents) AS DOUBLE) + 1)
                         / (CAST(df AS DOUBLE) + 1)), 4) AS score
       FROM agg ORDER BY score DESC, term LIMIT 20""",
    "N5 text: corpus tf-idf term scoring — one explode, one aggregation "
    "computing tf and df together, scalar doc count broadcast",
)
def q89(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    agg = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
    )
    score = F.round(
        F.col("tf").cast("double")
        * F.log((F.col("n_docs") + 1) / (F.col("df").cast("double") + 1)),
        4,
    )
    return (
        agg.join(F.broadcast(n_docs))
        .select("term", score.alias("score"))
        .orderBy(F.desc("score"), "term")
        .limit(20)
    )
