"""Function-surface + embedding-operator extension q90-q96 (SURVEY.md
§2.4/§2.6 + north-star N2/N3): boolean aggregates, argmax (max_by — the
scalar core of the CDC latest-by-key operator), edit-distance fuzzy
matching, the remaining string builtins, TRY_CAST error-tolerant
coercion, per-class embedding centroids, and quantization-hash
near-duplicate grouping.

Determinism: argmax orders are unique per group in the driver data
(verified: one event per (user_id, ts)); centroid means cast FLOAT →
DOUBLE before averaging so both engines accumulate identical doubles,
then ROUND 4; the quantization hash goes through md5 of a canonical
string so both engines bucket identically (ROUND-on-double tie points
are measure-zero for float32 inputs).

Scale notes: q92 blocks the edit-distance self join on (lang, length
bucket) so the quadratic comparison runs inside small blocks only —
the same blocked-join posture as operators/dedup.py; q95/q96 are one
explode + one map-side-combined aggregation each.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.queries import _t, ntz, register


@register(
    "q90_bool_aggs",
    """SELECT event_type,
              bool_and(value > 1)  AS all_gt1,
              bool_or(value > 90)  AS any_gt90,
              CAST(count_if(value > 50) AS BIGINT) AS n_gt50
       FROM events GROUP BY event_type ORDER BY event_type""",
    "boolean aggregates: bool_and / bool_or / count_if (A4 surface)",
)
def q90(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.bool_and(F.col("value") > 1).alias("all_gt1"),
            F.bool_or(F.col("value") > 90).alias("any_gt90"),
            F.count_if(F.col("value") > 50).alias("n_gt50"),
        )
        .orderBy("event_type")
    )


@register(
    "q91_argmax",
    """SELECT user_id,
              max_by(event_type, ts) AS latest_type,
              min_by(event_id, ts)   AS first_event,
              max(ts)                AS last_ts
       FROM events GROUP BY user_id ORDER BY user_id""",
    "argmax/argmin aggregates (max_by/min_by) — the single-expression "
    "form of the K3 latest-by-key upsert core; one map-side-combined "
    "shuffle, no window sort",
)
def q91(spark, sf_dir):
    return ntz(
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max_by("event_type", "ts").alias("latest_type"),
            F.min_by("event_id", "ts").alias("first_event"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


@register(
    "q92_levenshtein",
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS BIGINT) AS dist
       FROM documents a JOIN documents b
         ON a.lang = b.lang
        AND a.n_chars // 20 = b.n_chars // 20
        AND a.doc_id < b.doc_id
       WHERE a.doc_id < 200 AND b.doc_id < 200
         AND levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 10
       ORDER BY id_a, id_b""",
    "N2 fuzzy matching: edit-distance near-dup pairs, blocked on "
    "(lang, length-bucket) so the quadratic compare stays inside blocks",
)
def q92(spark, sf_dir):
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            "lang",
            (F.col("n_chars") / 20).cast("long").alias("len_bucket"),
            F.substring("text", 1, 40).alias("head"),
        )
    )
    a, b = docs.alias("a"), docs.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(dist <= 10)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            dist.cast("bigint").alias("dist"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "q93_string_surface2",
    """SELECT o_orderkey,
              lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded,
              translate(o_orderpriority, '-', '_')       AS swapped,
              reverse(o_orderstatus)                     AS rev,
              repeat(o_orderstatus, 3)                   AS tripled
       FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""",
    "remaining string builtins: lpad / translate / reverse / repeat",
)
def q93(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded"),
            F.translate("o_orderpriority", "-", "_").alias("swapped"),
            F.reverse("o_orderstatus").alias("rev"),
            F.repeat("o_orderstatus", 3).alias("tripled"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q94_try_cast",
    """SELECT o_orderkey,
              TRY_CAST(o_orderpriority AS BIGINT)                        AS bad_cast,
              TRY_CAST(string_split(o_orderpriority, '-')[1] AS BIGINT)  AS priority_num,
              TRY_CAST(o_orderstatus AS DATE) IS NULL                    AS not_a_date
       FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""",
    "TRY_CAST error-tolerant coercion (P8 with the reference's "
    "unknown-type-falls-back posture, add_output.py:283-285: bad values "
    "become NULL instead of failing the pipeline)",
)
def q94(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.expr("try_cast(o_orderpriority AS BIGINT)").alias("bad_cast"),
            F.expr(
                "try_cast(split(o_orderpriority, '-')[0] AS BIGINT)"
            ).alias("priority_num"),
            F.expr("try_cast(o_orderstatus AS DATE)").isNull().alias("not_a_date"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q95_embedding_centroids",
    """SELECT label, pos, ROUND(avg(CAST(v AS DOUBLE)), 4) AS c
       FROM (SELECT label, unnest(embedding) AS v,
                    CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos
             FROM embeddings)
       GROUP BY label, pos ORDER BY label, pos""",
    "N3 clustering primitive: per-class embedding centroid — posexplode "
    "to (label, dim) then one map-side-combined mean per cell; the same "
    "aggregation IVF training uses, expressed declaratively",
)
def q95(spark, sf_dir):
    return (
        _t(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("pos0", "v"))
        .select("label", (F.col("pos0") + 1).cast("int").alias("pos"), "v")
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 4).alias("c"))
        .orderBy("label", "pos")
    )


@register(
    "q96_quantized_neardup",
    """SELECT h, count(*) AS n, min(vec_id) AS exemplar
       FROM (SELECT vec_id,
                    md5(array_to_string(
                        list_transform(embedding[1:4],
                                       x -> CAST(ROUND(CAST(x AS DOUBLE), 1) + 0.0 AS VARCHAR)),
                        ',')) AS h
             FROM embeddings)
       GROUP BY h HAVING count(*) > 1 ORDER BY n DESC, h""",
    "N2 embedding near-dup via quantization hashing: round the leading "
    "dims to a coarse grid, md5 the canonical string, group collisions — "
    "a pure scan+agg (no pairwise join), the cheapest near-dup screen",
)
def q96(spark, sf_dir):
    # `+ 0.0` canonicalizes IEEE negative zero (-0.0 + 0.0 = +0.0) so both
    # engines hash the same string for dims that round to zero.
    quant = F.transform(
        F.slice("embedding", 1, 4),
        lambda x: (F.round(x.cast("double"), 1) + F.lit(0.0)).cast("string"),
    )
    return (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", F.md5(F.array_join(quant, ",")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("exemplar"))
        .filter(F.col("n") > 1)
        .orderBy(F.desc("n"), "h")
    )
