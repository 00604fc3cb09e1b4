"""North-star declared queries Q25-Q35 (SURVEY.md §2.8, BASELINE.json
north_star): dedup family, embedding near-dup / ANN, text analysis,
multimodal plumbing.

The driver fixtures are unique-by-construction word soup, so dedup
queries run over a *planted-duplicate corpus* derived deterministically
from ``documents`` / ``embeddings`` — same trick as the cdc_events
fixture: the derivation is implemented twice (DataFrame program + DuckDB
CTE) so both engines see identical input. Every hash is md5-derived,
which is bit-identical across engines, so even MinHash signatures and
SimHash band buckets are oracle-checked — not just "plausible".
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.functions import text as TX
from snowflake_cdc_spark.operators.dedup import (
    blocked_jaccard_pairs,
    duplicate_groups,
    minhash_lsh_pairs,
    simhash_near_dup_pairs,
)
from snowflake_cdc_spark.operators.components import connected_components
from snowflake_cdc_spark.operators.lsh import (
    cosine_topk_bucketed,
    embedding_near_dup_pairs,
)
from snowflake_cdc_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
)
from snowflake_cdc_spark.queries import _t, register

# --------------------------------------------------------------------------
# planted corpora (Spark + DuckDB, identical derivations)
# --------------------------------------------------------------------------


def planted_docs(spark, sf_dir):
    """documents ∪ exact copies (doc_id%10=0, +100000) ∪ near copies with
    one appended token (doc_id%10=5, +200000)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    exact = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source"
    )
    near = d.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
        "lang",
        "source",
    )
    return d.unionByName(exact).unionByName(near)


DOCS_CORPUS_SQL = """
WITH corpus AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang, source FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 200000, text || ' zzz', lang, source FROM documents WHERE doc_id % 10 = 5
)
"""


def planted_vectors(spark, sf_dir):
    """embeddings (as double arrays) ∪ scaled near-copies (×1.001,
    vec_id%10=0, +100000) — cosine of a scaled copy is exactly 1."""
    e = _t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select("vec_id", as_double.alias("v"))
    near = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.001).alias("v"),
    )
    return base.unionByName(near)


VECS_CORPUS_SQL = """
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.001)
  FROM embeddings WHERE vec_id % 10 = 0
)
"""

# shared DuckDB shingle CTE (mirrors functions/text.py::word_shingles n=3,
# and operators/dedup.py::hashed_shingle_set — first 12 md5 hex chars as a
# 48-bit int; identical arithmetic on both engines so even a collision
# collides identically)
_HASH12 = (
    "list_sum(list_transform(generate_series(1, 12), p -> "
    "CAST(strpos('0123456789abcdef', substr(md5(s), p, 1)) - 1 AS BIGINT) "
    "* (1::BIGINT << (4 * (12 - p)))))"
)
_SHINGLES_SQL = f"""
w AS (SELECT doc_id, lang, source, string_split(text, ' ') AS ws FROM corpus),
sh AS (SELECT doc_id, lang, source,
              CASE WHEN len(ws) >= 3
                   THEN list_distinct(list_transform(generate_series(1, len(ws) - 2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                   ELSE CAST([] AS VARCHAR[]) END AS shingles
       FROM w),
sh2 AS (SELECT doc_id, lang, source, shingles,
               list_distinct(list_transform(shingles, s -> {_HASH12})) AS hset
        FROM sh WHERE len(shingles) > 0)
"""


# --------------------------------------------------------------------------
# Q25 — MinHash + LSH near-dup (N2)
# --------------------------------------------------------------------------


@register(
    "q25_minhash_lsh",
    DOCS_CORPUS_SQL
    + ","
    + _SHINGLES_SQL
    + """,
    mh AS (SELECT doc_id, shingles,
                  list_transform(generate_series(0, 7), j ->
                    list_aggregate(list_transform(shingles,
                      s -> md5(CAST(j AS VARCHAR) || ':' || s)), 'min')) AS sig
           FROM sh2),
    bands AS (SELECT doc_id, shingles, b,
                     md5(sig[4*b+1] || '|' || sig[4*b+2] || '|' || sig[4*b+3] || '|' || sig[4*b+4])
                       AS band_val
              FROM (SELECT doc_id, shingles, sig, unnest(generate_series(0, 1)) AS b FROM mh)),
    cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             FROM bands x JOIN bands y
               ON x.b = y.b AND x.band_val = y.band_val AND x.doc_id < y.doc_id),
    j AS (SELECT a, b,
                 ROUND(CAST(len(list_intersect(s1.hset, s2.hset)) AS DOUBLE)
                       / CAST(len(list_distinct(list_concat(s1.hset, s2.hset))) AS DOUBLE), 4)
                   AS jaccard
          FROM cand JOIN sh2 s1 ON s1.doc_id = cand.a JOIN sh2 s2 ON s2.doc_id = cand.b)
    SELECT a, b, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY a, b""",
    "N2 MinHash(k=8) + LSH(2 bands × 4 rows) candidates, verified with exact "
    "Jaccard ≥ 0.8 over planted exact+near duplicates",
)
def q25(spark, sf_dir):
    return minhash_lsh_pairs(
        planted_docs(spark, sf_dir), "doc_id", "text", k=8, bands=2, threshold=0.8
    )


# --------------------------------------------------------------------------
# Q26 — SimHash near-dup (N2)
# --------------------------------------------------------------------------


@register(
    "q26_simhash",
    DOCS_CORPUS_SQL
    + """,
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM corpus),
    h AS (SELECT doc_id,
                 list_sum(list_transform(generate_series(1, 8), p ->
                   CAST(strpos('0123456789abcdef', substr(md5(t), p, 1)) - 1 AS BIGINT)
                   * (1::BIGINT << (4 * (8 - p))))) AS hv
          FROM tok),
    bits AS (SELECT doc_id, b, sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM h CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
             GROUP BY doc_id, b),
    sims AS (SELECT doc_id,
                    CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0::BIGINT END) AS BIGINT)
                      AS simhash
             FROM bits GROUP BY doc_id),
    bands AS (SELECT doc_id, simhash, b, (simhash >> (8 * b)) & 255 AS band_val
              FROM sims CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)),
    cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                    bit_count(xor(x.simhash, y.simhash)) AS hamming
             FROM bands x JOIN bands y
               ON x.b = y.b AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
    SELECT a, b, hamming FROM cand WHERE hamming <= 3 ORDER BY a, b""",
    "N2 32-bit SimHash, 8-bit-band blocking (pigeonhole-complete for hamming ≤ 3)",
)
def q26(spark, sf_dir):
    return simhash_near_dup_pairs(planted_docs(spark, sf_dir), "doc_id", "text", 3)


# --------------------------------------------------------------------------
# Q27 — exact blocked n-gram Jaccard (N2)
# --------------------------------------------------------------------------


@register(
    "q27_blocked_jaccard",
    DOCS_CORPUS_SQL
    + ","
    + _SHINGLES_SQL
    + """
    SELECT x.doc_id AS a, y.doc_id AS b,
           ROUND(CAST(len(list_intersect(x.hset, y.hset)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(x.hset, y.hset))) AS DOUBLE), 4)
             AS jaccard
    FROM sh2 x JOIN sh2 y
      ON x.lang = y.lang AND x.source = y.source AND x.doc_id < y.doc_id
    WHERE ROUND(CAST(len(list_intersect(x.hset, y.hset)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(x.hset, y.hset))) AS DOUBLE), 4) >= 0.6
    ORDER BY a, b""",
    "N2 exact 3-gram Jaccard within (lang, source) blocks — bounded-quadratic exact recall",
)
def q27(spark, sf_dir):
    return blocked_jaccard_pairs(
        planted_docs(spark, sf_dir), "doc_id", "text", ["lang", "source"], threshold=0.6
    )


# --------------------------------------------------------------------------
# Q28 — embedding-cosine near-dup via sign-bucket LSH (N2/N3)
# --------------------------------------------------------------------------


@register(
    "q28_embedding_neardup",
    VECS_CORPUS_SQL
    + """,
    bk AS (SELECT vec_id, v,
                  list_sum(list_transform(generate_series(1, 16), i ->
                    CASE WHEN v[i] > 0 THEN CAST(1::BIGINT << (i - 1) AS BIGINT)
                         ELSE 0::BIGINT END)) AS bucket
           FROM corpus),
    pairs AS (SELECT x.vec_id AS a, y.vec_id AS b,
                     ROUND(list_dot_product(x.v, y.v)
                           / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4)
                       AS sim
              FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
    SELECT a, b, sim FROM pairs WHERE sim >= 0.999 ORDER BY a, b""",
    "N2 embedding near-dup: sign-bit bucket join (no cross product), cosine ≥ 0.999",
)
def q28(spark, sf_dir):
    return embedding_near_dup_pairs(
        planted_vectors(spark, sf_dir).withColumnRenamed("v", "embedding"),
        "vec_id",
        "embedding",
        threshold=0.999,
        dims=16,
    )


# --------------------------------------------------------------------------
# Q29-Q32 — text analysis (N5)
# --------------------------------------------------------------------------

_SW = {k: "[" + ", ".join(f"'{w}'" for w in v) + "]" for k, v in TX.STOPWORDS.items()}


@register(
    "q29_language_id",
    f"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    s AS (SELECT doc_id,
            len(list_filter(ws, x -> list_contains({_SW['en']}, x))) AS s_en,
            len(list_filter(ws, x -> list_contains({_SW['es']}, x))) AS s_es,
            len(list_filter(ws, x -> list_contains({_SW['de']}, x))) AS s_de,
            len(list_filter(ws, x -> list_contains({_SW['fr']}, x))) AS s_fr
          FROM w)
    SELECT doc_id,
           CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_fr > 0 AND s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de THEN 'fr'
                ELSE 'zh' END AS predicted_lang
    FROM s ORDER BY doc_id""",
    "N5 language-ID: stopword-score argmax heuristic (deterministic tie order)",
)
def q29(spark, sf_dir):
    return (
        TX.with_language_id(
            _t(spark, sf_dir, "documents").select("doc_id", "text"),
            "text",
            out="predicted_lang",
        )
        .select("doc_id", "predicted_lang")
        .orderBy("doc_id")
    )


@register(
    "q30_quality_score",
    r"""SELECT doc_id,
           length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / (length(text) - length(replace(text, ' ', '')) + 1), 4) AS avg_token_len,
           ROUND(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
                 / greatest(length(text), 1), 4) AS punct_ratio,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                       x -> list_contains(['the', 'a', 'of', 'and', 'is'], x))) AS DOUBLE)
                 / (length(text) - length(replace(text, ' ', '')) + 1), 4) AS stopword_ratio
       FROM documents ORDER BY doc_id""",
    "N5 quality scoring: token stats, punctuation + stopword ratios",
)
def q30(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            TX.token_count("text").alias("n_tokens"),
            F.round(TX.avg_token_len("text"), 4).alias("avg_token_len"),
            F.round(TX.punct_ratio("text"), 4).alias("punct_ratio"),
            F.round(TX.stopword_ratio("text"), 4).alias("stopword_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "q31_fingerprint",
    r"""SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        FROM documents ORDER BY doc_id""",
    "N5 document fingerprint: md5 over normalized content (engine-portable)",
)
def q31(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", TX.fingerprint("text").alias("fp"))
        .orderBy("doc_id")
    )


@register(
    "q32_bpe_tokens",
    r"""SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe
        FROM documents ORDER BY doc_id""",
    "N5 BPE-style pre-tokenizer count (letter runs / digit runs / punct)",
)
def q32(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", TX.bpe_ish_token_count("text").cast("bigint").alias("n_bpe"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Q33 — exact dedup groups (N1)
# --------------------------------------------------------------------------


@register(
    "q33_exact_dedup_groups",
    DOCS_CORPUS_SQL
    + """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
         FROM corpus GROUP BY 1 HAVING count(*) > 1 ORDER BY h""",
    "N1 exact dedup: content-hash groups with representative selection",
)
def q33(spark, sf_dir):
    return duplicate_groups(planted_docs(spark, sf_dir), ["text"], "doc_id").orderBy("h")


# --------------------------------------------------------------------------
# Q34/Q35 — multimodal plumbing + bucketed ANN
# --------------------------------------------------------------------------


@register(
    "q34_multimodal_features",
    """SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
              md5(text) AS payload_md5
       FROM documents ORDER BY media_id""",
    "N4 multimodal: binary payload column → Arrow-batched mapInPandas feature "
    "extraction (decode stubbed; byte-level features oracle-checked)",
)
def q34(spark, sf_dir):
    media = documents_as_media(_t(spark, sf_dir, "documents"))
    return (
        extract_features(media)
        .select("media_id", "n_bytes", "payload_md5")
        .orderBy("media_id")
    )


@register(
    "q52_ivf_ann",
    """SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
       FROM embeddings WHERE vec_id % 10 = 0""",
    "N3 scale path #2: IVF-Flat ANN — k-means inverted file, nprobe nearest "
    "cells probed per query. Restated as a deterministic bounded-error "
    "check (round-3): Spark runs the real ANN search (k=5, nprobe=12) AND "
    "the exhaustive reference (nprobe=n_cells, proven ≡ brute force by "
    "q52b's hash-matched anchor), computes recall@5, and emits "
    "(n_queries, recall_ok := recall >= 0.9); the oracle emits the exact "
    "query count + literal TRUE. Measured recall at sf0.01 is 0.952 over "
    "50 queries (deterministic: seeded k-means on an md5-keyed sample — "
    "docs/ANN.md), so the 0.9 bound holds with margin without faking "
    "determinism of the sketch itself",
)
def q52(spark, sf_dir):
    from snowflake_cdc_spark.operators.ivf import build_ivf, ivf_recall_check

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = build_ivf(emb, n_cells=16)
    # single-pass recall check: candidates scored once, one shared window
    # sort yields both the exhaustive and the probed-subset rank
    return ivf_recall_check(idx, queries, k=5, nprobe=12, min_recall=0.9)


@register(
    "q35_ann_bucketed",
    """WITH b AS (
         SELECT vec_id, embedding,
                (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
              + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
              + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
              + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
              + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS bucket
         FROM embeddings),
       q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
             FROM b WHERE vec_id % 100 = 0),
       s AS (SELECT q.query_id, c.vec_id,
                    ROUND(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))
                          / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                                   CAST(c.embedding AS DOUBLE[])))
                             * sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]),
                                                     CAST(q.qv AS DOUBLE[])))), 4) AS sim
             FROM b c JOIN q USING (bucket)
             WHERE c.vec_id <> q.query_id),
       r AS (SELECT query_id, vec_id, sim,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) AS rn
             FROM s)
       SELECT query_id, vec_id, sim FROM r WHERE rn <= 3
       ORDER BY query_id, vec_id""",
    "N3 scale path: sign-bucket ANN join (corpus ⋈ queries on LSH cell, no "
    "cross product). Round-3: fully hash-checked — the operator is "
    "deterministic relative to its own spec (exact top-k within the "
    "query's sign bucket), and the oracle rebuilds the identical bucket "
    "restriction + cosine + rank in SQL; 'approximate vs true ANN' never "
    "meant 'uncheckable'",
)
def q35(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_topk_bucketed(emb, queries, k=3, dims=6).orderBy(
        "query_id", "vec_id"
    )


# --------------------------------------------------------------------------
# Q68/Q69 — the remaining Python-UDF surface (SURVEY.md §2.8): scalar
# pandas_udf and stateless grouped applyInPandas, both oracle-checked.
# --------------------------------------------------------------------------


@register(
    "q68_pandas_cosine",
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       SELECT e.vec_id,
              ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])))), 4) AS sim
       FROM embeddings e, q
       WHERE e.vec_id <> 0
       ORDER BY e.vec_id""",
    "N3 via the vectorized-UDF path: Arrow-batched scalar pandas_udf computing "
    "cosine against a broadcast query vector with one numpy matmul per batch — "
    "the 10-100x-over-row-UDF lane for math the built-ins can't express; "
    "rounding applied JVM-side after the UDF",
)
def q68(spark, sf_dir):
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    emb = _t(spark, sf_dir, "embeddings")
    qv = np.array(
        emb.filter(F.col("vec_id") == 0).select("embedding").head()[0],
        dtype=np.float64,
    )
    qn = float(np.sqrt(qv @ qv))

    # no pd.Series type hints: module-level `from __future__ import
    # annotations` stringifies them and the locally-imported pd can't
    # resolve — explicit returnType + hintless signature selects SCALAR
    def _cos(col):
        m = np.vstack(col.to_numpy()).astype(np.float64)
        return pd.Series((m @ qv) / (np.sqrt((m * m).sum(axis=1)) * qn))

    cos_sim = F.pandas_udf(_cos, DoubleType())

    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos_sim("embedding"), 4).alias("sim"))
        .orderBy("vec_id")
    )


@register(
    "q69_grouped_pandas_norm",
    """SELECT doc_id, lang,
              ROUND(CAST(n_chars - mn AS DOUBLE)
                    / CASE WHEN mx = mn THEN 1 ELSE mx - mn END, 4) AS norm
       FROM (SELECT doc_id, lang, n_chars,
                    min(n_chars) OVER (PARTITION BY lang) AS mn,
                    max(n_chars) OVER (PARTITION BY lang) AS mx
             FROM documents)
       ORDER BY doc_id""",
    "stateless grouped applyInPandas: per-language min-max normalization — "
    "whole-group pandas logic (integer min/max exact, one IEEE division per "
    "row, round applied JVM-side); oracle decorrelates to window min/max",
)
def q69(spark, sf_dir):
    def norm(pdf):
        mn, mx = pdf["n_chars"].min(), pdf["n_chars"].max()
        rng = (mx - mn) or 1
        out = pdf[["doc_id", "lang"]].copy()
        out["norm"] = (pdf["n_chars"] - mn) / rng
        return out

    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(norm, "doc_id long, lang string, norm double")
        .select("doc_id", "lang", F.round("norm", 4).alias("norm"))
        .orderBy("doc_id")
    )


@register(
    "q116_dedup_pipeline",
    "WITH RECURSIVE corpus AS ("
    + DOCS_CORPUS_SQL.split("corpus AS (", 1)[1].rsplit(")", 1)[0]
    + "),"
    + _SHINGLES_SQL.strip().lstrip()
    + """,
    mh AS (SELECT doc_id, shingles,
                  list_transform(generate_series(0, 7), j ->
                    list_aggregate(list_transform(shingles,
                      s -> md5(CAST(j AS VARCHAR) || ':' || s)), 'min')) AS sig
           FROM sh2),
    bands AS (SELECT doc_id, shingles, b,
                     md5(sig[4*b+1] || '|' || sig[4*b+2] || '|' || sig[4*b+3] || '|' || sig[4*b+4])
                       AS band_val
              FROM (SELECT doc_id, shingles, sig, unnest(generate_series(0, 1)) AS b FROM mh)),
    cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             FROM bands x JOIN bands y
               ON x.b = y.b AND x.band_val = y.band_val AND x.doc_id < y.doc_id),
    pairs AS (SELECT a, b
              FROM (SELECT a, b,
                           CAST(len(list_intersect(s1.hset, s2.hset)) AS DOUBLE)
                           / CAST(len(list_distinct(list_concat(s1.hset, s2.hset))) AS DOUBLE)
                             AS jac
                    FROM cand JOIN sh2 s1 ON s1.doc_id = cand.a
                              JOIN sh2 s2 ON s2.doc_id = cand.b)
              WHERE jac >= 0.8),
    sym AS (SELECT a AS src, b AS dst FROM pairs
            UNION SELECT b, a FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
    SELECT node AS doc_id, component AS canonical_id
    FROM comp WHERE node <> component ORDER BY doc_id""",
    "the full near-dup removal pipeline as one dataflow: MinHash-LSH "
    "candidate pairs (verified Jaccard >= 0.8) -> connected components -> "
    "drop list mapping every non-canonical duplicate to its cluster's "
    "min-id representative. Oracle rebuilds pairs with the q25 SQL and "
    "clusters them with an independent recursive-CTE transitive closure",
)
def q116(spark, sf_dir):
    docs = planted_docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", k=8, bands=2, threshold=0.8)
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    # auto: label-prop probe (near-dup clusters are shallow) with an
    # O(log d) star fallback should an adversarial deep cluster appear
    comp = connected_components(edges, algorithm="auto")
    return (
        comp.filter(F.col("node") != F.col("component"))
        .select(
            F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
        )
        .orderBy("doc_id")
    )


@register(
    "q52b_ivf_full_probe",
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                  FROM embeddings WHERE vec_id % 100 = 0),
       s AS (SELECT q.query_id, e.vec_id,
                    ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
                          / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                   CAST(e.embedding AS DOUBLE[])))
                             * sqrt(list_dot_product(q.qe, q.qe))), 4) AS sim
             FROM embeddings e, q WHERE e.vec_id <> q.query_id),
       r AS (SELECT query_id, vec_id, sim,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, vec_id) AS rn
             FROM s)
       SELECT query_id, vec_id, sim FROM r WHERE rn <= 3
       ORDER BY query_id, vec_id""",
    "IVF-Flat at nprobe = n_cells: every cell probed, so the index search "
    "must return EXACTLY the brute-force top-k — the correctness anchor "
    "that turns the approximate q52 lane into a hash-checked entry (the "
    "oracle is plain exhaustive cosine top-3 per query). Same plan shape "
    "as production IVF, just with the pruning disabled",
)
def q52b(spark, sf_dir):
    from snowflake_cdc_spark.operators.ivf import build_ivf, ivf_search

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = build_ivf(emb, n_cells=16)
    return (
        ivf_search(idx, queries, k=3, nprobe=16)
        .select("query_id", "vec_id", "sim")
        .orderBy("query_id", "vec_id")
    )
