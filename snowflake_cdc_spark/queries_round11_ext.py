"""Round-11 extension lanes (VERDICT r10): the extended script-aware
language-ID router (q245 — #5) and the corpus-build reject ledger
(q246 — #7).

Reference parity: the reference (add_output.py:421-448) lands raw CDC
text; these are warehouse-side curation passes over that landing zone.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.queries import _t, register

# --------------------------------------------------------------------------
# Q245 — extended script-aware language-ID (VERDICT r10 #5)
# --------------------------------------------------------------------------
#
# q243 proved the script-first routing on latin/cyrillic/cjk; this lane
# extends functions/text.py::script_of to the next four
# distinct-codepoint-range scripts — greek, arabic, devanagari, hangul
# — with a planted row set per script so the output itself proves every
# bucket fires and routes: greek -> el, arabic -> ar, devanagari -> hi,
# hangul -> ko (same one-scan higher-order-filter shape, no explode).

_PLANTS_245 = [
    # (modulus, true_lang, text) — moduli distinct from q243's 17/19
    (23, "ru", "привет мир это тестовое предложение для аудита"),
    (29, "zh", "模型 训练 数据 语料 评估 基准"),
    (31, "el", "αυτό είναι ένα δοκιμαστικό κείμενο για τον έλεγχο"),
    (37, "ar", "هذا نص تجريبي للتقييم والمراجعة"),
    (41, "hi", "यह एक परीक्षण वाक्य है जाँच के लिए"),
    (43, "ko", "이것은 검사를 위한 테스트 문장 입니다"),
]

_SW245 = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "y", "es"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "de", "et", "est"],
}

#: script -> routed language for the non-Latin buckets (the q243
#: routing extended; latin runs the stopword argmax, everything else
#: answers an honest 'und')
_ROUTE_245 = {
    "cyrillic": "ru",
    "cjk": "zh",
    "greek": "el",
    "arabic": "ar",
    "devanagari": "hi",
    "hangul": "ko",
}

# the EXACT script_of ranges, DuckDB-side (unicode(t) == Spark ascii,
# probed in q220): keep both CASEs token-identical
_SCRIPT_CASE_SQL = """
  CASE WHEN cp < 128 THEN 'latin'
       WHEN cp BETWEEN 880 AND 1023 THEN 'greek'
       WHEN cp < 1024 THEN 'latin_ext'
       WHEN cp < 1280 THEN 'cyrillic'
       WHEN cp BETWEEN 1536 AND 1791 THEN 'arabic'
       WHEN cp BETWEEN 2304 AND 2431 THEN 'devanagari'
       WHEN cp BETWEEN 4352 AND 4607 THEN 'hangul'
       WHEN cp BETWEEN 44032 AND 55215 THEN 'hangul'
       WHEN cp >= 11904 THEN 'cjk'
       ELSE 'other' END
"""


def _q245_oracle() -> str:
    plants = "\n  UNION ALL\n".join(
        f"  SELECT doc_id + {(i + 2) * 10000000} AS doc_id, "
        f"'{lang}' AS true_lang, '{text}' AS text "
        f"FROM documents WHERE doc_id % {mod} = 0"
        for i, (mod, lang, text) in enumerate(_PLANTS_245)
    )
    sw = {
        k: "[" + ", ".join(f"'{w}'" for w in v) + "]" for k, v in _SW245.items()
    }
    counts = ",\n         ".join(
        f"CAST(len(list_filter(sc, s -> s = '{s}')) AS BIGINT) AS n_{s}"
        for s in ("latin", "latin_ext", *_ROUTE_245)
    )
    # dominant script: argmax over the 8 buckets, ties by the fixed
    # bucket order below (mirrors the Spark CASE cascade exactly)
    order = ["cyrillic", "cjk", "greek", "arabic", "devanagari", "hangul"]
    dom = "CASE "
    for s in order:
        others = " AND ".join(
            f"n_{s} >= n_{o}" for o in order if o != s
        )
        dom += (
            f"WHEN n_{s} > 0 AND {others} AND n_{s} >= n_latin + n_latin_ext "
            f"THEN '{s}' "
        )
    dom += "ELSE 'latin' END"
    route = "CASE " + " ".join(
        f"WHEN script = '{s}' THEN '{lang}'" for s, lang in _ROUTE_245.items()
    )
    route += """ WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
             WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
             WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
             WHEN s_fr > 0 AND s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de THEN 'fr'
             ELSE 'und' END"""
    return f"""
WITH base AS (
  SELECT doc_id, lang AS true_lang, text FROM documents
  UNION ALL
{plants}),
w AS (SELECT doc_id, true_lang, string_split(text, ' ') AS ws,
             regexp_extract_all(lower(text), '[\\p{{L}}\\p{{M}}]+') AS uw
      FROM base),
s0 AS (SELECT doc_id, true_lang, ws,
              list_transform(list_transform(uw, t -> unicode(t)),
                             cp -> {_SCRIPT_CASE_SQL}) AS sc
       FROM w),
sc AS (SELECT doc_id, true_lang,
         {counts},
         len(list_filter(ws, x -> list_contains({sw['en']}, x))) AS s_en,
         len(list_filter(ws, x -> list_contains({sw['es']}, x))) AS s_es,
         len(list_filter(ws, x -> list_contains({sw['de']}, x))) AS s_de,
         len(list_filter(ws, x -> list_contains({sw['fr']}, x))) AS s_fr
       FROM s0),
p AS (SELECT true_lang, {dom} AS script, s_en, s_es, s_de, s_fr FROM sc),
r AS (SELECT true_lang, script, {route} AS predicted_lang FROM p)
SELECT true_lang, script, predicted_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


@register(
    "q245_script_language_id_ext",
    _q245_oracle(),
    "extended script-aware language-ID (VERDICT r10 #5): q243's "
    "script-first router widened from three scripts to seven — "
    "functions/text.py::script_of now carves greek (U+0370-03FF) out "
    "of latin_ext and hangul (jamo U+1100-11FF + syllables "
    "U+AC00-D7AF) out of the CJK block, and adds arabic (U+0600-06FF) "
    "and devanagari (U+0900-097F); the router sends each non-Latin "
    "dominant script to its language (cyrillic->ru, cjk->zh, "
    "greek->el, arabic->ar, devanagari->hi, hangul->ko), runs the "
    "stopword argmax only on Latin-dominant docs, and answers an "
    "honest 'und' otherwise. Six planted row sets (one per script, "
    "distinct doc_id moduli) make every bucket fire with nonzero "
    "n_docs, so the output itself proves the routing. Same shape as "
    "q243: one scan, per-token script via higher-order filters (no "
    "explode), one small groupBy",
)
def q245(spark, sf_dir):
    from snowflake_cdc_spark.functions.text import script_of, unicode_words

    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.col("lang").alias("true_lang"), "text")
    for i, (mod, lang, text) in enumerate(_PLANTS_245):
        base = base.unionByName(
            docs.filter(F.col("doc_id") % mod == 0).select(
                (F.col("doc_id") + (i + 2) * 10_000_000).alias("doc_id"),
                F.lit(lang).alias("true_lang"),
                F.lit(text).alias("text"),
            )
        )
    ws = F.split("text", " ")
    uw = unicode_words(F.col("text"))
    def _script_count(s):
        # closure via a real function scope: a 2-arg lambda with a
        # default would receive Spark's (elem, INDEX) pair instead
        return F.size(F.filter(uw, lambda t: script_of(t) == s)).cast("bigint")

    counts = {s: _script_count(s) for s in ("latin", "latin_ext", *_ROUTE_245)}

    def _sw_score(sws):
        arr = F.array(*[F.lit(s) for s in sws])
        return F.size(F.filter(ws, lambda x: F.array_contains(arr, x)))

    sc = base.select(
        "true_lang",
        *[counts[s].alias(f"n_{s}") for s in counts],
        *[_sw_score(sws).alias(f"s_{lang}") for lang, sws in _SW245.items()],
    )
    order = list(_ROUTE_245)
    script = F.lit("latin")
    for s in reversed(order):
        cond = F.col(f"n_{s}") > 0
        for o in order:
            if o != s:
                cond = cond & (F.col(f"n_{s}") >= F.col(f"n_{o}"))
        cond = cond & (
            F.col(f"n_{s}") >= F.col("n_latin") + F.col("n_latin_ext")
        )
        script = F.when(cond, F.lit(s)).otherwise(script)

    def _argmax(default):
        langs = list(_SW245)
        expr = F.lit(default)
        for lang in reversed(langs):
            cond = F.col(f"s_{lang}") > 0
            for o in langs:
                if o != lang:
                    cond = cond & (F.col(f"s_{lang}") >= F.col(f"s_{o}"))
            expr = F.when(cond, F.lit(lang)).otherwise(expr)
        return expr

    p = sc.withColumn("script", script)
    predicted = _argmax("und")
    for s, lang in reversed(list(_ROUTE_245.items())):
        predicted = F.when(F.col("script") == s, F.lit(lang)).otherwise(
            predicted
        )
    return (
        p.withColumn("predicted_lang", predicted)
        .groupBy("true_lang", "script", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "script", "predicted_lang")
    )


# --------------------------------------------------------------------------
# Q246 — corpus-build reject ledger (VERDICT r10 #7)
# --------------------------------------------------------------------------
#
# q239 reports ATTRITION per stage; from a user's view the drops are
# still silent data loss — nothing says WHICH document each gate
# rejected or WHY. This lane is the reject side of the same composed
# pipeline: one row per (stage, rejected doc), with the gate's name and
# a typed reason, so the funnel's n_in − n_out reconciles doc-by-doc
# (asserted in tests/test_corpus_build.py). Stage 5 (bpe_pack) rejects
# nothing by construction — every selected doc is packed (zero-token
# docs pack as 0) — so it has no ledger rows.


def _reject_oracle() -> str:
    from snowflake_cdc_spark.queries_round10_ext import _CB_CTES

    return (
        "WITH "
        + _CB_CTES
        + """
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage, 'nb_quality' AS gate, doc_id, n_toks,
         'nb_score_nonpositive' AS reason
  FROM candt WHERE doc_id NOT IN (SELECT doc_id FROM f1)
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'decontaminate', doc_id, n_toks,
         'test_contamination'
  FROM f1 WHERE doc_id NOT IN (SELECT doc_id FROM f2)
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'exact_dedup', doc_id, n_toks,
         'duplicate_fingerprint'
  FROM f2 WHERE doc_id NOT IN (SELECT doc_id FROM f3)
  UNION ALL
  SELECT CAST(4 AS BIGINT), 'budget_select', doc_id, n_toks,
         'zero_quality_score'
  FROM f3 WHERE len(list_distinct(ws)) < 1
  UNION ALL
  SELECT CAST(4 AS BIGINT), 'budget_select', doc_id, n_toks,
         'over_token_budget'
  FROM f3 WHERE len(list_distinct(ws)) >= 1
    AND doc_id NOT IN (SELECT doc_id FROM f4))
ORDER BY stage, doc_id"""
    )


@register(
    "q246_corpus_reject_ledger",
    _reject_oracle(),
    "corpus-build reject ledger (VERDICT r10 #7): the REJECT side of "
    "q239's composed pipeline — one row per (stage, dropped doc_id) "
    "with the gate name, the doc's token count, and a typed reason "
    "(nb_score_nonpositive / test_contamination / "
    "duplicate_fingerprint / zero_quality_score / over_token_budget), "
    "so a user can audit exactly what the funnel silently lost and "
    "why; the per-stage row counts reconcile EXACTLY with q239's "
    "n_in - n_out (asserted in tests/test_corpus_build.py). Each "
    "reject relation is the stage's anti-join — same stage "
    "DataFrames, same scale shapes; the oracle re-derives the full "
    "composition and selects the complement sides",
)
def q246(spark, sf_dir):
    from snowflake_cdc_spark.queries_round10_ext import _corpus_stages

    st = _corpus_stages(spark, sf_dir)
    candt, f1, f2, f3, f4 = (
        st["candt"],
        st["f1"],
        st["f2"],
        st["f3"],
        st["f4"],
    )

    def _led(df, stage, gate, reason):
        return df.select(
            F.lit(stage).cast("bigint").alias("stage"),
            F.lit(gate).alias("gate"),
            "doc_id",
            F.col("n_toks").cast("bigint").alias("n_toks"),
            F.lit(reason).alias("reason"),
        )

    r1 = _led(
        candt.join(f1.select("doc_id"), "doc_id", "left_anti"),
        1, "nb_quality", "nb_score_nonpositive",
    )
    r2 = _led(
        f1.join(f2.select("doc_id"), "doc_id", "left_anti"),
        2, "decontaminate", "test_contamination",
    )
    r3 = _led(
        f2.join(f3.select("doc_id"), "doc_id", "left_anti"),
        3, "exact_dedup", "duplicate_fingerprint",
    )
    sc = f3.withColumn("score", F.size(F.array_distinct("ws")).cast("bigint"))
    r4a = _led(
        sc.filter(F.col("score") < 1), 4, "budget_select", "zero_quality_score"
    )
    r4b = _led(
        sc.filter(F.col("score") >= 1).join(
            f4.select("doc_id"), "doc_id", "left_anti"
        ),
        4, "budget_select", "over_token_budget",
    )
    return (
        r1.unionByName(r2)
        .unionByName(r3)
        .unionByName(r4a)
        .unionByName(r4b)
        .orderBy("stage", "doc_id")
    )


# --------------------------------------------------------------------------
# Q247 — embedding-space outlier screen (round 11 widening)
# --------------------------------------------------------------------------
#
# The vector-quality pass the dedup/ANN battery was missing: corrupted
# embeddings (broken normalization, truncated encoders, poisoned
# inserts) sit FAR from every cluster center, and a training pipeline
# prunes them before SemDeDup/ANN ever run. Screen = exact integer
# distance-to-assigned-centroid vs the cell's mean distance: flag
# ``dist * n_cell > 2 * sum_dist`` (dist > 2x the cell mean — pure
# BIGINT cross-multiplication, no float, no sqrt). No window anywhere:
# one corpus-scaled assignment (q244's relational fit), one
# groupBy(cell), one broadcast join back, one filter.
#
# Plant: every vec_id % 53 == 0 vector is re-ingested at 3x magnitude
# under vec_id + 10_000_000 (the broken-normalization failure mode) —
# the output's ``planted`` column shows the screen catching them.

_OUT_FACTOR = 2  # flag dist > _OUT_FACTOR x cell mean
_OUT_PLANT_MOD = 53
_OUT_PLANT_OFFSET = 10_000_000


def _q247_oracle() -> str:
    from snowflake_cdc_spark.queries_round9_ext import _kmeans_chain_dyn

    chain = _kmeans_chain_dyn(rounds=2)
    assert chain.count("FROM embeddings") == 1
    base = f"""WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {_OUT_PLANT_OFFSET},
         list_transform(embedding,
           x -> CAST(CAST(x AS DOUBLE) * 3.0 AS FLOAT))
  FROM embeddings WHERE vec_id % {_OUT_PLANT_MOD} = 0),
"""
    chain = chain.replace("WITH ", base, 1).replace(
        "FROM embeddings)", "FROM base)"
    )
    return (
        chain
        + f""",
st AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(dist) AS BIGINT) AS s
       FROM a2 GROUP BY 1)
SELECT a.cell, a.vec_id, a.dist,
       (a.vec_id >= {_OUT_PLANT_OFFSET}) AS planted
FROM a2 a JOIN st USING (cell)
WHERE a.dist * st.n > {_OUT_FACTOR} * st.s
ORDER BY a.vec_id"""
    )


@register(
    "q247_embedding_outliers",
    _q247_oracle(),
    "embedding-space outlier screen (round 11): corrupted vectors "
    "(broken normalization, truncated encoders, poisoned inserts) sit "
    "far from every cluster center — flag vectors whose exact integer "
    "distance-to-assigned-centroid exceeds " + str(_OUT_FACTOR) + "x "
    "their cell's mean (BIGINT cross-multiplication dist*n > f*sum, "
    "no float, no sqrt, NO WINDOW — one corpus-scaled relational "
    "k-means assignment, one groupBy(cell), one broadcast join back). "
    "Planted 3x-magnitude copies of every vec_id%53 vector prove the "
    "catch in the hash-checked output's `planted` column. The pass a "
    "training pipeline runs BEFORE SemDeDup/ANN so junk vectors never "
    "pollute cells or neighbor lists",
)
def q247(spark, sf_dir):
    import math

    from snowflake_cdc_spark.operators.ivf_relational import (
        relational_kmeans_fit,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    plants = emb.filter(F.col("vec_id") % _OUT_PLANT_MOD == 0).select(
        (F.col("vec_id") + _OUT_PLANT_OFFSET).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * 3.0).cast("float")
        ).alias("embedding"),
    )
    base = emb.unionByName(plants)
    n = base.count()
    k_cells = max(8, math.ceil(math.sqrt(n)))
    _, assigned = relational_kmeans_fit(base, k=k_cells, rounds=2)
    st = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dist").cast("bigint").alias("s"),
    )
    return (
        assigned.join(F.broadcast(st), "cell")
        .filter(F.col("dist") * F.col("n") > _OUT_FACTOR * F.col("s"))
        .select(
            "cell",
            "vec_id",
            "dist",
            (F.col("vec_id") >= _OUT_PLANT_OFFSET).alias("planted"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Q248 — embedding-space split leakage (semantic eval decontamination)
# --------------------------------------------------------------------------
#
# Completes the contamination-audit family across modalities: q214
# finds shingle overlap, q217 exact text duplicates, q223 normalized
# matches — none of them catches a PARAPHRASED eval document whose
# embedding sits at cosine ~1 to a training vector (the leakage mode
# SemDeDup-style decontamination exists for). Screen = the q244
# machinery pointed across the split boundary: deterministic md5
# split of the vector corpus (test = md5 first hex char '0', ~1/16),
# corpus-scaled cells, and a BIPARTITE within-cell pair stage
# (train x test only, never train x train) with the exact signed-grid
# integer-cosine threshold. Plant: every vec_id % 71 == 0 TRAIN
# vector is re-ingested as a near-copy on the TEST side (+0.002 on
# every coordinate — cosine ~0.9999), so the output's `planted`
# column proves the catch. Same codegen discipline as q244: the dot
# is evaluated once behind the Generate barrier inside
# semantic_dup_pairs' algebra (re-expressed bipartite here).

_LEAK_T_NUM, _LEAK_T_DEN = 19, 20
_LEAK_GRID = 1000
_LEAK_PLANT_MOD = 71
_LEAK_PLANT_OFFSET = 20_000_000


def _q248_oracle(rounds: int = 2) -> str:
    from snowflake_cdc_spark.queries_round9_ext import _kmeans_chain_dyn

    chain = _kmeans_chain_dyn(rounds=rounds)
    assert chain.count("FROM embeddings") == 1
    base = f"""WITH base AS (
  SELECT vec_id, embedding,
         (substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0') AS is_test
  FROM embeddings
  UNION ALL
  SELECT vec_id + {_LEAK_PLANT_OFFSET},
         list_transform(embedding,
           x -> CAST(CAST(x AS DOUBLE) + 0.002 AS FLOAT)),
         TRUE
  FROM embeddings
  WHERE vec_id % {_LEAK_PLANT_MOD} = 0
    AND substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) <> '0'),
"""
    chain = chain.replace("WITH ", base, 1).replace(
        "FROM embeddings)", "FROM base)"
    )
    return (
        chain
        + f""",
sg AS (SELECT b.vec_id, b.is_test,
              list_transform(b.embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {_LEAK_GRID}.0 + 0.5)
                          AS BIGINT)) AS qc
       FROM base b),
sgn AS (SELECT vec_id, is_test, qc,
               CAST(list_sum(list_transform(qc, x -> x * x)) AS BIGINT) AS n2
        FROM sg),
mem AS (SELECT a.vec_id, a.cell, s.is_test, s.qc, s.n2
        FROM a{rounds} a JOIN sgn s USING (vec_id)),
pr AS (SELECT x.cell, x.vec_id AS train_vec, y.vec_id AS test_vec,
              CAST(list_sum(list_transform(list_zip(x.qc, y.qc),
                     p -> p[1] * p[2])) AS BIGINT) AS dot,
              x.n2 AS na2, y.n2 AS nb2
       FROM mem x JOIN mem y
         ON x.cell = y.cell AND NOT x.is_test AND y.is_test)
SELECT test_vec, train_vec, dot,
       (test_vec >= {_LEAK_PLANT_OFFSET}) AS planted
FROM pr
WHERE dot > 0
  AND dot * dot * {_LEAK_T_DEN * _LEAK_T_DEN}
      >= {_LEAK_T_NUM * _LEAK_T_NUM} * na2 * nb2
ORDER BY test_vec, train_vec"""
    )


@register(
    "q248_embedding_split_leakage",
    _q248_oracle(),
    "embedding-space split leakage (round 11): the contamination "
    "family's missing modality — q214/q217/q223 audit text overlap, "
    "but a PARAPHRASED eval doc shares no shingle while its embedding "
    "sits at cosine ~1 to a training vector. Deterministic md5 split "
    "of the vector corpus (test = first hex char '0'), corpus-scaled "
    "relational k-means cells over the union, then a BIPARTITE "
    "within-cell pair stage (train x test only) with the exact "
    "signed-grid integer-cosine threshold (19/20) and the q244 "
    "Generate-barrier codegen discipline. Planted near-copies "
    "(+0.002 per coordinate, cosine ~0.9999) of train vectors on the "
    "test side prove the catch in the output's `planted` column. "
    "Scale shape: one assignment, one shuffle on cell, never "
    "all-pairs, never train x train",
)
def q248(spark, sf_dir):
    import math

    from snowflake_cdc_spark.operators.ivf_relational import (
        relational_kmeans_fit,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    is_test = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) == "0"
    tagged = emb.withColumn("is_test", is_test)
    plants = tagged.filter(
        (F.col("vec_id") % _LEAK_PLANT_MOD == 0) & ~F.col("is_test")
    ).select(
        (F.col("vec_id") + _LEAK_PLANT_OFFSET).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") + 0.002).cast("float")
        ).alias("embedding"),
        F.lit(True).alias("is_test"),
    )
    base = tagged.unionByName(plants)
    n = base.count()
    k_cells = max(8, math.ceil(math.sqrt(n)))
    _, assigned = relational_kmeans_fit(
        base.select("vec_id", "embedding"), k=k_cells, rounds=2
    )
    qc = F.transform(
        "embedding",
        lambda x: F.floor(
            x.cast("double") * F.lit(float(_LEAK_GRID)) + F.lit(0.5)
        ).cast("bigint"),
    )
    sg = base.select("vec_id", "is_test", qc.alias("qc")).withColumn(
        "n2",
        F.aggregate(
            "qc", F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
        ),
    )
    mem = assigned.select("vec_id", "cell").join(sg, "vec_id")
    a = mem.filter(~F.col("is_test")).select(
        "cell",
        F.col("vec_id").alias("train_vec"),
        F.col("qc").alias("qa"),
        F.col("n2").alias("na2"),
    )
    b = mem.filter(F.col("is_test")).select(
        "cell",
        F.col("vec_id").alias("test_vec"),
        F.col("qc").alias("qb"),
        F.col("n2").alias("nb2"),
    )
    dot = None
    for i in range(1, 65):
        term = F.element_at("qa", i) * F.element_at("qb", i)
        dot = term if dot is None else dot + term
    dot = dot.cast("bigint")
    # the q244 Generate barrier: one dot per pair, never inlined into
    # the join condition (the 64 KB codegen overflow)
    return (
        a.join(b, "cell")
        .select(
            "test_vec",
            "train_vec",
            "na2",
            "nb2",
            F.explode(F.array(dot)).alias("dot"),
        )
        .filter(
            (F.col("dot") > 0)
            & (
                F.col("dot") * F.col("dot") * F.lit(_LEAK_T_DEN * _LEAK_T_DEN)
                >= F.lit(_LEAK_T_NUM * _LEAK_T_NUM)
                * F.col("na2")
                * F.col("nb2")
            )
        )
        .select(
            "test_vec",
            "train_vec",
            "dot",
            (F.col("test_vec") >= _LEAK_PLANT_OFFSET).alias("planted"),
        )
        .orderBy("test_vec", "train_vec")
    )
