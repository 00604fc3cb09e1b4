"""Round-10 extension lanes — the end-to-end corpus-build composition
(VERDICT r09 #1) and the remaining multilingual edges.

The curation battery has every stage a real training-data pipeline runs
(NB quality filter q235, decontamination q223/q225, dedup q22/q116,
budget selection q211/q221, BPE packing q209) but round 9 shipped them
only as separate lanes; q239/q240 compose them into the artifact a user
actually ships:

    candidates --NB filter--> f1 --decontaminate--> f2 --exact dedup-->
    f3 --token-budget select--> f4 --BPE tokenize + pack--> shards

- q239 is the per-stage attrition funnel over the REAL stages (q229's
  report shape, but each gate is the actual operator, not a proxy);
- q240 is the final packed-shard manifest (q209's shape) over the
  composed pipeline's survivors, BPE trained on the SELECTED corpus.

Roles on q210's deterministic stratified split: the VAL split is the
curated SEED that trains the quality classifier (the CCNet posture —
a small trusted sample scores the big crawl), the TRAIN split is the
crawl being curated, the TEST split is the held-out benchmark that
decontamination protects. Two in-query plants give stages real,
deterministic attrition on the synthetic corpus (the q223/q229
precedent): candidates with doc_id % 11 == 0 share a sentinel sentence
with the test split (decontamination must drop them), and every
candidate with doc_id % 5 == 0 is re-ingested as an exact replica under
doc_id + 10_000_000 (exact dedup must collapse the pair to its
md5-smallest member).

Scale shapes are inherited from the component lanes: NB is vocab-keyed
joins (never doc x vocab), decontamination is shingle-keyed (never
doc x doc), dedup is a fingerprint groupBy, selection is the sort-free
skewed_count_rank + bucketed cumsum, packing is per-bucket prefix sums.
The oracle re-derives the ENTIRE composition — split, model, every
score, gram hits, dedup winners, the selection prefix, the BPE merges,
and the packing sums — in one CTE chain.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.queries import _t, register

# --------------------------------------------------------------------------
# Q239/Q240 — the end-to-end corpus build
# --------------------------------------------------------------------------

# planted contamination: appended to EVERY test doc and to candidates
# with doc_id % 11 == 0, so decontamination has deterministic attrition
_PLANT = "heldout benchmark sentinel sequence for the leakage audit lane"
_REPL_OFFSET = 10_000_000  # replica ids: doc_id + offset (exact-dup plant)
_CB_BUDGET = 2_000  # token budget — bites at every driver SF
_CB_CAPACITY = 512  # packing window, BPE tokens
_CB_BUCKETS = 8  # packing shards
_CB_ROUNDS = 8  # BPE merge rounds (the q209/q145 setting)
_SEL_BUCKETS = 256  # cumsum range-buckets for the sort-free selection

# The shared CTE chain: split -> NB model from the seed -> planted
# candidates -> f1 (NB survivors) -> f2 (decontaminated) -> f3 (deduped)
# -> f4 (budget-selected). NB algebra is _NB_CTES' (queries_round9_ext)
# with the seed role moved to the val split.
_CB_CTES = f"""
d AS (SELECT doc_id, source, (lang = 'en') AS pos, text,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM d),
s AS MATERIALIZED (SELECT doc_id, source, pos, text, h,
             CASE WHEN rk <= (8 * n) // 10 THEN 'train'
                  WHEN rk <= (9 * n) // 10 THEN 'val'
                  ELSE 'test' END AS split
      FROM r),
seed AS (SELECT doc_id, pos,
                regexp_extract_all(lower(text), '[\\p{{L}}\\p{{M}}]+') AS ws
         FROM s WHERE split = 'val'),
tr AS (SELECT doc_id, pos, unnest(ws) AS w FROM seed),
cls AS (SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS d1,
               CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS d0
        FROM seed),
wc AS (SELECT w,
              CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS c1,
              CAST(count(*) FILTER (WHERE NOT pos) AS BIGINT) AS c0
       FROM tr GROUP BY 1),
nv AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0,
              CAST(count(*) AS BIGINT) AS v
       FROM wc),
lr AS MATERIALIZED (SELECT w,
              CAST(floor(ln((CAST(c1 + 1 AS DOUBLE) * CAST(n0 + v AS DOUBLE))
                            / (CAST(c0 + 1 AS DOUBLE) * CAST(n1 + v AS DOUBLE)))
                         * 1000000.0 + 0.5) AS BIGINT) AS llr
       FROM wc CROSS JOIN nv),
k AS MATERIALIZED (SELECT CAST(floor(ln(CAST(d1 AS DOUBLE) / CAST(d0 AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS prior,
             CAST(floor(ln(CAST(n0 + v AS DOUBLE) / CAST(n1 + v AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS unseen
      FROM cls CROSS JOIN nv),
cand0 AS (SELECT doc_id, source,
                 text || CASE WHEN doc_id % 11 = 0
                              THEN ' {_PLANT}' ELSE '' END AS text
          FROM s WHERE split = 'train'),
cand AS (SELECT doc_id, source, text, md5(CAST(doc_id AS VARCHAR)) AS h,
                regexp_extract_all(lower(text), '[\\p{{L}}\\p{{M}}]+') AS ws
         FROM (SELECT doc_id, source, text FROM cand0
               UNION ALL
               SELECT doc_id + {_REPL_OFFSET}, source, text
               FROM cand0 WHERE doc_id % 5 = 0)),
candt AS MATERIALIZED (SELECT doc_id, source, text, h, ws,
                 CAST(len(ws) AS BIGINT) AS n_toks
          FROM cand),
cc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
       FROM (SELECT doc_id, unnest(ws) AS w FROM candt) GROUP BY 1, 2),
ww AS (SELECT cc.doc_id,
              CAST(sum(cc.c * coalesce(lr.llr, k.unseen)) AS BIGINT) AS wsum
       FROM cc LEFT JOIN lr ON lr.w = cc.w CROSS JOIN k
       GROUP BY 1),
f1 AS MATERIALIZED (SELECT candt.* FROM candt LEFT JOIN ww USING (doc_id) CROSS JOIN k
       WHERE (coalesce(ww.wsum, 0) + k.prior) > 0),
nte AS (SELECT regexp_extract_all(replace(lower(text || ' {_PLANT}'), '''', ''),
                                  '[\\p{{L}}\\p{{M}}0-9]+') AS nws
        FROM s WHERE split = 'test'),
teg AS MATERIALIZED (SELECT DISTINCT unnest(list_transform(generate_series(1, len(nws) - 4),
               i -> array_to_string(nws[i:i+4], ' '))) AS gram
        FROM nte WHERE len(nws) >= 5),
f1n AS (SELECT doc_id,
               regexp_extract_all(replace(lower(text), '''', ''),
                                  '[\\p{{L}}\\p{{M}}0-9]+') AS nws
        FROM f1),
f1g AS (SELECT doc_id,
               unnest(list_transform(generate_series(1, len(nws) - 4),
                      i -> array_to_string(nws[i:i+4], ' '))) AS gram
        FROM f1n WHERE len(nws) >= 5),
hits AS (SELECT DISTINCT f1g.doc_id FROM f1g JOIN teg USING (gram)),
f2 AS MATERIALIZED (SELECT f1.* FROM f1 LEFT JOIN hits USING (doc_id)
       WHERE hits.doc_id IS NULL),
fp AS (SELECT doc_id, md5(lower(text)) AS fp, h FROM f2),
keep AS (SELECT doc_id FROM (
           SELECT doc_id, row_number() OVER (PARTITION BY fp
                                             ORDER BY h, doc_id) AS rn
           FROM fp) WHERE rn = 1),
f3 AS MATERIALIZED (SELECT f2.* FROM f2 JOIN keep USING (doc_id)),
sc4 AS (SELECT doc_id, source, text, n_toks, h,
               CAST(len(list_distinct(ws)) AS BIGINT) AS score
        FROM f3 WHERE len(list_distinct(ws)) >= 1),
r4 AS (SELECT *, row_number() OVER (ORDER BY score DESC, h, doc_id) AS rk4
       FROM sc4),
c4 AS (SELECT *, sum(n_toks) OVER (ORDER BY rk4
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       FROM r4),
f4 AS MATERIALIZED (SELECT doc_id, source, text, n_toks FROM c4 WHERE cum <= {_CB_BUDGET})
"""


def _cb_bpe_pack_ctes() -> str:
    """BPE trained on the SELECTED corpus (f4) + the q209 packing sums,
    as a CTE-chain suffix for _CB_CTES (the tokenizer a pipeline ships
    is trained on the corpus it ships)."""
    from snowflake_cdc_spark.operators.bpe import _bpe_chain_ctes

    ctes = _bpe_chain_ctes(_CB_ROUNDS, "f4")
    ctes.append(
        f"btok AS (SELECT word, CAST(len(string_split(w, chr(30))) - 1 AS BIGINT) "
        f"AS n_tok FROM w{_CB_ROUNDS})"
    )
    ctes.append(
        "docw AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM f4)"
    )
    ctes.append(
        "dw AS (SELECT doc_id, CAST(sum(n_tok) AS BIGINT) AS n_bpe "
        "FROM docw JOIN btok USING (word) GROUP BY 1)"
    )
    ctes.append(
        "perdoc AS MATERIALIZED (SELECT f4.doc_id, coalesce(dw.n_bpe, 0) AS n_bpe, "
        "CAST(CAST('0x' || substring(md5(CAST(f4.doc_id AS VARCHAR)), 1, 4) "
        f"AS UBIGINT) % {_CB_BUCKETS} AS BIGINT) AS bucket "
        "FROM f4 LEFT JOIN dw ON dw.doc_id = f4.doc_id)"
    )
    return ", " + ", ".join(ctes)


_FUNNEL_ORACLE = (
    "WITH "
    + _CB_CTES
    + _cb_bpe_pack_ctes()
    + f"""
SELECT * FROM (
  SELECT 1 AS stage, 'nb_quality' AS gate,
         (SELECT CAST(count(*) AS BIGINT) FROM candt) AS n_in,
         (SELECT CAST(count(*) AS BIGINT) FROM f1) AS n_out,
         (SELECT CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM f1) AS tokens_out
  UNION ALL SELECT 2, 'decontaminate',
         (SELECT count(*) FROM f1), (SELECT count(*) FROM f2),
         (SELECT CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM f2)
  UNION ALL SELECT 3, 'exact_dedup',
         (SELECT count(*) FROM f2), (SELECT count(*) FROM f3),
         (SELECT CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM f3)
  UNION ALL SELECT 4, 'budget_select',
         (SELECT count(*) FROM f3), (SELECT count(*) FROM f4),
         (SELECT CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM f4)
  UNION ALL SELECT 5, 'bpe_pack',
         (SELECT count(*) FROM f4), (SELECT count(*) FROM perdoc),
         (SELECT CAST(coalesce(sum(n_bpe), 0) AS BIGINT) FROM perdoc))
ORDER BY stage"""
)

_MANIFEST_ORACLE = (
    "WITH "
    + _CB_CTES
    + _cb_bpe_pack_ctes()
    + f""",
c AS (SELECT bucket, doc_id, n_bpe,
             sum(n_bpe) OVER (PARTITION BY bucket ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
      FROM perdoc),
p AS (SELECT bucket, n_bpe,
             CAST(floor((cum - n_bpe) / {_CB_CAPACITY}.0) AS BIGINT) AS first_bin,
             CAST(greatest(floor((cum - n_bpe) / {_CB_CAPACITY}.0),
                           floor((cum - 1) / {_CB_CAPACITY}.0)) AS BIGINT) AS last_bin
      FROM c)
SELECT bucket, count(*) AS n_docs,
       CAST(sum(n_bpe) AS BIGINT) AS total_tokens,
       CAST(ceil(sum(n_bpe) / {_CB_CAPACITY}.0) AS BIGINT) AS n_bins,
       CAST(sum(CASE WHEN first_bin <> last_bin THEN 1 ELSE 0 END) AS BIGINT)
         AS n_split_docs,
       CAST(CAST(ceil(sum(n_bpe) / {_CB_CAPACITY}.0) AS BIGINT) * {_CB_CAPACITY}
            - sum(n_bpe) AS BIGINT) AS pad_tokens
FROM p GROUP BY bucket ORDER BY bucket"""
)


def _split(spark, sf_dir):
    """q210's deterministic stratified split with the corpus columns the
    build needs; checkpointed once — seed/candidates/test all read it."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        (F.col("lang") == "en").alias("pos"),
        "text",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w_rk = Window.partitionBy("source").orderBy("h", "doc_id")
    w_n = Window.partitionBy("source")
    return (
        d.withColumn("rk", F.row_number().over(w_rk))
        .withColumn("n", F.count(F.lit(1)).over(w_n))
        .select(
            "doc_id",
            "source",
            "pos",
            "text",
            "h",
            F.when(F.expr("rk <= (8 * n) DIV 10"), "train")
            .when(F.expr("rk <= (9 * n) DIV 10"), "val")
            .otherwise("test")
            .alias("split"),
        )
        .localCheckpoint(eager=False)
    )


def _uwords(col):
    return F.regexp_extract_all(F.lower(col), F.lit(UNICODE_WORD), F.lit(0))


def _norm_grams(df, text_col="text"):
    """Normalized 5-gram shingles (the q225 matching normalization:
    lowercase, apostrophe collapse, alphanumeric tokens)."""
    from snowflake_cdc_spark.functions.text import UNICODE_WORD_NUM

    nws = F.regexp_extract_all(
        F.replace(F.lower(F.col(text_col)), F.lit("'"), F.lit("")),
        F.lit(UNICODE_WORD_NUM),
        F.lit(0),
    )
    base = df.withColumn("__nws", nws).filter(F.size("__nws") >= 5)
    return base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__nws") - 4),
                lambda i: F.concat_ws(" ", F.slice("__nws", i, F.lit(5))),
            )
        ).alias("gram"),
    )


def _budget_select(sc_df, budget: int):
    """q211's sort-free greedy selection (skewed_count_rank + the
    256-bucket broadcast-offset cumsum) over (doc_id, score, n_toks,
    ...carry) — identical selection set to the oracle's single-sort
    (score DESC, md5, id) prefix."""
    from snowflake_cdc_spark.operators.rank import skewed_count_rank

    ranked = skewed_count_rank(
        sc_df, "score", "doc_id", ascending=False, rank_col="rk"
    )
    n = sc_df.agg(F.count(F.lit(1)).alias("__n"))
    keyed = (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(
            "__rb",
            F.expr(f"CAST(((rk - 1) * {_SEL_BUCKETS}) DIV __n AS BIGINT)"),
        )
        .localCheckpoint(eager=True)  # both branches read the rank subtree
    )
    per_bucket = keyed.groupBy("__rb").agg(F.sum("n_toks").alias("__bt"))
    offsets = per_bucket.select(
        "__rb",
        (F.sum("__bt").over(Window.orderBy("__rb")) - F.col("__bt")).alias("__off"),
    )
    w_intra = (
        Window.partitionBy("__rb")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        keyed.join(F.broadcast(offsets), "__rb")
        .withColumn("cum", F.col("__off") + F.sum("n_toks").over(w_intra))
        .filter(F.col("cum") <= budget)
    )


def _corpus_stages(spark, sf_dir, lr=None, k=None):
    """Run the composed pipeline; returns the per-stage DataFrames
    {candt, f1, f2, f3, f4}. ``lr``/``k``: an externally maintained NB
    model (the streaming maintainer's) replacing the batch-trained one —
    the batch/streaming parity seam."""
    from snowflake_cdc_spark.operators.nb import nb_score, nb_train

    s = _split(spark, sf_dir)
    if lr is None:
        seed = s.filter(F.col("split") == "val").select(
            "doc_id", "pos", _uwords(F.col("text")).alias("ws")
        )
        lr, k = nb_train(seed)

    cand0 = s.filter(F.col("split") == "train").select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" " + _PLANT)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    replicas = cand0.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _REPL_OFFSET).alias("doc_id"), "source", "text"
    )
    candt = (
        cand0.unionByName(replicas)
        .select(
            "doc_id",
            "source",
            "text",
            F.md5(F.col("doc_id").cast("string")).alias("h"),
            _uwords(F.col("text")).alias("ws"),
        )
        .withColumn("n_toks", F.size("ws").cast("bigint"))
        .localCheckpoint(eager=False)
    )

    # stage 1: NB quality filter (score > 0 against the seed model)
    scored = nb_score(candt.select("doc_id", "ws"), lr, k)
    f1 = candt.join(
        scored.filter(F.col("pred_pos")).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=False)

    # stage 2: decontaminate vs the (planted) test split — gram-keyed
    test_g = (
        _norm_grams(
            s.filter(F.col("split") == "test").select(
                "doc_id", F.concat(F.col("text"), F.lit(" " + _PLANT)).alias("text")
            )
        )
        .select("gram")
        .distinct()
    )
    hits = _norm_grams(f1).join(test_g, "gram").select("doc_id").distinct()
    f2 = f1.join(hits, "doc_id", "left_anti").localCheckpoint(eager=False)

    # stage 3: exact dedup — fingerprint groupBy, md5-smallest survives
    w_fp = Window.partitionBy("fp").orderBy("h", "doc_id")
    keep = (
        f2.select("doc_id", F.md5(F.lower(F.col("text"))).alias("fp"), "h")
        .withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )
    f3 = f2.join(keep, "doc_id").localCheckpoint(eager=False)

    # stage 4: token-budget selection (quality = distinct-word count)
    sc4 = f3.select(
        "doc_id",
        "source",
        "text",
        "n_toks",
        "h",
        F.size(F.array_distinct("ws")).cast("bigint").alias("score"),
    ).filter(F.col("score") >= 1)
    f4 = (
        _budget_select(sc4, _CB_BUDGET)
        .select("doc_id", "source", "text", "n_toks")
        .localCheckpoint(eager=False)
    )
    return {"candt": candt, "f1": f1, "f2": f2, "f3": f3, "f4": f4}


def _bpe_perdoc(f4):
    """Train BPE on the selected corpus, tokenize it, return per-doc
    (doc_id, n_bpe) — q209's composition pointed at f4."""
    from snowflake_cdc_spark.operators.bpe import (
        apply_bpe,
        train_bpe,
        word_frequencies,
    )

    words = word_frequencies(f4)
    merges = train_bpe(words, rounds=_CB_ROUNDS).collect()
    tok = apply_bpe(words, [tuple(m) for m in merges])
    docw = f4.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    dw = (
        docw.join(F.broadcast(tok), "word")
        .groupBy("doc_id")
        .agg(F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe"))
    )
    return f4.select("doc_id").join(dw, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("n_bpe"), F.lit(0)).cast("bigint").alias("n_bpe")
    )


def _funnel_report(spark, stages, perdoc):
    """Five 1-row aggregates cross-joined into the q229-shaped funnel."""
    aggs = []
    for name in ("candt", "f1", "f2", "f3", "f4"):
        aggs.append(
            stages[name].agg(
                F.count(F.lit(1)).cast("bigint").alias(f"n_{name}"),
                F.coalesce(F.sum("n_toks"), F.lit(0))
                .cast("bigint")
                .alias(f"t_{name}"),
            )
        )
    aggs.append(
        perdoc.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_perdoc"),
            F.coalesce(F.sum("n_bpe"), F.lit(0)).cast("bigint").alias("t_bpe"),
        )
    )
    t = aggs[0]
    for a in aggs[1:]:
        t = t.crossJoin(F.broadcast(a))
    return t.selectExpr(
        "inline(array("
        "struct(CAST(1 AS BIGINT) AS stage, 'nb_quality' AS gate, "
        "  n_candt AS n_in, n_f1 AS n_out, t_f1 AS tokens_out),"
        "struct(CAST(2 AS BIGINT) AS stage, 'decontaminate' AS gate, "
        "  n_f1 AS n_in, n_f2 AS n_out, t_f2 AS tokens_out),"
        "struct(CAST(3 AS BIGINT) AS stage, 'exact_dedup' AS gate, "
        "  n_f2 AS n_in, n_f3 AS n_out, t_f3 AS tokens_out),"
        "struct(CAST(4 AS BIGINT) AS stage, 'budget_select' AS gate, "
        "  n_f3 AS n_in, n_f4 AS n_out, t_f4 AS tokens_out),"
        "struct(CAST(5 AS BIGINT) AS stage, 'bpe_pack' AS gate, "
        "  n_f4 AS n_in, n_perdoc AS n_out, t_bpe AS tokens_out)))"
    ).orderBy("stage")


@register(
    "q239_corpus_build_funnel",
    _FUNNEL_ORACLE,
    "END-TO-END corpus build, attrition report (VERDICT r09 #1): the "
    "real stages composed — NB quality filter (q235's operator, seed = "
    "the val split, the CCNet small-trusted-sample posture) -> "
    "normalized-shingle decontamination against the test split (q225) "
    "-> exact dedup (md5 fingerprint groupBy, md5-smallest survives) "
    "-> 2000-token greedy budget selection (q211's sort-free rank + "
    "bucketed cumsum) -> BPE tokenize-and-pack (q209, tokenizer "
    "trained on the SELECTED corpus). Output = q229's funnel shape "
    "with each gate the actual operator. Two deterministic in-query "
    "plants give dedup and decontamination real attrition (q223/q229 "
    "precedent): doc_id%11 candidates share a sentinel sentence with "
    "the test split; doc_id%5 candidates are re-ingested as exact "
    "replicas. The oracle re-derives the whole composition in one CTE "
    "chain. Scale: every stage keeps its component lane's shape — "
    "vocab-keyed NB joins, gram-keyed decontamination, fingerprint "
    "groupBy dedup, sort-free selection, per-bucket packing sums",
)
def q239(spark, sf_dir):
    stages = _corpus_stages(spark, sf_dir)
    perdoc = _bpe_perdoc(stages["f4"])
    return _funnel_report(spark, stages, perdoc)


@register(
    "q240_corpus_build_manifest",
    _MANIFEST_ORACLE,
    "END-TO-END corpus build, shard manifest (VERDICT r09 #1): the "
    "artifact the q239 pipeline actually ships — the final selected "
    "corpus BPE-tokenized (8 merges trained on the survivors "
    "themselves) and packed into 512-token windows across 8 md5 "
    "shards; per-shard docs, BPE tokens, windows, split docs and "
    "padding (q209's manifest shape over the composed pipeline's "
    "output). Hash-matching this manifest pins every upstream stage: "
    "a single changed survivor anywhere in the funnel changes the "
    "packing sums",
)
def q240(spark, sf_dir):
    from snowflake_cdc_spark.operators.packing import packing_stats

    stages = _corpus_stages(spark, sf_dir)
    perdoc = _bpe_perdoc(stages["f4"])
    return packing_stats(
        perdoc, "doc_id", "n_bpe", capacity=_CB_CAPACITY, n_buckets=_CB_BUCKETS
    ).select(
        "bucket",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.col("n_bins").cast("bigint").alias("n_bins"),
        F.col("n_split_docs").cast("bigint").alias("n_split_docs"),
        F.col("pad_tokens").cast("bigint").alias("pad_tokens"),
    )
