"""Round-9 extension lanes — the scale-safe ANN evaluation shapes
(VERDICT r08 #1) plus the round's curation additions.

The round-8 sf1 probe (docs/PLANS.md) measured the shipped ANN
recall-eval lanes quadratic (query panel scales WITH the corpus) and
measured the fixes linear; this module ships those fixes as
oracle-backed registry queries so the hash-checked surface contains the
form you'd actually run at 100 TB:

- q52c/q133c/q144c — the q52/q133/q144 recall checks re-run against a
  FIXED 128-query md5-chosen panel: the exhaustive ground-truth pass
  becomes corpus x 128 (linear in the corpus — measured exponent 0.97
  at the round-8 probe) instead of corpus x corpus/10. The original
  lanes stay registered as the full-ground-truth forms for driver SFs.
- q192b — mutual-NN with a CORPUS-SIZED cell count: k_cells =
  max(8, ceil(sqrt(N))) keeps the per-cell population ~sqrt(N), so the
  cell equi-join stays ~N^1.5 total candidate pairs instead of N^2/8
  (the round-8 probe measured the k=80-at-sf1 variant at 144 s vs
  TIMEOUT>360 for fixed k=8). Fully oracle-checked: the exact-integer
  k-means chain (q157/q158 discipline) is re-derived in SQL with the
  SAME dynamic k via a scalar subquery — sqrt is IEEE-exactly-rounded,
  so ceil(sqrt(n)) is bit-identical across Python, Spark and DuckDB.

All lanes keep the standing disciplines: token-identical DuckDB
oracles, md5-only randomness, bounded driver-side state (the centroid
table is k x d ints, k ~ sqrt(N) — the FAISS "centroids are small"
posture).
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.operators.histogram import ntile_fill_sql
from snowflake_cdc_spark.queries import _t, register
from snowflake_cdc_spark.operators.util import ckpt_lazy

# --------------------------------------------------------------------------
# Q52c/Q133c/Q144c — fixed-panel ANN recall evaluation (the 100-TB shape)
# --------------------------------------------------------------------------

PANEL_SIZE = 128

_PANEL_ORACLE = f"""SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
       FROM (SELECT vec_id FROM embeddings
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {PANEL_SIZE})"""


def _md5_panel(emb, n: int = PANEL_SIZE):
    """The fixed evaluation panel: the n md5-smallest vec_ids
    (layout-invariant, the bounded_md5_sample/kmeans-seed key). A
    TakeOrderedAndProject — one linear scan, no global sort."""
    key = F.md5(F.col("vec_id").cast("string"))
    return (
        emb.orderBy(key, "vec_id")
        .limit(n)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
    )


@register(
    "q52c_ivf_ann_panel",
    _PANEL_ORACLE,
    "N3 scale-safe evaluation shape (VERDICT r08 #1): the q52 IVF "
    "recall@5 check against a FIXED 128-query md5-chosen panel instead "
    "of the corpus-proportional vec_id%10 panel — the exhaustive "
    "ground-truth pass is corpus x 128, LINEAR in the corpus (round-8 "
    "sf1 probe: exponent 0.97 vs TIMEOUT for the proportional form; "
    "docs/PLANS.md). This is the form an evaluation harness runs at "
    "100 TB; q52 remains the full-ground-truth form for driver SFs. "
    "Same operators/ivf.py index (n_cells=16, nprobe=12), same "
    "single-pass shared-window recall algebra, same >= 0.9 bound "
    "(measured 0.96 at sf0.01, 0.95 at sf0.1 on the panel)",
)
def q52c(spark, sf_dir):
    from snowflake_cdc_spark.operators.ivf import build_ivf, ivf_recall_check

    emb = _t(spark, sf_dir, "embeddings")
    idx = build_ivf(emb, n_cells=16)
    return ivf_recall_check(idx, _md5_panel(emb), k=5, nprobe=12, min_recall=0.9)


@register(
    "q133c_pq_ann_panel",
    _PANEL_ORACLE,
    "N3 scale-safe evaluation shape (VERDICT r08 #1): the q133 PQ "
    "recall@5 check against the fixed 128-query md5 panel (q52c "
    "pattern) — ADC scan + exact-cosine ground truth both go linear in "
    "the corpus. Same operators/pq.py index (m=8 x 256 codewords), "
    "same shortlist=100 re-rank, same >= 0.9 bound",
)
def q133c(spark, sf_dir):
    from snowflake_cdc_spark.operators.pq import build_pq, pq_recall_check

    emb = _t(spark, sf_dir, "embeddings")
    idx = build_pq(emb, m=8, k=256)
    return pq_recall_check(idx, _md5_panel(emb), k=5, shortlist=100, min_recall=0.9)


@register(
    "q144c_ivfpq_ann_panel",
    _PANEL_ORACLE,
    "N3 scale-safe evaluation shape (VERDICT r08 #1): the q144 "
    "composed IVF-PQ recall@5 check against the fixed 128-query md5 "
    "panel (q52c pattern). Same operators/ivfpq.py index (16 cells, "
    "nprobe=12, m=8 x 256, shortlist=200), same double-flag "
    "single-pass recall algebra, same >= 0.9 bound",
)
def q144c(spark, sf_dir):
    from snowflake_cdc_spark.operators.ivfpq import build_ivfpq, ivfpq_recall_check

    emb = _t(spark, sf_dir, "embeddings")
    idx = build_ivfpq(emb, n_cells=16, m=8, k=256)
    return ivfpq_recall_check(
        idx, _md5_panel(emb), k=5, nprobe=12, shortlist=200, min_recall=0.9
    )


# --------------------------------------------------------------------------
# Q192b — mutual-NN with corpus-sized cell count (the 100-TB shape)
# --------------------------------------------------------------------------


def _kmeans_chain_dyn(rounds: int = 2, dim: int = 64) -> str:
    """The q157/q158 exact-integer k-means CTE chain with a DYNAMIC
    cell count: k = max(8, ceil(sqrt(N))) computed from the corpus via
    a scalar subquery (sqrt is IEEE-exactly-rounded, so the Python and
    DuckDB values agree bit-for-bit). Everything else is the
    queries_governance_ext._kmeans_chain algebra verbatim — md5-ranked
    seeds, integer distances, per-dim sums DIV counts."""
    head = """WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor((CAST(x AS DOUBLE) + 1.0) * 10000.0 + 0.5) AS BIGINT)) AS qv
  FROM embeddings),
kk AS (SELECT greatest(8, CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)) AS k
       FROM q),
sd AS (SELECT vec_id, qv FROM q
       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT (SELECT k FROM kk)),
c0 AS (SELECT CAST(row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cell,
              qv
       FROM sd)"""
    parts = [head]
    for r in range(1, rounds + 1):
        prev_c = f"c{r-1}"
        parts.append(f""",
d{r} AS (SELECT q.vec_id, q.qv, c.cell,
              CAST(list_sum(list_transform(list_zip(q.qv, c.qv),
                     p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS dist
       FROM q, {prev_c} c),
a{r} AS (SELECT vec_id, qv, cell, dist FROM (
         SELECT *, row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cell) AS rn FROM d{r})
       WHERE rn = 1)""")
        if r < rounds:
            parts.append(f""",
s{r} AS (SELECT cell, i AS pos, CAST(sum(qv[i]) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
       FROM a{r}, unnest(generate_series(1, {dim})) t(i) GROUP BY 1, 2),
c{r} AS (SELECT cell, list(s // n ORDER BY pos) AS qv FROM s{r} GROUP BY 1)""")
    return "".join(parts)


def _mutual_nn_scaled_oracle(rounds: int = 2, dim: int = 64, nprobe: int = 4) -> str:
    return _kmeans_chain_dyn(rounds, dim) + f""",
qs AS (SELECT vec_id AS query_id, qv FROM q),
pd AS (SELECT s.query_id, s.qv, c.cell,
              CAST(list_sum(list_transform(list_zip(s.qv, c.qv),
                     p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS cdist
       FROM qs s, c{rounds - 1} c),
pr AS (SELECT query_id, qv, cell FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                                      ORDER BY cdist, cell) AS rn FROM pd)
       WHERE rn <= {nprobe}),
cand AS (SELECT p.query_id, a.vec_id,
                CAST(list_sum(list_transform(list_zip(p.qv, a.qv),
                       pp -> (pp[1]-pp[2])*(pp[1]-pp[2]))) AS BIGINT) AS dist
         FROM pr p JOIN a{rounds} a
           ON a.cell = p.cell AND a.vec_id <> p.query_id),
nn AS (SELECT query_id, vec_id, dist FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                                      ORDER BY dist, vec_id) AS rn FROM cand)
       WHERE rn = 1)
SELECT x.query_id AS vec_a, x.vec_id AS vec_b, x.dist
FROM nn x JOIN nn y ON y.query_id = x.vec_id AND y.vec_id = x.query_id
WHERE x.query_id < x.vec_id
ORDER BY vec_a"""


@register(
    "q192b_mutual_nn_scaled",
    _mutual_nn_scaled_oracle(),
    "mutual-NN with a CORPUS-SIZED cell count (VERDICT r08 #1, the "
    "round-8 probe's measured q192 fix): k_cells = max(8, "
    "ceil(sqrt(N))) keeps per-cell population ~sqrt(N), so the "
    "self-join over cells generates ~N^1.5 candidate pairs instead of "
    "the fixed-k N^2/8 that TIMEOUTed at sf1 (k=80 variant measured "
    "144 s vs >360; docs/PLANS.md round-8). Same exact-integer "
    "k-means + exact-IVF algebra as q192 (seeds = k md5-smallest ids, "
    "2 assignment rounds, nprobe=4, reciprocal-best-among-probed, "
    "a<b canonical) — the oracle re-derives the ENTIRE index with the "
    "same dynamic k via a scalar subquery; ceil(sqrt(n)) is "
    "cross-engine exact because IEEE sqrt is correctly rounded. "
    "Centroids are RELATIONAL (operators/ivf_relational.py — broadcast "
    "joins, not the k x d plan literals of kmeans_exact, which blow "
    "the codegen budget at corpus-sized k: measured 31 s literal vs "
    "~6 s relational at sf0.1). Registry q192 keeps fixed k=8 as the "
    "dense-cell stress form",
)
def q192b(spark, sf_dir):
    from snowflake_cdc_spark.operators.ivf_relational import (
        relational_ivf_topk,
        relational_kmeans_fit,
    )

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    k_cells = max(8, math.ceil(math.sqrt(n)))
    centroids, assigned = relational_kmeans_fit(emb, k=k_cells, rounds=2)
    queries = assigned.select(F.col("vec_id").alias("query_id"), "qv")
    nn = relational_ivf_topk(
        centroids, assigned.select("vec_id", "qv", "cell"), queries,
        k=1, nprobe=4, dim=64,
    ).transform(ckpt_lazy)  # both self-join sides read it (r11)
    back = nn.select(
        F.col("query_id").alias("vec_id"), F.col("vec_id").alias("query_id")
    )
    return (
        nn.join(back, ["query_id", "vec_id"])
        .filter(F.col("query_id") < F.col("vec_id"))
        .select(
            F.col("query_id").alias("vec_a"),
            F.col("vec_id").alias("vec_b"),
            "dist",
        )
        .orderBy("vec_a")
    )


# --------------------------------------------------------------------------
# Q235 — deterministic Naive Bayes quality/domain classifier (VERDICT r08 #4)
# --------------------------------------------------------------------------

_NB_CTES = """
WITH d AS (SELECT doc_id, source, (lang = 'en') AS pos,
                  regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+') AS ws,
                  md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM d),
s AS (SELECT doc_id, pos, ws,
             CASE WHEN rk <= (8 * n) // 10 THEN 'train'
                  WHEN rk <= (9 * n) // 10 THEN 'val'
                  ELSE 'test' END AS split
      FROM r),
tr AS (SELECT doc_id, pos, unnest(ws) AS w FROM s WHERE split = 'train'),
cls AS (SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS d1,
               CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS d0
        FROM s WHERE split = 'train'),
wc AS (SELECT w,
              CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS c1,
              CAST(count(*) FILTER (WHERE NOT pos) AS BIGINT) AS c0
       FROM tr GROUP BY 1),
nv AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c0) AS BIGINT) AS n0,
              CAST(count(*) AS BIGINT) AS v
       FROM wc),
lr AS (SELECT w,
              CAST(floor(ln((CAST(c1 + 1 AS DOUBLE) * CAST(n0 + v AS DOUBLE))
                            / (CAST(c0 + 1 AS DOUBLE) * CAST(n1 + v AS DOUBLE)))
                         * 1000000.0 + 0.5) AS BIGINT) AS llr
       FROM wc CROSS JOIN nv),
k AS (SELECT CAST(floor(ln(CAST(d1 AS DOUBLE) / CAST(d0 AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS prior,
             CAST(floor(ln(CAST(n0 + v AS DOUBLE) / CAST(n1 + v AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS unseen
      FROM cls CROSS JOIN nv),
tdocs AS (SELECT doc_id, pos FROM s WHERE split = 'test'),
te AS (SELECT doc_id, pos, unnest(ws) AS w FROM s WHERE split = 'test'),
tc AS (SELECT doc_id, pos, w, CAST(count(*) AS BIGINT) AS c
       FROM te GROUP BY 1, 2, 3),
sc AS (SELECT tc.doc_id,
              CAST(sum(tc.c * coalesce(lr.llr, k.unseen)) AS BIGINT) AS wsum
       FROM tc LEFT JOIN lr USING (w) CROSS JOIN k
       GROUP BY 1),
pred AS (SELECT td.doc_id, td.pos,
                (coalesce(sc.wsum, 0) + k.prior) AS score_unat,
                (coalesce(sc.wsum, 0) + k.prior) > 0 AS pred_pos
         FROM tdocs td LEFT JOIN sc USING (doc_id) CROSS JOIN k)
"""

_NB_ORACLE = _NB_CTES + """
SELECT pos AS true_en, pred_pos AS pred_en,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(score_unat) AS BIGINT) AS sum_score_unat
FROM pred GROUP BY 1, 2 ORDER BY true_en, pred_en
"""


def _nb_test_scores(spark, sf_dir):
    """Shared NB pipeline half: q210's stratified split, nb_train on
    the train split, nb_score on the held-out test split — returns
    (doc_id, pos, score_unat, pred_pos). q235 aggregates the confusion
    matrix, q236 the PR curve, q238 the calibration curve."""
    from snowflake_cdc_spark.operators.nb import nb_score, nb_train

    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        (F.col("lang") == "en").alias("pos"),
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(UNICODE_WORD), F.lit(0)).alias("ws"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    from snowflake_cdc_spark.operators.splits import stratified_split

    s = (
        stratified_split(d)
        .select("doc_id", "pos", "ws", "split")
        .transform(ckpt_lazy)  # train and test branches share the split
    )
    lr, k = nb_train(s.filter(F.col("split") == "train").select("doc_id", "pos", "ws"))
    return nb_score(
        s.filter(F.col("split") == "test").select("doc_id", "pos", "ws"), lr, k
    )


@register(
    "q235_nb_quality_filter",
    _NB_ORACLE,
    "deterministic Naive Bayes quality/domain classifier (VERDICT r08 "
    "#4 — the fastText/CCNet-style filter the curation battery lacked: "
    "GPT-3 and CCNet both train a classifier to recognize target-"
    "domain text and threshold the crawl on its score). Target class = "
    "the planted lang='en' label (the q221 DSIR target domain). Train "
    "on q210's stratified train split, Laplace-smoothed per-word "
    "log-likelihood ratios quantized ONCE to integer micro-nats (the "
    "q160/q172 discipline: one libm ln per train word + one prior + "
    "one unseen-word constant, everything after is exact BIGINT), "
    "score the held-out test split (val untouched), threshold at 0 "
    "(ties -> negative), emit the confusion matrix with per-cell "
    "score sums (q191 posture). Scale shape: vocab-keyed equi-joins "
    "and map-side-combined counts — never doc x vocab; the only "
    "windows are q210's per-source split ranks (partitioned)",
)
def q235(spark, sf_dir):
    sc = _nb_test_scores(spark, sf_dir)
    return (
        sc.groupBy(
            F.col("pos").alias("true_en"),
            F.col("pred_pos").alias("pred_en"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("score_unat").cast("bigint").alias("sum_score_unat"),
        )
        .orderBy("true_en", "pred_en")
    )


# --------------------------------------------------------------------------
# Q236 — NB classifier precision/recall curve over equi-depth score bands
# --------------------------------------------------------------------------

_PR_BANDS = 10

_NB_PR_ORACLE = _NB_CTES + f""",
tot AS (SELECT CAST(count(*) AS BIGINT) AS nt,
               CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
        FROM pred),
rr AS (SELECT pos, score_unat,
              row_number() OVER (ORDER BY score_unat, doc_id) AS rn
       FROM pred),
b AS (SELECT pos,
             {ntile_fill_sql('rn', 'tot.nt', _PR_BANDS)} AS band
      FROM rr, tot),
pb AS (SELECT band,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
       FROM b GROUP BY 1),
cum AS (SELECT band, n_docs, n_pos,
               CAST(sum(n_docs) OVER (ORDER BY band DESC) AS BIGINT) AS cum_docs,
               CAST(sum(n_pos) OVER (ORDER BY band DESC) AS BIGINT) AS cum_pos
        FROM pb)
SELECT CAST(band AS BIGINT) AS band, n_docs, n_pos, cum_docs, cum_pos,
       CAST(cum_pos * 1000000 // cum_docs AS BIGINT) AS precision_ppm,
       CAST(cum_pos * 1000000 // NULLIF(tot.np, 0) AS BIGINT) AS recall_ppm
FROM cum, tot ORDER BY band
"""


@register(
    "q236_nb_pr_curve",
    _NB_PR_ORACLE,
    "NB classifier precision/recall curve (the threshold-tuning "
    "artifact every production quality filter ships with): q235's "
    "scored test split cut into 10 equi-depth score bands "
    "(operators/histogram.py::equidepth_assign — the sort-free q140 "
    "composition, ntile-fill ranks over (score, doc_id)); band 10 = "
    "highest scores, cumulative-from-the-top TP/doc counts give exact "
    "integer precision_ppm and recall_ppm at each take-top-k-bands "
    "cutoff. The only unpartitioned windows are the 64-row "
    "bucket-offsets table and the 10-row band cumsum (whitelisted "
    "constant-bounded class); the oracle re-derives the model, every "
    "score, the naive single-sort ntile banding, and both curves",
)
def q236(spark, sf_dir):
    from snowflake_cdc_spark.operators.histogram import equidepth_assign

    scored = _nb_test_scores(spark, sf_dir).transform(ckpt_lazy)  # banding + totals both read the scores
    banded = equidepth_assign(scored, "score_unat", "doc_id", k=_PR_BANDS).select(
        "doc_id", F.col("bucket").alias("band")
    )
    pb = (
        scored.join(banded, "doc_id")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("pos").cast("bigint")).cast("bigint").alias("n_pos"),
        )
    )
    tot = scored.agg(
        F.sum(F.col("pos").cast("bigint")).cast("bigint").alias("np")
    )
    w_cum = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        pb.withColumn("cum_docs", F.sum("n_docs").over(w_cum).cast("bigint"))
        .withColumn("cum_pos", F.sum("n_pos").over(w_cum).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("band").cast("bigint").alias("band"),
            "n_docs",
            "n_pos",
            "cum_docs",
            "cum_pos",
            F.expr("CAST(cum_pos * 1000000 DIV cum_docs AS BIGINT)").alias(
                "precision_ppm"
            ),
            # NULLIF mirrored in the oracle (ADVICE r09): a zero-positive
            # corpus must degrade identically in both engines (NULL recall),
            # not as Spark-NULL vs DuckDB division-by-zero
            F.expr("CAST(cum_pos * 1000000 DIV NULLIF(np, 0) AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# Q237 — DSIR importance-weight diagnostics: effective sample size
# --------------------------------------------------------------------------

_ESS_ORACLE_TAIL = """
mx AS (SELECT CAST(max(logw) AS BIGINT) AS mxw FROM pool),
wq AS (SELECT doc_id,
              CAST(floor(exp(CAST(logw - mx.mxw AS DOUBLE) / 1000000.0)
                         * 1000.0 + 0.5) AS BIGINT) AS w_milli
       FROM pool, mx),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_pool,
               CAST(sum(w_milli) AS BIGINT) AS s1,
               CAST(sum(w_milli * w_milli) AS BIGINT) AS s2,
               CAST(sum(CASE WHEN w_milli = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_zero_weight
        FROM wq)
SELECT agg.n_pool,
       CAST(floor((CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * 1000.0)
                  / CAST(s2 AS DOUBLE) + 0.5) AS BIGINT) AS ess_milli,
       CAST(floor((CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * 1000000.0)
                  / (CAST(s2 AS DOUBLE) * CAST(n_pool AS DOUBLE)) + 0.5)
            AS BIGINT) AS ess_ratio_ppm,
       agg.n_zero_weight, mx.mxw AS max_logw_unat
FROM agg, mx
"""


def _ess_oracle() -> str:
    from snowflake_cdc_spark.queries_round8_ext import _DSIR_SEL_CTES

    # _DSIR_SEL_CTES ends at the sel CTE; chain the diagnostics after it
    return _DSIR_SEL_CTES + "," + _ESS_ORACLE_TAIL


@register(
    "q237_dsir_ess",
    _ess_oracle(),
    "DSIR importance-weight diagnostics (Kong 1992 effective sample "
    "size — the standard 'are my importance weights degenerate' check "
    "run before any resampling/selection): per-doc weights w = "
    "exp(logw - max_logw) quantized ONCE to milli-units (exp probed "
    "bit-identical across Spark/DuckDB on the micro-nat grid, the ln-"
    "lane discipline extended; max-shift makes overflow impossible and "
    "keeps w in (0, 1]), then ESS = (sum w)^2 / (sum w^2) and "
    "ESS/n in exact-double-quantized milli/ppm units, plus the "
    "zero-weight tail count (docs >= ~7 nats below the max). ESS near "
    "n = weights uninformative; ESS near 1 = selection collapses onto "
    "a handful of docs. One scalar max + one map-side-combined "
    "aggregation over the q221 pool — no window, no join beyond the "
    "broadcast max",
)
def q237(spark, sf_dir):
    from snowflake_cdc_spark.queries_round8_ext import _dsir_pool

    pool = _dsir_pool(spark, sf_dir)
    mx = pool.agg(F.max("logw").cast("bigint").alias("mxw"))
    wq = pool.crossJoin(F.broadcast(mx)).select(
        "mxw",
        F.expr(
            "CAST(floor(exp(CAST(logw - mxw AS DOUBLE) / 1000000.0)"
            " * 1000.0 + 0.5) AS BIGINT)"
        ).alias("w_milli"),
    )
    return (
        wq.groupBy("mxw")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pool"),
            F.sum("w_milli").cast("bigint").alias("s1"),
            F.sum(F.col("w_milli") * F.col("w_milli")).cast("bigint").alias("s2"),
            F.sum(F.when(F.col("w_milli") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero_weight"),
        )
        .select(
            "n_pool",
            F.expr(
                "CAST(floor((CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * 1000.0)"
                " / CAST(s2 AS DOUBLE) + 0.5) AS BIGINT)"
            ).alias("ess_milli"),
            F.expr(
                "CAST(floor((CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * 1000000.0)"
                " / (CAST(s2 AS DOUBLE) * CAST(n_pool AS DOUBLE)) + 0.5) AS BIGINT)"
            ).alias("ess_ratio_ppm"),
            "n_zero_weight",
            F.col("mxw").alias("max_logw_unat"),
        )
    )


# --------------------------------------------------------------------------
# Q238 — NB classifier calibration curve (reliability diagram)
# --------------------------------------------------------------------------

_NB_CAL_ORACLE = _NB_CTES + f""",
pp AS (SELECT doc_id, pos, score_unat,
              CAST(floor(1000000.0
                         / (1.0 + exp(-CAST(score_unat AS DOUBLE) / 1000000.0))
                         + 0.5) AS BIGINT) AS prob_ppm
       FROM pred),
tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM pp),
rr AS (SELECT pos, prob_ppm,
              row_number() OVER (ORDER BY score_unat, doc_id) AS rn
       FROM pp),
b AS (SELECT pos, prob_ppm,
             {ntile_fill_sql('rn', 'tot.nt', _PR_BANDS)} AS band
      FROM rr, tot)
SELECT CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(sum(prob_ppm) // count(*) AS BIGINT) AS mean_pred_ppm,
       CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS empirical_ppm,
       CAST(sum(prob_ppm) // count(*)
            - sum(CASE WHEN pos THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS gap_ppm
FROM b GROUP BY band ORDER BY band
"""


@register(
    "q238_nb_calibration",
    _NB_CAL_ORACLE,
    "NB classifier calibration curve (reliability diagram — the audit "
    "that decides whether the filter's scores can be used as sampling "
    "probabilities or only as a ranking): per equi-depth score band, "
    "mean PREDICTED probability sigmoid(score) vs the EMPIRICAL "
    "positive rate, and their gap, all in exact integer ppm. One "
    "sigmoid per doc, quantized ONCE (exp probed bit-identical on the "
    "micro-nat grid — q237 discipline; IEEE inf semantics make the "
    "saturated tails exact 0/1e6 on both engines), then pure integer "
    "band aggregation over the q236 ntile banding. Naive Bayes is "
    "famously over-confident — the gap column is the measurement",
)
def q238(spark, sf_dir):
    from snowflake_cdc_spark.operators.histogram import equidepth_assign

    scored = _nb_test_scores(spark, sf_dir).transform(ckpt_lazy)
    pp = scored.withColumn(
        "prob_ppm",
        F.expr(
            "CAST(floor(1000000.0"
            " / (1.0 + exp(-CAST(score_unat AS DOUBLE) / 1000000.0))"
            " + 0.5) AS BIGINT)"
        ),
    )
    banded = equidepth_assign(pp, "score_unat", "doc_id", k=_PR_BANDS).select(
        "doc_id", F.col("bucket").alias("band")
    )
    return (
        pp.join(banded, "doc_id")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("pos").cast("bigint")).cast("bigint").alias("n_pos"),
            F.expr("CAST(sum(prob_ppm) DIV count(*) AS BIGINT)").alias(
                "mean_pred_ppm"
            ),
            F.expr(
                "CAST(sum(CAST(pos AS BIGINT)) * 1000000 DIV count(*) AS BIGINT)"
            ).alias("empirical_ppm"),
            F.expr(
                "CAST(sum(prob_ppm) DIV count(*)"
                " - sum(CAST(pos AS BIGINT)) * 1000000 DIV count(*) AS BIGINT)"
            ).alias("gap_ppm"),
        )
        .select(
            F.col("band").cast("bigint").alias("band"),
            "n_docs",
            "n_pos",
            "mean_pred_ppm",
            "empirical_ppm",
            "gap_ppm",
        )
        .orderBy("band")
    )
