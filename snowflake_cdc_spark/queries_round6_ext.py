"""Round-6 extension q199-q208: the verdict-r05 follow-on lanes plus
the round's new pipeline surface —

- q199 deterministic mergeable quantile sketch
  (``operators/quantile_sketch.py``): bottom-k-by-md5 rank summaries
  with a checked DKW bound — the order-free replacement for GK/KLL
  compactors (whose content depends on arrival order and could never
  pass the layout-determinism audit or carry a SQL oracle);
- q200 SemDeDup embedding-cluster semantic near-dup pairs
  (``operators/semdedup.py``): k-means cells + within-cell exact
  integer cosine — the modern complement of MinHash/substring dedup;
- q201 directed containment (near-superset) dedup
  (``operators/setsim.py::containment_join``, one-sided prefix filter);
- q202 dataset mixing-weight plan (epochs-per-source, exact ppm);
- q203 training-shard manifest (``operators/sharding.py`` — sort-free
  global token cumsum along the seeded shuffle order);
- q204 multi-touch revenue attribution (first/last/linear in one pass,
  remainder-to-first-touch accounting closure);
- q205 two-relation table diff audit (``operators/diff.py::table_diff``);
- q206 MinHash-LSH banding recall/precision vs exact ground truth
  (the measure-your-own-dedup lane, itself hash-checkable);
- q207 explicit-value-list PIVOT (reporting reshape surface);
- q208 dedup savings report (per-source corpus-shrinkage accounting).

Reference parity: the reference (``add_output.py:421-448``) lands CDC
rows; these are warehouse-side statistics/curation passes over the
landed tables.

Determinism contract (memory: determinism-contract): md5 for all
pseudo-randomness, exact integers everywhere (cents quantized once at
input, integer rank arithmetic ``(q_ppm·m + 999999) DIV 1e6``, integer
rank-interval counts), booleans derived from integer comparisons only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.operators.quantile_sketch import (
    bottomk_sample,
    quantile_estimates,
    rank_check,
)
from snowflake_cdc_spark.queries import _t, register

# --------------------------------------------------------------------------
# Q199 — deterministic mergeable quantile sketch with a checked DKW bound
# --------------------------------------------------------------------------

_QSKETCH_ORACLE = """
WITH src AS (
  SELECT CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS h
  FROM lineitem),
smp AS (SELECT v FROM src ORDER BY h, v LIMIT 256),
arr AS (SELECT list_sort(list(v)) AS vs, CAST(count(*) AS BIGINT) AS m FROM smp),
qs AS (SELECT CAST(q_ppm AS BIGINT) AS q_ppm
       FROM (VALUES (250000), (500000), (750000), (900000)) t(q_ppm)),
est AS (SELECT q_ppm,
               vs[CAST(greatest(1, (q_ppm * m + 999999) // 1000000) AS INT)] AS est
        FROM qs, arr),
chk AS (SELECT e.q_ppm, e.est,
               CAST(sum(CASE WHEN s.v < e.est THEN 1 ELSE 0 END) AS BIGINT) AS r_lo,
               CAST(sum(CASE WHEN s.v <= e.est THEN 1 ELSE 0 END) AS BIGINT) AS r_hi,
               CAST(count(*) AS BIGINT) AS n
        FROM src s CROSS JOIN est e GROUP BY 1, 2)
SELECT q_ppm, est, r_lo, r_hi, n,
       (r_lo * 1000000 <= (q_ppm + 130000) * n
        AND r_hi * 1000000 >= (q_ppm - 130000) * n) AS within_bound
FROM chk ORDER BY q_ppm
"""


@register(
    "q199_quantile_sketch",
    _QSKETCH_ORACLE,
    "deterministic mergeable quantile sketch "
    "(operators/quantile_sketch.py): price-cents quantiles "
    "(q1/median/q3/p90) estimated from the 256 md5(pk)-smallest rows — "
    "the KMV idea applied to RANKS. GK/KLL compactors are "
    "order-dependent by construction (they could never pass the "
    "layout-determinism audit or carry a SQL oracle); the bottom-k "
    "hash sample is a pure function of the set, merges exactly "
    "(bottom-k of a union == bottom-k of the bottom-k's — the merge "
    "law KMV q135 set, fuzz-tested), and compiles to "
    "TakeOrderedAndProject: per-partition summaries + driver merge, "
    "no global sort anywhere. The DKW bound (eps = 0.13 at k = 256) "
    "is CHECKED, not assumed: the estimate's true rank interval comes "
    "from two conditional counts in one scan (never a rank window) "
    "and the in-bound boolean is part of the output; the oracle "
    "re-derives sample, estimates, counts AND booleans — a complete "
    "oracle for an approximate operator (q127+q134 disciplines "
    "combined). This is the q193-class scale path: eps-tolerant "
    "quantiles from k rows, exact ranks only where the lane demands "
    "them",
)
def q199(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    src = li.select(
        F.floor(F.col("l_extendedprice").cast("double") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        ).alias("pk"),
    )
    smp = bottomk_sample(src, "v", "pk", k=256)
    est = quantile_estimates(smp, [250000, 500000, 750000, 900000])
    return rank_check(src, "v", est, eps_ppm=130000).orderBy("q_ppm")


# --------------------------------------------------------------------------
# Q200 — SemDeDup: embedding-cluster semantic near-dup pairs
# --------------------------------------------------------------------------


def _semdedup_oracle(k: int = 8, rounds: int = 2, grid: int = 1000,
                     t_num: int = 9, t_den: int = 20,
                     cell_cap: int = 4096) -> str:
    from snowflake_cdc_spark.queries_governance_ext import _kmeans_chain

    return _kmeans_chain(k, rounds) + f""",
sg AS (SELECT vec_id,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {grid}.0 + 0.5) AS BIGINT)) AS qc
       FROM embeddings),
sgn AS (SELECT vec_id, qc,
               CAST(list_sum(list_transform(qc, x -> x * x)) AS BIGINT) AS n2
        FROM sg),
hot AS (SELECT cell FROM a{rounds} GROUP BY cell HAVING count(*) > {cell_cap}),
mem AS (SELECT a.vec_id, a.cell, s.qc, s.n2
        FROM a{rounds} a JOIN sgn s USING (vec_id)
        WHERE a.cell NOT IN (SELECT cell FROM hot)),
pr AS (SELECT x.cell, x.vec_id AS vec_a, y.vec_id AS vec_b,
              CAST(list_sum(list_transform(list_zip(x.qc, y.qc),
                     p -> p[1] * p[2])) AS BIGINT) AS dot,
              x.n2 AS na2, y.n2 AS nb2
       FROM mem x JOIN mem y
         ON x.cell = y.cell AND x.vec_id < y.vec_id)
SELECT cell, vec_a, vec_b, dot
FROM pr
WHERE dot > 0 AND dot * dot * {t_den * t_den} >= {t_num * t_num} * na2 * nb2
ORDER BY vec_a, vec_b
"""


@register(
    "q200_semdedup",
    _semdedup_oracle(),
    "SemDeDup embedding-cluster semantic near-dup pairs "
    "(operators/semdedup.py; Abbas et al. 2023) — the embedding-level "
    "complement of MinHash/substring dedup for training corpora "
    "(paraphrases share no shingles but sit at near-identical "
    "embeddings): k-means cells from the q157 exact integer Lloyd, "
    "pairwise integer cosine WITHIN cells only (cluster-then-compare: "
    "never all-pairs — Σ|cell|² is bounded by cluster granularity and "
    "k grows with the corpus exactly as IVF's does), threshold as the "
    "pure-BIGINT predicate dot²·t_den² >= t_num²·na2·nb2 (no sqrt, no "
    "division), so the oracle re-derives centroids, cells, every dot "
    "product and every surviving pair. The synthetic fixture has no "
    "planted paraphrases (max within-cell cosine ~0.49), so the lane "
    "runs at the demonstrative t = 9/20 threshold; the planted "
    "paraphrase-cluster test (tests/test_semdedup.py) drives the "
    "operator at the paper's 0.95 regime and fuzzes it against a "
    "brute per-cell reference. Hot-cell guard (VERDICT r06 #1): cells "
    "over cell_cap=4096 members are dropped with a logged count "
    "before the pair join — the uniform-vector anti-regime where "
    "k-means cannot split the mass stays O(cap²) per cell instead of "
    "quadratic; the oracle mirrors the cap with a HAVING-count filter "
    "on the same deterministic cell relation",
)
def q200(spark, sf_dir):
    from snowflake_cdc_spark.operators.semdedup import semantic_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dup_pairs(
        emb, t_num=9, t_den=20, dim=64, cell_cap=4096
    ).orderBy("vec_a", "vec_b")


# --------------------------------------------------------------------------
# Q201 — directed containment (near-superset) dedup pairs
# --------------------------------------------------------------------------

_CONTAIN_ORACLE = """
WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+') AS ws
           FROM documents),
t AS (SELECT doc_id,
             unnest(list_distinct(list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(ws[i : i + 2], ' ')))) AS tok
      FROM d WHERE len(ws) >= 3),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM t GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db,
                 CAST(count(*) AS BIGINT) AS ni
          FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id <> b.doc_id
          GROUP BY 1, 2)
SELECT i.da AS sub_doc, i.db AS sup_doc, i.ni AS n_inter, s.sz AS n_sub
FROM inter i JOIN sz s ON s.doc_id = i.da
WHERE 10 * i.ni >= 9 * s.sz
ORDER BY sub_doc, sup_doc
"""


@register(
    "q201_containment_dedup",
    _CONTAIN_ORACLE,
    "directed near-superset dedup (operators/setsim.py::"
    "containment_join): pairs where >= 90% of the sub-doc's 3-gram "
    "shingles appear in the sup-doc — the ASYMMETRIC dedup mode "
    "Jaccard structurally misses (a short doc embedded in a long one "
    "has tiny Jaccard but containment 1.0: boilerplate-wrapped "
    "re-posts, quote-with-commentary, version supersets; keep the "
    "superset, drop the subset). Prefix filtering adapts one-sidedly: "
    "only the SUB side prefixes (pigeonhole over ITS set; the sup side "
    "indexes full but candidates join only on sub-prefix tokens — "
    "each sub's rarest, so the postings join stays self-deskewing), "
    "plus the one-sided size prune |B| >= t|A|; verify is the exact "
    "integer test td*inter >= tn*|A| over per-doc sorted arrays. The "
    "oracle is the INDEPENDENT direct form (full postings join + "
    "group count) — prefix completeness is what the hash check "
    "proves, and the brute fuzz in tests/test_containment.py pins it "
    "on adversarial inputs",
)
def q201(spark, sf_dir):
    from snowflake_cdc_spark.operators.setsim import (
        containment_join,
        shingle_sets,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = shingle_sets(docs, n=3)
    return containment_join(toks, threshold_num=9, threshold_den=10)


# --------------------------------------------------------------------------
# Q202 — dataset mixing weights (epochs-per-source plan)
# --------------------------------------------------------------------------

_MIXING_ORACLE = """
WITH s AS (SELECT source,
                  CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(len(regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+')))
                       AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS ns FROM s)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens * 1000000 // t AS BIGINT) AS natural_ppm,
       CAST(1000000 // ns AS BIGINT) AS target_ppm,
       CAST(t * 1000000 // (ns * n_tokens) AS BIGINT) AS epochs_ppm,
       (t * 1000000 // (ns * n_tokens)) > 4000000 AS needs_cap
FROM s CROSS JOIN tot
ORDER BY source
"""


@register(
    "q202_mixing_weights",
    _MIXING_ORACLE,
    "dataset mixing-weight plan — the step between curation and "
    "sharding in a pre-training pipeline: given a target share per "
    "source (uniform here; the GLaM/LLaMA-style mixture table is a "
    "literal swap), how many EPOCHS of each source does the mixed "
    "corpus take? epochs_i = target_share·T / tokens_i, emitted as "
    "exact integer ppm (T·1e6 DIV (n_sources·tokens_i) — one integer "
    "division at the end, the q189 orphan-ppm discipline), plus the "
    "over-sampling flag (epochs > 4: a source so small the mixture "
    "would repeat it past the memorization comfort zone — the "
    "repetition-budget governance question). One corpus scan, "
    "source-sized aggregates, a 1-row broadcast total",
)
def q202(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.size(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(UNICODE_WORD), 0)
            )
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = s.agg(
        F.sum("n_tokens").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("ns"),
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("CAST(n_tokens * 1000000 DIV t AS BIGINT)").alias(
                "natural_ppm"
            ),
            F.expr("CAST(1000000 DIV ns AS BIGINT)").alias("target_ppm"),
            F.expr(
                "CAST(t * 1000000 DIV (ns * n_tokens) AS BIGINT)"
            ).alias("epochs_ppm"),
            F.expr("(t * 1000000 DIV (ns * n_tokens)) > 4000000").alias(
                "needs_cap"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q203 — training-shard manifest (sort-free global cumsum)
# --------------------------------------------------------------------------

_SHARD_ORACLE = """
WITH toks AS (SELECT doc_id,
                     CAST(len(regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+'))
                          AS BIGINT) AS tok
              FROM documents),
r AS (SELECT doc_id, tok,
             row_number() OVER (
               ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rank
      FROM toks),
c AS (SELECT rank, tok,
             coalesce(sum(tok) OVER (ORDER BY rank
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM r)
SELECT CAST(before // 2000 AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens,
       CAST(min(rank) AS BIGINT) AS first_rank,
       CAST(max(rank) AS BIGINT) AS last_rank
FROM c GROUP BY 1 ORDER BY shard_id
"""


# --------------------------------------------------------------------------
# Q208 — dedup savings report (corpus shrinkage accounting)
# --------------------------------------------------------------------------


def _dedup_savings_oracle() -> str:
    from snowflake_cdc_spark.queries_northstar import DOCS_CORPUS_SQL

    return DOCS_CORPUS_SQL + """,
g AS (SELECT doc_id, source, length(text) AS chars,
             min(doc_id) OVER (PARTITION BY md5(text)) AS rep
      FROM corpus)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id <> rep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(sum(chars) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN doc_id <> rep THEN chars ELSE 0 END) AS BIGINT)
         AS chars_saved,
       CAST(sum(CASE WHEN doc_id <> rep THEN chars ELSE 0 END) * 1000000
            // sum(chars) AS BIGINT) AS saved_ppm
FROM g GROUP BY source ORDER BY source
"""


@register(
    "q208_dedup_savings",
    _dedup_savings_oracle(),
    "dedup savings report — the corpus-shrinkage accounting every "
    "dedup pass must publish before anyone trusts it (the budgeting "
    "number behind 'dedup cut our storage/training tokens by X%'): "
    "per source over the planted-duplicate corpus, docs / dropped "
    "docs under keep-first exact dedup (min doc_id per md5(text) "
    "group — the q22/q33 contract) / total chars / chars saved / "
    "exact integer saved ppm. One scan; the keep-first representative "
    "comes from a min-over-md5(text)-partition — each partition is "
    "one duplicate group, bounded by its multiplicity, never a "
    "global order. The per-SOURCE attribution is what q22-class "
    "dedup lanes don't answer: WHO is shipping the duplicates",
)
def q208(spark, sf_dir):
    from pyspark.sql import Window

    from snowflake_cdc_spark.queries_northstar import planted_docs

    corpus = planted_docs(spark, sf_dir).select(
        "doc_id", "source", F.length("text").alias("chars"), F.md5("text").alias("k")
    )
    rep = F.min("doc_id").over(Window.partitionBy("k"))
    g = corpus.withColumn("rep", rep)
    dropped = (F.col("doc_id") != F.col("rep")).cast("bigint")
    return (
        g.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(dropped).cast("bigint").alias("n_dropped"),
            F.sum("chars").cast("bigint").alias("total_chars"),
            F.sum(dropped * F.col("chars")).cast("bigint").alias("chars_saved"),
        )
        .select(
            "source",
            "n_docs",
            "n_dropped",
            "total_chars",
            "chars_saved",
            F.expr("CAST(chars_saved * 1000000 DIV total_chars AS BIGINT)").alias(
                "saved_ppm"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q207 — PIVOT: long-to-wide reshape (reporting surface)
# --------------------------------------------------------------------------


@register(
    "q207_pivot",
    """SELECT n.n_name AS nation,
       CAST(count(*) FILTER (WHERE o.o_orderstatus = 'F') AS BIGINT) AS status_f,
       CAST(count(*) FILTER (WHERE o.o_orderstatus = 'O') AS BIGINT) AS status_o,
       CAST(count(*) FILTER (WHERE o.o_orderstatus = 'P') AS BIGINT) AS status_p,
       CAST(coalesce(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
            FILTER (WHERE o.o_orderstatus = 'F'), 0) AS BIGINT) AS cents_f
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1 ORDER BY nation""",
    "PIVOT (long-to-wide reshape): per-nation order counts pivoted "
    "into one column per order status, plus a pivoted money measure "
    "in exact cents — the reporting-layer reshape every BI consumer "
    "of the landed CDC tables runs. Spark's groupBy().pivot() with an "
    "EXPLICIT value list (schema fixed at plan time — a valueless "
    "pivot would scan once just to discover columns, and its column "
    "set would be data-dependent); compiles to one hash aggregate of "
    "conditional aggregates, exactly the oracle's FILTER form — no "
    "extra shuffle vs the long groupBy",
)
def q207(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    j = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
    )
    wide = (
        j.groupBy("nation")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
    return wide.select(
        "nation",
        F.coalesce(F.col("F_n"), F.lit(0)).cast("bigint").alias("status_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).cast("bigint").alias("status_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).cast("bigint").alias("status_p"),
        F.coalesce(F.col("F_cents"), F.lit(0)).cast("bigint").alias("cents_f"),
    ).orderBy("nation")


# --------------------------------------------------------------------------
# Q206 — MinHash-LSH banding recall/precision vs exact ground truth
# --------------------------------------------------------------------------


def _lsh_recall_oracle() -> str:
    from snowflake_cdc_spark.queries_northstar import (
        DOCS_CORPUS_SQL,
        _SHINGLES_SQL,
    )

    return DOCS_CORPUS_SQL + "," + _SHINGLES_SQL + """,
mh AS (SELECT doc_id,
              list_transform(generate_series(0, 7), j ->
                list_aggregate(list_transform(shingles,
                  s -> md5(CAST(j AS VARCHAR) || ':' || s)), 'min')) AS sig
       FROM sh2),
bands AS (SELECT doc_id, b,
                 md5(sig[4*b+1] || '|' || sig[4*b+2] || '|' || sig[4*b+3] || '|' || sig[4*b+4])
                   AS band_val
          FROM (SELECT doc_id, sig, unnest(generate_series(0, 1)) AS b FROM mh)),
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         FROM bands x JOIN bands y
           ON x.b = y.b AND x.band_val = y.band_val AND x.doc_id < y.doc_id),
post AS (SELECT doc_id, unnest(hset) AS h FROM sh2),
sz AS (SELECT doc_id, CAST(len(hset) AS BIGINT) AS sz FROM sh2),
inter AS (SELECT p.doc_id AS a, q.doc_id AS b, CAST(count(*) AS BIGINT) AS ni
          FROM post p JOIN post q ON p.h = q.h AND p.doc_id < q.doc_id
          GROUP BY 1, 2),
truth AS (SELECT i.a, i.b
          FROM inter i
          JOIN sz s1 ON s1.doc_id = i.a JOIN sz s2 ON s2.doc_id = i.b
          WHERE 5 * i.ni >= 4 * (s1.sz + s2.sz - i.ni)),
hit AS (SELECT c.a, c.b FROM cand c JOIN truth t ON t.a = c.a AND t.b = c.b)
SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true_pairs,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_candidates_true,
       CAST((SELECT count(*) FROM truth) - (SELECT count(*) FROM hit)
            AS BIGINT) AS n_missed,
       CAST((SELECT count(*) FROM hit) * 1000000
            // (SELECT count(*) FROM truth) AS BIGINT) AS recall_ppm,
       CAST((SELECT count(*) FROM hit) * 1000000
            // (SELECT count(*) FROM cand) AS BIGINT) AS precision_ppm
"""


@register(
    "q206_lsh_recall_eval",
    _lsh_recall_oracle(),
    "MinHash-LSH banding evaluation against exact ground truth — the "
    "measure-your-own-dedup lane (the q49/q52/q144 recall-check "
    "discipline applied to the MinHash family): ground truth = ALL "
    "pairs with exact hashed-shingle Jaccard >= 0.8 (integer "
    "cross-mult 5·inter >= 4·union, via the q149 PPJoin prefix-filter "
    "join — pigeonhole-pruned candidates, self-deskewing on shared "
    "boilerplate shingles, never |postings|²), "
    "candidates = the q25 banding (k=8, 2 bands x 4 rows, md5-seeded "
    "so the candidate set is a fixed function of the data, not a coin "
    "flip). Emits true/candidate/hit/missed counts + exact integer "
    "recall and precision ppm; because every hash is md5, DuckDB "
    "re-derives signatures, bands, candidates AND the ground truth — "
    "an LSH quality metric that is itself hash-checkable. Banding "
    "theory says recall ~ 1-(1-j^4)^2 at j=0.8 -> ~0.63 per band "
    "pair; the planted exact dupes (j=1) are always caught",
)
def q206(spark, sf_dir):
    from snowflake_cdc_spark.operators.dedup import (
        lsh_bands,
        minhash_features,
    )
    from snowflake_cdc_spark.queries_northstar import planted_docs

    corpus = planted_docs(spark, sf_dir)
    sh = minhash_features(corpus, "doc_id", "text", k=8, shingle_n=3)
    banded = sh.select(
        "id", F.explode(lsh_bands(F.col("sig"), 2, 4)).alias("bv")
    ).select("id", "bv.band", "bv.band_val")
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    # ground truth through the PPJoin prefix filter (VERDICT r06 #4):
    # the raw postings self-join is |postings|² per shared shingle — one
    # boilerplate shingle in k docs contributes k² candidate rows. The
    # q149 prefix-filter join computes the IDENTICAL truth set (same
    # integer predicate 5·inter >= 4·union) with pigeonhole pruning:
    # only the (1-t)·|set|+1 rarest tokens of each doc enter the join,
    # so hot shingles fall out of the candidate generator entirely
    # (measured: one shingle shared by 1k docs -> 499.5k raw candidate
    # rows vs 0 prefix candidates when sets are otherwise disjoint)
    from snowflake_cdc_spark.operators.setsim import prefix_filter_join

    toks = sh.select(F.col("id").alias("doc_id"), F.explode("hset").alias("tok"))
    truth = prefix_filter_join(toks, 4, 5, "doc_id").select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    # ONE pass over both pair relations (round 11): the previous shape
    # counted truth, cand and cand⋈truth in three separate aggregate
    # branches, so the expensive subtrees (minhash + banding join,
    # minhash + prefix-filter join) executed twice each — the hit
    # semi-join could not reuse the count branches' results. A full
    # outer join on the pair key + flag counting computes the same
    # three exact counts with each subtree evaluated exactly once
    # (measured 18.5 s -> see OPTIMIZATION_r11.md). Same integers,
    # same output row — the oracle is untouched.
    flags = cand.withColumn("__c", F.lit(1)).join(
        truth.withColumn("__t", F.lit(1)), ["a", "b"], "full_outer"
    )
    counts = flags.agg(
        F.count("__t").cast("bigint").alias("n_true_pairs"),
        F.count("__c").cast("bigint").alias("n_candidates"),
        F.count(F.when(F.col("__c").isNotNull() & F.col("__t").isNotNull(), 1))
        .cast("bigint")
        .alias("n_candidates_true"),
    )
    return counts.select(
        "n_true_pairs",
        "n_candidates",
        "n_candidates_true",
        (F.col("n_true_pairs") - F.col("n_candidates_true")).alias("n_missed"),
        F.expr(
            "CAST(n_candidates_true * 1000000 DIV n_true_pairs AS BIGINT)"
        ).alias("recall_ppm"),
        F.expr(
            "CAST(n_candidates_true * 1000000 DIV n_candidates AS BIGINT)"
        ).alias("precision_ppm"),
    )


# --------------------------------------------------------------------------
# Q204 — multi-touch revenue attribution (first / last / linear)
# --------------------------------------------------------------------------

_ATTRIB_ORACLE = """
WITH p AS (SELECT event_id AS pid, user_id,
                  epoch_us(ts) AS pus,
                  CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
t AS (SELECT user_id, event_id, event_type AS typ, epoch_us(ts) AS us
      FROM events WHERE event_type IN ('view', 'click')),
touch AS (SELECT p.pid, p.cents, t.typ, t.us, t.event_id
          FROM p JOIN t ON t.user_id = p.user_id
          WHERE t.us < p.pus AND t.us >= p.pus - 604800000000),
per_p AS (SELECT pid, cents,
                 CAST(count(*) AS BIGINT) AS n,
                 min(struct_pack(us := us, id := event_id, t := typ)).t AS first_typ,
                 max(struct_pack(us := us, id := event_id, t := typ)).t AS last_typ
          FROM touch GROUP BY 1, 2),
lin AS (SELECT x.pid, x.typ, CAST(count(*) AS BIGINT) AS cnt
        FROM touch x GROUP BY 1, 2),
lc AS (SELECT l.pid, l.typ,
              l.cnt * (1000000 // pp.n) * pp.cents
              + CASE WHEN l.typ = pp.first_typ
                     THEN (1000000 - pp.n * (1000000 // pp.n)) * pp.cents
                     ELSE 0 END AS micro
       FROM lin l JOIN per_p pp ON pp.pid = l.pid),
chan AS (
  SELECT pp.first_typ AS channel, CAST(count(*) AS BIGINT) AS n_first,
         CAST(sum(pp.cents) AS BIGINT) AS first_cents
  FROM per_p pp GROUP BY 1),
chan_l AS (
  SELECT pp.last_typ AS channel, CAST(count(*) AS BIGINT) AS n_last,
         CAST(sum(pp.cents) AS BIGINT) AS last_cents
  FROM per_p pp GROUP BY 1),
chan_lin AS (
  SELECT typ AS channel, CAST(sum(micro) AS BIGINT) AS linear_cents_micro
  FROM lc GROUP BY 1),
untouched AS (
  SELECT '(none)' AS channel,
         CAST(count(*) AS BIGINT) AS n_first,
         CAST(coalesce(sum(p.cents), 0) AS BIGINT) AS first_cents,
         CAST(count(*) AS BIGINT) AS n_last,
         CAST(coalesce(sum(p.cents), 0) AS BIGINT) AS last_cents,
         CAST(coalesce(sum(p.cents), 0) * 1000000 AS BIGINT) AS linear_cents_micro
  FROM p WHERE pid NOT IN (SELECT pid FROM per_p))
SELECT channel,
       coalesce(c.n_first, 0) AS n_first,
       coalesce(c.first_cents, 0) AS first_cents,
       coalesce(cl.n_last, 0) AS n_last,
       coalesce(cl.last_cents, 0) AS last_cents,
       coalesce(cn.linear_cents_micro, 0) AS linear_cents_micro
FROM chan c
FULL JOIN chan_l cl USING (channel)
FULL JOIN chan_lin cn USING (channel)
UNION ALL
SELECT channel, n_first, first_cents, n_last, last_cents, linear_cents_micro
FROM untouched
ORDER BY channel
"""


@register(
    "q204_attribution",
    _ATTRIB_ORACLE,
    "multi-touch revenue attribution (first-touch / last-touch / "
    "linear, computed together): each purchase's exact-cents value "
    "credited to the user's view/click touchpoints in the strictly-"
    "prior 7-day window — the marketing-analytics workhorse downstream "
    "of the funnel lanes (q150/q193 say WHO converts and how fast; "
    "this says which channel gets the revenue credit). Deterministic "
    "integer split: linear credit = cents·(1e6 DIV n) micro-units per "
    "touch with the division remainder assigned to the FIRST touch "
    "(so every purchase's credits sum exactly to cents·1e6 — "
    "accounting closure, asserted in tests); first/last by (ts, "
    "event_id) struct order; untouched purchases land in the '(none)' "
    "row so total revenue reconciles. One user-equi join with the "
    "range predicate (per-user touches are bounded), "
    "purchase-and-channel-sized aggregates after",
)
def q204(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        us.alias("pus"),
        F.floor(F.col("value").cast("double") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("typ"),
        us.alias("us"),
    )
    touch = p.join(t, "user_id").filter(
        (F.col("us") < F.col("pus"))
        & (F.col("us") >= F.col("pus") - F.lit(604800000000))
    )
    per_p = touch.groupBy("pid", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min(F.struct("us", "tid", "typ"))["typ"].alias("first_typ"),
        F.max(F.struct("us", "tid", "typ"))["typ"].alias("last_typ"),
    )
    lin = touch.groupBy("pid", "typ").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    lc = lin.join(per_p, "pid").select(
        "typ",
        (
            F.col("cnt") * F.expr("1000000 DIV n") * F.col("cents")
            + F.when(
                F.col("typ") == F.col("first_typ"),
                F.expr("(1000000 - n * (1000000 DIV n))") * F.col("cents"),
            ).otherwise(F.lit(0))
        ).alias("micro"),
    )
    chan_f = per_p.groupBy(F.col("first_typ").alias("channel")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_first"),
        F.sum("cents").cast("bigint").alias("first_cents"),
    )
    chan_l = per_p.groupBy(F.col("last_typ").alias("channel")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_last"),
        F.sum("cents").cast("bigint").alias("last_cents"),
    )
    chan_lin = lc.groupBy(F.col("typ").alias("channel")).agg(
        F.sum("micro").cast("bigint").alias("linear_cents_micro")
    )
    untouched = (
        p.join(per_p.select("pid"), "pid", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_first"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("first_cents"),
        )
        .select(
            F.lit("(none)").alias("channel"),
            "n_first",
            "first_cents",
            F.col("n_first").alias("n_last"),
            F.col("first_cents").alias("last_cents"),
            (F.col("first_cents") * F.lit(1000000))
            .cast("bigint")
            .alias("linear_cents_micro"),
        )
    )
    # FULL outer on the channel key: a channel that only ever appears as
    # a last/linear touch (every journey ends on it but never starts on
    # it) must still carry its last_cents / linear credit — a LEFT join
    # keyed on first-touch channels would silently drop it and break the
    # accounting-closure claim (ADVICE r06)
    touched = (
        chan_f.join(chan_l, "channel", "full")
        .join(chan_lin, "channel", "full")
        .select(
            "channel",
            F.coalesce(F.col("n_first"), F.lit(0)).cast("bigint").alias("n_first"),
            F.coalesce(F.col("first_cents"), F.lit(0))
            .cast("bigint")
            .alias("first_cents"),
            F.coalesce(F.col("n_last"), F.lit(0)).cast("bigint").alias("n_last"),
            F.coalesce(F.col("last_cents"), F.lit(0))
            .cast("bigint")
            .alias("last_cents"),
            F.coalesce(F.col("linear_cents_micro"), F.lit(0))
            .cast("bigint")
            .alias("linear_cents_micro"),
        )
    )
    return touched.unionByName(untouched).orderBy("channel")


@register(
    "q203_shard_manifest",
    _SHARD_ORACLE,
    "training-shard manifest (operators/sharding.py): every document "
    "assigned to a ~2000-token shard along the seeded md5 corpus "
    "order — the last batch step before a 1000-node training job "
    "reads shard files instead of a table. Composes two sort-free "
    "pieces: the q120 deterministic shuffle rank, and the global "
    "RUNNING TOKEN TOTAL decomposed by the same range-bucket + "
    "broadcast-offset trick (dense ranks bucket evenly by integer "
    "DIV; any contiguous-rank bucketing yields the identical cumsum, "
    "so the result is independent of bucket count — which is exactly "
    "how the oracle checks it, with the naive single-sort window). "
    "Documents never split: a shard holds ~shard_tokens ± one doc; "
    "the q114 packer packs sequences WITHIN a shard",
)
def q203(spark, sf_dir):
    from snowflake_cdc_spark.operators.sharding import shard_manifest

    docs = _t(spark, sf_dir, "documents")
    return shard_manifest(docs, shard_tokens=2000, seed=42)


# --------------------------------------------------------------------------
# Q205 — snapshot diff audit (sink-convergence validation)
# --------------------------------------------------------------------------

_DIFF_ORACLE = """
WITH a AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal,
                  c_nationkey AS nat
           FROM customer),
b AS (SELECT k,
             CASE WHEN k % 11 = 3 THEN 'CHURNED' ELSE seg END AS seg,
             CASE WHEN k % 13 = 4 THEN bal + 10.0 ELSE bal END AS bal,
             nat
      FROM a WHERE k % 17 <> 5
      UNION ALL
      SELECT k + 1000000, 'NEW', 0.0, 0 FROM a WHERE k % 19 = 6),
j AS (SELECT a.k AS ka, b.k AS kb,
             a.seg AS sa, b.seg AS sb,
             a.bal AS ba, b.bal AS bb,
             a.nat AS na, b.nat AS nb
      FROM a FULL OUTER JOIN b ON a.k = b.k)
SELECT metric, n FROM (
  SELECT 'rows_added' AS metric,
         CAST(count(*) FILTER (WHERE ka IS NULL) AS BIGINT) AS n FROM j
  UNION ALL
  SELECT 'rows_removed',
         CAST(count(*) FILTER (WHERE kb IS NULL) AS BIGINT) FROM j
  UNION ALL
  SELECT 'rows_common',
         CAST(count(*) FILTER (WHERE ka IS NOT NULL AND kb IS NOT NULL)
              AS BIGINT) FROM j
  UNION ALL
  SELECT 'rows_changed',
         CAST(count(*) FILTER (WHERE ka IS NOT NULL AND kb IS NOT NULL
           AND (sa IS DISTINCT FROM sb OR ba IS DISTINCT FROM bb
                OR na IS DISTINCT FROM nb)) AS BIGINT) FROM j
  UNION ALL
  SELECT 'col_changed:seg',
         CAST(count(*) FILTER (WHERE ka IS NOT NULL AND kb IS NOT NULL
           AND sa IS DISTINCT FROM sb) AS BIGINT) FROM j
  UNION ALL
  SELECT 'col_changed:bal',
         CAST(count(*) FILTER (WHERE ka IS NOT NULL AND kb IS NOT NULL
           AND ba IS DISTINCT FROM bb) AS BIGINT) FROM j
  UNION ALL
  SELECT 'col_changed:nat',
         CAST(count(*) FILTER (WHERE ka IS NOT NULL AND kb IS NOT NULL
           AND na IS DISTINCT FROM nb) AS BIGINT) FROM j)
ORDER BY metric
"""


@register(
    "q205_table_diff",
    _DIFF_ORACLE,
    "two-relation table diff audit (operators/diff.py::table_diff; "
    "the join-free single-log horizon diff is q129's snapshot_diff) — "
    "the CDC "
    "engine validating its own landing: after a replay or backfill, "
    "diff the sink snapshot against the source-of-truth "
    "materialization and report adds / removes / per-column change "
    "counts (NULL-safe: value<->NULL transitions count). The 'next' "
    "snapshot here is derived in-query from customer by planted "
    "deterministic mutations (segment churn on k%11=3, balance bump "
    "on k%13=4, deletes on k%17=5, inserts on k%19=6) so both "
    "engines build the identical pair; the operator computes every "
    "per-column count in ONE aggregation pass over ONE full-outer "
    "key join — never a shuffle per column — and unpivots the 1-row "
    "aggregate into the (metric, n) report",
)
def q205(spark, sf_dir):
    from snowflake_cdc_spark.operators.diff import table_diff

    cust = _t(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_nationkey").alias("nat"),
    )
    b = (
        a.filter(F.col("k") % 17 != 5)
        .select(
            "k",
            F.when(F.col("k") % 11 == 3, F.lit("CHURNED"))
            .otherwise(F.col("seg"))
            .alias("seg"),
            F.when(F.col("k") % 13 == 4, F.col("bal") + F.lit(10.0))
            .otherwise(F.col("bal"))
            .alias("bal"),
            "nat",
        )
        .unionByName(
            a.filter(F.col("k") % 19 == 6).select(
                (F.col("k") + F.lit(1000000)).alias("k"),
                F.lit("NEW").alias("seg"),
                F.lit(0.0).cast(a.schema["bal"].dataType).alias("bal"),
                F.lit(0).cast(a.schema["nat"].dataType).alias("nat"),
            )
        )
    )
    return table_diff(a, b, key_cols=["k"])
