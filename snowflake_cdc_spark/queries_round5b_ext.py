"""Round-5 extension q179+: graph robustness, retrieval and behavioral
analytics lanes —

- q179 k-core decomposition by iterative peeling (``operators/kcore.py``)
  over the support-thresholded co-purchase graph;

Reference parity: the reference (``add_output.py:421-448``) lands raw
CDC rows into the warehouse; these are warehouse-side analytics passes
over the landed tables.

Determinism contract (memory: determinism-contract): integer set
algebra end-to-end where possible (degrees, counts, node ids, word
positions); any float-valued score is one token-identical IEEE
expression quantized ONCE to integer micro units before any sum or
compare (the q160/q172 discipline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.operators.kcore import kcore
from snowflake_cdc_spark.operators.phrase import phrase_search
from snowflake_cdc_spark.queries import _t, register
from snowflake_cdc_spark.operators.util import ckpt_eager, ckpt_lazy

# --------------------------------------------------------------------------
# Q179 — k-core decomposition (iterative peeling, operators/kcore.py)
# --------------------------------------------------------------------------


def _kcore_oracle_sql(ks: tuple[int, ...], rounds: int) -> str:
    """Unrolled peeling oracle (the q136/q145 fixed-rounds pattern):
    per k, ``rounds`` CTE stages of degree-over-survivors + filter.
    Peeling is idempotent at its fixpoint, so an engine that drains
    early equals the full unroll exactly."""
    # MATERIALIZED stops DuckDB inlining `edges` into each of the
    # 2*rounds degree stages (inlining reopens the parquet scan per
    # reference and exhausts the file-handle limit)
    head = """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       pairs AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
                        CAST(count(*) AS BIGINT) AS sup
                 FROM li a JOIN li b
                   ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
                 GROUP BY 1, 2),
       edges AS MATERIALIZED (SELECT src, dst FROM pairs WHERE sup >= 2),
       n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges)"""
    parts = [head]
    finals = []
    for k in ks:
        prev = "n0"
        for r in range(1, rounds + 1):
            parts.append(
                f""",
       d{k}_{r} AS MATERIALIZED (
                 SELECT e.src AS node, CAST(count(*) AS BIGINT) AS deg
                 FROM edges e
                 JOIN {prev} a ON a.node = e.src
                 JOIN {prev} b ON b.node = e.dst
                 GROUP BY e.src),
       n{k}_{r} AS MATERIALIZED (SELECT node FROM d{k}_{r} WHERE deg >= {k})"""
            )
            prev = f"n{k}_{r}"
        finals.append(
            f"SELECT CAST({k} AS BIGINT) AS k, node, deg"
            f" FROM d{k}_{rounds} WHERE deg >= {k}"
        )
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(finals) + "\nORDER BY k, node"


@register(
    "q179_kcore",
    _kcore_oracle_sql((2, 3), 12),
    "k-core decomposition by iterative peeling (operators/kcore.py; "
    "Seidman 1983, Batagelj-Zaversnik 2003) at k=2 and k=3 over the "
    "support>=2 co-purchase graph — the graph-robustness lane beside "
    "components/PageRank/triangles/BFS: the 2-core strips every pendant "
    "tree (the classic sparsification trim), the 3-core keeps only the "
    "cyclically-dense nucleus. The support threshold (q153's frequent-"
    "pairs cut) is what gives this near-random catalog graph real core "
    "structure to find — the raw co-purchase graph is so dense it "
    "all-or-nothing collapses, which the probe documented and rejected. "
    "Per peel round: ONE map-side-combined degree count + two anti-joins "
    "of the edge set against the (small, shrinking) peeled delta — never "
    "a join against the big survivor set; fixed max_rounds=12 with "
    "drained-early exit (the q136/q151 precedent), and because the "
    "fixpoint is idempotent an early-drained run hash-matches the "
    "oracle's full 12-round CTE unroll exactly. Pure integer set "
    "algebra: nothing to quantize, nothing to drift. Multi-round "
    "cascade proven on this data: k=3 takes 10 peel rounds at sf0.01",
)
def q179(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "k")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= 2)
        .select("src", "dst")
        # the pair build dominates the lane; materialize it ONCE and
        # let both k-level peels read the checkpoint instead of each
        # re-running the co-purchase join+groupBy
        .transform(ckpt_eager)
    )
    out = None
    for k in (2, 3):
        core = kcore(edges, k=k, max_rounds=12).select(
            F.lit(k).cast("bigint").alias("k"), "node", "deg"
        )
        out = core if out is None else out.unionByName(core)
    return out.orderBy("k", "node")


# --------------------------------------------------------------------------
# Q180 — exact phrase search over positional postings (operators/phrase.py)
# --------------------------------------------------------------------------

_PHRASES = {
    "w2_table_hash": "table hash",
    "w2_table_table": "table table",
    "w3_stream_table_hash": "stream table hash",
}


def _phrase_oracle_sql(phrases: dict[str, str]) -> str:
    """Window-scan oracle: every k-window of every doc compared to the
    phrase — the definition itself, independent of the postings
    offset-vote formulation the operator ships."""
    blocks = []
    for label, phrase in phrases.items():
        ws = phrase.split()
        m = len(ws)
        conds = " AND ".join(f"ws[i+{j}] = '{w}'" for j, w in enumerate(ws))
        blocks.append(
            f"""SELECT '{label}' AS phrase, doc_id,
              CAST(count(*) AS BIGINT) AS n_occ,
              CAST(min(i) AS BIGINT) AS first_pos
       FROM d, LATERAL unnest(generate_series(1, greatest(len(ws) - {m - 1}, 0))) AS u(i)
       WHERE {conds}
       GROUP BY doc_id"""
        )
    return (
        """WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+') AS ws
           FROM documents)\n"""
        + "\nUNION ALL\n".join(blocks)
        + "\nORDER BY phrase, doc_id"
    )


@register(
    "q180_phrase_search",
    _phrase_oracle_sql(_PHRASES),
    "exact multi-word phrase search over positional postings "
    "(operators/phrase.py) — the IR lane beside BM25 (q130): one "
    "tokenize scan kept to postings of queried-phrase words only, each "
    "posting votes for the phrase-start it would imply per slot its "
    "word fills, ONE groupBy over (phrase, doc, start) counting filled "
    "slots = exact occurrences for ALL phrases together (the m-way "
    "postings-intersection join chain would be m-1 shuffles PER "
    "phrase). Repeated-word phrases and overlapping occurrences fall "
    "out of the slot semantics ('table table' is in the query set "
    "precisely to hash-pin them). Pure integer positions/counts; the "
    "oracle runs the INDEPENDENT window-scan definition, so the check "
    "proves the postings formulation equivalent to it",
)
def q180(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return phrase_search(docs, _PHRASES).orderBy("phrase", "doc_id")


# --------------------------------------------------------------------------
# Q181 — Markov event-type transition matrix (behavioral analytics)
# --------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH s AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
     p AS (SELECT prev, event_type AS nxt, CAST(count(*) AS BIGINT) AS c
           FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
     t AS (SELECT prev, CAST(sum(c) AS BIGINT) AS tot FROM p GROUP BY 1)
SELECT p.prev AS prev_type, p.nxt AS next_type, p.c AS n_transitions,
       CAST(p.c * 1000000 // t.tot AS BIGINT) AS prob_ppm
FROM p JOIN t USING (prev)
ORDER BY prev_type, next_type
"""


@register(
    "q181_markov_transitions",
    _MARKOV_ORACLE,
    "first-order Markov transition matrix over per-user event sequences "
    "— the behavioral model behind next-action prediction, anomaly "
    "screens (transitions that never happen for real users) and funnel "
    "design: per user, events sorted by (ts, event_id), consecutive "
    "type pairs counted globally, per-source probabilities as EXACT "
    "integer ppm (cnt*1e6 div row-total — no float division to drift). "
    "ONE data shuffle: per-user sorted arrays built the q172 way "
    "(sort_array of structs, pairs via zip_with of shifted slices — no "
    "per-user window sort pass), then a tiny (|types|^2) aggregation + "
    "broadcast totals join. The oracle runs the INDEPENDENT window-lag "
    "algorithm, so the hash check proves the array-fold equivalent",
)
def q181(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    arr = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))).alias("s")
    )
    # bind derived arrays to columns BEFORE slicing/zipping (lambda-CSE
    # gotcha: enclosing exprs re-evaluate per element otherwise)
    arr = arr.withColumn(
        "types", F.transform("s", lambda x: x["event_type"])
    ).withColumn("n", F.size("types"))
    pairs = arr.select(
        F.explode(
            F.zip_with(
                F.slice("types", 1, F.greatest(F.col("n") - 1, F.lit(0))),
                F.slice("types", 2, F.greatest(F.col("n") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("prev_type"), b.alias("next_type")),
            )
        ).alias("pr")
    ).select("pr.prev_type", "pr.next_type")
    cnt = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    tot = cnt.groupBy("prev_type").agg(
        F.sum("n_transitions").cast("bigint").alias("tot")
    )
    return (
        cnt.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            F.expr("CAST(n_transitions * 1000000 DIV tot AS BIGINT)").alias(
                "prob_ppm"
            ),
        )
        .orderBy("prev_type", "next_type")
    )


# --------------------------------------------------------------------------
# Q182 — chi-squared independence audit (contingency EDA / DQ screen)
# --------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH obs AS (SELECT c_nationkey AS nat, c_mktsegment AS seg,
                    CAST(count(*) AS BIGINT) AS o
             FROM customer GROUP BY 1, 2),
     r AS (SELECT nat, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
     c AS (SELECT seg, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
     n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM obs),
     grid AS (SELECT r.nat, c.seg, r.rt, c.ct, n.nn,
                     coalesce(obs.o, 0) AS o
              FROM r CROSS JOIN c CROSS JOIN n
              LEFT JOIN obs ON obs.nat = r.nat AND obs.seg = c.seg),
     cells AS (SELECT nat, seg, o,
                      CAST(floor(
                        CAST(nn * o - rt * ct AS DOUBLE)
                        * CAST(nn * o - rt * ct AS DOUBLE)
                        / (CAST(nn AS DOUBLE) * CAST(rt AS DOUBLE)
                           * CAST(ct AS DOUBLE))
                        * 1000000.0) AS BIGINT) AS contrib_micro
               FROM grid)
SELECT nat, seg, o, contrib_micro FROM cells
UNION ALL
SELECT -1 AS nat, '_TOTAL' AS seg,
       (SELECT nn FROM n) AS o,
       CAST(sum(contrib_micro) AS BIGINT) AS contrib_micro
FROM cells
ORDER BY nat, seg
"""


@register(
    "q182_chi2_independence",
    _CHI2_ORACLE,
    "chi-squared independence audit over the (nation x segment) "
    "contingency table — the EDA/data-quality screen for 'did this "
    "load skew a dimension' and the statistical cousin of the Benford "
    "lane (q178): every cell's (N*obs - rowtot*coltot)^2 keeps EXACT "
    "BIGINT arithmetic (at sf0.1 the squared term peaks ~5e13, far "
    "under 2^63), then ONE token-identical IEEE expression divides by "
    "N*rowtot*coltot and quantizes to integer micro units (the "
    "q160/q172 discipline), summed order-free — zero cells INCLUDED "
    "via the row-totals x col-totals grid (chi2 without them is "
    "wrong). One scan + one tiny class aggregation; everything after "
    "runs on broadcast-sized relations. Total row (-1, _TOTAL) carries "
    "the statistic; dof = (R-1)(C-1) is derivable from the grid",
)
def q182(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    obs = cust.groupBy(
        F.col("c_nationkey").alias("nat"), F.col("c_mktsegment").alias("seg")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    r = obs.groupBy("nat").agg(F.sum("o").cast("bigint").alias("rt"))
    c = obs.groupBy("seg").agg(F.sum("o").cast("bigint").alias("ct"))
    n = obs.agg(F.sum("o").cast("bigint").alias("nn"))
    grid = (
        F.broadcast(r)
        .crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(n))
        .join(obs, ["nat", "seg"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0).cast("bigint")))
    )
    cells = grid.select(
        "nat",
        "seg",
        "o",
        F.expr(
            "CAST(floor("
            " CAST(nn * o - rt * ct AS DOUBLE)"
            " * CAST(nn * o - rt * ct AS DOUBLE)"
            " / (CAST(nn AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))"
            " * 1000000.0) AS BIGINT)"
        ).alias("contrib_micro"),
    )
    total = (
        cells.agg(F.sum("contrib_micro").cast("bigint").alias("contrib_micro"))
        .crossJoin(F.broadcast(n.select(F.col("nn").alias("o"))))
        .select(
            F.lit(-1).cast("bigint").alias("nat"),
            F.lit("_TOTAL").alias("seg"),
            "o",
            "contrib_micro",
        )
    )
    return cells.unionByName(total).orderBy("nat", "seg")


# --------------------------------------------------------------------------
# Q183 — hard-negative mining (label-aware exact-IVF ANN)
# --------------------------------------------------------------------------


def _hard_negative_oracle(k: int = 8, rounds: int = 2, dim: int = 64,
                          nprobe: int = 4, topk: int = 5) -> str:
    from snowflake_cdc_spark.queries_governance_ext import _kmeans_chain

    return _kmeans_chain(k, rounds, dim) + f""",
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
qs AS (SELECT q.vec_id AS query_id, q.qv, l.label AS q_label
       FROM q JOIN lab l ON l.vec_id = q.vec_id
       WHERE q.vec_id % 10 = 7),
pd AS (SELECT s.query_id, s.qv, s.q_label, c.cell,
              CAST(list_sum(list_transform(list_zip(s.qv, c.qv),
                     p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS cdist
       FROM qs s, c{rounds - 1} c),
pr AS (SELECT query_id, qv, q_label, cell FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                                      ORDER BY cdist, cell) AS rn FROM pd)
       WHERE rn <= {nprobe}),
cand AS (SELECT p.query_id, p.q_label, a.vec_id, l.label AS n_label,
                CAST(list_sum(list_transform(list_zip(p.qv, a.qv),
                       pp -> (pp[1]-pp[2])*(pp[1]-pp[2]))) AS BIGINT) AS dist
         FROM pr p
         JOIN a{rounds} a ON a.cell = p.cell AND a.vec_id <> p.query_id
         JOIN lab l ON l.vec_id = a.vec_id
         WHERE l.label <> p.q_label)
SELECT query_id, q_label, vec_id, n_label, dist FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist, vec_id) AS rn FROM cand)
WHERE rn <= {topk} ORDER BY query_id, vec_id"""


@register(
    "q183_hard_negatives",
    _hard_negative_oracle(),
    "hard-negative mining for contrastive training (label-aware "
    "exact-IVF ANN; the standard training-data step behind embedding "
    "models — for each anchor, the NEAREST vectors of a DIFFERENT "
    "label are the negatives that actually move the loss): q158's "
    "complete-oracle search with the label-exclusion filter applied "
    "BEFORE the top-k ranking (trimming after the top-k would return "
    "fewer/weaker negatives — the ordering of filter vs rank is the "
    "semantics, and the planted test pins it). Same scale shape as "
    "q158: probes from the driver-held centroid grid (plan literal), "
    "candidates from ONE cell equi-join, never corpus x queries; all "
    "arithmetic exact integers on the quantized grid, so DuckDB "
    "re-derives every centroid, probe and mined negative",
)
def q183(spark, sf_dir):
    from snowflake_cdc_spark.operators.ivf_exact import ivf_exact_search
    from snowflake_cdc_spark.operators.kmeans_exact import (
        kmeans_fit,
        quantize_vectors,
    )

    emb = _t(spark, sf_dir, "embeddings")
    lab = emb.select("vec_id", F.col("label").cast("bigint").alias("label"))
    centroids, assigned = kmeans_fit(emb, k=8, rounds=2)
    assigned_l = assigned.join(lab, "vec_id")
    queries = (
        quantize_vectors(
            emb.filter(F.col("vec_id") % 10 == 7).select("vec_id", "embedding")
        )
        .join(lab, "vec_id")
        .select(F.col("vec_id").alias("query_id"), "qv", "label")
    )
    hits = ivf_exact_search(
        centroids,
        assigned_l,
        queries,
        k=5,
        nprobe=4,
        exclude_match_col="label",
        dim=64,
    )
    q_lab = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    n_lab = lab.select("vec_id", F.col("label").alias("n_label"))
    return (
        hits.join(F.broadcast(q_lab), "query_id")
        .join(F.broadcast(n_lab), "vec_id")
        .select("query_id", "q_label", "vec_id", "n_label", "dist")
        .orderBy("query_id", "vec_id")
    )


# --------------------------------------------------------------------------
# Q184 — seasonal-profile residual anomalies (ops analytics)
# --------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH e AS (SELECT event_id, event_type,
                  CAST(hour(ts) AS BIGINT) AS hod,
                  CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v
           FROM events),
     g AS (SELECT event_type, hod, CAST(sum(v) AS BIGINT) AS s,
                  CAST(count(*) AS BIGINT) AS n
           FROM e GROUP BY 1, 2),
     r AS (SELECT e.event_id, e.event_type, e.hod, e.v,
                  g.n, g.s, g.n * e.v - g.s AS dev
           FROM e JOIN g USING (event_type, hod)),
     m AS (SELECT event_type, hod, CAST(sum(abs(dev)) AS BIGINT) AS sad
           FROM r GROUP BY 1, 2)
SELECT r.event_id, r.event_type, r.hod, r.v, r.dev
FROM r JOIN m USING (event_type, hod)
WHERE r.n * abs(r.dev) > 3 * m.sad
ORDER BY r.event_id
"""


@register(
    "q184_seasonal_anomalies",
    _SEASONAL_ORACLE,
    "seasonal-profile residual anomalies — the ops-analytics screen "
    "beside CUSUM (q164: level shifts over time) and MAD (q175: static "
    "per-group outliers): each event's value is compared to its "
    "(event_type, hour-of-day) seasonal baseline, flagging rows whose "
    "residual exceeds 3x the profile's mean absolute residual. The "
    "fractional mean never materializes (q164's count-scaling: dev = "
    "n*v - S, threshold n*|dev| > 3*sum|dev| — all BIGINT, nothing "
    "rounds; value quantized ONCE to micro units at input). Two "
    "map-side-combined profile aggregations over one scan + broadcast "
    "join-backs (the profile table is |types| x 24 rows); at 100 TB "
    "the n^2*v headroom is managed by coarser input quantization "
    "(documented), never by float fallback",
)
def q184(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("hod"),
        F.floor(F.col("value") * 1000000.0 + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )
    g = e.groupBy("event_type", "hod").agg(
        F.sum("v").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    r = e.join(F.broadcast(g), ["event_type", "hod"]).withColumn(
        "dev", F.col("n") * F.col("v") - F.col("s")
    )
    m = r.groupBy("event_type", "hod").agg(
        F.sum(F.abs(F.col("dev"))).cast("bigint").alias("sad")
    )
    return (
        r.join(F.broadcast(m), ["event_type", "hod"])
        .filter(F.col("n") * F.abs(F.col("dev")) > 3 * F.col("sad"))
        .select("event_id", "event_type", "hod", "v", "dev")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q185 — exponentially-decayed trending scores (dyadic-exact)
# --------------------------------------------------------------------------

_DECAY_ORACLE = """
WITH mx AS (SELECT max(CAST(ts AS DATE)) AS d0 FROM events),
     e AS (SELECT event_type,
                  date_diff('day', CAST(ts AS DATE), mx.d0) AS age
           FROM events, mx),
     w AS (SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CAST(1 AS BIGINT) << (29 - age)) AS BIGINT)
                    AS decayed_num
           FROM e WHERE age <= 29 GROUP BY 1)
SELECT event_type, n_events, decayed_num,
       CAST(floor(CAST(decayed_num AS DOUBLE) / 536870912.0 * 1000000.0)
            AS BIGINT) AS decayed_micro
FROM w ORDER BY event_type
"""


@register(
    "q185_decayed_trending",
    _DECAY_ORACLE,
    "exponentially-decayed trending scores over the trailing 30 days "
    "(half-life = 1 day) — the freshness-weighted counting every "
    "trending/leaderboard surface runs, made hash-checkable by "
    "DYADIC weights: each event contributes 2^(29 - age_days), an "
    "exact BIGINT (sum <= ~2^29 * |events|, far under 2^63 at this "
    "window; the window bound is also what keeps the shift exponent "
    "nonnegative and bounded), so the decayed numerator is an exact "
    "order-free integer sum where a float 0.5^age sum would be "
    "order-dependent. The human-readable score is ONE quantized "
    "division by 2^29 at the end (q160 discipline). One scan + one "
    "map-side-combined aggregation; the anchor date is a broadcast "
    "1-row aggregate, not a driver collect",
)
def q185(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("d")
    )
    mx = ev.agg(F.max("d").alias("d0"))
    e = ev.crossJoin(F.broadcast(mx)).select(
        "event_type", F.datediff(F.col("d0"), F.col("d")).cast("int").alias("age")
    )
    w = (
        e.filter(F.col("age") <= 29)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 29 - age)"))
            .cast("bigint")
            .alias("decayed_num"),
        )
    )
    return w.select(
        "event_type",
        "n_events",
        "decayed_num",
        F.floor(
            F.col("decayed_num").cast("double") / F.lit(536870912.0) * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("decayed_micro"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q186 — audio frame-energy extraction (multimodal feature lane)
# --------------------------------------------------------------------------

_AUDIO_ENERGY_ORACLE = """
WITH d AS (SELECT doc_id, text, n_chars FROM documents
           WHERE doc_id % 5 = 1 AND n_chars > 0),
     s AS (SELECT doc_id, (n_chars + 1) // 2 AS n_samples FROM d),
     f AS (SELECT d.doc_id, u.i AS si,
                  ascii(substr(d.text, 2 * u.i + 1, 1))
                  + 256 * ascii(substr(d.text, 2 * u.i + 2, 1)) AS v
           FROM d JOIN s USING (doc_id),
           LATERAL unnest(generate_series(0, s.n_samples - 1)) AS u(i))
SELECT doc_id AS media_id,
       CAST(si // 200 AS BIGINT) AS frame_index,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CAST(v AS BIGINT) * CAST(v AS BIGINT)) AS BIGINT) AS energy
FROM f GROUP BY 1, 2
ORDER BY media_id, frame_index
"""


@register(
    "q186_audio_frame_energy",
    _AUDIO_ENERGY_ORACLE,
    "audio feature-extraction lane, driver-hash-checked end to end — "
    "the q163 codec-round-trip discipline extended from image to "
    "AUDIO: documents become genuine WAV containers (utf-8 bytes as "
    "little-endian 16-bit PCM, stdlib codec), the Arrow-batched "
    "decode_audio stage decodes them back, and audio_frame_energy "
    "emits per-200-sample-frame EXACT integer energies (sum of squared "
    "int16 samples — the front-end of VAD/silence-trim/loudness "
    "pipelines). The oracle re-derives every sample value and frame "
    "energy from the text column alone (ASCII bytes -> lo + 256*hi; "
    "ascii('') = 0 supplies the odd-length pad), so a hash match "
    "proves encode -> WAV -> mapInPandas decode -> framing -> feature "
    "are ALL lossless. Empty documents are filtered on both sides "
    "(the q163 ADVICE precedent); real corpora route them to the DQ "
    "lane instead",
)
def q186(spark, sf_dir):
    from snowflake_cdc_spark.operators.multimodal import (
        audio_frame_energy,
        decode_audio,
        documents_as_wav_media,
    )

    docs = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 5 == 1) & (F.col("n_chars") > 0)
    )
    media = documents_as_wav_media(docs)
    dec = decode_audio(media)
    return audio_frame_energy(dec, frame_len=200).orderBy(
        "media_id", "frame_index"
    )


# --------------------------------------------------------------------------
# Q187 — weight-of-evidence feature binning (equi-depth + WOE)
# --------------------------------------------------------------------------

_WOE_ORACLE = """
WITH src AS (SELECT o_orderkey AS id, o_totalprice AS v,
                    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
             FROM orders WHERE o_totalprice IS NOT NULL),
     tot AS (SELECT count(*) AS n FROM src),
     r AS (SELECT id, pos, row_number() OVER (ORDER BY v, id) AS rn FROM src),
     b AS (SELECT pos,
             CASE WHEN rn <= (tot.n % 10) * (tot.n // 10 + 1)
                  THEN (rn - 1) // (tot.n // 10 + 1) + 1
                  ELSE (tot.n % 10)
                       + (rn - (tot.n % 10) * (tot.n // 10 + 1) - 1) // (tot.n // 10) + 1
             END AS bucket
           FROM r, tot),
     bins AS (SELECT CAST(bucket AS BIGINT) AS bucket,
                     CAST(sum(pos) AS BIGINT) AS n_pos,
                     CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
              FROM b GROUP BY 1),
     t AS (SELECT CAST(sum(n_pos + 1) AS BIGINT) AS p,
                  CAST(sum(n_neg + 1) AS BIGINT) AS q FROM bins)
SELECT bucket, n_pos, n_neg,
       CAST(floor(ln(CAST((n_pos + 1) * t.q AS DOUBLE)
                     / CAST((n_neg + 1) * t.p AS DOUBLE)) * 1000000.0)
            AS BIGINT) AS woe_micro
FROM bins, t
ORDER BY bucket
"""


@register(
    "q187_woe_binning",
    _WOE_ORACLE,
    "weight-of-evidence feature binning (the credit-scoring / feature-"
    "engineering standard: equi-depth bins of a continuous feature, "
    "per-bin ln of the smoothed pos/neg odds ratio vs the global "
    "ratio): bin assignment reuses the q140 sort-free equi-depth "
    "composition (operators/histogram.py::equidepth_assign — per-row "
    "buckets, NO global sort region; the oracle runs the independent "
    "single-sort ntile-fill), target = o_orderstatus 'F'. WOE keeps "
    "+1-smoothed counts in EXACT BIGINT products and spends ONE "
    "token-identical ln+division quantized to micro units (the "
    "q173 discipline) — at warehouse scale the BIGINT product "
    "headroom is managed by pre-dividing both counts by a common "
    "power of two, never by float sums",
)
def q187(spark, sf_dir):
    from snowflake_cdc_spark.operators.histogram import equidepth_assign

    orders = _t(spark, sf_dir, "orders")
    src = orders.filter(F.col("o_totalprice").isNotNull()).select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    assigned = equidepth_assign(src, "o_totalprice", "o_orderkey", k=10)
    joined = assigned.join(src.select("o_orderkey", "pos"), "o_orderkey")
    # k-row relation consumed by BOTH the totals agg and the final
    # projection — materialize once (round 11) or the whole equi-depth
    # assignment subtree executes twice
    bins = joined.groupBy("bucket").agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("bigint").alias("n_neg"),
    ).transform(ckpt_lazy)
    t = bins.agg(
        F.sum(F.col("n_pos") + 1).cast("bigint").alias("p"),
        F.sum(F.col("n_neg") + 1).cast("bigint").alias("q"),
    )
    return (
        bins.crossJoin(F.broadcast(t))
        .select(
            "bucket",
            "n_pos",
            "n_neg",
            F.floor(
                F.log(
                    F.expr("CAST((n_pos + 1) * q AS DOUBLE)")
                    / F.expr("CAST((n_neg + 1) * p AS DOUBLE)")
                )
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("woe_micro"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Q188 — join-key skew profiler (operators/skew.py)
# --------------------------------------------------------------------------


def _skew_oracle_sql(keys: list[tuple[str, str]]) -> str:
    blocks = []
    for i, (table, col) in enumerate(keys):
        label = f"{table}.{col}"
        blocks.append(
            f"""k{i} AS (SELECT {col} AS key, CAST(count(*) AS BIGINT) AS c
            FROM {table} WHERE {col} IS NOT NULL GROUP BY 1),
       r{i} AS (SELECT c, row_number() OVER (ORDER BY c, key) AS rn FROM k{i}),
       g{i} AS (SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(c) AS BIGINT) AS s1,
                       CAST(sum(rn * c) AS BIGINT) AS s2
                FROM r{i})"""
        )
    selects = []
    for i, (table, col) in enumerate(keys):
        label = f"{table}.{col}"
        selects.append(
            f"""SELECT '{label}' AS key_col, s1 AS n_rows, n AS n_distinct,
       (SELECT max(c) FROM k{i}) AS max_count,
       (SELECT CAST(min(key) AS VARCHAR) FROM k{i}
        WHERE c = (SELECT max(c) FROM k{i})) AS top_key,
       CAST(2 * s2 - (n + 1) * s1 AS BIGINT) AS gini_num,
       CAST(n * s1 AS BIGINT) AS gini_den
FROM g{i}"""
        )
    return (
        "WITH " + ",\n       ".join(blocks) + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY key_col"
    )


_SKEW_KEYS = [
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
]


@register(
    "q188_skew_profile",
    _skew_oracle_sql(_SKEW_KEYS),
    "join-key skew profiler (operators/skew.py) — the shuffle-planning "
    "diagnostic behind salting/broadcast decisions, profiled for the "
    "four hottest join keys in the schema: per key, rows / distinct / "
    "heaviest key + count / EXACT-RATIONAL Gini concentration "
    "((2*sum(i*x_i) - (n+1)*sum(x)) over n*sum(x), x ascending — the "
    "q162/q174 rational-pair discipline; float Gini is an "
    "order-dependent sum). Everything after the per-key count agg runs "
    "on the DISTINCT-KEY relation, and its rank is SORT-FREE "
    "(operators/rank.py skewed_count_rank — no unpartitioned window "
    "even at billion-key joins; tie blocks rank in md5 order, "
    "invisible to Σ rn·c); heaviest key via min-over-struct, one "
    "pass. AQE reacts to skew at runtime — this lane reports it ahead "
    "of time, the q131/LSH-cap planning story",
)
def q188(spark, sf_dir):
    from snowflake_cdc_spark.operators.skew import skew_profile

    out = None
    for table, col in _SKEW_KEYS:
        prof = skew_profile(_t(spark, sf_dir, table), col, f"{table}.{col}")
        out = prof if out is None else out.unionByName(prof)
    return out.orderBy("key_col")


# --------------------------------------------------------------------------
# Q189 — referential-integrity audit (FK orphan screen)
# --------------------------------------------------------------------------


def _ref_integrity_oracle(pairs) -> str:
    blocks = []
    for i, (child, ck, parent, pk) in enumerate(pairs):
        blocks.append(
            f"""SELECT '{child}.{ck} -> {parent}.{pk}' AS fk,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(count(*) FILTER (WHERE p.{pk} IS NULL) AS BIGINT) AS n_orphans,
       CAST(count(*) FILTER (WHERE p.{pk} IS NULL) * 1000000
            // count(*) AS BIGINT) AS orphan_ppm
FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
  ON c.{ck} = p.{pk}"""
        )
    return "\nUNION ALL\n".join(blocks) + "\nORDER BY fk"


_FK_PAIRS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
]


@register(
    "q189_ref_integrity",
    _ref_integrity_oracle(_FK_PAIRS),
    "referential-integrity audit over the schema's five FK edges — the "
    "data-contract governance lane beside the DQ report (q132) and "
    "k-anonymity (q177): per FK, child rows / orphans (child keys with "
    "no parent) / exact integer orphan ppm. Each edge is ONE left "
    "anti-join-shaped probe against the DISTINCT parent keys (the "
    "parent key relation broadcasts when small — nation — and "
    "shuffle-joins when not — orders; Catalyst/AQE picks, which is the "
    "point of declaring it as a join rather than hand-scheduling); on "
    "this consistent fixture every ppm is 0, which IS the audit's "
    "green path — the planted pytest drives the orphan branch",
)
def q189(spark, sf_dir):
    out = None
    for child, ck, parent, pk in _FK_PAIRS:
        c = _t(spark, sf_dir, child).select(F.col(ck).alias("ck"))
        p = _t(spark, sf_dir, parent).select(F.col(pk).alias("pk")).distinct()
        j = c.join(p, c.ck == p.pk, "left")
        row = j.agg(
            F.lit(f"{child}.{ck} -> {parent}.{pk}").alias("fk"),
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
            F.count(F.when(F.col("pk").isNull(), 1)).cast("bigint").alias(
                "n_orphans"
            ),
            F.expr(
                "CAST(count(CASE WHEN pk IS NULL THEN 1 END) * 1000000"
                " DIV count(*) AS BIGINT)"
            ).alias("orphan_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk")


# --------------------------------------------------------------------------
# Q190 — vocabulary drift between corpus halves (smoothed KL divergence)
# --------------------------------------------------------------------------

_KL_ORACLE = """
WITH toks AS (SELECT doc_id % 2 AS half, unnest(
                  regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+')) AS w
              FROM documents),
     c AS (SELECT w,
                  CAST(count(*) FILTER (WHERE half = 0) AS BIGINT) AS cp,
                  CAST(count(*) FILTER (WHERE half = 1) AS BIGINT) AS cq
           FROM toks GROUP BY 1),
     t AS (SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cq) AS BIGINT) AS nq,
                  CAST(count(*) AS BIGINT) AS v
           FROM c),
     terms AS (SELECT c.w, c.cp, c.cq,
                      CAST(floor(
                        (CAST(c.cp + 1 AS DOUBLE) / CAST(t.np + t.v AS DOUBLE))
                        * ln(CAST((c.cp + 1) * (t.nq + t.v) AS DOUBLE)
                             / CAST((c.cq + 1) * (t.np + t.v) AS DOUBLE))
                        * 1000000000.0) AS BIGINT) AS term_nano
               FROM c, t)
SELECT w, cp, cq, term_nano FROM terms
UNION ALL
SELECT '_TOTAL' AS w, t.np AS cp, t.nq AS cq,
       (SELECT CAST(sum(term_nano) AS BIGINT) FROM terms) AS term_nano
FROM t
ORDER BY w
"""


@register(
    "q190_vocab_drift",
    _KL_ORACLE,
    "vocabulary drift between corpus halves via +1-smoothed KL "
    "divergence over the union vocabulary — the corpus-drift monitor a "
    "training-data pipeline runs per ingest batch (template floods and "
    "source composition shifts bend the distribution long before "
    "eyeballing does; the diagnostic sibling of Zipf q174 and "
    "surprisal q160): each word's KL term spends its floats in ONE "
    "token-identical expression — smoothed p as a single division, the "
    "log-ratio as one ln over a quotient of exact BIGINT products — "
    "quantized once to nano units, then summed order-free (negative "
    "terms floor correctly). One corpus scan, one vocab-sized "
    "aggregation with FILTER-style split counting, broadcast totals; "
    "total row carries the divergence",
)
def q190(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(UNICODE_WORD), 0)
        ).alias("w"),
    )
    c = toks.groupBy("w").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("cp"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("cq"),
    )
    t = c.agg(
        F.sum("cp").cast("bigint").alias("np"),
        F.sum("cq").cast("bigint").alias("nq"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    terms = c.crossJoin(F.broadcast(t)).select(
        "w",
        "cp",
        "cq",
        F.expr(
            "CAST(floor("
            " (CAST(cp + 1 AS DOUBLE) / CAST(np + v AS DOUBLE))"
            " * ln(CAST((cp + 1) * (nq + v) AS DOUBLE)"
            "      / CAST((cq + 1) * (np + v) AS DOUBLE))"
            " * 1000000000.0) AS BIGINT)"
        ).alias("term_nano"),
    )
    total = (
        terms.agg(F.sum("term_nano").cast("bigint").alias("term_nano"))
        .crossJoin(F.broadcast(t))
        .select(
            F.lit("_TOTAL").alias("w"),
            F.col("np").alias("cp"),
            F.col("nq").alias("cq"),
            "term_nano",
        )
    )
    return terms.unionByName(total).orderBy("w")


# --------------------------------------------------------------------------
# Q191 — kNN auto-labeling evaluation (held-out label inference)
# --------------------------------------------------------------------------


def _knn_eval_oracle(k: int = 8, rounds: int = 2, dim: int = 64,
                     nprobe: int = 4, topk: int = 5) -> str:
    from snowflake_cdc_spark.queries_governance_ext import _kmeans_chain

    return _kmeans_chain(k, rounds, dim) + f""",
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
qs AS (SELECT q.vec_id AS query_id, q.qv, l.label AS true_label
       FROM q JOIN lab l ON l.vec_id = q.vec_id
       WHERE q.vec_id % 10 = 7),
pd AS (SELECT s.query_id, s.qv, s.true_label, c.cell,
              CAST(list_sum(list_transform(list_zip(s.qv, c.qv),
                     p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS cdist
       FROM qs s, c{rounds - 1} c),
pr AS (SELECT query_id, qv, true_label, cell FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                                      ORDER BY cdist, cell) AS rn FROM pd)
       WHERE rn <= {nprobe}),
cand AS (SELECT p.query_id, p.true_label, a.vec_id, l.label AS n_label,
                CAST(list_sum(list_transform(list_zip(p.qv, a.qv),
                       pp -> (pp[1]-pp[2])*(pp[1]-pp[2]))) AS BIGINT) AS dist
         FROM pr p
         JOIN a{rounds} a ON a.cell = p.cell AND a.vec_id % 10 <> 7
         JOIN lab l ON l.vec_id = a.vec_id),
nn AS (SELECT query_id, true_label, n_label FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                                      ORDER BY dist, vec_id) AS rn FROM cand)
       WHERE rn <= {topk}),
votes AS (SELECT query_id, true_label, n_label,
                 CAST(count(*) AS BIGINT) AS v
          FROM nn GROUP BY 1, 2, 3),
pred AS (SELECT query_id, true_label, n_label AS pred_label FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY v DESC, n_label) AS rn
           FROM votes)
         WHERE rn = 1)
SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2 ORDER BY true_label, pred_label"""


@register(
    "q191_knn_label_eval",
    _knn_eval_oracle(),
    "kNN auto-labeling evaluation — the training-data workflow that "
    "closes the loop on the ANN family: held-out vectors (vec_id%10=7) "
    "get labels inferred by majority vote of their 5 nearest LABELED "
    "neighbors (candidates exclude the entire held-out split, not just "
    "self — held-out means held out), emitted as the confusion matrix. "
    "Same complete-oracle scale shape as q158/q183 (plan-literal "
    "centroids, ONE cell equi-join, integer L2); the vote argmax ties "
    "to the smallest label (struct order), so the whole inference — "
    "index, probes, neighbors, votes, predictions — hash-matches "
    "DuckDB re-deriving it from scratch",
)
def q191(spark, sf_dir):
    from pyspark.sql import Window

    from snowflake_cdc_spark.operators.ivf_exact import ivf_exact_search
    from snowflake_cdc_spark.operators.kmeans_exact import (
        kmeans_fit,
        quantize_vectors,
    )

    emb = _t(spark, sf_dir, "embeddings")
    lab = emb.select("vec_id", F.col("label").cast("bigint").alias("label"))
    centroids, assigned = kmeans_fit(emb, k=8, rounds=2)
    corpus = assigned.filter(F.col("vec_id") % 10 != 7)
    queries = (
        quantize_vectors(
            emb.filter(F.col("vec_id") % 10 == 7).select("vec_id", "embedding")
        )
        .select(F.col("vec_id").alias("query_id"), "qv")
    )
    nn = ivf_exact_search(centroids, corpus, queries, k=5, nprobe=4, dim=64)
    nn_lab = nn.join(
        F.broadcast(lab.select("vec_id", F.col("label").alias("n_label"))),
        "vec_id",
    )
    votes = nn_lab.groupBy("query_id", "n_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("v"), "n_label")
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("n_label").alias("pred_label"))
    )
    truth = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        pred.join(F.broadcast(truth), "query_id")
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("true_label", "pred_label")
    )


# --------------------------------------------------------------------------
# Q192 — mutual nearest neighbors (alignment-pair mining)
# --------------------------------------------------------------------------

def _mutual_nn_oracle(k: int = 8, rounds: int = 2, dim: int = 64,
                      nprobe: int = 4) -> str:
    from snowflake_cdc_spark.queries_governance_ext import _kmeans_chain

    return _kmeans_chain(k, rounds, dim) + f""",
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
    "q192_mutual_nn",
    _mutual_nn_oracle(),
    "mutual-nearest-neighbor pair mining (the reciprocal-best-match "
    "criterion behind bitext/entity alignment and duplicate-pair "
    "bootstrapping — a pair only aligns when EACH side is the other's "
    "top-1), CORPUS-WIDE (VERDICT r05 #3 — the former vec_id%25 "
    "fixture subset and its subset-squared crossJoin are gone): every "
    "vector queries the q158/q183 exact-IVF candidate generator "
    "(plan-literal centroids, ONE cell equi-join of the assigned "
    "corpus against itself — never corpus x corpus), top-1 per "
    "direction by (dist, id) over the probed candidates, reciprocity "
    "via the self-join of the two direction results, a<b canonical "
    "order. All-integer end to end, so the oracle re-derives the "
    "whole index, both NN directions and every surviving pair (the "
    "complete-oracle ANN discipline; mutuality under IVF means "
    "reciprocal-best AMONG PROBED CANDIDATES, identically in both "
    "engines)",
)
def q192(spark, sf_dir):
    from snowflake_cdc_spark.operators.ivf_exact import ivf_exact_search
    from snowflake_cdc_spark.operators.kmeans_exact import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    centroids, assigned = kmeans_fit(emb, k=8, rounds=2)
    queries = assigned.select(F.col("vec_id").alias("query_id"), "qv")
    nn = ivf_exact_search(
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
# Q193 — conversion-latency quartiles (funnel timing analytics)
# --------------------------------------------------------------------------

_LATENCY_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS vt FROM events
           WHERE event_type = 'view' GROUP BY 1),
     p AS (SELECT v.user_id,
                  min((epoch_us(e.ts) - epoch_us(v.vt)) // 1000000) AS delta_s
           FROM v JOIN events e
             ON e.user_id = v.user_id
            AND e.event_type = 'purchase' AND e.ts > v.vt
           GROUP BY 1),
     r AS (SELECT delta_s,
                  row_number() OVER (ORDER BY delta_s, user_id) AS rn,
                  count(*) OVER () AS n
           FROM p)
SELECT q, CAST(rk AS BIGINT) AS rank, CAST(delta_s AS BIGINT) AS delta_s
FROM (SELECT 'q1' AS q, (n + 3) // 4 AS rk FROM r LIMIT 1) x
JOIN r ON r.rn = x.rk
UNION ALL
SELECT 'q2', CAST(rk AS BIGINT), CAST(delta_s AS BIGINT)
FROM (SELECT (n + 1) // 2 AS rk FROM r LIMIT 1) x JOIN r ON r.rn = x.rk
UNION ALL
SELECT 'q3', CAST(rk AS BIGINT), CAST(delta_s AS BIGINT)
FROM (SELECT (3 * n + 1) // 4 AS rk FROM r LIMIT 1) x JOIN r ON r.rn = x.rk
ORDER BY q
"""


@register(
    "q193_conversion_latency",
    _LATENCY_ORACLE,
    "conversion-latency quartiles (first view -> first strictly-later "
    "purchase per user, the q100/q150 anchoring semantics; deltas in "
    "whole seconds): the timing half of funnel analytics — counts say "
    "HOW MANY convert, this says HOW FAST. Quartiles are EXACT values "
    "at integer ranks of the (delta, user) total order (the q175 "
    "rank-of-sorted-multiset discipline — layout-invariant under ties "
    "where approx_percentile would be neither exact nor verifiable); "
    "the converter rank is SORT-FREE (operators/rank.py "
    "rangebucket_rank, the q120/q140 range-bucket + broadcast-offset "
    "composition — no unpartitioned window over the converters), "
    "after two map-side-combined min aggregations",
)
def q193(spark, sf_dir):
    from snowflake_cdc_spark.operators.rank import rangebucket_rank

    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.expr(
                    "CAST((unix_micros(cast(ts as timestamp))"
                    " - unix_micros(cast(vt as timestamp))) DIV 1000000"
                    " AS BIGINT)"
                )
            ).alias("delta_s")
        )
    )
    # sort-free rank of the converters relation (VERDICT r05 #1): the
    # q120/q140 range-bucket + broadcast-offset composition via
    # operators/rank.py — identical ranks to the oracle's
    # (delta_s, user_id) window, no single-partition sort. ONE ranked
    # relation joined against a broadcast 3-row quartile spec (a
    # per-quartile union would re-plan the whole rank subtree 3×)
    r = rangebucket_rank(p, "delta_s", "user_id", rank_col="rn")
    spec = (
        p.agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.explode(
                F.array(
                    *(
                        F.struct(
                            F.lit(name).alias("q"),
                            F.expr(f"CAST({rk} AS BIGINT)").alias("rank"),
                        )
                        for name, rk in (
                            ("q1", "(n + 3) DIV 4"),
                            ("q2", "(n + 1) DIV 2"),
                            ("q3", "(3 * n + 1) DIV 4"),
                        )
                    )
                )
            ).alias("s")
        )
        .select("s.q", "s.rank")
    )
    return (
        r.join(F.broadcast(spec), F.col("rn") == F.col("rank"))
        .select("q", "rank", F.col("delta_s").cast("bigint").alias("delta_s"))
        .orderBy("q")
    )


# --------------------------------------------------------------------------
# Q194 — persistent top-k mining (leaderboard stability)
# --------------------------------------------------------------------------

_PERSIST_ORACLE = """
WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon, o_custkey,
                  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                       AS BIGINT) AS spend
           FROM orders GROUP BY 1, 2),
     r AS (SELECT *, row_number() OVER (PARTITION BY mon
                                        ORDER BY spend DESC, o_custkey) AS rn
           FROM m),
     t AS (SELECT * FROM r WHERE rn <= 10)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_months,
       CAST(min(rn) AS BIGINT) AS best_rank,
       CAST(sum(spend) AS BIGINT) AS top_spend_cents
FROM t GROUP BY 1 HAVING count(*) >= 2
ORDER BY o_custkey
"""


@register(
    "q194_topk_persistence",
    _PERSIST_ORACLE,
    "persistent top-k mining — which customers make the monthly "
    "top-10-by-spend leaderboard REPEATEDLY (the stability question "
    "behind whale retention, fraud rings that resurface, and "
    "hot-partition forecasting; a one-shot top-k ranks a single "
    "window, this ranks the ranks): per-month spend in EXACT cents "
    "(floor(x*100+0.5) once at input, BIGINT sums), per-month top-10 "
    "by (spend DESC, custkey) — the window sorts are bounded per "
    "month, never a global order — then persistence = months-on-board "
    "over the tiny slots relation (months x 10 rows). All integer "
    "arithmetic end to end",
)
def q194(spark, sf_dir):
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp")).alias("mon"),
        "o_custkey",
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("spend")
    )
    w = Window.partitionBy("mon").orderBy(F.desc("spend"), "o_custkey")
    t = m.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
    return (
        t.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_months"),
            F.min("rn").cast("bigint").alias("best_rank"),
            F.sum("spend").cast("bigint").alias("top_spend_cents"),
        )
        .filter(F.col("n_months") >= 2)
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Q195 — quality-based survivorship for duplicate clusters
# --------------------------------------------------------------------------

_SURVIVOR_ORACLE = """
WITH RECURSIVE
  edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
            FROM documents a JOIN documents b
              ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang),
  sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
  nodes AS (SELECT DISTINCT src AS node FROM sym),
  reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src),
  comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
  full_c AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
                    d.n_chars
             FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
  keep AS (SELECT component, doc_id AS keeper FROM (
             SELECT *, row_number() OVER (PARTITION BY component
                                          ORDER BY n_chars DESC, doc_id) AS rn
             FROM full_c)
           WHERE rn = 1)
SELECT f.doc_id, f.component, k.keeper,
       f.doc_id = k.keeper AS is_keeper
FROM full_c f JOIN keep k USING (component)
ORDER BY doc_id
"""


@register(
    "q195_quality_survivorship",
    _SURVIVOR_ORACLE,
    "quality-based survivorship for duplicate clusters — WHICH copy to "
    "keep is a first-class dedup decision the min-id policy (q116) "
    "dodges: per connected near-dup cluster the survivor is the "
    "HIGHEST-QUALITY document (n_chars here; any deterministic integer "
    "quality plugs in), ties to the smaller id. Clusters come from "
    "connected_components (q102's deterministic same-lang chains — "
    "multi-round convergence); singletons are their own keepers via "
    "the left-join coalesce, so EVERY document gets a verdict. One "
    "per-cluster window over the component relation, all integer; the "
    "oracle recomputes the closure with a recursive CTE and the same "
    "argmax — an independent algorithm end to end",
)
def q195(spark, sf_dir):
    from pyspark.sql import Window

    from snowflake_cdc_spark.operators.components import connected_components

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("prev_id"),
        F.col("doc_id").alias("dst"),
        F.col("lang").alias("lang_b"),
    )
    edges = docs.join(
        nxt, (docs.doc_id == nxt.prev_id) & (docs.lang == nxt.lang_b)
    ).select(F.col("doc_id").alias("src"), "dst")
    comp = connected_components(edges).select(
        F.col("node").alias("doc_id"), "component"
    )
    full_c = (
        docs.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .withColumn("component", F.coalesce("component", "doc_id"))
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
    keep = (
        full_c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("keeper"))
    )
    return (
        full_c.join(keep, "component")
        .select(
            "doc_id",
            "component",
            "keeper",
            (F.col("doc_id") == F.col("keeper")).alias("is_keeper"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Q196 — frequent 3-step event paths (sequential pattern mining)
# --------------------------------------------------------------------------

_PATHS_ORACLE = """
WITH s AS (SELECT user_id, event_type,
                  lag(event_type, 2) OVER w AS p2,
                  lag(event_type, 1) OVER w AS p1
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT p2 AS step1, p1 AS step2, event_type AS step3,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE p2 IS NOT NULL
GROUP BY 1, 2, 3 HAVING count(*) >= 25
ORDER BY step1, step2, step3
"""


@register(
    "q196_frequent_paths",
    _PATHS_ORACLE,
    "frequent 3-step event paths (sequential pattern mining, the "
    "order-2 extension of q181's transition matrix — WHICH multi-step "
    "journeys actually happen, the input to funnel design): per-user "
    "consecutive type triples from the same ONE-shuffle sorted-array "
    "posture (three aligned slices zipped — no second window pass), "
    "support threshold prunes to the head. The oracle runs the "
    "INDEPENDENT double-lag window algorithm, proving the triple-slice "
    "zip equivalent",
)
def q196(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    arr = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))).alias("s")
        )
        .withColumn("types", F.transform("s", lambda x: x["event_type"]))
        .withColumn("n", F.size("types"))
    )
    trips = arr.select(
        F.explode(
            F.zip_with(
                F.zip_with(
                    F.slice("types", 1, F.greatest(F.col("n") - 2, F.lit(0))),
                    F.slice("types", 2, F.greatest(F.col("n") - 2, F.lit(0))),
                    lambda a, b: F.struct(a.alias("s1"), b.alias("s2")),
                ),
                F.slice("types", 3, F.greatest(F.col("n") - 2, F.lit(0))),
                lambda ab, c: F.struct(
                    ab["s1"].alias("s1"), ab["s2"].alias("s2"), c.alias("s3")
                ),
            )
        ).alias("t")
    ).select("t.s1", "t.s2", "t.s3")
    return (
        trips.groupBy(
            F.col("s1").alias("step1"),
            F.col("s2").alias("step2"),
            F.col("s3").alias("step3"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= 25)
        .orderBy("step1", "step2", "step3")
    )


# --------------------------------------------------------------------------
# Q197 — cross-source contamination matrix (provenance audit)
# --------------------------------------------------------------------------

_XSOURCE_ORACLE = """
WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
     ch AS (SELECT DISTINCT source,
                   ws[i*8+1] || ' ' || ws[i*8+2] || ' ' || ws[i*8+3] || ' '
                   || ws[i*8+4] || ' ' || ws[i*8+5] || ' ' || ws[i*8+6] || ' '
                   || ws[i*8+7] || ' ' || ws[i*8+8] AS chunk
            FROM d, LATERAL unnest(generate_series(0, len(ws) // 8 - 1)) AS u(i))
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_chunks
FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.source < b.source
GROUP BY 1, 2
ORDER BY source_a, source_b
"""


@register(
    "q197_cross_source_contamination",
    _XSOURCE_ORACLE,
    "cross-source contamination matrix — the provenance audit behind "
    "'did source X scrape source Y' and dataset-mixing dedup budgets: "
    "per SOURCE PAIR, how many distinct 8-word grid chunks they share "
    "(the q123 chunk granularity lifted from doc pairs to source "
    "pairs). The distinct (chunk, source) relation shuffles once on "
    "the chunk hash; pair expansion is bounded by per-chunk source "
    "counts (<= |sources|, the q27 blocked-join argument — never "
    "sources x sources over raw text). Spark matches chunks by md5 of "
    "the window while the oracle keys raw TEXT, so the hash family "
    "provably drops out (the q171 discipline)",
)
def q197(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    ws = F.split(F.col("text"), " ")
    d = docs.select("source", ws.alias("ws")).withColumn(
        "n_ch", F.floor(F.size("ws") / 8).cast("int")
    )
    ch = (
        d.filter(F.col("n_ch") > 0)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_ch") - 1),
                    lambda i: F.md5(
                        F.concat_ws(
                            " ", F.slice(F.col("ws"), i * 8 + 1, 8)
                        )
                    ),
                )
            ).alias("chunk"),
        )
        .distinct()
    )
    a = ch.select(F.col("source").alias("source_a"), "chunk")
    b = ch.select(F.col("source").alias("source_b"), "chunk")
    return (
        a.join(b, "chunk")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_chunks"))
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------------------------------------
# Q198 — bitemporal belief grid (valid-time x transaction-time audit)
# --------------------------------------------------------------------------

_BITEMPORAL_ORACLE = """
WITH ch AS (
  SELECT c_custkey AS k, c_mktsegment AS seg, 1 AS valid_t, 1 AS tx_t
  FROM customer
  UNION ALL
  SELECT c_custkey, 'UPDATED', 2, 2 FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey, 'RETRO', 1, 3 FROM customer WHERE c_custkey % 7 = 0),
grid AS (SELECT v, t FROM (VALUES (1), (2)) AS gv(v),
                           (VALUES (1), (2), (3)) AS gt(t)),
win AS (SELECT g.v, g.t, ch.k, ch.seg,
               row_number() OVER (PARTITION BY g.v, g.t, ch.k
                                  ORDER BY ch.valid_t DESC, ch.tx_t DESC) AS rn
        FROM grid g JOIN ch ON ch.valid_t <= g.v AND ch.tx_t <= g.t)
SELECT CAST(v AS BIGINT) AS valid_at, CAST(t AS BIGINT) AS known_at,
       seg AS segment, CAST(count(*) AS BIGINT) AS n_customers
FROM win WHERE rn = 1
GROUP BY 1, 2, 3
ORDER BY valid_at, known_at, segment
"""


@register(
    "q198_bitemporal_grid",
    _BITEMPORAL_ORACLE,
    "bitemporal belief grid (operators/scd.py::bitemporal_as_of — the "
    "valid-time x transaction-time generalization of the SCD2 AS-OF "
    "lanes q138/q141): per (valid_at, known_at) checkpoint, the "
    "segment census under 'what was effective at V as we believed it "
    "at T'. The synthetic change log plants the case bitemporality "
    "exists for — a RETROACTIVE correction (tx=3, valid=1) that "
    "changes answers about the PAST for known_at >= 3 while replaying "
    "known_at <= 2 reproduces the earlier belief exactly (the cells "
    "differ precisely on the %7 keys at valid_at 1..2 x known_at 3). "
    "Per cell: one scan-filtered max_by aggregation over (valid, tx) "
    "struct order — both predicates reach the scan, no window, no "
    "join; the oracle re-derives every cell with an independent "
    "row_number formulation over the exploded grid",
)
def q198(spark, sf_dir):
    from snowflake_cdc_spark.operators.scd import bitemporal_as_of

    cust = _t(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.lit(1).alias("valid_t"),
        F.lit(1).alias("tx_t"),
    )
    upd = cust.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("k"),
        F.lit("UPDATED").alias("seg"),
        F.lit(2).alias("valid_t"),
        F.lit(2).alias("tx_t"),
    )
    retro = cust.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("k"),
        F.lit("RETRO").alias("seg"),
        F.lit(1).alias("valid_t"),
        F.lit(3).alias("tx_t"),
    )
    ch = base.unionByName(upd).unionByName(retro)
    out = None
    for v in (1, 2):
        for t in (1, 2, 3):
            cell = (
                bitemporal_as_of(ch, ["k"], "seg", "valid_t", "tx_t", v, t)
                .groupBy("seg")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
                .select(
                    F.lit(v).cast("bigint").alias("valid_at"),
                    F.lit(t).cast("bigint").alias("known_at"),
                    F.col("seg").alias("segment"),
                    "n_customers",
                )
            )
            out = cell if out is None else out.unionByName(cell)
    return out.orderBy("valid_at", "known_at", "segment")
