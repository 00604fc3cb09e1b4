"""Round-3 extension q130-q143: corpus retrieval scoring and
governance — BM25 keyword ranking, per-domain document caps, a
one-scan data-quality expectation report, product-quantization ANN,
and count-min heavy hitters (the first approximate lane with a FULL
hash-checked oracle: its md5 hash family is engine-portable, so the
DuckDB side re-derives every counter — see operators/sketches.py).

These round out the training-data curation lane (SURVEY.md §2.8
N-family) with the three operations a warehouse user downstream of the
reference's CDC landing (``add_output.py:421-448``) runs daily:

- **q130 BM25** (``operators/retrieval.py``): lexical ranking over the
  corpus. Postings filtered to the query terms BEFORE any shuffle, term
  stats broadcast, fixed-order float summation for cross-engine
  determinism (contrast q89 tf-idf, which scores terms, not documents).
- **q131 domain cap** (``operators/curation.py``): the standard
  "no domain exceeds N documents" corpus rule, via a deterministic
  md5-smallest-per-group selector. The operator's prefilter variant
  bounds per-group sort size at mega-domain scale (plan-asserted in
  ``tests/test_governance.py``); the registry query runs the same
  EXACT semantics, which is what the oracle mirrors.
- **q132 DQ report** (``operators/expectations.py``): Deequ-style
  multi-constraint verification compiled into ONE scan — conditional
  aggregates + unpivot; a deliberately-violated range constraint
  proves failures surface as ``passed = false`` rows rather than
  exceptions.

Determinism contract: q130 follows the round-3 ratio amendment
(``round_half_up`` final projection; ranking on the rounded value; the
only libm call is ``ln``, the q89 precedent). q131 compares md5 hex
strings (lexicographic ≡ numeric at fixed width). q132 metrics are
exact BIGINT pairs with one final double division and integer-compare
booleans. q133 is the bounded-error pattern (exact + in-bound boolean).
q134/q135/q142 are FULLY hash-checked approximate operators — their
md5 hash families are engine-portable, and the KMV u_k is an exact
52-bit dyadic double. q136-q140 are pure integer/set algebra (fixed-
point PageRank, oriented wedge counts, interval filters, keyed
recompute, ntile-fill ranks). q141's as-of match carries raw values
with no arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.operators.curation import cap_per_group
from snowflake_cdc_spark.operators.expectations import (
    accepted_values,
    dq_report,
    in_range,
    matches_pattern,
    not_null,
    unique,
)
from snowflake_cdc_spark.operators.retrieval import bm25_topk
from snowflake_cdc_spark.queries import _t, register
from snowflake_cdc_spark.sources.cdc import CDC_EVENTS_SQL
from snowflake_cdc_spark.operators.util import ckpt_lazy

# --------------------------------------------------------------------------
# Q130 — BM25 retrieval: top-10 documents for a 3-term keyword query
# --------------------------------------------------------------------------

_BM25_SQL = """
WITH d AS (SELECT doc_id, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
           FROM documents),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
          FROM d),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       FROM tok WHERE term IN ('vector', 'hash', 'merge') GROUP BY 1, 2),
dfs AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
         * (tf.tf * 2.2)
         / (tf.tf + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE) / stats.avgdl))) AS c
  FROM tf
  JOIN dfs USING (term)
  JOIN d ON d.doc_id = tf.doc_id
  CROSS JOIN stats),
sc AS (
  SELECT doc_id,
         coalesce(max(CASE WHEN term = 'vector' THEN c END), 0.0)
         + coalesce(max(CASE WHEN term = 'hash' THEN c END), 0.0)
         + coalesce(max(CASE WHEN term = 'merge' THEN c END), 0.0) AS s
  FROM contrib GROUP BY doc_id)
SELECT doc_id, floor(s * 10000.0 + 0.5) / 10000.0 AS bm25
FROM sc ORDER BY bm25 DESC, doc_id LIMIT 10"""


@register(
    "q130_bm25",
    _BM25_SQL,
    "BM25 (Lucene idf variant, k1=1.2 b=0.75) top-10 docs for the query "
    "{vector, hash, merge}: postings filtered to query terms before the "
    "tf aggregation, df + corpus stats broadcast, fixed-order 3-term sum, "
    "rank on the tie-robust rounded score",
)
def q130(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, "doc_id", "text", ["vector", "hash", "merge"], k=10)


# --------------------------------------------------------------------------
# Q131 — per-domain document cap (md5-smallest-per-group survivors)
# --------------------------------------------------------------------------


@register(
    "q131_domain_cap",
    """WITH ranked AS (
         SELECT source, doc_id,
                row_number() OVER (
                  PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         FROM documents)
       SELECT source, doc_id, CAST(rn AS BIGINT) AS rn
       FROM ranked WHERE rn <= 10 ORDER BY source, doc_id""",
    "per-domain cap: keep the 10 md5-smallest docs per source (exact, "
    "deterministic, layout-invariant). The operator's hash-threshold "
    "prefilter bounds per-group sort size for mega-domains "
    "(test_governance.py proves the bounded plan on a planted skewed "
    "group); registry semantics are identical either way",
)
def q131(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("source", "doc_id")
    return (
        cap_per_group(docs, "source", "doc_id", cap=10)
        .select("source", "doc_id", F.col("rn").cast("bigint").alias("rn"))
        .orderBy("source", "doc_id")
    )


# --------------------------------------------------------------------------
# Q132 — one-scan data-quality expectation report over orders
# --------------------------------------------------------------------------


@register(
    "q132_dq_report",
    """WITH a AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(count(o_custkey) AS BIGINT) AS m_complete,
                CAST(count(DISTINCT o_orderkey) AS BIGINT) AS m_unique,
                CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS m_status,
                CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') THEN 1 ELSE 0 END) AS BIGINT) AS m_pattern,
                CAST(sum(CASE WHEN o_totalprice BETWEEN 0 AND 250000 THEN 1 ELSE 0 END) AS BIGINT) AS m_range
         FROM orders),
       r AS (
         SELECT 'completeness_o_custkey' AS check_name, m_complete AS n_pass, n AS n_total FROM a
         UNION ALL SELECT 'uniqueness_o_orderkey', m_unique, n FROM a
         UNION ALL SELECT 'accepted_values_o_orderstatus', m_status, n FROM a
         UNION ALL SELECT 'pattern_o_orderpriority', m_pattern, n FROM a
         UNION ALL SELECT 'range_o_totalprice', m_range, n FROM a)
       SELECT check_name, n_pass, n_total,
              CAST(n_pass AS DOUBLE) / CAST(n_total AS DOUBLE) AS ratio,
              n_pass = n_total AS passed
       FROM r ORDER BY check_name""",
    "Deequ-style DQ verification in ONE scan: completeness, key "
    "uniqueness, accepted values, regex pattern conformance, and a "
    "deliberately-tight range bound (0..250000 — violations surface as "
    "passed=false, not exceptions). Exact integer metrics, single final "
    "division",
)
def q132(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return dq_report(
        orders,
        [
            not_null("o_custkey"),
            unique("o_orderkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            matches_pattern("o_orderpriority", "^[1-5]-[A-Z ]+$"),
            in_range("o_totalprice", 0, 250000),
        ],
    )


# --------------------------------------------------------------------------
# Q133 — product-quantization ANN (third scale path; bounded-error check)
# --------------------------------------------------------------------------


@register(
    "q133_pq_ann",
    """SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
       FROM embeddings WHERE vec_id % 10 = 0""",
    "N3 scale path #3: product quantization (operators/pq.py, Jegou "
    "2011) — m=8 subspaces x 256 codewords = 8-byte codes, a 32x "
    "compression of the 64-dim float32 vectors; the approximate pass "
    "scans only the codes relation (vectorized ADC pandas_udf), exact "
    "cosine re-ranks the top-100 shortlist. Bounded-"
    "error restatement (q49/q52/q127 pattern): Spark computes recall@5 "
    "of the PQ search against the exhaustive top-5 in ONE candidate "
    "pass (shared window sort) and emits (n_queries, recall_ok := "
    "recall >= 0.9); the oracle emits the exact query count + literal "
    "TRUE. Measured recall@5: 0.992 at sf0.01, 0.940 at sf0.1 — the "
    "bound holds with margin. Deterministic: seeded per-subspace "
    "k-means on the md5-keyed bounded sample, lowest-index argmin "
    "tie-break, float64 ADC",
)
def q133(spark, sf_dir):
    from snowflake_cdc_spark.operators.pq import build_pq, pq_recall_check

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = build_pq(emb, m=8, k=256)
    return pq_recall_check(idx, queries, k=5, shortlist=100, min_recall=0.9)


# --------------------------------------------------------------------------
# Q134 — count-min heavy hitters with a COMPLETE oracle (md5 hash family
# makes the whole sketch engine-portable — unlike the bounded-error lanes)
# --------------------------------------------------------------------------


@register(
    "q134_countmin_heavy_hitters",
    """WITH sk AS (
         SELECT i, substr(md5(CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 2) AS b,
                CAST(count(*) AS BIGINT) AS cnt
         FROM events, unnest(generate_series(0, 3)) AS t(i)
         GROUP BY 1, 2),
       thr AS (
         SELECT CAST(ceil(1.2 * (CAST(count(*) AS DOUBLE) / CAST(count(DISTINCT user_id) AS DOUBLE))) AS BIGINT) AS t
         FROM events),
       keys AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt FROM events GROUP BY 1),
       est AS (
         SELECT k.user_id, k.exact_cnt,
                min(sk.cnt) AS est_cnt
         FROM keys k,
              unnest(generate_series(0, 3)) AS t(i)
         JOIN sk ON sk.i = t.i
               AND sk.b = substr(md5(CAST(t.i AS VARCHAR) || ':' || CAST(k.user_id AS VARCHAR)), 1, 2)
         GROUP BY 1, 2)
       SELECT user_id, exact_cnt, est_cnt
       FROM est, thr WHERE est_cnt >= thr.t
       ORDER BY user_id""",
    "count-min heavy hitters (operators/sketches.py, d=4 x 256 buckets): "
    "the hash family is md5, so the ENTIRE sketch is engine-portable and "
    "this approximate operator gets a FULL hash-checked oracle (the "
    "DuckDB side re-derives every counter) — unlike the q49/q52/q127/"
    "q133 bounded-error lanes whose sketches are engine-internal. "
    "Threshold adapts to SF: ceil(1.2 x mean per-key count). CM "
    "guarantee est >= exact visible in the output columns. Sketch is "
    "<= 1024 counters (KBs) after map-side combine; batch sketches "
    "merge by addition (streaming posture)",
)
def q134(spark, sf_dir):
    from snowflake_cdc_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    ev = _t(spark, sf_dir, "events")
    sketch = countmin_sketch(ev, "user_id", d=4)
    keys = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    thr = ev.agg(
        F.ceil(
            F.lit(1.2)
            * (
                F.count(F.lit(1)).cast("double")
                / F.count_distinct("user_id").cast("double")
            )
        )
        .cast("bigint")
        .alias("__t")
    )
    est = countmin_estimate(sketch, keys, "user_id", d=4)
    return (
        est.crossJoin(F.broadcast(thr))
        .filter(F.col("est_cnt") >= F.col("__t"))
        .select("user_id", "exact_cnt", F.col("est_cnt").cast("bigint").alias("est_cnt"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q135 — KMV distinct-count sketch, also with a COMPLETE oracle
# --------------------------------------------------------------------------


@register(
    "q135_kmv_distinct",
    """WITH h AS (SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
       r AS (SELECT event_type, h,
                    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
             FROM h),
       sk AS (SELECT event_type, max(rk) AS n_h,
                     max(CASE WHEN rk = 32 THEN ('0x' || substr(h, 1, 13))::BIGINT END) AS num
              FROM r WHERE rk <= 32 GROUP BY 1),
       ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
              FROM events GROUP BY 1)
       SELECT ex.event_type, ex.n_exact,
              CASE WHEN sk.n_h < 32 THEN CAST(sk.n_h AS DOUBLE)
                   ELSE 31.0 / (CAST(num AS DOUBLE) / 4503599627370496.0) END AS kmv_est
       FROM ex JOIN sk USING (event_type) ORDER BY event_type""",
    "KMV (k=32 minimum values, Bar-Yossef 2002) distinct-user estimate "
    "per event_type, next to the exact count — the second approximate "
    "lane with a COMPLETE oracle (q134 pattern): the hash family is md5 "
    "and u_k is an exact 52-bit dyadic double, so the estimate is one "
    "correctly-rounded division both engines compute bit-identically. "
    "The sketch shuffle carries (event_type, 32B hash), never payload "
    "rows; sketches merge by union + re-take-k (tested)",
)
def q135(spark, sf_dir):
    from snowflake_cdc_spark.operators.sketches import kmv_estimate, kmv_sketch

    ev = _t(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "user_id", "event_type", k=32)
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact")
    )
    return (
        ex.join(kmv_estimate(sk, "event_type", k=32), "event_type")
        .select("event_type", "n_exact", "kmv_est")
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q136 — fixed-point PageRank (iterative numeric algorithm, exact oracle)
# --------------------------------------------------------------------------

def _pr_oracle_sql(iterations: int) -> str:
    head = """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       edges AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
                 FROM li a JOIN li b
                   ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       nodes AS (SELECT DISTINCT l_partkey AS node FROM li),
       deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
       r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank FROM nodes)"""
    its = []
    for i in range(1, iterations + 1):
        its.append(
            f""",
       r{i} AS (SELECT n.node,
                     CAST(150000000 + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS rank
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
                FROM r{i-1} r
                JOIN deg d ON d.src = r.node
                JOIN edges e ON e.src = r.node
                GROUP BY e.dst) s ON s.node = n.node)"""
        )
    return (
        head
        + "".join(its)
        + f"""
       SELECT node AS part, rank FROM r{iterations}
       ORDER BY rank DESC, part LIMIT 20"""
    )


@register(
    "q136_pagerank",
    _pr_oracle_sql(3),
    "fixed-point PageRank (operators/pagerank.py), 3 damped rounds over "
    "the part co-purchase graph (parts sharing an order; edge build is "
    "bounded by sum of per-order distinct-parts^2, the q27 class — never "
    "corpus^2). Ranks are 10^9-scaled BIGINTs: integer div contributions "
    "+ (85*s) div 100 damping mean every intermediate is exact, so the "
    "iterative algorithm hash-matches a full DuckDB oracle — float "
    "PageRank could never (per-node float sums are order-nondeterministic). "
    "Per round: one src-partitioned join + one map-side-combined sum",
)
def q136(spark, sf_dir):
    from snowflake_cdc_spark.operators.pagerank import pagerank_fixed

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "k").filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )
    nodes = li.select(F.col("l_partkey").alias("node")).distinct()
    pr = pagerank_fixed(edges, nodes, iterations=3)
    return (
        pr.select(F.col("node").alias("part"), F.col("rank").cast("bigint").alias("rank"))
        .orderBy(F.desc("rank"), "part")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q137 — triangle counting (degree-oriented wedge join, exact oracle)
# --------------------------------------------------------------------------


@register(
    "q137_triangles",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       und AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
               FROM li x JOIN li y
                 ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
               FROM (SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
               GROUP BY 1),
       ort AS (SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                           THEN u.a ELSE u.b END AS u,
                      CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                           THEN u.b ELSE u.a END AS v,
                      CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                           THEN db.d ELSE da.d END AS dv
               FROM und u
               JOIN deg da ON da.n = u.a
               JOIN deg db ON db.n = u.b),
       w AS (SELECT l.v AS x, r.v AS y
             FROM ort l JOIN ort r ON l.u = r.u
             WHERE (l.dv < r.dv) OR (l.dv = r.dv AND l.v < r.v))
       SELECT CAST(count(*) AS BIGINT) AS n_triangles
       FROM w JOIN ort c ON c.u = w.x AND c.v = w.y""",
    "triangle count over the part co-purchase graph via degree "
    "orientation (operators/triangles.py, Schank-Wagner 'forward'): "
    "orienting edges low-(deg,id) -> high caps every out-degree at "
    "O(sqrt(m)), bounding the wedge join at O(m^1.5) regardless of hub "
    "skew, and the (dv, v) canonical wedge order makes the closing-edge "
    "probe a pure equi-join (no OR-join nested loop). Exact integer "
    "count, full oracle of the same oriented algorithm",
)
def q137(spark, sf_dir):
    from snowflake_cdc_spark.operators.triangles import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    x = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    y = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    und = (
        x.join(y, "k").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    return triangle_count(und)


# --------------------------------------------------------------------------
# Q138 — point-in-time (AS OF) read over the SCD2 history
# --------------------------------------------------------------------------


@register(
    "q138_scd2_as_of",
    """WITH ordered AS (
         SELECT user_id, event_type, ts, event_id,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
                lag(1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_first
         FROM events),
       opens AS (
         SELECT user_id, event_type, ts, event_id FROM ordered
         WHERE is_first OR prev IS DISTINCT FROM event_type),
       hist AS (
         SELECT user_id, event_type, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
         FROM opens),
       t AS (SELECT max(ts) AS t FROM events
             WHERE event_id <= (SELECT max(event_id) // 2 FROM events))
       SELECT h.user_id, h.event_type AS attr_as_of
       FROM hist h, t
       WHERE h.valid_from <= t.t AND (h.valid_to IS NULL OR h.valid_to > t.t)
       ORDER BY h.user_id""",
    "AS OF read (operators/scd.py::scd2_as_of): each user's attribute "
    "version valid at the log's midpoint timestamp (deterministic scalar: "
    "max ts among the first half of event ids, integer-div horizon). "
    "Inclusive-from/exclusive-to interval semantics; the read itself is a "
    "pure filter over the history — no join, no window: at warehouse "
    "scale a time-travel query costs one partition-pruned scan. "
    "Reference parity: the engine's AtTime replay (add_output.py:260,666) "
    "re-materializes history; the SCD2 history + AS OF filter answers the "
    "same question without replay",
)
def q138(spark, sf_dir):
    from snowflake_cdc_spark.operators.scd import scd2_as_of, scd2_from_changes

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    hist = scd2_from_changes(ev, ["user_id"], "event_type", "ts", "event_id")
    horizon = ev.agg(F.max("event_id").alias("__m")).select(
        F.expr("__m div 2").alias("__h")
    )
    t = ev.join(F.broadcast(horizon)).filter(F.col("event_id") <= F.col("__h")).agg(
        F.max("ts").alias("__t")
    )
    asof = scd2_as_of(hist.crossJoin(F.broadcast(t)), F.col("__t"))
    return (
        asof.select("user_id", F.col("event_type").alias("attr_as_of"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q139 — incremental JOIN-view maintenance (IVM, delta-key recompute)
# --------------------------------------------------------------------------


@register(
    "q139_ivm_join",
    CDC_EVENTS_SQL
    + """, o AS (SELECT * FROM (
           SELECT e.*, row_number() OVER (PARTITION BY primary_key ORDER BY seq DESC) AS rn
           FROM cdc_events e)
         WHERE rn = 1 AND NOT is_delete),
       c AS (SELECT c_custkey,
                    CASE WHEN c_custkey % 5 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment
             FROM customer WHERE c_custkey % 97 <> 0)
       SELECT o.row_o_orderkey AS o_orderkey,
              o.row_o_custkey AS o_custkey,
              c.c_mktsegment,
              o.row_o_totalprice AS o_totalprice
       FROM o JOIN c ON c.c_custkey = o.row_o_custkey
       ORDER BY o_orderkey""",
    "incremental JOIN-view maintenance (operators/ivm.py, delta-key "
    "recompute): orders⋈customer maintained through 3 zipped CDC batches "
    "— order inserts + customer load, order updates + customer segment "
    "updates (custkey%5), order deletes + customer deletes (custkey%97, "
    "cascading: their orders leave the view via the inner join). Per "
    "batch only touched fact keys and fact rows referencing touched dim "
    "keys recompute; the oracle joins the two FINAL snapshots from "
    "scratch — the maintained view must equal it exactly (pure keyed set "
    "algebra, no floats)",
)
def q139(spark, sf_dir):
    from snowflake_cdc_spark.operators.ivm import JoinViewMaintainer
    from snowflake_cdc_spark.sources.cdc import cdc_events_flat

    flat = cdc_events_flat(spark, sf_dir)
    fact = flat.select(
        "primary_key",
        "seq",
        "is_delete",
        "op",
        F.coalesce(F.col("row_o_custkey"), F.col("old_row_o_custkey")).alias(
            "o_custkey"
        ),
        F.col("row_o_orderkey").alias("o_orderkey"),
        F.col("row_o_totalprice").alias("o_totalprice"),
    )
    # one materialization of the flattened CDC relation (round 11): each
    # batch filter re-analyzed the whole wide flatten subtree otherwise
    fact = fact.transform(ckpt_lazy)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dim_b0 = cust.select(
        "c_custkey", "c_mktsegment",
        F.lit(1).alias("seq"), F.lit(False).alias("is_delete"),
    )
    dim_b1 = cust.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey", F.lit("UPDATED").alias("c_mktsegment"),
        F.lit(2).alias("seq"), F.lit(False).alias("is_delete"),
    )
    dim_b2 = cust.filter(F.col("c_custkey") % 97 == 0).select(
        "c_custkey", F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(3).alias("seq"), F.lit(True).alias("is_delete"),
    )
    m = JoinViewMaintainer("primary_key", "o_custkey", "c_custkey")
    for op, dim_b in [("insert", dim_b0), ("update", dim_b1), ("delete", dim_b2)]:
        m.apply_batch(fact.filter(F.col("op") == op).drop("op"), dim_b)
    return (
        m.view.select("o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Q140 — exact equi-depth histogram, sort-free construction
# --------------------------------------------------------------------------


@register(
    "q140_equidepth_histogram",
    """WITH src AS (SELECT event_id AS id, value AS v FROM events WHERE value IS NOT NULL),
       tot AS (SELECT count(*) AS n FROM src),
       r AS (SELECT v, row_number() OVER (ORDER BY v, id) AS rn FROM src),
       b AS (SELECT v,
               CASE WHEN rn <= (tot.n % 10) * (tot.n // 10 + 1)
                    THEN (rn - 1) // (tot.n // 10 + 1) + 1
                    ELSE (tot.n % 10)
                         + (rn - (tot.n % 10) * (tot.n // 10 + 1) - 1) // (tot.n // 10) + 1
               END AS bucket
             FROM r, tot)
       SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
              min(v) AS lo, max(v) AS hi
       FROM b GROUP BY bucket ORDER BY bucket""",
    "exact 10-bucket equi-depth histogram of events.value "
    "(operators/histogram.py): the engine composes the global rank from "
    "value-range partitions + per-partition row_number + broadcast "
    "offsets — NO global sort region (q120's composition, range-keyed by "
    "value; the only sorted unit is one range bucket). The oracle runs "
    "the naive single-sort ntile-fill form — an independent algorithm "
    "that must produce bit-identical buckets (pure integer div/mod "
    "bucket assignment on both sides)",
)
def q140(spark, sf_dir):
    from snowflake_cdc_spark.operators.histogram import equidepth_histogram

    ev = _t(spark, sf_dir, "events")
    return equidepth_histogram(ev, "value", "event_id", k=10)


# --------------------------------------------------------------------------
# Q141 — point-in-time-correct dimension enrichment (SCD2 × as-of join)
# --------------------------------------------------------------------------


@register(
    "q141_pit_enrichment",
    """WITH h AS (SELECT max(o_orderkey) // 2 AS h FROM orders)
       SELECT o.o_orderkey, o.o_custkey,
              CASE WHEN c.c_custkey % 5 = 0 AND o.o_orderkey >= h.h
                   THEN 'UPDATED' ELSE c.c_mktsegment END AS segment_at_order
       FROM orders o
       JOIN customer c ON c.c_custkey = o.o_custkey
       CROSS JOIN h
       ORDER BY o.o_orderkey""",
    "point-in-time-correct enrichment: each order joins the customer-"
    "segment VERSION valid at its own position on the change axis "
    "(custkey%5 customers flip to 'UPDATED' effective at the mid-key "
    "horizon; earlier orders must keep the original segment — the "
    "no-leakage property a training-data feature lookup needs). Engine "
    "composes the SCD2 version table with the single-shuffle union-merge "
    "as-of join (operators/asof.py — |orders|+|versions| rows through "
    "ONE exchange, never |orders|x|versions|); the oracle derives the "
    "version arithmetic independently (CASE on the horizon), not via an "
    "interval join — two algorithms, one answer",
)
def q141(spark, sf_dir):
    from snowflake_cdc_spark.operators.asof import asof_join

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    horizon = orders.agg(F.expr("max(o_orderkey) div 2").alias("__h"))
    v0 = cust.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(0).cast("bigint").alias("valid_from"),
    )
    v1 = (
        cust.filter(F.col("c_custkey") % 5 == 0)
        .crossJoin(F.broadcast(horizon))
        .select(
            F.col("c_custkey").alias("o_custkey"),
            F.lit("UPDATED").alias("segment"),
            F.col("__h").cast("bigint").alias("valid_from"),
        )
    )
    versions = v0.unionByName(v1)
    out = asof_join(
        orders,
        versions,
        on="o_custkey",
        left_ts="o_orderkey",
        right_ts="valid_from",
        value_cols={"segment": "segment_at_order"},
        tie_col="valid_from",
        strict=False,  # a version effective AT ts is visible AT ts
    )
    return out.select("o_orderkey", "o_custkey", "segment_at_order").orderBy(
        "o_orderkey"
    )


# --------------------------------------------------------------------------
# Q142 — rolling distinct users via merged day-level KMV sketches
# --------------------------------------------------------------------------


@register(
    "q142_rolling_distinct_kmv",
    """WITH h AS (SELECT DISTINCT
                    date_diff('day', DATE '1970-01-01',
                              CAST(date_trunc('day', ts) AS DATE)) AS day,
                    md5(CAST(user_id AS VARCHAR)) AS h
              FROM events),
       ds AS (SELECT day, h FROM (
                SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rk
                FROM h) WHERE rk <= 64),
       days AS (SELECT DISTINCT day FROM h),
       contrib AS (SELECT DISTINCT t.end_day, ds.h
                   FROM ds, unnest(generate_series(ds.day, ds.day + 6)) AS t(end_day)
                   WHERE t.end_day IN (SELECT day FROM days)),
       merged AS (SELECT end_day, h, row_number() OVER (PARTITION BY end_day ORDER BY h) AS rk
                  FROM contrib),
       sk AS (SELECT end_day, max(rk) AS n_h,
                     max(CASE WHEN rk = 64 THEN ('0x' || substr(h, 1, 13))::BIGINT END) AS num
              FROM merged WHERE rk <= 64 GROUP BY 1),
       ex AS (SELECT t.end_day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_exact
              FROM (SELECT DISTINCT
                      date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS day,
                      user_id
                    FROM events) u,
                   unnest(generate_series(u.day, u.day + 6)) AS t(end_day)
              WHERE t.end_day IN (SELECT day FROM days)
              GROUP BY 1)
       SELECT ex.end_day AS day_num, ex.n_exact,
              CASE WHEN sk.n_h < 64 THEN CAST(sk.n_h AS DOUBLE)
                   ELSE 63.0 / (CAST(num AS DOUBLE) / 4503599627370496.0) END AS kmv_est
       FROM ex JOIN sk ON sk.end_day = ex.end_day
       ORDER BY day_num""",
    "7-day rolling distinct users per day from MERGED day-level KMV "
    "sketches (k=64): exact rolling distinct is non-additive (every "
    "window re-scans 7 days of raw events — the oracle's ex CTE does "
    "exactly that), the sketch path reduces the corpus ONCE to <=k "
    "hashes/day and each window is a union + re-take-k over "
    "days x k x 7 tiny rows. Both the estimate and the exact comparison "
    "column are in the output; complete oracle (q134/q135 md5 "
    "portability)",
)
def q142(spark, sf_dir):
    from snowflake_cdc_spark.operators.sketches import kmv_rolling_distinct

    ev = _t(spark, sf_dir, "events")
    est = kmv_rolling_distinct(ev, "user_id", "ts", window_days=7, k=64)
    day = F.datediff(
        F.to_date(F.date_trunc("day", F.col("ts"))), F.to_date(F.lit("1970-01-01"))
    )
    du = ev.select(day.alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    exact = (
        du.withColumn("end_day", F.explode(F.sequence(F.col("day"), F.col("day") + 6)))
        .join(days.withColumnRenamed("day", "end_day"), "end_day", "left_semi")
        .groupBy("end_day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_exact"))
        .withColumnRenamed("end_day", "day_num")
    )
    return (
        exact.join(est, "day_num")
        .select("day_num", "n_exact", "kmv_est")
        .orderBy("day_num")
    )


# --------------------------------------------------------------------------
# Q143 — multiset set-operations (INTERSECT ALL / EXCEPT ALL)
# --------------------------------------------------------------------------


@register(
    "q143_multiset_ops",
    """WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45),
       b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.08),
       i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
       e AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
       SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT k) AS BIGINT) AS n_distinct FROM i
       UNION ALL
       SELECT 'except_all', CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT) FROM e
       ORDER BY op""",
    "U2 multiset completion: INTERSECT ALL / EXCEPT ALL (duplicate-"
    "preserving bag semantics — min/difference of per-key "
    "multiplicities), distinct from q19's set forms. Both engines "
    "implement SQL-standard bag semantics; counts + distinct-counts "
    "summarize the (large) result multisets determinism-safely",
)
def q143(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_discount") > 0.08).select(F.col("l_suppkey").alias("k"))
    i = a.intersectAll(b).agg(
        F.lit("intersect_all").alias("op"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_distinct("k").cast("bigint").alias("n_distinct"),
    )
    e = a.exceptAll(b).agg(
        F.lit("except_all").alias("op"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_distinct("k").cast("bigint").alias("n_distinct"),
    )
    return i.unionByName(e).orderBy("op")


# --------------------------------------------------------------------------
# Q144 — composed IVF-PQ ANN (both scale paths stacked; bounded-error)
# --------------------------------------------------------------------------


@register(
    "q144_ivfpq_ann",
    """SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
       FROM embeddings WHERE vec_id % 10 = 0""",
    "N3 composition (operators/ivfpq.py — the FAISS IndexIVFPQ "
    "architecture): IVF prunes WHICH vectors are scored (nprobe=12 of "
    "16 cells), PQ shrinks WHAT is scanned (m=8 x 256 codewords, 8-byte "
    "codes, LUT-ADC), exact cosine re-ranks the top-200 shortlist — a "
    "probe reads nprobe/n_cells x 1/32 of the raw corpus bytes. "
    "Bounded-error restatement (q52/q133 pattern): ivfpq_recall_check "
    "computes recall@5 of the composed search against the exhaustive "
    "top-5 in ONE candidate pass — both pruning layers reconstructed "
    "from flags under the exact search orderings, pinned to the direct "
    "two-search measurement by test — and emits (n_queries, recall_ok "
    ":= recall >= 0.9); the oracle emits the exact query count + "
    "literal TRUE. Operating point tuned round 4 (VERDICT r03 #1): "
    "measured recall@5 0.952 at sf0.01, 0.931 at sf0.1 "
    "(tools/ivfpq_recall.py sweep, docs/ANN.md)",
)
def q144(spark, sf_dir):
    from snowflake_cdc_spark.operators.ivfpq import build_ivfpq, ivfpq_recall_check

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = build_ivfpq(emb, n_cells=16, m=8, k=256)
    return ivfpq_recall_check(
        idx, queries, k=5, nprobe=12, shortlist=200, min_recall=0.9
    )


# --------------------------------------------------------------------------
# Q145 — iterative BPE vocabulary training with a COMPLETE oracle
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.bpe import (  # noqa: E402
    bpe_oracle_sql,
    train_bpe,
    word_frequencies,
)


@register(
    "q145_bpe_train",
    bpe_oracle_sql(rounds=8),
    "Iterative BPE merge-pair training (operators/bpe.py, Sennrich 2016) "
    "over the documents corpus: 8 rounds of exact BIGINT pair counting "
    "on the word-FREQUENCY table (the 100 TB reduction — the corpus is "
    "scanned once, every round touches only vocab-sized relations), "
    "total-order winner (count DESC, left, right), merge applied via "
    "expression-level replace on marker-PREFIXED symbol strings (greedy "
    "left-to-right non-overlap identical in both engines — the prefix "
    "marker makes consecutive merges share no characters). COMPLETE "
    "hash-checked oracle: the fixed rounds unroll as a DuckDB CTE chain "
    "(q136 fixed-point precedent — iterative training is "
    "oracle-checkable when every round is exact integer algebra)",
)
def q145(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return train_bpe(word_frequencies(docs), rounds=8)


# --------------------------------------------------------------------------
# Q146 — BPE tokenizer APPLY: vocab-level tokenization + broadcast join
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.bpe import (  # noqa: E402
    apply_bpe,
    bpe_apply_oracle_sql,
)


@register(
    "q146_bpe_tokenize",
    bpe_apply_oracle_sql(rounds=8),
    "Tokenizer-apply lane completing q145: the 8 learned merges are "
    "applied IN TRAINING ORDER to the VOCABULARY (a rounds-deep "
    "projection over vocab-sized data — documents are never re-scanned "
    "per merge), then one broadcast join maps every corpus word to its "
    "BPE token count; per-source totals (words, char-level tokens, BPE "
    "tokens) show the compression the learned vocab buys. All exact "
    "BIGINTs; the oracle re-derives the merges with the q145 CTE chain "
    "and reads final representations off its last rewrite stage",
)
def q146(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    words = word_frequencies(docs)
    merges = train_bpe(words, rounds=8).collect()
    tok = apply_bpe(words, [tuple(m) for m in merges])
    docw = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    return (
        docw.join(F.broadcast(tok), "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_char_tokens"),
            F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q147 — one-scan column profiler (discovery beside q132's checking)
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.expectations import profile_table  # noqa: E402


def _profile_oracle(table: str, cols: list[str]) -> str:
    parts = [
        (
            f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_total, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"CAST(min({c}) AS VARCHAR) AS min_val, "
            f"CAST(max({c}) AS VARCHAR) AS max_val FROM {table}"
        )
        for c in cols
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register(
    "q147_column_profile",
    _profile_oracle("documents", ["doc_id", "text", "lang", "source", "n_chars"]),
    "Deequ-style column DISCOVERY profiling "
    "(operators/expectations.py::profile_table) — the complement of "
    "q132's expectation CHECKING: per column, (n_total, n_null, "
    "n_distinct, min, max) computed in ONE scan (all metrics fold into "
    "a single agg; the multiple count_distincts plan as one Expand — "
    "one pass regardless of column count) then unpivoted via "
    "array-of-structs explode. min/max on NATIVE types rendered to "
    "string; profiled columns are bigint/varchar so the rendering is "
    "engine-identical (float rendering is not — documented contract)",
)
def q147(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return profile_table(docs, ["doc_id", "text", "lang", "source", "n_chars"])


# --------------------------------------------------------------------------
# Q148 — deterministic Bloom-filter join pruning (runtime-filter lane)
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.bloom import (  # noqa: E402
    bloom_prefilter,
    build_bloom,
)

_BLOOM_ORACLE = """
WITH dim AS (SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 9000),
bloom AS (
  SELECT DISTINCT
    ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)), 1, 13))::BIGINT % 4096 AS pos
  FROM dim, unnest(generate_series(0, 3)) AS t(i)),
probek AS (SELECT DISTINCT o_custkey AS key FROM orders),
pk AS (
  SELECT key, i,
    ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || CAST(key AS VARCHAR)), 1, 13))::BIGINT % 4096 AS pos
  FROM probek, unnest(generate_series(0, 3)) AS t(i)),
passkeys AS (
  SELECT key FROM pk JOIN bloom USING (pos)
  GROUP BY key HAVING count(DISTINCT i) = 4),
stats AS (
  SELECT
    CAST((SELECT count(*) FROM dim) AS BIGINT) AS n_dim_keys,
    CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_probe,
    CAST((SELECT count(*) FROM orders WHERE o_custkey IN (SELECT key FROM passkeys)) AS BIGINT) AS n_bloom_pass,
    CAST((SELECT count(*) FROM orders WHERE o_custkey IN (SELECT c_custkey FROM dim)) AS BIGINT) AS n_true_match)
SELECT n_dim_keys, n_probe, n_bloom_pass, n_true_match,
       n_bloom_pass - n_true_match AS n_false_pos
FROM stats
"""


@register(
    "q148_bloom_join_pruning",
    _BLOOM_ORACLE,
    "Runtime-filter lane (operators/bloom.py): Bloom-filter join pruning "
    "with an md5 hash family, so the WHOLE filter is engine-portable and "
    "this approximate structure gets a COMPLETE oracle (q134 count-min "
    "precedent — DuckDB re-derives every set bit). Build = one distinct "
    "over the selective dim keys' k=4 positions (<= m=4096 rows ~ 16 KB "
    "broadcast REGARDLESS of key count — the object that still fits "
    "when the dim key set itself no longer broadcasts); probe = pure "
    "scan-side conjunction of array_contains probes, no exchange, no "
    "probe-side explode — non-matching fact rows die at the scan before "
    "any shuffle. Output: exact probe/pass/true-match/false-positive "
    "counts (Bloom errs only toward keeping, so join semantics stay "
    "exact — asserted in tests)",
)
def q148(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey").distinct()
    bloom = build_bloom(dim, "c_custkey", k=4, m=4096)
    passed = bloom_prefilter(orders, "o_custkey", bloom, k=4, m=4096)
    a = dim.agg(F.count(F.lit(1)).cast("bigint").alias("n_dim_keys"))
    b = orders.agg(F.count(F.lit(1)).cast("bigint").alias("n_probe"))
    c = passed.agg(F.count(F.lit(1)).cast("bigint").alias("n_bloom_pass"))
    d = orders.join(
        F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left_semi"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_true_match"))
    return (
        a.crossJoin(b)
        .crossJoin(c)
        .crossJoin(d)
        .withColumn(
            "n_false_pos", (F.col("n_bloom_pass") - F.col("n_true_match"))
        )
    )


# --------------------------------------------------------------------------
# Q149 — exact set-similarity join via prefix filtering (PPJoin family)
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.setsim import (  # noqa: E402
    allpairs_jaccard_join,
    shingle_sets,
)

_SETSIM_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, sh AS tok FROM (
    SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+') AS w
          FROM documents),
         unnest(generate_series(1, len(w) - 2)) AS t(i))),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS dfc FROM toks GROUP BY 1),
ranked AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY dfc, tok) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS sz
  FROM toks JOIN df USING (tok)),
pref AS (SELECT * FROM ranked WHERE rn <= sz - ((6*sz + 9) // 10) + 1),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
   AND 10 * b.sz >= 6 * a.sz AND 10 * a.sz >= 6 * b.sz),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM toks GROUP BY 1),
inter AS (
  SELECT c.da, c.db, CAST(count(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN toks x ON x.doc_id = c.da
  JOIN toks y ON y.doc_id = c.db AND y.tok = x.tok
  GROUP BY 1, 2)
SELECT i.da AS doc_a, i.db AS doc_b, i.n_inter,
       sa.sz + sb.sz - i.n_inter AS n_union
FROM inter i JOIN sz sa ON sa.doc_id = i.da JOIN sz sb ON sb.doc_id = i.db
WHERE 10 * i.n_inter >= 6 * (sa.sz + sb.sz - i.n_inter)
ORDER BY doc_a, doc_b
"""


@register(
    "q149_setsim_join",
    _SETSIM_ORACLE,
    "EXACT set-similarity join (operators/setsim.py, SSJoin/PPJoin "
    "family): every document pair with Jaccard >= 0.6 over 3-word "
    "shingle sets — the recall-1.0 counterpart of the MinHash/SimHash "
    "probabilistic near-dup lanes (q25/q26). Registry runs the direct "
    "inverted-index form (thin postings on this corpus make it optimal "
    "— the q131/q140 pattern); the operator's `prefix_filter_join` is "
    "the identical-output scale path whose candidates come only from "
    "shared PREFIX tokens under the global rarest-first order "
    "(pigeonhole guarantees completeness; boilerplate shingles never "
    "enter prefixes, so the Σdf² quadratic dies — planted-skew bound + "
    "equivalence asserted in test_setsim.py). All exact integer "
    "algebra: den*inter >= num*union verify, integer-ceil prefix "
    "lengths — no float boundary anywhere",
)
def q149(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = shingle_sets(docs, n=3)
    return allpairs_jaccard_join(toks, threshold_num=6, threshold_den=10)


# --------------------------------------------------------------------------
# Q150 — funnel analysis: ordered-sequence conversion in ONE shuffle
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.funnel import funnel_counts  # noqa: E402

_FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
SELECT 1 AS step, 'view' AS step_name,
       CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
UNION ALL
SELECT 2, 'click', CAST((SELECT count(*) FROM c) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
ORDER BY step
"""


@register(
    "q150_funnel",
    _FUNNEL_ORACLE,
    "Funnel conversion (operators/funnel.py): users completing "
    "view -> click -> purchase in strict temporal order, each step "
    "matched to its earliest qualifying event. ONE shuffle total: "
    "events filtered to funnel types at the scan, grouped per user, and "
    "the step times fall out of a single expression-level aggregate "
    "fold over each user's time-sorted events — vs the naive k-fold "
    "join-chain (k shuffles + k scans), which is exactly the "
    "INDEPENDENT algorithm the oracle runs (min-ts chain with strict > "
    "joins), so the hash check proves the two formulations equivalent. "
    "Counts only cross engines; timestamps compare at us resolution",
)
def q150(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"])


_FUNNEL_NOMATCH_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'zz_absent_a' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'zz_absent_b' AND e.ts > v.t1 GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'zz_absent_c' AND e.ts > c.t2 GROUP BY 1)
SELECT 1 AS step, 'zz_absent_a' AS step_name,
       CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
UNION ALL
SELECT 2, 'zz_absent_b', CAST((SELECT count(*) FROM c) AS BIGINT)
UNION ALL
SELECT 3, 'zz_absent_c', CAST((SELECT count(*) FROM p) AS BIGINT)
ORDER BY step
"""


@register(
    "q150b_funnel_nomatch",
    _FUNNEL_NOMATCH_ORACLE,
    "Funnel zero-match semantics, hash-pinned on both engines (VERDICT "
    "r04 #1): every step type is absent from the corpus, so the "
    "per-user relation the expression-level fold aggregates over is "
    "EMPTY — the counts must be 0, not NULL (F.sum over zero rows is "
    "NULL; funnel_counts coalesces each step count). A user hits this "
    "branch the first time they typo a step name; the oracle's "
    "independent min-ts join chain yields count(*)=0 naturally, so the "
    "cross-engine hash pins the empty-relation contract forever",
)
def q150b(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return funnel_counts(ev, ["zz_absent_a", "zz_absent_b", "zz_absent_c"])


# --------------------------------------------------------------------------
# Q151 — multi-source BFS k-hop distances (frontier expansion)
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.bfs import khop_distances  # noqa: E402

_BFS_ORACLE = """
WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
bfs AS (
  SELECT l_partkey AS node, 0 AS dist
  FROM (SELECT DISTINCT l_partkey FROM li WHERE l_partkey <= 10)
  UNION
  SELECT e.dst, bfs.dist + 1
  FROM bfs JOIN edges e ON e.src = bfs.node
  WHERE bfs.dist < 3),
settled AS (SELECT node, CAST(min(dist) AS INT) AS dist FROM bfs GROUP BY 1)
SELECT dist, CAST(count(*) AS BIGINT) AS n_parts
FROM settled GROUP BY dist ORDER BY dist
"""


@register(
    "q151_bfs_khop",
    _BFS_ORACLE,
    "Multi-source BFS (operators/bfs.py): minimal hop distance from the "
    "seed parts (partkey <= 10) over the co-purchase graph, settled up "
    "to 3 hops — frontier expansion joins ONLY the current frontier "
    "against the edge list per hop (never the visited set, never "
    "graph x graph), anti-join settles each node once at its minimal "
    "distance, per-hop localCheckpoint keeps lineage flat. Exact "
    "integer distances make the traversal fully hash-checkable against "
    "a depth-bounded recursive-CTE oracle (an INDEPENDENT algorithm — "
    "DuckDB's set-semantics recursion + min(dist) vs level-synchronous "
    "settling). Output: nodes-per-distance histogram",
)
def q151(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "k").filter(F.col("src") != F.col("dst"))
        .select("src", "dst").distinct()
    )
    seeds = li.filter(F.col("l_partkey") <= 10).select(
        F.col("l_partkey").alias("node")
    )
    dist = khop_distances(edges, seeds, max_hops=3)
    return (
        dist.groupBy("dist")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("dist")
    )


# --------------------------------------------------------------------------
# Q152 — peak concurrency per hour (bucketed sweep line, no global sort)
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.sweepline import (  # noqa: E402
    peak_concurrency_by_bucket,
)

_SWEEP_ORACLE = """
WITH iv AS (SELECT ts AS s, ts + INTERVAL 10 MINUTE AS e FROM events),
b AS (SELECT s AS t, 1 AS delta FROM iv UNION ALL SELECT e, -1 FROM iv),
pi AS (SELECT date_trunc('hour', t) AS bkt, t, sum(delta) AS delta,
              CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
       FROM b GROUP BY 1, 2),
sw AS (SELECT bkt, t, delta, n_starts,
              sum(delta) OVER (PARTITION BY bkt ORDER BY t
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
       FROM pi),
pb AS (SELECT bkt, max(run) AS max_run, min(t) AS t0, sum(delta) AS net,
              CAST(sum(n_starts) AS BIGINT) AS n_starts
       FROM sw GROUP BY 1)
SELECT bucket_ts, n_starts,
       CAST(CASE WHEN t0 = bucket_ts THEN carry + max_run
            ELSE greatest(carry, carry + max_run) END AS BIGINT) AS peak
FROM (SELECT bkt AS bucket_ts, t0, n_starts, max_run,
             coalesce(sum(net) OVER (ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry
      FROM pb)
ORDER BY bucket_ts
"""


@register(
    "q152_peak_concurrency",
    _SWEEP_ORACLE,
    "Peak concurrent sessions per hour (operators/sweepline.py): each "
    "event opens a 10-minute session; the BUCKETED sweep line computes "
    "the exact per-hour maximum concurrency with NO global data sort — "
    "boundaries pre-aggregated to a NET delta per (hour, instant) so the "
    "per-bucket running sums (bounded window sorts over distinct "
    "instants) only take instant-complete concurrency values, + carry-in "
    "from a running net over the tiny hour-level table (the q120/q140 "
    "broadcast-offsets shape; the only unpartitioned window is over "
    "hours, not rows). Half-open [start, end): an end at t cancels a "
    "start at t inside the same net delta. The peak is the exact "
    "maximum over the whole bucket: the bucket-START instant (= bare "
    "carry) is a candidate whenever no boundary sits exactly there, so "
    "buckets that only close sessions still report the sessions open "
    "at their start (ADVICE r05). Pure integer deltas over distinct "
    "instants — the max is layout-invariant",
)
def q152(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end_ts"),
    )
    return peak_concurrency_by_bucket(iv, bucket="hour")


# --------------------------------------------------------------------------
# Q153 — frequent pair mining with a-priori pruning
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.itemsets import frequent_pairs  # noqa: E402


@register(
    "q153_frequent_pairs",
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS it FROM lineitem),
       fi AS (SELECT it FROM li GROUP BY 1 HAVING count(*) >= 2),
       fl AS (SELECT li.ok, li.it FROM li JOIN fi ON fi.it = li.it)
       SELECT a.it AS item_a, b.it AS item_b, CAST(count(*) AS BIGINT) AS support
       FROM fl a JOIN fl b ON a.ok = b.ok AND a.it < b.it
       GROUP BY 1, 2 HAVING count(*) >= 2
       ORDER BY item_a, item_b""",
    "Market-basket frequent pairs (operators/itemsets.py, a-priori): "
    "parts co-purchased in >= 2 orders. Downward closure prunes "
    "infrequent items from every basket BEFORE the quadratic per-basket "
    "pair expansion (Σ b² bounded by frequent items only — the planted "
    "test shows a basket of one-off items generating ZERO candidates); "
    "exact integer support counts over distinct (order, part) pairs",
)
def q153(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    )
    return (
        frequent_pairs(li, min_support=2)
        .select(
            F.col("item_a").alias("item_a"),
            F.col("item_b").alias("item_b"),
            "support",
        )
    )


# --------------------------------------------------------------------------
# Q154 — weighted sampling without replacement (Efraimidis-Spirakis)
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.sampling import weighted_sample_aes  # noqa: E402


@register(
    "q154_weighted_sample",
    """WITH keyed AS (
         SELECT doc_id, n_chars,
                ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
                   / 4503599627370496.0)
                / CAST(n_chars AS DOUBLE) AS r
         FROM documents WHERE n_chars > 0),
       top AS (
         SELECT doc_id, n_chars,
                row_number() OVER (ORDER BY r DESC, doc_id) AS rn
         FROM keyed)
       SELECT doc_id, n_chars, CAST(rn AS BIGINT) AS sample_rank
       FROM top WHERE rn <= 100 ORDER BY sample_rank""",
    "Weighted sampling WITHOUT replacement (operators/sampling.py, "
    "Efraimidis-Spirakis A-ES): 100 documents drawn with probability "
    "proportional to length — rank = ln(u)/w with u the exact dyadic "
    "(md5_52bit+1)/2^52 and ln the one tolerated libm call, so both "
    "engines compute bit-identical ranks and the SAMPLE ITSELF "
    "hash-matches (no seed lottery, layout-invariant). Spark side is "
    "one scan + TakeOrdered top-k — no global sort shuffle",
)
def q154(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sampled = weighted_sample_aes(docs, "n_chars", 100, "doc_id")
    # re-rank the (tiny) selected set for a stable output order
    num = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    u = (num + F.lit(1)).cast("double") / F.lit(float(2**52))
    r = F.log(u) / F.col("n_chars").cast("double")
    w = Window.orderBy(F.desc(r), "doc_id")
    return (
        sampled.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .orderBy("sample_rank")
    )


# --------------------------------------------------------------------------
# Q155 — linear-interpolation resampling onto an hourly grid
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.resample import interpolate_resample  # noqa: E402

_RESAMPLE_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, max(value) AS value FROM events
  WHERE user_id < 20 GROUP BY user_id, ts),
span AS (SELECT date_trunc('hour', min(ts)) AS a, date_trunc('hour', max(ts)) AS b
         FROM ev),
hours AS (SELECT unnest(generate_series((SELECT a FROM span),
                                        (SELECT b FROM span),
                                        INTERVAL 1 HOUR)) AS g),
grid AS (SELECT u.user_id, h.g AS grid_ts
         FROM (SELECT DISTINCT user_id FROM ev) u, hours h),
merged AS (
  SELECT user_id AS k, ts AS t, 0 AS side, value AS v FROM ev
  UNION ALL
  SELECT user_id, grid_ts, 1, NULL FROM grid),
win AS (
  SELECT k, t, side,
    last_value(v IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY t, side
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN CAST(epoch_us(t) AS DOUBLE) END IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY t, side
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    first_value(v IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY t, side
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN CAST(epoch_us(t) AS DOUBLE) END IGNORE NULLS) OVER
      (PARTITION BY k ORDER BY t, side
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM merged),
iv AS (
  SELECT k, t,
    CASE WHEN pv IS NULL THEN nv
         WHEN nv IS NULL OR nt = pt THEN pv
         ELSE pv + (nv - pv) * ((CAST(epoch_us(t) AS DOUBLE) - pt) / (nt - pt))
    END AS x
  FROM win WHERE side = 1)
SELECT k AS user_id, t AS grid_ts,
       floor(x * 10000.0 + 0.5) / 10000.0 AS value
FROM iv ORDER BY user_id, grid_ts
"""


@register(
    "q155_interpolate_resample",
    _RESAMPLE_ORACLE,
    "Time-series resampling with LINEAR INTERPOLATION "
    "(operators/resample.py): each user's irregular event values "
    "projected onto the hourly grid — the "
    "time_bucket_gapfill(interpolate) workload (q86 gap-fills counts, "
    "q98 forward-fills; this lane interpolates). Single-shuffle "
    "union-merge run in BOTH directions at once: one per-key sort, two "
    "stacked window passes (last/first ignorenulls) — never a "
    "grid x observations join. Interpolation on epoch-micro integers "
    "cast to double (exact < 2^52), written token-identically in both "
    "engines; boundary semantics: backfill before first, hold after "
    "last, exact value AT observations; round_half_up final projection",
)
def q155(spark, sf_dir):
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    span = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("a"),
        F.date_trunc("hour", F.max("ts")).alias("b"),
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("a"), F.col("b"), F.expr("INTERVAL 1 HOUR"))
            ).alias("grid_ts"),
        )
    )
    return interpolate_resample(ev, grid)


# --------------------------------------------------------------------------
# Q156 — windowed funnel (30-minute conversion windows)
# --------------------------------------------------------------------------

_FUNNEL_W_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL 30 MINUTE GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL 30 MINUTE GROUP BY 1)
SELECT 1 AS step, 'view' AS step_name,
       CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
UNION ALL
SELECT 2, 'click', CAST((SELECT count(*) FROM c) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
ORDER BY step
"""


@register(
    "q156_funnel_windowed",
    _FUNNEL_W_ORACLE,
    "Windowed funnel (q150 + per-transition conversion windows): each "
    "step must land within 30 minutes of the previous bound step — the "
    "form real funnels take (a purchase a month after the click is not "
    "a conversion). ANCHORED semantics: steps bind to the earliest "
    "event qualifying relative to the already-bound predecessor; an "
    "expired window does not re-anchor — exactly the windowed min-ts "
    "join chain the oracle runs, so the single-shuffle fold and the "
    "k-join algorithm are again proven equivalent by the hash check",
)
def q156(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return funnel_counts(
        ev, ["view", "click", "purchase"], within="30 minutes"
    )


# --------------------------------------------------------------------------
# Q157 — exact-arithmetic distributed k-means (fully oracle-checked Lloyd)
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.kmeans_exact import kmeans_exact  # noqa: E402


def _kmeans_chain(k: int = 8, rounds: int = 2, dim: int = 64) -> str:
    """Shared unrolled-CTE chain: q/seeds/c0 + per-round (d{r}, a{r})
    with centroid updates (s{r}, c{r}) between assignment rounds —
    used by the q157 clustering summary AND the q158 exact-IVF oracle."""
    head = """WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor((CAST(x AS DOUBLE) + 1.0) * 10000.0 + 0.5) AS BIGINT)) AS qv
  FROM embeddings),
sd AS (SELECT vec_id, qv FROM q
       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}),
c0 AS (SELECT CAST(row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cell,
              qv
       FROM sd)""".format(k=k)
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


def _kmeans_oracle(k: int = 8, rounds: int = 2, dim: int = 64) -> str:
    return _kmeans_chain(k, rounds, dim) + f"""
SELECT cell, CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(dist) AS BIGINT) AS inertia
FROM a{rounds} GROUP BY 1 ORDER BY cell"""


def _ivf_exact_oracle(k: int = 8, rounds: int = 2, dim: int = 64,
                      nprobe: int = 4, topk: int = 5) -> str:
    return _kmeans_chain(k, rounds, dim) + f""",
qs AS (SELECT vec_id AS query_id, qv FROM q WHERE vec_id % 10 = 3),
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
           ON a.cell = p.cell AND a.vec_id <> p.query_id)
SELECT query_id, vec_id, dist FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist, vec_id) AS rn FROM cand)
WHERE rn <= {topk} ORDER BY query_id, vec_id"""


@register(
    "q157_kmeans_exact",
    _kmeans_oracle(),
    "Exact-arithmetic distributed k-means (operators/kmeans_exact.py): "
    "Lloyd's algorithm with every quantity an exact integer — vectors "
    "quantized once to an offset BIGINT grid (floor-of-double identical "
    "on both engines; offset makes integer-division truncation == "
    "floor), distances are order-free integer sums, centroid updates "
    "are per-dim sums DIV counts, seeds are the k md5-smallest ids, "
    "ties to the lowest cell — so an ITERATIVE SHUFFLE-HEAVY ML "
    "TRAINING LOOP hash-matches a full unrolled-CTE oracle (the q136 "
    "fixed-point discipline; float k-means can never, its centroid "
    "means are order-dependent float sums). Per round: one "
    "broadcast-closure assignment pass (centroids are k x d ints in "
    "the plan, no join) + one partial-aggregated (cell, dim) sum; "
    "k=8, 2 assignment rounds, output (cell, n_members, inertia)",
)
def q157(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_exact(emb, k=8, rounds=2)


# --------------------------------------------------------------------------
# Q158 — FULLY-oracle-checked IVF ANN (exact index + exact search)
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.ivf_exact import ivf_exact_search  # noqa: E402
from snowflake_cdc_spark.operators.kmeans_exact import (  # noqa: E402
    kmeans_fit,
    quantize_vectors,
)


@register(
    "q158_ivf_exact_ann",
    _ivf_exact_oracle(),
    "COMPLETE-oracle ANN (operators/ivf_exact.py): the q52/q133/q144 "
    "lanes declare bounded-error recall because float trainers and "
    "cosine scores are not cross-engine reproducible; here the WHOLE "
    "index and search are exact — centroids from the q157 integer "
    "Lloyd, probes by integer centroid distance (nprobe=4 of 8, tie to "
    "lowest cell), candidates from ONE cell equi-join of the assigned "
    "corpus (never corpus x queries), neighbors ranked by integer "
    "squared L2 on the quantized grid — so DuckDB re-derives every "
    "centroid, assignment, probe and NEIGHBOR, and the ANN result "
    "itself hash-matches (the q134/q135 complete-oracle discipline "
    "applied to ANN)",
)
def q158(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    centroids, assigned = kmeans_fit(emb, k=8, rounds=2)
    queries = (
        quantize_vectors(
            emb.filter(F.col("vec_id") % 10 == 3).select("vec_id", "embedding")
        )
        .select(F.col("vec_id").alias("query_id"), "qv")
    )
    return ivf_exact_search(centroids, assigned, queries, k=5, nprobe=4, dim=64)


# --------------------------------------------------------------------------
# Q159 — deterministic HyperLogLog with a COMPLETE oracle
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.sketches import (  # noqa: E402
    hll_estimate,
    hll_sketch,
)

_HLL_ORACLE = """
WITH src AS (
  SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
         trim(LEADING '0' FROM substr(md5(CAST(user_id AS VARCHAR)), 3, 13)) AS t
  FROM events),
rho AS (
  SELECT bucket,
         CASE WHEN length(t) = 0 THEN 53
              ELSE 4 * (13 - length(t))
                   + (CASE WHEN substr(t, 1, 1) = '1' THEN 3
                           WHEN substr(t, 1, 1) IN ('2', '3') THEN 2
                           WHEN substr(t, 1, 1) IN ('4', '5', '6', '7') THEN 1
                           ELSE 0 END) + 1
         END AS r
  FROM src),
regs AS (SELECT bucket, max(r) AS reg FROM rho GROUP BY 1),
agg AS (
  SELECT sum(1.0 / CAST((CAST(1 AS BIGINT) << reg) AS DOUBLE)) AS s_present,
         count(*) AS n_present
  FROM regs),
est AS (
  SELECT CASE
    WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
         / (s_present + CAST(256 - n_present AS DOUBLE)) <= 2.5 * 256.0
         AND 256 - n_present > 0
    THEN 256.0 * ln(256.0 / CAST(256 - n_present AS DOUBLE))
    ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
         / (s_present + CAST(256 - n_present AS DOUBLE))
  END AS e FROM agg)
SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS exact_distinct,
       floor(e * 10000.0 + 0.5) / 10000.0 AS hll_estimate
FROM est
"""


@register(
    "q159_hll_deterministic",
    _HLL_ORACLE,
    "Deterministic HyperLogLog (operators/sketches.py, Flajolet 2007): "
    "the sketch family's third member beside count-min (q134) and KMV "
    "(q135) — and the one q49's engine-internal approx_count_distinct "
    "can only declare as bounded-error. Built from md5: bucket = 2 hex "
    "chars, rho = leftmost-1-bit position of the 52-bit suffix computed "
    "by pure string algebra (ANSI trim LEADING both engines), registers "
    "= per-bucket MAX (mergeable by the HLL union law). The estimator "
    "is deterministic too: every 2^-reg term is an exact dyadic whose "
    "partial sums stay exactly representable (order-free), absent "
    "buckets contribute 1, the small-range branch uses the tolerated "
    "ln — so the ESTIMATE ITSELF hash-matches, alongside the exact "
    "distinct count it approximates",
)
def q159(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    est = hll_estimate(hll_sketch(ev, "user_id"))
    exact = ev.agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return exact.crossJoin(est)


# --------------------------------------------------------------------------
# Q160 — unigram surprisal scoring with integer micro-nat accumulation
# --------------------------------------------------------------------------

_SURPRISAL_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{M}]+')) AS w
  FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
vocab AS (
  SELECT w,
         CAST(floor(-ln(CAST(count(*) AS DOUBLE) / (SELECT CAST(n AS DOUBLE) FROM tot))
                    * 1000000.0 + 0.5) AS BIGINT) AS sup
  FROM tok GROUP BY 1),
scored AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(v.sup) AS BIGINT) AS total_surprisal
  FROM tok t JOIN vocab v ON v.w = t.w
  GROUP BY 1)
SELECT doc_id, n_tokens, total_surprisal,
       total_surprisal // n_tokens AS mean_surprisal_unat
FROM (SELECT *, row_number() OVER (
        ORDER BY total_surprisal // n_tokens DESC, doc_id) AS rn
      FROM scored)
WHERE rn <= 10 ORDER BY doc_id
"""


@register(
    "q160_surprisal_score",
    _SURPRISAL_ORACLE,
    "Unigram surprisal document scoring (curation lane): the "
    "language-model-style quality signal (docs whose tokens are "
    "corpus-rare score high — OCR junk / gibberish detectors). The "
    "float trap — per-doc Σ -ln p(w) is an order-dependent float sum — "
    "is closed by quantizing each TOKEN's surprisal once to integer "
    "micro-nats (floor(-ln(p)*1e6+0.5): ln on identical doubles, "
    "identical everywhere) and accumulating exact BIGINTs, which are "
    "order-free — the q136/q157 exact-arithmetic discipline applied to "
    "a floating-point scoring function. One explode scan, broadcast "
    "vocab join, top-10 by integer mean surprisal",
)
def q160(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(UNICODE_WORD), 0)
        ).alias("w"),
    )
    tot = tok.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            F.floor(
                -F.log(F.col("c").cast("double") / F.col("n").cast("double"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("sup"),
        )
    )
    scored = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("sup").cast("bigint").alias("total_surprisal"),
        )
        .withColumn(
            "mean_surprisal_unat",
            F.expr("total_surprisal div n_tokens"),
        )
    )
    # top-10 via orderBy().limit(): TakeOrderedAndProject (q18's plan),
    # not a single-partition global window (VERDICT r05 #1)
    return (
        scored.orderBy(F.desc("mean_surprisal_unat"), "doc_id")
        .limit(10)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Q161 — hybrid retrieval: reciprocal-rank fusion of BM25 + length prior
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.fusion import rrf_fuse  # noqa: E402

_RRF_ORACLE = _BM25_SQL[: _BM25_SQL.rindex("SELECT doc_id,")].rstrip() + """,
lex AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
        FROM (SELECT doc_id, floor(s * 10000.0 + 0.5) / 10000.0 AS bm25
              FROM sc ORDER BY bm25 DESC, doc_id LIMIT 50)),
pri AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
        FROM (SELECT doc_id, n_chars FROM documents
              ORDER BY n_chars DESC, doc_id LIMIT 50)),
f AS (SELECT coalesce(l.doc_id, p.doc_id) AS doc_id,
             coalesce(1.0 / (60.0 + CAST(l.r AS DOUBLE)), 0.0)
             + coalesce(1.0 / (60.0 + CAST(p.r AS DOUBLE)), 0.0) AS sc2
      FROM lex l FULL OUTER JOIN pri p ON l.doc_id = p.doc_id),
g AS (SELECT doc_id, floor(sc2 * 1000000.0 + 0.5) / 1000000.0 AS rrf_score
      FROM f),
h AS (SELECT doc_id, rrf_score,
             CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT)
               AS fused_rank
      FROM g)
SELECT doc_id, rrf_score, fused_rank FROM h
WHERE fused_rank <= 10 ORDER BY fused_rank"""


@register(
    "q161_rrf_hybrid",
    _RRF_ORACLE,
    "Hybrid retrieval via reciprocal-rank fusion (operators/fusion.py, "
    "Cormack 2009): BM25 top-50 (q130's lexical ranker) fused with a "
    "document-length prior top-50 by summing 1/(60+rank) per system — "
    "rank positions cross systems, not raw scores, so incommensurable "
    "scorers combine without normalization. Deterministic: integer "
    "ranks from total orders, per-system terms summed in FIXED order "
    "(q130 discipline — never a float sum over an unordered group), "
    "absent docs contribute 0 via coalesce, fused score round_half_up'd "
    "with ranking on the rounded value; fusion cost bounded by the "
    "ranking sizes, never the corpus",
)
def q161(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    lex = bm25_topk(docs, "doc_id", "text", ["vector", "hash", "merge"], k=50)
    lex_r = lex.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("bm25"), "doc_id"))
    ).select("doc_id", "rnk")
    pri_r = (
        docs.select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(50)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("n_chars"), "doc_id")),
        )
        .select("doc_id", "rnk")
    )
    return rrf_fuse([lex_r, pri_r], topn=10)


# --------------------------------------------------------------------------
# Q162 — per-group OLS trend with an exact rational slope
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.regression import grouped_ols_rational  # noqa: E402

_OLS_ORACLE = """
WITH m AS (SELECT min(ts) AS t0 FROM events),
e AS (SELECT event_type,
             (epoch_us(ts) - (SELECT epoch_us(t0) FROM m)) // 3600000000 AS x,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
      FROM events),
a AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM e GROUP BY 1)
SELECT event_type, n_events,
       CAST(n_events * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n_events * sxx - sx * sx AS BIGINT) AS slope_den
FROM a ORDER BY event_type
"""


@register(
    "q162_ols_trend",
    _OLS_ORACLE,
    "Per-event-type OLS value trend (operators/regression.py): float "
    "regr_slope is order-nondeterministic, so both variables are made "
    "integer — y at its native cent resolution "
    "(floor(value*100+0.5)), x in whole hours since the corpus start "
    "(coarse enough that |n*Sxy| < 2^63 with two orders of margin on "
    "this fixture) — and the closed-form slope is emitted as its EXACT "
    "(numerator, denominator) pair: nothing rounds anywhere, the "
    "per-group trend hash-matches bit-for-bit. One scan, one "
    "map-side-combined aggregation of five sufficient statistics (the "
    "classic distributed-regression layout)",
)
def q162(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ (contract); unix_micros needs TIMESTAMP — the
    # cast is an identity under the UTC session tz
    t0 = ev.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t0")
    )
    e = ev.crossJoin(F.broadcast(t0)).select(
        "event_type",
        F.expr(
            "(unix_micros(cast(ts as timestamp)) - t0) div 3600000000"
        ).alias("x"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    return grouped_ols_rational(e, "event_type", F.col("x"), F.col("y"))


# --------------------------------------------------------------------------
# Q163 — multimodal codec round-trip audit (real BMP encode -> decode)
# --------------------------------------------------------------------------


@register(
    "q163_media_roundtrip",
    """SELECT doc_id AS media_id,
              16 AS width,
              CAST(greatest(ceil(CAST(n_chars AS DOUBLE) / 48.0), 1) AS INT)
                AS height,
              CAST(48 * CAST(greatest(ceil(CAST(n_chars AS DOUBLE) / 48.0), 1)
                             AS BIGINT) AS BIGINT) AS n_pixel_bytes,
              md5(text) AS content_md5
       FROM documents WHERE doc_id % 5 = 0 ORDER BY media_id""",
    "Multimodal lane, driver-hash-checked end to end (round 4): "
    "documents become GENUINE 24bpp BMPs (built-in dependency-free "
    "codec), the Arrow-batched decode stage decodes them back, and the "
    "audit emits each image's dimensions, pixel-buffer size, and the "
    "md5 of the first n_chars decoded pixel bytes — which must equal "
    "md5(text): the oracle derives every value from the documents table "
    "alone, so a hash match PROVES the encode->mapInPandas->decode "
    "round-trip is lossless (stronger than q34's opaque byte features; "
    "the codec itself is inside the checked path)",
)
def q163(spark, sf_dir):
    from snowflake_cdc_spark.operators.multimodal import (
        decode_images,
        documents_as_bmp_media,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    media = documents_as_bmp_media(docs, width=16)
    dec = decode_images(media)
    n = docs.select(
        F.col("doc_id").alias("media_id"), F.col("n_chars")
    )
    return (
        dec.join(n, "media_id")
        .select(
            "media_id",
            F.col("width"),
            F.col("height"),
            F.length("pixels").cast("bigint").alias("n_pixel_bytes"),
            F.md5(F.expr("substring(pixels, 1, n_chars)")).alias("content_md5"),
        )
        .orderBy("media_id")
    )


# --------------------------------------------------------------------------
# Q164 — CUSUM change-point detection with exact scaled statistics
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.changepoint import cusum_changepoint  # noqa: E402

_CUSUM_ORACLE = """
WITH e AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
  FROM events),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS yy
        FROM e GROUP BY 1),
sc AS (
  SELECT e.event_type, t.n,
         sum(t.n * e.y - t.yy) OVER (
           PARTITION BY e.event_type ORDER BY e.event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
         row_number() OVER (
           PARTITION BY e.event_type ORDER BY e.event_id) AS k
  FROM e JOIN tot t USING (event_type)),
b AS (
  SELECT event_type, n, abs(s) AS a, k,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(s) DESC, k) AS rn
  FROM sc)
SELECT event_type, n, CAST(k AS BIGINT) AS cp_index,
       CAST(a AS BIGINT) AS cp_max_abs
FROM b WHERE rn = 1 ORDER BY event_type
"""


@register(
    "q164_cusum_changepoint",
    _CUSUM_ORACLE,
    "CUSUM change-point per event type (operators/changepoint.py): the "
    "metric-drift detector, exact — the classic statistic's fractional "
    "mean is cleared by scaling with the group count "
    "(S_k = sum(n*y - Y), same argmax, every value BIGINT; y at native "
    "cent resolution, |S| bounded ~4e13 on this fixture, far under "
    "2^63), change point = earliest position of max |S_k| via a "
    "struct-ordered max. Two window passes over one bounded per-group "
    "sort + a broadcast totals join — no global order anywhere; the "
    "oracle runs the same decomposition with an independent "
    "argmax-by-row_number formulation",
)
def q164(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    )
    return cusum_changepoint(e, "event_type", "event_id", F.col("y"))


# --------------------------------------------------------------------------
# Q165 — gaps and islands: consecutive-activity streaks per user
# --------------------------------------------------------------------------

_ISLANDS_ORACLE = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
g AS (SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INT) AS grp
      FROM d),
isl AS (SELECT user_id, min(day) AS streak_start,
               CAST(count(*) AS BIGINT) AS streak_days
        FROM g GROUP BY user_id, grp),
top AS (SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_streaks,
               CAST(max(streak_days) AS BIGINT) AS longest_streak,
               min(streak_start) AS first_active_day
        FROM isl GROUP BY 1)
SELECT user_id, n_streaks, longest_streak, first_active_day
FROM (SELECT *, row_number() OVER (
        ORDER BY longest_streak DESC, n_streaks, user_id) AS rn FROM top)
WHERE rn <= 25 ORDER BY user_id
"""


@register(
    "q165_gaps_islands",
    _ISLANDS_ORACLE,
    "Gaps-and-islands (the canonical SQL streak idiom): per user, "
    "consecutive-day activity runs via the day-minus-dense-sequence "
    "grouping key (day - row_number is constant exactly within a "
    "consecutive run), then streak counts / longest streak / first "
    "active day, top-25 by longest streak. Pure date/integer algebra — "
    "one distinct, two bounded per-user windows, one aggregation; "
    "DATE-INT arithmetic written as date_sub on the Spark side and "
    "day - INT on DuckDB (identical calendar semantics)",
)
def q165(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    d = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    isl = g.groupBy("user_id", "grp").agg(
        F.min("day").alias("streak_start"),
        F.count(F.lit(1)).cast("bigint").alias("streak_days"),
    )
    top = isl.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("streak_days").cast("bigint").alias("longest_streak"),
        F.min("streak_start").alias("first_active_day"),
    )
    # top-25 via orderBy().limit(): TakeOrderedAndProject, not a
    # single-partition global window (VERDICT r05 #1)
    return (
        top.orderBy(F.desc("longest_streak"), "n_streaks", "user_id")
        .limit(25)
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Q166 — 2-D skyline (Pareto frontier) via one sort-based window
# --------------------------------------------------------------------------


@register(
    "q166_skyline",
    """WITH pts AS (
         SELECT p_partkey, CAST(p_retailprice * 100 AS BIGINT) AS price_c,
                CAST(p_size AS BIGINT) AS size
         FROM part),
       dpts AS (SELECT DISTINCT price_c, size FROM pts),
       front AS (
         SELECT price_c, size FROM (
           SELECT price_c, size,
                  max(size) OVER (ORDER BY price_c, size DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
           FROM dpts)
         WHERE best_prev IS NULL OR size > best_prev)
       SELECT p.p_partkey, p.price_c, p.size
       FROM pts p JOIN front f USING (price_c, size)
       ORDER BY p.p_partkey""",
    "2-D skyline / Pareto frontier (Borzsony 2001): parts not dominated "
    "on (price low, size high) — the classic multi-criteria shortlist. "
    "The naive form is the O(n^2) dominance self-join; the sort-based "
    "form is ONE window over the DISTINCT value pairs — after ordering "
    "by (price asc, size desc), a pair survives iff its size exceeds "
    "the running max over strict predecessors (within-price domination "
    "resolves via the size-desc order; running on distinct pairs is "
    "what keeps duplicate points of a frontier pair alive — the strict "
    "> would otherwise drop them, caught by the planted test) — then a "
    "semi-join recovers every point on a surviving pair: the standard "
    "non-strict skyline. Exact integers (price cents, decimal*100 "
    "exact); the global window sorts only the distinct-pair relation; "
    "at fact scale the q140 range-bucket decomposition applies to the "
    "same running max",
)
def q166(spark, sf_dir):
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part")
    pts = part.select(
        "p_partkey",
        (F.col("p_retailprice") * 100).cast("bigint").alias("price_c"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    dpts = pts.select("price_c", "size").distinct()
    w = (
        Window.orderBy("price_c", F.desc("size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    front = (
        dpts.withColumn("best_prev", F.max("size").over(w))
        .filter(F.col("best_prev").isNull() | (F.col("size") > F.col("best_prev")))
        .select("price_c", "size")
    )
    return pts.join(front, ["price_c", "size"], "left_semi").select(
        "p_partkey", "price_c", "size"
    ).orderBy("p_partkey")


# --------------------------------------------------------------------------
# Q167 — bounded Bellman-Ford weighted shortest paths
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.bfs import bounded_shortest_paths  # noqa: E402

_BELLMAN_ORACLE = """
WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT src, dst,
         1 + (('0x' || substr(md5(CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)), 1, 13))::BIGINT % 9) AS w
  FROM (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)),
paths AS (
  SELECT l_partkey AS node, CAST(0 AS BIGINT) AS d, 0 AS hops
  FROM (SELECT DISTINCT l_partkey FROM li WHERE l_partkey <= 5)
  UNION
  SELECT e.dst, p.d + e.w, p.hops + 1
  FROM paths p JOIN edges e ON e.src = p.node WHERE p.hops < 3)
SELECT d AS dist, CAST(count(*) AS BIGINT) AS n_parts
FROM (SELECT node, min(d) AS d FROM paths GROUP BY 1)
GROUP BY 1 ORDER BY dist
"""


@register(
    "q167_bellman_ford",
    _BELLMAN_ORACLE,
    "Bounded Bellman-Ford (operators/bfs.py::bounded_shortest_paths): "
    "minimal WEIGHTED distance from the seed parts over the "
    "co-purchase graph using at most 3 edges — BFS (q151) generalized "
    "to integer edge weights (deterministic md5-derived 1..9 per edge, "
    "determinism-contract 52-bit slice). Per round one distance⋈edges "
    "join + map-side-combined min, lineage truncated per round; every "
    "distance exact, so the full relaxation hash-checks against a "
    "depth-bounded recursive-CTE + min oracle (an independent "
    "path-enumeration algorithm). Output: nodes-per-distance histogram",
)
def q167(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "k").filter(F.col("src") != F.col("dst"))
        .select("src", "dst").distinct()
        .withColumn(
            "w",
            1
            + F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("src").cast("string"),
                                F.lit(":"),
                                F.col("dst").cast("string"),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(9),
            ),
        )
    )
    seeds = li.filter(F.col("l_partkey") <= 5).select(
        F.col("l_partkey").alias("node")
    )
    dist = bounded_shortest_paths(edges, seeds, rounds=3)
    return (
        dist.groupBy(F.col("d").alias("dist"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("dist")
    )


# --------------------------------------------------------------------------
# Q168 — exact weighted median per group (integer cumulative weights)
# --------------------------------------------------------------------------


@register(
    "q168_weighted_median",
    """WITH v AS (
         SELECT l_returnflag AS flag,
                CAST(l_extendedprice * 100 AS BIGINT) AS price_c,
                CAST(l_quantity AS BIGINT) AS w
         FROM lineitem),
       g AS (SELECT flag, price_c, CAST(sum(w) AS BIGINT) AS w
             FROM v GROUP BY 1, 2),
       c AS (SELECT flag, price_c, w,
                    CAST(sum(w) OVER (PARTITION BY flag ORDER BY price_c
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
                    CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
             FROM g)
       SELECT flag, CAST(min(price_c) AS BIGINT) AS weighted_median_cents,
              CAST(max(tw) AS BIGINT) AS total_weight
       FROM c WHERE 2 * cw >= tw GROUP BY flag ORDER BY flag""",
    "Exact weighted median (lower convention: smallest value whose "
    "cumulative weight reaches half the total) of extended price "
    "weighted by quantity, per return flag — the weighted complement "
    "of q60's exact percentiles. All integer: price in cents "
    "(decimal*100 exact), BIGINT weights, the half-total test as the "
    "cross-multiplied 2*cw >= tw (no float division anywhere). "
    "Pre-aggregating per (group, value) bounds the windowed relation "
    "at distinct-values size before the per-group cumulative sum",
)
def q168(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    g = v.groupBy("flag", "price_c").agg(F.sum("w").cast("bigint").alias("w"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.withColumn("cw", F.sum("w").over(w_cum).cast("bigint")).withColumn(
        "tw", F.sum("w").over(Window.partitionBy("flag")).cast("bigint")
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.min("price_c").cast("bigint").alias("weighted_median_cents"),
            F.max("tw").cast("bigint").alias("total_weight"),
        )
        .orderBy("flag")
    )


# --------------------------------------------------------------------------
# Q169 — KMV theta-intersection estimate (sketch set algebra)
# --------------------------------------------------------------------------

from snowflake_cdc_spark.operators.sketches import (  # noqa: E402
    kmv_intersection_estimate,
    kmv_sketch,
)

_KMV_INTER_ORACLE = """
WITH ua AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h
            FROM events WHERE value > 300),
ub AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h
       FROM events WHERE user_id % 3 = 0),
sa AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM ua)
       WHERE rk <= 32),
sb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM ub)
       WHERE rk <= 32),
u AS (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)),
th AS (SELECT count(*) AS n_u, max(CASE WHEN rk = 32 THEN h END) AS thh
       FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM u)),
common AS (SELECT sa.h FROM sa JOIN sb ON sa.h = sb.h),
agg AS (SELECT CAST(sum(CASE WHEN th.thh IS NULL OR common.h < th.thh
                             THEN 1 ELSE 0 END) AS BIGINT) AS c,
               max(th.n_u) AS n_u,
               max(('0x' || substr(th.thh, 1, 13))::BIGINT) AS num
        FROM common, th),
est AS (SELECT CASE WHEN n_u < 32 THEN CAST(c AS DOUBLE)
                    ELSE CAST(c AS DOUBLE)
                         / (CAST(num AS DOUBLE) / 4503599627370496.0)
               END AS e
        FROM agg)
SELECT (SELECT CAST(count(*) AS BIGINT)
        FROM (SELECT h FROM ua INTERSECT SELECT h FROM ub)) AS exact_inter,
       floor(coalesce(e, 0.0) * 10000.0 + 0.5) / 10000.0 AS kmv_inter_est
FROM est
"""


@register(
    "q169_kmv_intersection",
    _KMV_INTER_ORACLE,
    "KMV sketch SET ALGEBRA (theta-style intersection): the distinct "
    "users of two overlapping cohorts are sketched independently "
    "(k=32), and the intersection cardinality is estimated as "
    "|{h in both sketches, h < theta}| / theta with theta = u_k of the "
    "union sketch — the composable half that makes mergeable sketches "
    "a set algebra (union = merge+re-take-k exists since q142). All "
    "q135 machinery — md5, lexicographic ≡ numeric order, exact 52-bit "
    "dyadic theta — so the ESTIMATE hash-matches beside the exact "
    "intersection it approximates. Degenerate small-union case returns "
    "the exact sketch intersection (sketches are lossless below k)",
)
def q169(spark, sf_dir):
    from snowflake_cdc_spark.functions.vectors import round_half_up

    ev = _t(spark, sf_dir, "events")
    a_rows = ev.filter(F.col("value") > 300).select("user_id")
    b_rows = ev.filter(F.col("user_id") % 3 == 0).select("user_id")
    sa = kmv_sketch(a_rows.withColumn("g", F.lit(1)), "user_id", "g", k=32)
    sb = kmv_sketch(b_rows.withColumn("g", F.lit(1)), "user_id", "g", k=32)
    est = kmv_intersection_estimate(sa, sb, k=32).select(
        round_half_up(F.col("kmv_inter_est"), 4).alias("kmv_inter_est")
    )
    exact = (
        a_rows.distinct()
        .join(b_rows.distinct(), "user_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    return exact.crossJoin(est)


# --------------------------------------------------------------------------
# Q170 — duplication audit: exact-dup group-size histogram + byte impact
# --------------------------------------------------------------------------


@register(
    "q170_dup_audit",
    """WITH g AS (SELECT md5(text) AS fp, CAST(count(*) AS BIGINT) AS sz,
                       CAST(sum(n_chars) AS BIGINT) AS bytes
              FROM documents GROUP BY 1)
       SELECT sz AS group_size,
              CAST(count(*) AS BIGINT) AS n_groups,
              CAST(sum(sz) AS BIGINT) AS n_docs,
              CAST(sum(bytes - bytes // sz) AS BIGINT) AS removable_bytes
       FROM g GROUP BY 1 ORDER BY group_size""",
    "Corpus duplication AUDIT — the report a dedup run is justified "
    "with, before any row is dropped: exact-duplicate groups "
    "(md5(text) fingerprints, the q22/q33 machinery) histogrammed by "
    "group size, with the bytes a keep-one policy would remove "
    "(sum - per-group keeper share; integer division exact on both "
    "engines since every member of an exact-dup group has equal "
    "n_chars, making bytes/sz exact). Two map-side-combined "
    "aggregations, nothing else",
)
def q170(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    g = docs.groupBy(F.md5("text").alias("fp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.sum("n_chars").cast("bigint").alias("bytes"),
    )
    return (
        g.groupBy(F.col("sz").alias("group_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("sz").cast("bigint").alias("n_docs"),
            F.sum(F.col("bytes") - F.expr("bytes div sz"))
            .cast("bigint")
            .alias("removable_bytes"),
        )
        .orderBy("group_size")
    )
