"""Behavioral / time-series operator extension q97-q100 (SURVEY.md §2.5
windows + north-star event analytics): TPC-H Q6 scan-bound revenue, null
forward-fill (the imputation primitive of a training-data pipeline),
gap-based sessionization (the batch semantics of session_window, built
from first principles so the oracle can check it), and ordered funnel
conversion.

Determinism: timestamp gaps compare as whole-second boundary counts
(DuckDB date_diff('second') ≡ Spark floor-epoch subtraction — identical
for positive timestamps); session numbering is a running sum of
new-session flags under a total (ts, event_id) order, so ids are stable
across engines and partitionings.

Scale notes: q97 is the canonical scan-bound query (predicates pushed,
2 columns read); q98/q99 are single-window-shuffle plans partitioned by
user_id — the same key the raw zone would bucket by, so at scale the
window sort runs on co-located data; q100's per-stage joins stay on
user_id and the stage tables shrink monotonically down the funnel.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_cdc_spark.operators.components import connected_components
from snowflake_cdc_spark.operators.incremental import aggregate_from_retractions
from snowflake_cdc_spark.queries import DEC, _t, register
from snowflake_cdc_spark.sources.cdc import CDC_EVENTS_SQL, ORDER_COLS, cdc_events_flat

DEC4 = T.DecimalType(18, 4)


@register(
    "q97_q6_shape",
    """SELECT ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,
              count(*) AS n
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate <  TIMESTAMP '1998-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
    "TPC-H Q6 shape: pure scan-bound filter + aggregate — every predicate "
    "pushed to the parquet scan, two columns read, no shuffle beyond the "
    "single-row partial-agg collect",
)
def q97(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
    return li.agg(
        F.round(F.sum(rev).cast("double"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q98_forward_fill",
    """SELECT event_id, user_id,
              ROUND(last_value(v IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled
       FROM (SELECT event_id, user_id, ts,
                    CASE WHEN event_type <> 'error' THEN value END AS v
             FROM events)
       ORDER BY user_id, event_id""",
    "forward-fill imputation: last non-null value per user up to the "
    "current row (last_value IGNORE NULLS ≡ Spark last(ignorenulls)) — "
    "the standard missing-value repair in a training pipeline",
)
def q98(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
        )
        .select(
            "event_id",
            "user_id",
            F.round(F.last("v", ignorenulls=True).over(w), 4).alias("filled"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q99_sessionization",
    """WITH flagged AS (
         SELECT user_id, ts, event_id,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 28800
                     THEN 1 ELSE 0 END AS new_session
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       numbered AS (
         SELECT user_id, ts, event_id,
                sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM flagged)
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              count(*) AS n_events,
              CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec
       FROM numbered GROUP BY user_id, session_id
       ORDER BY user_id, session_id""",
    "gap-based sessionization (8h inactivity): lag → new-session flag → "
    "running-sum session ids → per-session stats; the deterministic batch "
    "twin of streaming session_window (q47)",
)
def q99(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # NTZ-safe epoch seconds: cast(ts AS LONG) rejects TIMESTAMP_NTZ, so
    # re-tag to TIMESTAMP (session TZ is pinned UTC) then unix_timestamp.
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    lag_sec = F.lag(sec).over(w)
    flagged = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(lag_sec.isNull() | ((sec - lag_sec) > 28800), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session").over(wrun).alias("session_id"),
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.max(F.unix_timestamp(F.col("ts").cast("timestamp")))
                - F.min(F.unix_timestamp(F.col("ts").cast("timestamp")))
            )
            .cast("bigint")
            .alias("duration_sec"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q100_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS t2
                  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
                  WHERE e.event_type = 'click' GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t3
                  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
                  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
       SELECT (SELECT count(*) FROM v) AS n_view,
              (SELECT count(*) FROM c) AS n_view_click,
              (SELECT count(*) FROM p) AS n_full_funnel""",
    "ordered funnel conversion (view → click → purchase): per-stage "
    "first-occurrence times chained with strictly-after joins; stage "
    "tables shrink monotonically, all joins on user_id",
)
def q100(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


@register(
    "q101_incremental_agg",
    CDC_EVENTS_SQL
    + """SELECT row_o_orderpriority AS o_orderpriority,
                count(*) AS n,
                ROUND(CAST(sum(CAST(row_o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                    AS sum_o_totalprice
         FROM (SELECT *, row_number() OVER (PARTITION BY primary_key
                                            ORDER BY seq DESC) AS rn
               FROM cdc_events)
         WHERE rn = 1 AND NOT is_delete
         GROUP BY 1 ORDER BY 1""",
    "incremental aggregate maintenance (operators/incremental.py): the "
    "CDC log applied as three retraction batches (insert/update/delete "
    "phases) must land on the same grouped count/sum as aggregating the "
    "materialized snapshot — the oracle computes the snapshot side, the "
    "engine never touches it",
)
def q101(spark, sf_dir):
    flat = cdc_events_flat(spark, sf_dir)
    agg = aggregate_from_retractions(
        flat,
        ORDER_COLS,
        group_cols=["o_orderpriority"],
        sum_cols=["o_totalprice"],
        n_chunks_by="op",
    )
    # maintenance stays DECIMAL-exact; only the reported projection is
    # double-cast (driver decimal-hash canonicalization, see queries.py q11)
    return agg.select(
        "o_orderpriority",
        "n",
        F.round(F.col("sum_o_totalprice").cast("double"), 2).alias("sum_o_totalprice"),
    ).orderBy("o_orderpriority")


@register(
    "q102_connected_components",
    """WITH RECURSIVE
       edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
                 FROM documents a JOIN documents b
                   ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang),
       sym AS (SELECT src, dst FROM edges
               UNION SELECT dst, src FROM edges),
       nodes AS (SELECT DISTINCT src AS node FROM sym),
       reach(node, r) AS (
         SELECT node, node FROM nodes
         UNION
         SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src)
       SELECT node, min(r) AS component FROM reach
       GROUP BY node ORDER BY node""",
    "connected components (operators/components.py): near-dup pair edges "
    "→ transitive clusters via min-label propagation; oracle computes the "
    "same components with a recursive-CTE transitive closure — an "
    "independent algorithm. Edges here: consecutive same-lang documents "
    "(deterministic chains, forcing multi-round convergence)",
)
def q102(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("prev_id"),
        F.col("doc_id").alias("dst"),
        F.col("lang").alias("lang_b"),
    )
    edges = docs.join(
        nxt, (docs.doc_id == nxt.prev_id) & (docs.lang == nxt.lang_b)
    ).select(F.col("doc_id").alias("src"), "dst")
    return connected_components(edges).orderBy("node")


@register(
    "q118_deep_chain_components",
    """WITH r AS (SELECT row_number() OVER (ORDER BY o_orderkey) AS rn
                  FROM orders)
       SELECT CAST(rn AS BIGINT) AS node, CAST(1 AS BIGINT) AS component
       FROM r WHERE rn <= 8192 ORDER BY node""",
    "adversarial connected-components stress (round-3 stretch): one "
    "single chain of up to 8192 nodes — diameter = node count, the worst "
    "case for O(diameter) label propagation (8k rounds) and exactly "
    "where the Kiveris large-star/small-star lane's O(log d) bound earns "
    "its keep (~15 rounds). algorithm='auto' probes with label-prop, "
    "detects non-convergence, and switches to star. The expected result "
    "of a chain is closed-form (every node joins component 1), so the "
    "oracle is exact without a recursive CTE",
)
def q118(spark, sf_dir):
    nodes = (
        _t(spark, sf_dir, "orders")
        .select(F.row_number().over(Window.orderBy("o_orderkey")).alias("rn"))
        .filter(F.col("rn") <= 8192)
    )
    edges = nodes.filter(F.col("rn") > 1).select(
        (F.col("rn") - 1).alias("src"), F.col("rn").alias("dst")
    )
    return connected_components(edges, algorithm="auto").select(
        F.col("node").cast("bigint").alias("node"),
        F.col("component").cast("bigint").alias("component"),
    ).orderBy("node")
