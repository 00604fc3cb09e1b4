"""Round-3 extension q121-q127: CDC history (SCD2), cohort retention,
chunk-level corpus dedup, temperature-mixture sampling applied
end-to-end, token-commonness curation scoring, leakage-safe splits, and
a bounded-error approx-percentile lane.

These close two remaining surface gaps:

- **q121 SCD2** is the history-preserving twin of the engine's flagship
  latest-by-key upsert (reference ``add_output.py:421-448`` keeps only
  the latest image; a warehouse user's dimension tables keep every
  version with validity intervals). Built on ``operators/scd.py``.
- **q122 retention** is the standard cohort-retention matrix every
  event-analytics user of the reference runs downstream of the CDC
  landing.
- **q123-q126** extend the training-data curation lane: span-level
  dedup (Lee et al. chunk variant, ``operators/chunk_dedup.py``),
  deterministic mixture resampling (inverse-sqrt temperature flattening
  applied via the md5-threshold sampler), mean-corpus-frequency
  commonness scoring (the CCNet-style "head of the distribution"
  signal), and group-coherent train/val/test splits (exact-dup groups
  may never straddle a split — the leakage guard).
- **q127** is the third bounded-error approximate lane (pattern of
  q49/q52): Spark emits the exact percentile plus a boolean asserting
  the t-digest/GK estimate lands inside the bound; the oracle computes
  the exact side + literal TRUE.

Determinism contract (COVERAGE.md round-2/3 amendments): all ratios are
exact BIGINT aggregates with at most ONE final double division; the
mixture fractions compose only correctly-rounded IEEE ops (divide,
sqrt, multiply, floor, least) on exact integers, so both engines derive
bit-identical thresholds; md5 selectors compare lowercase hex strings
lexicographically (≡ numerically at fixed width). Timestamps cross the
engine boundary as NTZ (queries.py module contract).

Scale notes per query are on the individual registrations.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.chunk_dedup import chunk_dedup
from snowflake_cdc_spark.operators.scd import scd2_from_changes
from snowflake_cdc_spark.sources.cdc import CDC_EVENTS_SQL
from snowflake_cdc_spark.queries import _t, ntz, register
from snowflake_cdc_spark.queries_northstar import DOCS_CORPUS_SQL, planted_docs

# --------------------------------------------------------------------------
# Q121 — SCD2 history materialization (K-family twin: history-preserving
# upsert; reference add_output.py:421-448 is the latest-only half)
# --------------------------------------------------------------------------


@register(
    "q121_scd2",
    """WITH ordered AS (
         SELECT user_id, event_type, ts, event_id,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
                lag(1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_first
         FROM events),
       opens AS (
         SELECT user_id, event_type, ts, event_id FROM ordered
         WHERE is_first OR prev IS DISTINCT FROM event_type)
       SELECT user_id, event_type, ts AS valid_from,
              lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
              lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
       FROM opens ORDER BY user_id, valid_from, event_type""",
    "SCD2 dimension history from the event change log: consecutive-equal "
    "runs collapse, [valid_from, valid_to) intervals, is_current flag. "
    "One shuffle on the business key (both windows share partitioning).",
)
def q121(spark, sf_dir):
    changes = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    out = scd2_from_changes(
        changes, ["user_id"], "event_type", "ts", "event_id"
    )
    return ntz(out).orderBy("user_id", "valid_from", "event_type")


# --------------------------------------------------------------------------
# Q122 — cohort retention matrix (event-analytics downstream of the CDC
# landing; weekly cohorts x weekly activity offsets)
# --------------------------------------------------------------------------


@register(
    "q122_retention",
    """WITH firsts AS (
         SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
         FROM events GROUP BY user_id),
       activity AS (
         SELECT DISTINCT e.user_id, f.cohort,
                CAST(date_diff('day', f.cohort,
                               CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS BIGINT)
                  AS week_offset
         FROM events e JOIN firsts f USING (user_id))
       SELECT cohort, week_offset, CAST(count(*) AS BIGINT) AS n_users
       FROM activity GROUP BY cohort, week_offset
       ORDER BY cohort, week_offset""",
    "weekly cohort retention: users grouped by first-seen week, counted "
    "once per (cohort, week-offset) they were active in. Both engines "
    "truncate weeks to ISO Monday; offsets are exact day-counts / 7.",
)
def q122(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    act = (
        ev.withColumn(
            "cohort", F.date_trunc("week", F.min("ts").over(w)).cast("date")
        )
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        act.groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "week_offset")
    )


# --------------------------------------------------------------------------
# Q123 — chunk-level corpus dedup (N2 span variant; operators/chunk_dedup)
# --------------------------------------------------------------------------


@register(
    "q123_chunk_dedup",
    DOCS_CORPUS_SQL
    + """, w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
       c AS (SELECT doc_id, i AS chunk_idx,
                    array_to_string(ws[i*8+1 : least((i+1)*8, len(ws))], ' ') AS chunk
             FROM w, unnest(generate_series(0, CAST(ceil(len(ws)/8.0) AS BIGINT)-1)) AS t(i)),
       r AS (SELECT doc_id, chunk_idx, chunk,
                    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
             FROM c)
       SELECT doc_id, count(*) AS n_chunks,
              CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END,
                                      ' ' ORDER BY chunk_idx), '')) AS kept_md5
       FROM r GROUP BY doc_id ORDER BY doc_id""",
    "span-level exact dedup (Lee et al. chunk variant): 8-word windows, "
    "corpus-wide first occurrence survives, per-doc surviving text "
    "fingerprint. Planted exact copies lose every chunk; near copies "
    "lose all but the ragged tail.",
)
def q123(spark, sf_dir):
    return chunk_dedup(
        planted_docs(spark, sf_dir), "doc_id", "text", chunk_words=8
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q124 — temperature-mixture resampling applied (N5: q111 computed the
# weights; this applies an inverse-sqrt flattening deterministically)
# --------------------------------------------------------------------------

_MIX_FRACTION_SQL = """
       totals AS (
         SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tl
         FROM documents GROUP BY lang),
       frac AS (
         SELECT lang, tl,
                least(1.0, 0.2 / sqrt(CAST(tl AS DOUBLE)
                                      / CAST((SELECT sum(tl) FROM totals) AS DOUBLE)))
                  AS keep_frac
         FROM totals),
       thr AS (
         SELECT lang, tl, keep_frac,
                lpad(lower(hex(CAST(least(floor(keep_frac * 65536), 65535) AS BIGINT))),
                     4, '0') AS cutoff
         FROM frac)
"""


@register(
    "q124_mixture_sample",
    "WITH "
    + _MIX_FRACTION_SQL
    + """, kept AS (
         SELECT d.doc_id, d.lang, t.keep_frac,
                len(string_split(d.text, ' ')) AS n_tok,
                (t.keep_frac >= 1.0
                 OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < t.cutoff) AS keep
         FROM documents d JOIN thr t USING (lang))
       SELECT lang, keep_frac,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
       FROM kept GROUP BY lang, keep_frac ORDER BY lang""",
    "inverse-sqrt temperature flattening applied via the deterministic "
    "md5-threshold sampler: keep_frac_l = min(1, 0.2/sqrt(token_share_l)) "
    "— low-resource languages keep more. Thresholds derive from exact "
    "BIGINT token totals through correctly-rounded IEEE ops only, so "
    "both engines select identical rows.",
)
def q124(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok")
    )
    totals = docs.groupBy("lang").agg(
        F.sum("n_tok").cast("bigint").alias("tl")
    )
    grand = totals.agg(F.sum("tl").alias("t"))
    frac = totals.crossJoin(F.broadcast(grand)).select(
        "lang",
        F.least(
            F.lit(1.0),
            0.2 / F.sqrt(F.col("tl").cast("double") / F.col("t").cast("double")),
        ).alias("keep_frac"),
    )
    thr = frac.select(
        "lang",
        "keep_frac",
        F.lpad(
            F.lower(
                F.hex(
                    F.least(
                        F.floor(F.col("keep_frac") * 65536), F.lit(65535)
                    ).cast("bigint")
                )
            ),
            4,
            "0",
        ).alias("cutoff"),
    )
    kept = docs.join(F.broadcast(thr), "lang").select(
        "lang",
        "keep_frac",
        "n_tok",
        (
            (F.col("keep_frac") >= 1.0)
            | (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < F.col("cutoff"))
        ).alias("keep"),
    )
    return (
        kept.groupBy("lang", "keep_frac")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q125 — token-commonness curation score (CCNet-style head-of-distribution
# signal: mean corpus frequency of a document's tokens)
# --------------------------------------------------------------------------


@register(
    "q125_commonness",
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       ctf AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w)
       SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(sum(c.f) AS BIGINT) AS sum_ctf,
              CAST(sum(c.f) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_ctf
       FROM tok t JOIN ctf c USING (w)
       GROUP BY t.doc_id ORDER BY t.doc_id""",
    "mean corpus-frequency of each document's tokens (high = the doc "
    "lives in the head of the distribution — boilerplate-ish). Exact "
    "BIGINT sums, one final double division. The vocab side of the join "
    "is broadcast (vocabulary << corpus at any scale).",
)
def q125(spark, sf_dir):
    tok = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    )
    ctf = tok.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    return (
        tok.join(F.broadcast(ctf), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("f").cast("bigint").alias("sum_ctf"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_ctf",
            (
                F.col("sum_ctf").cast("double") / F.col("n_tokens").cast("double")
            ).alias("mean_ctf"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Q126 — leakage-safe train/val/test split (exact-dup groups never
# straddle a split: the split key is the group representative, not the row)
# --------------------------------------------------------------------------


@register(
    "q126_leakage_split",
    DOCS_CORPUS_SQL
    + """, reps AS (
         SELECT doc_id, md5(text) AS h,
                min(doc_id) OVER (PARTITION BY md5(text)) AS group_rep
         FROM corpus)
       SELECT doc_id, group_rep,
              CASE WHEN substr(md5(CAST(group_rep AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                   WHEN substr(md5(CAST(group_rep AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                   ELSE 'test' END AS split
       FROM reps ORDER BY doc_id""",
    "80/10/10 split assigned by hashing the exact-dup group REPRESENTATIVE "
    "(min doc_id per identical text): planted copies land in the same "
    "split as their originals by construction — the train/test leakage "
    "guard. Membership re-derivable from the key alone.",
)
def q126(spark, sf_dir):
    # hash BEFORE the shuffle: the group-rep window repartitions on the
    # content hash, and carrying (doc_id, 32-byte h) instead of the full
    # text keeps the exchange narrow — the difference between shuffling
    # 100 TB of text and ~50 bytes/row at scale.
    docs = planted_docs(spark, sf_dir).select(
        "doc_id", F.md5("text").alias("_h")
    )
    w = Window.partitionBy("_h")
    reps = docs.select(
        "doc_id", F.min("doc_id").over(w).alias("group_rep")
    )
    hx = F.substring(F.md5(F.col("group_rep").cast("string")), 1, 4)
    return reps.select(
        "doc_id",
        "group_rep",
        F.when(hx < "cccc", "train")
        .when(hx < "e666", "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q127 — bounded-error approx percentile (third approximate lane, q49/q52
# pattern: Spark emits exact value + in-bound boolean; oracle exact + TRUE)
# --------------------------------------------------------------------------


@register(
    "q127_approx_percentile",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              ROUND(quantile_cont(value, 0.50), 4) AS p50_exact,
              ROUND(quantile_cont(value, 0.95), 4) AS p95_exact,
              TRUE AS p50_in_bound, TRUE AS p95_in_bound
       FROM events GROUP BY event_type ORDER BY event_type""",
    "approx_percentile (GK sketch, accuracy 10000) checked against the "
    "exact interpolated percentile: booleans assert |approx-exact| <= "
    "max(5% relative, 0.01 absolute). The sketch itself is "
    "merge-order-dependent; the bound is what's contractual.",
)
def q127(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    exact = F.percentile(F.col("value"), F.lit([0.50, 0.95]))
    approx = F.percentile_approx(F.col("value"), F.lit([0.50, 0.95]), F.lit(10000))
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        exact.alias("_e"),
        approx.alias("_a"),
    )

    def in_bound(e, a):
        return F.abs(a - e) <= F.greatest(F.lit(0.05) * F.abs(e), F.lit(0.01))

    return agg.select(
        "event_type",
        "n",
        F.round(F.col("_e")[0], 4).alias("p50_exact"),
        F.round(F.col("_e")[1], 4).alias("p95_exact"),
        in_bound(F.col("_e")[0], F.col("_a")[0]).alias("p50_in_bound"),
        in_bound(F.col("_e")[1], F.col("_a")[1]).alias("p95_in_bound"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q128 — record linkage / entity resolution (operators/linkage.py):
# blocking -> integer-thresholded Jaccard verify -> deterministic resolve
# --------------------------------------------------------------------------


@register(
    "q128_entity_resolution",
    """WITH clean AS (
         SELECT p_partkey AS id,
                p_name || ' ' || lower(p_type) || ' ' || p_brand AS nm
         FROM part),
       dirty AS (
         SELECT p_partkey + 5000000 AS id,
                p_name || ' ' || lower(p_type) AS nm
         FROM part WHERE p_partkey % 7 = 0),
       cbg AS (SELECT id, ws[i] || ' ' || ws[i+1] AS bg
               FROM (SELECT id, string_split(nm, ' ') AS ws FROM clean),
                    unnest(generate_series(1, len(ws)-1)) AS t(i)),
       dbg AS (SELECT id, ws[i] || ' ' || ws[i+1] AS bg
               FROM (SELECT id, string_split(nm, ' ') AS ws FROM dirty),
                    unnest(generate_series(1, len(ws)-1)) AS t(i)),
       cand AS (SELECT cbg.id AS clean_id, dbg.id AS dirty_id
                FROM cbg JOIN dbg USING (bg)
                GROUP BY 1, 2 HAVING count(DISTINCT bg) >= 2),
       scored AS (
         SELECT cand.dirty_id, cand.clean_id,
                CAST(len(list_intersect(ct.toks, dt.toks)) AS BIGINT) AS n_inter,
                CAST(len(list_distinct(list_concat(ct.toks, dt.toks))) AS BIGINT) AS n_union
         FROM cand
         JOIN (SELECT id, list_distinct(string_split(nm, ' ')) AS toks FROM clean) ct
           ON ct.id = cand.clean_id
         JOIN (SELECT id, list_distinct(string_split(nm, ' ')) AS toks FROM dirty) dt
           ON dt.id = cand.dirty_id),
       ranked AS (
         SELECT *, row_number() OVER (
                  PARTITION BY dirty_id
                  ORDER BY CAST(n_inter AS DOUBLE) / n_union DESC, clean_id) AS rn
         FROM scored WHERE n_inter * 2 >= n_union)
       SELECT dirty_id, clean_id, n_inter, n_union,
              CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard
       FROM ranked WHERE rn = 1 ORDER BY dirty_id""",
    "entity resolution: dirty records (brand token dropped, shifted key) "
    "linked back to the clean catalog via token-bigram blocking with "
    ">=2-distinct-bigram agreement (~30x fewer candidates than >=1 at "
    "sf0.1) + exact Jaccard verify (integer threshold 2*inter >= union) "
    "+ best-match window. Every planted dirty record must resolve to "
    "its original (jaccard 3/4 beats same-name-different-brand's 3/5; "
    "the planted pair always shares both its bigrams, so the >=2 "
    "blocking refinement cannot lose it).",
)
def q128(spark, sf_dir):
    from snowflake_cdc_spark.operators.linkage import link_records

    part = _t(spark, sf_dir, "part")
    clean = part.select(
        F.col("p_partkey").alias("id"),
        F.concat_ws(
            " ", "p_name", F.lower(F.col("p_type")), "p_brand"
        ).alias("nm"),
    )
    dirty = part.filter(F.col("p_partkey") % 7 == 0).select(
        (F.col("p_partkey") + 5000000).alias("id"),
        F.concat_ws(" ", "p_name", F.lower(F.col("p_type"))).alias("nm"),
    )
    return link_records(clean, dirty, "id", "nm", min_shared_blocks=2).orderBy(
        "dirty_id"
    )


# --------------------------------------------------------------------------
# Q129 — snapshot diff (CDC data-diff between two seq horizons)
# --------------------------------------------------------------------------


@register(
    "q129_snapshot_diff",
    CDC_EVENTS_SQL
    + """, h AS (SELECT m // 2 AS s1 FROM mx),
       r1 AS (SELECT * FROM (
           SELECT e.*, row_number() OVER (PARTITION BY primary_key ORDER BY seq DESC) AS rn
           FROM cdc_events e, h WHERE e.seq <= h.s1)
         WHERE rn = 1 AND NOT is_delete),
       r2 AS (SELECT * FROM (
           SELECT e.*, row_number() OVER (PARTITION BY primary_key ORDER BY seq DESC) AS rn
           FROM cdc_events e)
         WHERE rn = 1 AND NOT is_delete),
       d AS (SELECT
           COALESCE(a.primary_key, b.primary_key) AS primary_key,
           CASE WHEN b.primary_key IS NULL THEN 'removed'
                WHEN a.primary_key IS NULL THEN 'added'
                ELSE 'changed' END AS change_type,
           CASE WHEN a.primary_key IS NULL OR b.primary_key IS NULL
                THEN CAST([] AS VARCHAR[])
                ELSE list_filter([
                  CASE WHEN a.row_o_custkey       IS DISTINCT FROM b.row_o_custkey       THEN 'row_o_custkey' END,
                  CASE WHEN a.row_o_orderdate     IS DISTINCT FROM b.row_o_orderdate     THEN 'row_o_orderdate' END,
                  CASE WHEN a.row_o_orderkey      IS DISTINCT FROM b.row_o_orderkey      THEN 'row_o_orderkey' END,
                  CASE WHEN a.row_o_orderpriority IS DISTINCT FROM b.row_o_orderpriority THEN 'row_o_orderpriority' END,
                  CASE WHEN a.row_o_orderstatus   IS DISTINCT FROM b.row_o_orderstatus   THEN 'row_o_orderstatus' END,
                  CASE WHEN a.row_o_totalprice    IS DISTINCT FROM b.row_o_totalprice    THEN 'row_o_totalprice' END
                ], x -> x IS NOT NULL) END AS changed_cols
         FROM r1 a FULL OUTER JOIN r2 b ON a.primary_key = b.primary_key)
       SELECT primary_key, change_type, changed_cols,
              CAST(len(changed_cols) AS BIGINT) AS n_changed_cols
       FROM d WHERE change_type <> 'changed' OR len(changed_cols) > 0
       ORDER BY primary_key""",
    "CDC data-diff (operators/diff.py): the hard-delete snapshot as of "
    "seq <= max_insert_seq/2 diffed against the full log — added / "
    "removed / changed keys with the NULL-safe list of changed columns. "
    "Engine computes BOTH as-of states in ONE hash aggregation "
    "(max_by(payload, seq) + max_by(payload, CASE WHEN seq<=s1 THEN seq "
    "END) — the conditional ordering key IS the horizon filter): one "
    "shuffle on the key, no join; the oracle builds two row_number "
    "snapshots and full-outer-joins them (independent algorithm). The "
    "horizon scalar rides a broadcast cross join, no driver collect. "
    "Fixture coverage: updates -> changed(row_o_totalprice), deletes -> "
    "removed, inserts above the horizon -> added.",
)
def q129(spark, sf_dir):
    from snowflake_cdc_spark.operators.diff import snapshot_diff
    from snowflake_cdc_spark.sources.cdc import ORDER_COLS, cdc_events_flat

    ch = cdc_events_flat(spark, sf_dir)
    h = ch.filter(F.col("op") == "insert").agg(
        F.floor(F.max("seq") / 2).cast("long").alias("__s1")
    )
    d = snapshot_diff(
        ch.crossJoin(F.broadcast(h)),
        ["primary_key"],
        [f"row_{c}" for c in ORDER_COLS],
        s1=F.col("__s1"),
    )
    return d.select(
        "primary_key",
        "change_type",
        "changed_cols",
        F.col("n_changed_cols").cast("bigint").alias("n_changed_cols"),
    ).orderBy("primary_key")
