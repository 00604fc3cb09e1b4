"""Round-11 widening lanes, part 2: the capacity-planning trio a
training-data pipeline owner runs BEFORE committing a corpus to a
training run — per-source epoch/effective-token accounting under a
fixed token budget (q249), the packing-vs-truncation capacity sweep
(q250), and cluster-balanced diversity selection over the embedding
corpus (q251).

Reference parity: the reference (add_output.py:421-448) lands raw CDC
text into the warehouse; these are the planning passes a user runs on
that landing zone before training. All three are pure relational
compositions of existing operators (one groupBy, one bucketed window,
one corpus-scaled k-means + sort-free rank), each with an exact DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.queries import _t, register

# --------------------------------------------------------------------------
# Q249 — data-constrained token accounting (epochs + effective tokens)
# --------------------------------------------------------------------------
#
# When the training budget exceeds the corpus, data repeats — and
# repeated tokens are worth less than fresh ones (Muennighoff et al.
# 2023, "Scaling Data-Constrained Language Models": the value of the
# R-th repeat decays with a corpus-level constant R* ~ 15.4 epochs).
# This lane does the per-source ledger: under a fixed global budget
# split uniformly across sources (the data-constrained regime —
# low-resource sources repeat the most), report each source's unique
# tokens, allocation, epoch count, and EFFECTIVE tokens after
# diminishing returns. The decay here is the hyperbolic simplification
# eff_extra = R* . R / (R + R*) of the paper's exponential form, kept
# in pure BIGINT parts-per-million so both engines agree bit-for-bit
# (exp() cross-engine float parity is not hash-safe; the hyperbola has
# the same endpoints and monotonicity).
#
# Scale shape: one scan, one groupBy(source), one broadcast of the
# 1-row totals — embarrassingly parallel. NOTE (100-TB posture): the
# ppm products (U * eff_ppm ~ 10^12 x 10^6) overflow int64 around
# U ~ 9 x 10^12 unique tokens per source; at that scale widen the ppm
# math to DECIMAL(38,0) — the algebra is unchanged.

_R_STAR_PPM = 15_400_000  # R* ~ 15.4 epochs, in ppm
_BUDGET_EPOCHS = 4  # global budget = 4x total corpus tokens


def _q249_oracle() -> str:
    return f"""
WITH s AS (SELECT source,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS u
           FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(u) AS BIGINT) * {_BUDGET_EPOCHS} AS b,
             CAST(count(*) AS BIGINT) AS n_src
      FROM s),
a AS (SELECT s.source, s.u, CAST(t.b // t.n_src AS BIGINT) AS alloc
      FROM s, t),
e AS (SELECT source, u, alloc,
             CAST((alloc * 1000000) // u AS BIGINT) AS epochs_ppm
      FROM a),
r AS (SELECT source, u, alloc, epochs_ppm,
             greatest(CAST(0 AS BIGINT), epochs_ppm - 1000000) AS rep_ppm
      FROM e),
f AS (SELECT source, u, alloc, epochs_ppm,
             least(epochs_ppm, CAST(1000000 AS BIGINT))
               + CAST(({_R_STAR_PPM} * rep_ppm)
                      // (rep_ppm + {_R_STAR_PPM}) AS BIGINT)
               AS eff_epochs_ppm
      FROM r)
SELECT source, u AS u_tokens, alloc AS alloc_tokens, epochs_ppm,
       eff_epochs_ppm,
       CAST((u * eff_epochs_ppm) // 1000000 AS BIGINT) AS effective_tokens,
       CAST(((alloc - (u * eff_epochs_ppm) // 1000000) * 1000000)
            // alloc AS BIGINT) AS wasted_ppm
FROM f ORDER BY source"""


@register(
    "q249_token_accounting",
    _q249_oracle(),
    "data-constrained token accounting (round 11): under a fixed "
    "global budget of " + str(_BUDGET_EPOCHS) + "x the corpus split "
    "uniformly across sources, the per-source epoch/effective-token "
    "ledger — unique tokens, allocation, epochs (ppm), and effective "
    "tokens after diminishing repeat value (the hyperbolic "
    "R*.R/(R+R*) simplification of Muennighoff et al. 2023's decay, "
    "R* = 15.4 epochs, pure BIGINT ppm so both engines agree exactly; "
    "exp() float parity is not hash-safe). Low-resource sources "
    "repeat most and waste the largest ppm of their allocation — the "
    "number a pipeline owner reads before paying for the run. Scale "
    "shape: one scan, one groupBy(source), one 1-row broadcast",
)
def q249(spark, sf_dir):
    s = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).cast("bigint").alias("u"))
    )
    t = s.agg(
        (F.sum("u") * _BUDGET_EPOCHS).cast("bigint").alias("b"),
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
    )
    a = s.join(F.broadcast(t)).withColumn("alloc", F.expr("b div n_src"))
    e = a.withColumn("epochs_ppm", F.expr("(alloc * 1000000) div u"))
    r = e.withColumn(
        "rep_ppm",
        F.greatest(F.lit(0).cast("bigint"), F.col("epochs_ppm") - 1_000_000),
    )
    f = r.withColumn(
        "eff_epochs_ppm",
        F.least(F.col("epochs_ppm"), F.lit(1_000_000).cast("bigint"))
        + F.expr(
            f"({_R_STAR_PPM}L * rep_ppm) div (rep_ppm + {_R_STAR_PPM}L)"
        ),
    )
    eff = F.expr("(u * eff_epochs_ppm) div 1000000")
    return f.select(
        "source",
        F.col("u").alias("u_tokens"),
        F.col("alloc").alias("alloc_tokens"),
        "epochs_ppm",
        "eff_epochs_ppm",
        eff.alias("effective_tokens"),
        F.expr(
            "((alloc - (u * eff_epochs_ppm) div 1000000) * 1000000)"
            " div alloc"
        ).alias("wasted_ppm"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# Q250 — packing-vs-truncation capacity sweep
# --------------------------------------------------------------------------
#
# q114 reports the packing ledger at ONE context length; the question a
# pipeline owner actually asks is "which context length?" — and the
# answer trades the two waste modes against each other: packing splits
# documents across window boundaries (attention pollution, counted as
# n_split_docs) and pads the final partial window, while
# truncate-at-capacity loses every token beyond the window instead.
# This lane sweeps capacity over {256..4096} and reports both ledgers
# per capacity FROM ONE PASS: the per-bucket running token count (the
# only window) is capacity-INDEPENDENT, so all five capacities are
# expression-level derivations over the same cumsum — one shuffle on
# the 16 md5 buckets, one window, one groupBy, never five packing runs.

_SWEEP_CAPS = (256, 512, 1024, 2048, 4096)
_SWEEP_BUCKETS = 16


def _q250_oracle() -> str:
    percap = ",\n             ".join(
        f"CAST(sum(CASE WHEN floor((cum - n_tokens) / {c}.0)"
        f" <> greatest(floor((cum - n_tokens) / {c}.0),"
        f" floor((cum - 1) / {c}.0)) THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS split_{c},\n             "
        f"CAST(ceil(sum(n_tokens) / {c}.0) AS BIGINT) AS bins_{c},\n"
        f"             "
        f"CAST(sum(greatest(0, n_tokens - {c})) AS BIGINT) AS trunc_{c}"
        for c in _SWEEP_CAPS
    )
    arms = "\n  UNION ALL\n".join(
        f"""  SELECT CAST({c} AS BIGINT) AS capacity,
         CAST(sum(bins_{c}) AS BIGINT) AS n_bins,
         CAST(sum(split_{c}) AS BIGINT) AS n_split_docs,
         CAST(sum(bins_{c}) * {c} - sum(tot) AS BIGINT) AS pad_tokens,
         CAST(((sum(bins_{c}) * {c} - sum(tot)) * 1000000)
              // (sum(bins_{c}) * {c}) AS BIGINT) AS pad_ppm,
         CAST(sum(trunc_{c}) AS BIGINT) AS trunc_tokens,
         CAST((sum(trunc_{c}) * 1000000) // sum(tot) AS BIGINT)
             AS trunc_ppm
  FROM b"""
        for c in _SWEEP_CAPS
    )
    return f"""
WITH d AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                              1, 4)
                            AS UBIGINT) % {_SWEEP_BUCKETS} AS BIGINT)
                      AS bucket
           FROM documents),
c AS (SELECT bucket, n_tokens,
             sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
      FROM d),
b AS (SELECT bucket, CAST(sum(n_tokens) AS BIGINT) AS tot,
             {percap}
      FROM c GROUP BY bucket)
SELECT * FROM (
{arms})
ORDER BY capacity"""


@register(
    "q250_packing_capacity_sweep",
    _q250_oracle(),
    "packing-vs-truncation capacity sweep (round 11): q114's ledger "
    "swept over context lengths {256,512,1024,2048,4096} with BOTH "
    "waste modes per capacity — concat-and-chunk packing (window "
    "count, boundary-split documents, final-window padding ppm) vs "
    "truncate-at-capacity (tokens lost beyond the window, ppm of the "
    "corpus) — the sizing table a pipeline owner reads to pick the "
    "context length. ONE PASS for all five capacities: the per-bucket "
    "running token count is capacity-independent, so every capacity "
    "is an expression over the same cumsum — one shuffle on the 16 "
    "md5 buckets, one window, one groupBy, an inline unpivot; never "
    "five packing runs",
)
def q250(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("bigint"),
        F.lit(_SWEEP_BUCKETS),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    c = docs.select("doc_id", bucket.alias("bucket"), "n_tokens").withColumn(
        "cum", F.sum("n_tokens").over(w)
    )
    aggs = [F.sum("n_tokens").cast("bigint").alias("tot")]
    for cap in _SWEEP_CAPS:
        first_bin = F.floor((F.col("cum") - F.col("n_tokens")) / cap)
        last_bin = F.greatest(first_bin, F.floor((F.col("cum") - 1) / cap))
        aggs.append(
            F.sum((first_bin != last_bin).cast("bigint"))
            .cast("bigint")
            .alias(f"split_{cap}")
        )
        aggs.append(
            F.ceil(F.sum("n_tokens") / cap).cast("bigint").alias(f"bins_{cap}")
        )
        aggs.append(
            F.sum(
                F.greatest(F.lit(0).cast("bigint"), F.col("n_tokens") - cap)
            )
            .cast("bigint")
            .alias(f"trunc_{cap}")
        )
    b = c.groupBy("bucket").agg(*aggs)
    # corpus-level totals once, then the per-capacity unpivot is
    # expression-level over one 1-row relation
    tot_aggs = [F.sum("tot").cast("bigint").alias("tot")]
    for cap in _SWEEP_CAPS:
        tot_aggs += [
            F.sum(f"bins_{cap}").cast("bigint").alias(f"bins_{cap}"),
            F.sum(f"split_{cap}").cast("bigint").alias(f"split_{cap}"),
            F.sum(f"trunc_{cap}").cast("bigint").alias(f"trunc_{cap}"),
        ]
    t = b.agg(*tot_aggs)
    arms = []
    for cap in _SWEEP_CAPS:
        pad = F.col(f"bins_{cap}") * cap - F.col("tot")
        arms.append(
            F.struct(
                F.lit(cap).cast("bigint").alias("capacity"),
                F.col(f"bins_{cap}").alias("n_bins"),
                F.col(f"split_{cap}").alias("n_split_docs"),
                pad.cast("bigint").alias("pad_tokens"),
                F.expr(
                    f"((bins_{cap} * {cap} - tot) * 1000000)"
                    f" div (bins_{cap} * {cap})"
                ).alias("pad_ppm"),
                F.col(f"trunc_{cap}").alias("trunc_tokens"),
                F.expr(f"(trunc_{cap} * 1000000) div tot").alias("trunc_ppm"),
            )
        )
    return (
        t.select(F.explode(F.array(*arms)).alias("s"))
        .select("s.*")
        .orderBy("capacity")
    )


# --------------------------------------------------------------------------
# Q251 — cluster-balanced diversity selection
# --------------------------------------------------------------------------
#
# Budget selection by quality score (q211) concentrates on whatever the
# scorer likes; diversity-aware pipelines instead spread a fixed budget
# ACROSS the embedding space — equal per-cluster quotas over k-means
# cells, so no mode of the corpus is silently dropped (the
# cluster-balanced sampling used by dataset-diversification recipes).
# Composition: the q244 corpus-scaled exact-integer k-means
# (k = max(8, ceil(sqrt(N))), 2 rounds) assigns cells; within each cell
# the deterministic (md5(vec_id), vec_id) order ranks candidates via
# grouped_hash_rank — the SORT-FREE rank (no per-cell total sort; the
# only ordered region is one cell x one 256th-bucket) — and each cell
# keeps rank <= quota = ceil((N/4) / k). Cells smaller than the quota
# keep everything (their whole mode survives); dense cells are capped.
#
# Scale shape: one corpus-scaled assignment, one shuffle on cell, the
# bucketed rank, one filter — never a global sort, never all-pairs.


def _q251_oracle() -> str:
    from snowflake_cdc_spark.queries_round9_ext import _kmeans_chain_dyn

    chain = _kmeans_chain_dyn(rounds=2)
    return (
        chain
        + """,
pm AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM q) AS n,
              (SELECT CAST(k AS BIGINT) FROM kk) AS k),
qt AS (SELECT ((n // 4) + k - 1) // k AS quota FROM pm),
rk AS (SELECT cell, vec_id,
              row_number() OVER (PARTITION BY cell
                                 ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                          vec_id) AS rn
       FROM a2)
SELECT cell, vec_id, CAST(rn AS BIGINT) AS rn
FROM rk WHERE rn <= (SELECT quota FROM qt)
ORDER BY cell, rn"""
    )


@register(
    "q251_diverse_selection",
    _q251_oracle(),
    "cluster-balanced diversity selection (round 11): spread a fixed "
    "budget (N/4 vectors) across the embedding space instead of "
    "concentrating where a scorer points — corpus-scaled exact-integer "
    "k-means cells (k = max(8, ceil(sqrt(N))), 2 rounds, the q244 "
    "machinery), per-cell quota = ceil(budget/k), and within-cell rank "
    "by deterministic (md5(vec_id), vec_id) via grouped_hash_rank — "
    "the SORT-FREE rank, so no cell ever becomes a single-partition "
    "total sort. Small cells keep everything (no mode of the corpus "
    "is silently dropped); dense cells are capped at the quota. Scale "
    "shape: one assignment, one shuffle on cell, bucketed rank, one "
    "filter — never a global sort, never all-pairs",
)
def q251(spark, sf_dir):
    import math

    from snowflake_cdc_spark.operators.ivf_relational import (
        relational_kmeans_fit,
    )
    from snowflake_cdc_spark.operators.rank import grouped_hash_rank

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    k_cells = max(8, math.ceil(math.sqrt(n)))
    quota = ((n // 4) + k_cells - 1) // k_cells
    _, assigned = relational_kmeans_fit(emb, k=k_cells, rounds=2)
    ranked = grouped_hash_rank(
        assigned.select("cell", "vec_id").withColumn(
            "h", F.md5(F.col("vec_id").cast("string"))
        ),
        ["cell"],
        "h",
        "vec_id",
    )
    return (
        ranked.filter(F.col("rn") <= quota)
        .select("cell", "vec_id", F.col("rn").cast("bigint").alias("rn"))
        .orderBy("cell", "rn")
    )
