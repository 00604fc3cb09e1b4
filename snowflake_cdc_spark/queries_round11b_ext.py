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
from snowflake_cdc_spark.operators.util import ckpt_lazy

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


# --------------------------------------------------------------------------
# Q252/Q253 — unigram-LM tokenizer (SentencePiece-style), exact-integer
# --------------------------------------------------------------------------
#
# The tokenizer family's third member beside char-BPE (q145) and
# byte-BPE (q241): a unigram language-model tokenizer — vocabulary =
# the corpus's most frequent substrings, segmentation = the Viterbi
# path minimizing total piece cost (cost = -ln p(piece) in integer
# micro-nats, the q235 NB quantization idiom: ONE libm ln per vocab
# piece, quantized once, pure BIGINT after). Single-character pieces
# are always in the vocabulary, so every [a-z]+ word is segmentable.
#
# The Viterbi DP runs as EXPRESSIONS, not Python: per distinct word,
# best[i] = min over l<=4 of best[i-l] + cost(substr(w, i-l+1, l)),
# encoded as one BIGINT comp = 32*cost + n_tokens (n_tokens <= 12 < 32,
# so min(comp) is lexicographic (cost, n_tokens) and the decode is the
# positive-operand comp//32 and comp%32 — no negative-division
# cross-engine traps). Catalyst collapses adjacent projections and
# would inline each DP level into the next (4^12 blowup), so a
# Generate barrier (explode of a 1-element array — the q244 codegen
# discipline) seals every 3 levels; DuckDB's CTE inliner gets the same
# treatment via AS MATERIALIZED.
#
# Scale shape: word counts and piece counts are map-side-combined
# groupBys; the vocab (top-512 + chars) broadcasts; the DP is a
# per-row expression over the DISTINCT-WORD relation — never per
# occurrence, never Python, never a global sort (the vocab rank rides
# rangebucket_rank).

from snowflake_cdc_spark.operators.unigram import (  # noqa: E402
    INF as _UNI_INF,
    MAX_PLEN as _UNI_MAX_PLEN,
    MAX_WLEN as _UNI_MAX_WLEN,
    SCALE as _UNI_SCALE,
    VOCAB_SIZE as _UNI_VOCAB,
)

#: the synthetic corpus has only ~31 distinct [a-z]+ words at every SF
#: — far too few to exercise a segmenter — so the word stream is
#: augmented with one deterministic pseudo-word per document (md5 hex
#: of doc_id transliterated to a-p, length 4 + doc_id % 9), giving the
#: vocabulary corpus-sized substring statistics and the DP a
#: corpus-sized distinct-word relation in both engines.
_UNI_PLANT_EXPR = (
    "translate(substring(md5(CAST(doc_id AS VARCHAR)), 1,"
    " 4 + CAST(doc_id % 9 AS INT)), '0123456789abcdef',"
    " 'abcdefghijklmnop')"
)
_UNI_PLANT_SQL = f"SELECT {_UNI_PLANT_EXPR} AS w FROM documents"


def _uni_plant_col():
    """The Spark Column form of _UNI_PLANT_EXPR (DuckDB dialect uses
    VARCHAR casts Spark's parser rejects)."""
    return F.translate(
        F.md5(F.col("doc_id").cast("string")).substr(
            F.lit(1), (F.lit(4) + F.col("doc_id") % 9).cast("int")
        ),
        "0123456789abcdef",
        "abcdefghijklmnop",
    )

_UNI_VOCAB_CTES = f"""wt AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents
        UNION ALL
        {_UNI_PLANT_SQL})
  WHERE length(w) <= {_UNI_MAX_WLEN} GROUP BY w),
pc AS MATERIALIZED (
  SELECT substring(w, i, l) AS piece, CAST(sum(c) AS BIGINT) AS cnt
  FROM wt,
       unnest(generate_series(1, length(w))) t1(i),
       unnest(generate_series(1, {_UNI_MAX_PLEN})) t2(l)
  WHERE i + l - 1 <= length(w)
  GROUP BY 1),
vr AS (SELECT piece, cnt,
              row_number() OVER (ORDER BY cnt DESC, piece) AS rn
       FROM pc),
vb AS (SELECT piece, cnt FROM vr
       WHERE rn <= {_UNI_VOCAB} OR length(piece) = 1),
tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vb),
vc AS MATERIALIZED (
  SELECT piece, cnt,
         CAST(floor(ln(CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS cost
  FROM vb, tt)"""


def _uni_dp_sql() -> str:
    """The chained-CTE Viterbi over dp0(w, c, m)."""
    parts = []
    for i in range(1, _UNI_MAX_WLEN + 1):
        terms = []
        for l in range(1, min(_UNI_MAX_PLEN, i) + 1):
            prev = "CAST(0 AS BIGINT)" if i - l == 0 else f"c{i - l}"
            terms.append(
                f"{prev} + {_UNI_SCALE} * coalesce(list_extract("
                f"map_extract(m, substring(w, {i - l + 1}, {l})), 1),"
                f" {_UNI_INF}) + 1"
            )
        parts.append(
            f"dp{i} AS MATERIALIZED (SELECT *, least({', '.join(terms)})"
            f" AS c{i} FROM dp{i - 1})"
        )
    return ",\n".join(parts)


def _q253_oracle() -> str:
    return (
        "WITH "
        + _UNI_VOCAB_CTES
        + "\nSELECT piece, cnt, cost FROM vc ORDER BY piece"
    )


def _q252_oracle() -> str:
    comps = ", ".join(f"c{i}" for i in range(1, _UNI_MAX_WLEN + 1))
    return (
        "WITH "
        + _UNI_VOCAB_CTES
        + f""",
pw AS (SELECT DISTINCT w, substring(w, i, l) AS piece
       FROM wt,
            unnest(generate_series(1, length(w))) t1(i),
            unnest(generate_series(1, {_UNI_MAX_PLEN})) t2(l)
       WHERE i + l - 1 <= length(w)),
pm AS MATERIALIZED (
  SELECT pw.w, map_from_entries(list({{k: pw.piece, v: vc.cost}})) AS m
  FROM pw JOIN vc USING (piece) GROUP BY pw.w),
dp0 AS MATERIALIZED (SELECT wt.w, wt.c, pm.m FROM wt JOIN pm USING (w)),
"""
        + _uni_dp_sql()
        + f""",
fin AS (SELECT w, c,
               list_extract([{comps}], length(w)) AS comp
        FROM dp{_UNI_MAX_WLEN})
SELECT w AS word, c AS n_occurrences,
       CAST(comp % {_UNI_SCALE} AS BIGINT) AS n_tokens,
       CAST(comp // {_UNI_SCALE} AS BIGINT) AS cost_unats
FROM fin ORDER BY word"""
    )


def _uni_vocab_df(spark, sf_dir):
    """(wt, vc): distinct-word counts and the costed vocabulary —
    the Spark side of _UNI_VOCAB_CTES via operators/unigram.py
    (token-identical cost math; the vocab is collected once as a
    parameter-bounded model artifact, see costed_vocab)."""
    from snowflake_cdc_spark.operators import unigram

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(_uni_plant_col().alias("w"))
    wt = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
            ).alias("w")
        )
        .unionByName(planted)
        .filter(F.length("w") <= _UNI_MAX_WLEN)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        # one materialization (round 11): consumed by the vocab build
        # AND by two branches of every downstream DP plan (piece
        # explode + the word join) — the corpus explode + groupBy
        # would otherwise re-run per consumer
        .transform(ckpt_lazy)
    )
    vc = unigram.costed_vocab(
        spark, unigram.piece_counts(wt, _UNI_MAX_PLEN), _UNI_VOCAB
    )
    return wt, vc


@register(
    "q253_unigram_vocab",
    _q253_oracle(),
    "unigram-LM tokenizer vocabulary (round 11): the trained model "
    "artifact of the q252 segmenter — the corpus's top-"
    + str(_UNI_VOCAB)
    + " substrings (length <= "
    + str(_UNI_MAX_PLEN)
    + ", occurrence-weighted counts, ties broken by piece) plus every "
    "single character (the closure guaranteeing all [a-z]+ words "
    "segment), each with its cost = -ln(cnt/total) quantized once to "
    "integer micro-nats (the q235 NB idiom — one libm ln per piece, "
    "pure BIGINT after). Scale shape: piece counts are map-side-"
    "combined groupBys over the DISTINCT-word relation; the top-V "
    "rank rides rangebucket_rank (no global sort); the ranked vocab "
    "(<= V + alphabet rows, parameter-fixed) is collected once and "
    "rebroadcast as a literal — the BPE-merge control-plane "
    "discipline — so the corpus aggregation runs exactly once and "
    "no window reaches the registry plan; the vocab is a "
    "broadcast-sized relation at any corpus size",
)
def q253(spark, sf_dir):
    _, vc = _uni_vocab_df(spark, sf_dir)
    return vc.orderBy("piece")


def _uni_segmented(spark, sf_dir):
    """(w, c, comp): the expression-level Viterbi over the distinct-word
    relation — comp = 32*min_cost + n_tokens, shared by q252/q254."""
    from snowflake_cdc_spark.operators.unigram import viterbi_segment

    wt, vc = _uni_vocab_df(spark, sf_dir)
    return viterbi_segment(wt, vc, _UNI_MAX_WLEN, _UNI_MAX_PLEN)


@register(
    "q252_unigram_segmentation",
    _q252_oracle(),
    "unigram-LM Viterbi segmentation (round 11): SentencePiece-style "
    "tokenization — per distinct word, the minimum-cost segmentation "
    "into q253 vocabulary pieces (cost = -ln p in integer micro-nats), "
    "computed as a pure-EXPRESSION dynamic program: best[i] = min over "
    "piece lengths <= " + str(_UNI_MAX_PLEN) + " of best[i-l] + "
    "cost(substr), encoded in one BIGINT comp = 32*cost + n_tokens so "
    "the (cost, token-count) lexicographic optimum and its decode are "
    "pure positive-integer arithmetic in both engines. A Generate "
    "barrier seals every 3 DP levels against Catalyst's project-"
    "collapse inlining (4^12 blowup); the oracle's chained CTEs get AS "
    "MATERIALIZED for DuckDB's inliner. Scale shape: the DP runs over "
    "the DISTINCT-word relation (never per occurrence), the vocab is "
    "the q253 collected literal (bounded by parameter) consumed via a "
    "broadcast join, the hot path is pure JVM expressions — zero "
    "windows, zero global sorts",
)
def q252(spark, sf_dir):
    return (
        _uni_segmented(spark, sf_dir)
        .select(
            F.col("w").alias("word"),
            F.col("c").alias("n_occurrences"),
            F.expr(f"comp % {_UNI_SCALE}").cast("bigint").alias("n_tokens"),
            F.expr(f"comp div {_UNI_SCALE}").cast("bigint").alias(
                "cost_unats"
            ),
        )
        .orderBy("word")
    )


# --------------------------------------------------------------------------
# Q254 — per-source unigram fertility (the tokenizer applied corpus-wide)
# --------------------------------------------------------------------------
#
# The application lane completing the unigram family, parallel to the
# other two tokenizers' q226 (char-BPE fertility curve) and q242
# (byte-BPE per-language coverage): join the word-level Viterbi results
# back to per-(source, word) occurrence counts and report each source's
# token budget under the q253 vocabulary — total words, total tokens,
# fertility (tokens per word, in ppm) and mean per-word encoding cost
# (micro-nats). This is the number a pipeline owner multiplies a
# source's document count by when sizing a training run (q249's input).
#
# Scale shape: the DP stays on the DISTINCT-word relation; the only new
# work is a (source, word) map-side-combined groupBy and a hash join of
# that against the word-level segmentation — all integer arithmetic,
# no windows, no Python.


def _q254_oracle() -> str:
    comps = ", ".join(f"c{i}" for i in range(1, _UNI_MAX_WLEN + 1))
    return (
        "WITH "
        + _UNI_VOCAB_CTES
        + f""",
pw AS (SELECT DISTINCT w, substring(w, i, l) AS piece
       FROM wt,
            unnest(generate_series(1, length(w))) t1(i),
            unnest(generate_series(1, {_UNI_MAX_PLEN})) t2(l)
       WHERE i + l - 1 <= length(w)),
pm AS MATERIALIZED (
  SELECT pw.w, map_from_entries(list({{k: pw.piece, v: vc.cost}})) AS m
  FROM pw JOIN vc USING (piece) GROUP BY pw.w),
dp0 AS MATERIALIZED (SELECT wt.w, wt.c, pm.m FROM wt JOIN pm USING (w)),
"""
        + _uni_dp_sql()
        + f""",
seg AS MATERIALIZED (
  SELECT w,
         CAST(list_extract([{comps}], length(w)) % {_UNI_SCALE} AS BIGINT)
           AS nt,
         CAST(list_extract([{comps}], length(w)) // {_UNI_SCALE} AS BIGINT)
           AS cost
  FROM dp{_UNI_MAX_WLEN}),
sw AS MATERIALIZED (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents
        UNION ALL
        SELECT source, {_UNI_PLANT_EXPR} AS w FROM documents)
  WHERE length(w) <= {_UNI_MAX_WLEN}
  GROUP BY 1, 2)
SELECT sw.source,
       CAST(sum(sw.c) AS BIGINT) AS n_words,
       CAST(sum(sw.c * seg.nt) AS BIGINT) AS n_tokens,
       CAST(sum(sw.c * seg.nt) * 1000000 // sum(sw.c) AS BIGINT)
         AS fertility_ppm,
       CAST(sum(sw.c * seg.cost) // sum(sw.c) AS BIGINT)
         AS mean_cost_unats
FROM sw JOIN seg USING (w)
GROUP BY 1 ORDER BY 1"""
    )


@register(
    "q254_unigram_fertility",
    _q254_oracle(),
    "per-source unigram-tokenizer fertility (round 11): the q252 "
    "segmenter applied corpus-wide — per source, total [a-z]+ words, "
    "total tokens under the q253 vocabulary, fertility in tokens-per-"
    "word ppm, and mean per-word encoding cost in micro-nats; the "
    "capacity number q249's token ledger consumes. Scale shape: the "
    "Viterbi DP stays on the DISTINCT-word relation; the per-(source, "
    "word) counts are one map-side-combined groupBy hash-joined to the "
    "word-level segmentation — pure BIGINT, no windows, no Python, no "
    "global sorts",
)
def q254(spark, sf_dir):
    seg = _uni_segmented(spark, sf_dir).select(
        "w",
        F.expr(f"comp % {_UNI_SCALE}").cast("bigint").alias("nt"),
        F.expr(f"comp div {_UNI_SCALE}").cast("bigint").alias("cost"),
    )
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("w"),
    )
    planted = docs.select("source", _uni_plant_col().alias("w"))
    sw = (
        words.unionByName(planted)
        .filter(F.length("w") <= _UNI_MAX_WLEN)
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return (
        sw.join(seg, "w")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.col("nt")).cast("bigint").alias("n_tokens"),
            F.expr("CAST(sum(c * nt) * 1000000 div sum(c) AS BIGINT)").alias(
                "fertility_ppm"
            ),
            F.expr("CAST(sum(c * cost) div sum(c) AS BIGINT)").alias(
                "mean_cost_unats"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q255 — curriculum training schedule (quality-quartile phases)
# --------------------------------------------------------------------------
#
# Curriculum learning over the corpus: documents are split into
# equal-mass quality phases (equi-depth quartiles of vocabulary
# richness — the q233 score axis) and trained highest-quality-first
# (the data-curation curriculum: clean text anchors early training,
# the noisy tail arrives once the loss is low). The deliverable is the
# SCHEDULE a trainer consumes: per (train_order, source) the doc and
# token mass, each source's share of its phase, and the cumulative
# token count once the phase completes.
#
# Scale shape: one equidepth_assign (the sort-free exact-rank
# composition — range buckets + broadcast offsets, whitelisted 64-row
# window), one doc-keyed join back for (source, n_toks), one
# (phase, source) rollup; the phase totals and cumulative schedule
# live on a K-row relation handled with broadcast joins, not windows.

_CURR_K = 4

_CURR_ORACLE = None  # built below (needs ntile_fill_sql)


def _curr_oracle() -> str:
    from snowflake_cdc_spark.operators.histogram import ntile_fill_sql

    return f"""
WITH d AS (SELECT doc_id, source,
                  CAST(len(regexp_extract_all(lower(text),
                       '[\\p{{L}}\\p{{M}}]+')) AS BIGINT) AS n_toks,
                  CAST(len(list_distinct(regexp_extract_all(lower(text),
                       '[\\p{{L}}\\p{{M}}]+'))) AS BIGINT) AS score
           FROM documents),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
r AS (SELECT doc_id, source, n_toks, score,
             row_number() OVER (ORDER BY score, doc_id) AS rq FROM d),
b AS (SELECT doc_id, source, n_toks,
             {_CURR_K + 1} - ({ntile_fill_sql('rq', 'n.n', _CURR_K)})
               AS train_order
      FROM r, n),
ps AS (SELECT train_order, source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_toks) AS BIGINT) AS tokens
       FROM b GROUP BY 1, 2),
pt AS (SELECT train_order, CAST(sum(tokens) AS BIGINT) AS phase_tokens
       FROM ps GROUP BY 1),
ct AS (SELECT a.train_order,
              CAST(sum(b.phase_tokens) AS BIGINT) AS cum_tokens
       FROM pt a JOIN pt b ON b.train_order <= a.train_order
       GROUP BY 1)
SELECT ps.train_order, ps.source, ps.n_docs, ps.tokens,
       CAST(ps.tokens * 1000000 // pt.phase_tokens AS BIGINT) AS share_ppm,
       ct.cum_tokens
FROM ps JOIN pt USING (train_order) JOIN ct USING (train_order)
ORDER BY train_order, source"""


@register(
    "q255_curriculum_schedule",
    _curr_oracle(),
    "curriculum training schedule (round 11): documents split into "
    + str(_CURR_K)
    + " equal-mass quality phases (equi-depth quartiles of distinct-"
    "word vocabulary richness, the q233 score axis) trained highest-"
    "quality-first; per (train_order, source) the doc/token mass, the "
    "source's ppm share of its phase, and the cumulative tokens once "
    "the phase completes — the schedule artifact a trainer consumes. "
    "Scale shape: ONE sort-free equidepth_assign (range buckets + "
    "broadcast offsets), a doc-keyed join, a (phase, source) rollup; "
    "phase totals and the cumulative schedule are K-row broadcast "
    "joins, never windows",
)
def q255(spark, sf_dir):
    from snowflake_cdc_spark.functions.text import UNICODE_WORD
    from snowflake_cdc_spark.operators.histogram import equidepth_assign

    docs = _t(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower("text"), F.lit(UNICODE_WORD), F.lit(0))
    d = docs.select(
        "doc_id",
        "source",
        F.size(ws).cast("bigint").alias("n_toks"),
        F.size(F.array_distinct(ws)).cast("bigint").alias("score"),
    )
    assigned = equidepth_assign(d, "score", "doc_id", k=_CURR_K).select(
        "doc_id",
        (F.lit(_CURR_K + 1) - F.col("bucket")).cast("bigint").alias(
            "train_order"
        ),
    )
    ps = (
        d.join(assigned, "doc_id")
        .groupBy("train_order", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("tokens"),
        )
    )
    # The phase totals and the cumulative schedule are a K-row
    # PARAMETER-bounded artifact: collect once and rebroadcast as a
    # literal (the costed_vocab discipline). Kept lazy, the K-row tail
    # would drag FOUR plan copies of the equidepth subtree (ps + pt +
    # ct's self-join both sides) into the final plan.
    prow = sorted(
        ps.groupBy("train_order")
        .agg(F.sum("tokens").cast("bigint").alias("phase_tokens"))
        .collect(),
        key=lambda r: r.train_order,
    )
    cum = 0
    sched = []
    for r in prow:
        cum += r.phase_tokens
        sched.append((r.train_order, r.phase_tokens, cum))
    pt = spark.createDataFrame(
        sched, "train_order bigint, phase_tokens bigint, cum_tokens bigint"
    )
    return (
        ps.join(F.broadcast(pt), "train_order")
        .select(
            "train_order",
            "source",
            "n_docs",
            "tokens",
            F.expr("CAST(tokens * 1000000 div phase_tokens AS BIGINT)").alias(
                "share_ppm"
            ),
            "cum_tokens",
        )
        .orderBy("train_order", "source")
    )


# --------------------------------------------------------------------------
# Q256 — unigram segmentation PIECES (Viterbi backtrack, hash-checked)
# --------------------------------------------------------------------------
#
# q252 proves the optimum's (cost, token-count); this lane emits the
# tokenizer's actual user-facing output — the winning piece sequence —
# by recording the argmin choice in the low bits of the DP value
# (comp = 8*(32*cost + n_tokens) + piece_len, min = lexicographic
# (cost, n_tokens, smallest piece)) and walking back from position
# length(w) with an unrolled prepend loop. Both engines reconstruct
# the string independently and the driver hash-compares it verbatim —
# the strongest cross-engine statement the tokenizer family makes.

_CHOICE = 8


def _uni_dp_paths_sql() -> str:
    parts = []
    for i in range(1, _UNI_MAX_WLEN + 1):
        terms = []
        for l in range(1, min(_UNI_MAX_PLEN, i) + 1):
            prev = (
                "CAST(0 AS BIGINT)"
                if i - l == 0
                else f"(c{i - l} // {_CHOICE})"
            )
            terms.append(
                f"({prev} + {_UNI_SCALE} * coalesce(list_extract("
                f"map_extract(m, substring(w, {i - l + 1}, {l})), 1),"
                f" {_UNI_INF}) + 1) * {_CHOICE} + {l}"
            )
        parts.append(
            f"dp{i} AS MATERIALIZED (SELECT *, least({', '.join(terms)})"
            f" AS c{i} FROM dp{i - 1})"
        )
    return ",\n".join(parts)


def _uni_backtrack_sql() -> str:
    parts = []
    for k in range(1, _UNI_MAX_WLEN + 1):
        parts.append(
            f"bta{k} AS MATERIALIZED (SELECT w, c, cs, core, pos, seg,\n"
            f"  CASE WHEN pos > 0 THEN list_extract(cs, CAST(pos AS INT))"
            f" % {_CHOICE}\n"
            f"       ELSE CAST(0 AS BIGINT) END AS li\n"
            f"  FROM bt{k - 1})"
        )
        parts.append(
            f"bt{k} AS MATERIALIZED (SELECT w, c, cs, core,"
            f" pos - li AS pos,\n"
            f"  CASE WHEN pos > 0 THEN"
            f" substring(w, CAST(pos - li + 1 AS INT), CAST(li AS INT))\n"
            f"    || (CASE WHEN seg = '' THEN '' ELSE ' ' END) || seg\n"
            f"  ELSE seg END AS seg\n"
            f"  FROM bta{k})"
        )
    return ",\n".join(parts)


def _q256_oracle() -> str:
    comps = ", ".join(f"c{i}" for i in range(1, _UNI_MAX_WLEN + 1))
    return (
        "WITH "
        + _UNI_VOCAB_CTES
        + f""",
pw AS (SELECT DISTINCT w, substring(w, i, l) AS piece
       FROM wt,
            unnest(generate_series(1, length(w))) t1(i),
            unnest(generate_series(1, {_UNI_MAX_PLEN})) t2(l)
       WHERE i + l - 1 <= length(w)),
pm AS MATERIALIZED (
  SELECT pw.w, map_from_entries(list({{k: pw.piece, v: vc.cost}})) AS m
  FROM pw JOIN vc USING (piece) GROUP BY pw.w),
dp0 AS MATERIALIZED (SELECT wt.w, wt.c, pm.m FROM wt JOIN pm USING (w)),
"""
        + _uni_dp_paths_sql()
        + f""",
fin AS MATERIALIZED (
  SELECT w, c, [{comps}] AS cs,
         CAST(list_extract([{comps}], length(w)) // {_CHOICE} AS BIGINT)
           AS core
  FROM dp{_UNI_MAX_WLEN}),
bt0 AS (SELECT w, c, cs, core, CAST(length(w) AS BIGINT) AS pos,
               '' AS seg
        FROM fin),
"""
        + _uni_backtrack_sql()
        + f"""
SELECT w AS word, c AS n_occurrences,
       CAST(core % {_UNI_SCALE} AS BIGINT) AS n_tokens,
       CAST(core // {_UNI_SCALE} AS BIGINT) AS cost_unats,
       seg AS segmentation
FROM bt{_UNI_MAX_WLEN} ORDER BY word"""
    )


@register(
    "q256_unigram_pieces",
    _q256_oracle(),
    "unigram segmentation pieces (round 11): the tokenizer's actual "
    "output — per distinct word the winning piece SEQUENCE, "
    "reconstructed by recording the argmin choice in the low bits of "
    "the DP value (comp = 8*(32*cost + n_tokens) + piece_len, min = "
    "lexicographic (cost, tokens, smallest piece)) and walking back "
    "from length(w) with an unrolled prepend loop; both engines build "
    "the string independently and it is hash-compared verbatim. Scale "
    "shape: identical to q252 — pure expressions over the DISTINCT-"
    "word relation, broadcast literal vocab, Generate barriers on the "
    "DP and the backtrack, zero windows, zero Python",
)
def q256(spark, sf_dir):
    from snowflake_cdc_spark.operators.unigram import viterbi_segment_paths

    wt, vc = _uni_vocab_df(spark, sf_dir)
    return (
        viterbi_segment_paths(wt, vc, _UNI_MAX_WLEN, _UNI_MAX_PLEN)
        .select(
            F.col("w").alias("word"),
            F.col("c").alias("n_occurrences"),
            F.expr(f"core % {_UNI_SCALE}").cast("bigint").alias("n_tokens"),
            F.expr(f"core div {_UNI_SCALE}").cast("bigint").alias(
                "cost_unats"
            ),
            "segmentation",
        )
        .orderBy("word")
    )


# --------------------------------------------------------------------------
# Q257 — unigram hard-EM re-estimation round
# --------------------------------------------------------------------------
#
# The training step that makes the unigram model a MODEL (Kudo 2018,
# hard-EM/Viterbi variant): segment the corpus with the q253 costs,
# count how often each vocabulary piece is actually USED along the
# winning paths (occurrence-weighted), and re-estimate costs from the
# usage distribution — pieces the segmenter never chooses fall out of
# the model (kept = false), the rest get cost1 = -ln(used/total_used)
# quantized once to micro-nats. One EM round; the output is the
# re-estimated model card: (piece, cnt0, cost0, used, kept, cost1).
#
# Scale shape: the corpus-sized work is the q256 path DP (distinct
# words) plus ONE piece-explode groupBy of the path strings; the
# usage table is a subset of the vocabulary (<= V + alphabet rows,
# parameter-bounded), so it is collected and the model card assembled
# as a literal — the costed_vocab discipline end-to-end.


def _q257_oracle() -> str:
    comps = ", ".join(f"c{i}" for i in range(1, _UNI_MAX_WLEN + 1))
    return (
        "WITH "
        + _UNI_VOCAB_CTES
        + f""",
pw AS (SELECT DISTINCT w, substring(w, i, l) AS piece
       FROM wt,
            unnest(generate_series(1, length(w))) t1(i),
            unnest(generate_series(1, {_UNI_MAX_PLEN})) t2(l)
       WHERE i + l - 1 <= length(w)),
pm AS MATERIALIZED (
  SELECT pw.w, map_from_entries(list({{k: pw.piece, v: vc.cost}})) AS m
  FROM pw JOIN vc USING (piece) GROUP BY pw.w),
dp0 AS MATERIALIZED (SELECT wt.w, wt.c, pm.m FROM wt JOIN pm USING (w)),
"""
        + _uni_dp_paths_sql()
        + f""",
fin AS MATERIALIZED (
  SELECT w, c, [{comps}] AS cs,
         CAST(list_extract([{comps}], length(w)) // {_CHOICE} AS BIGINT)
           AS core
  FROM dp{_UNI_MAX_WLEN}),
bt0 AS (SELECT w, c, cs, core, CAST(length(w) AS BIGINT) AS pos,
               '' AS seg
        FROM fin),
"""
        + _uni_backtrack_sql()
        + f""",
used AS MATERIALIZED (
  SELECT piece, CAST(sum(c) AS BIGINT) AS used
  FROM bt{_UNI_MAX_WLEN}, unnest(string_split(seg, ' ')) t(piece)
  GROUP BY 1),
tu AS (SELECT CAST(sum(used) AS BIGINT) AS total_used FROM used)
SELECT vc.piece,
       vc.cnt AS cnt0,
       vc.cost AS cost0,
       CAST(coalesce(used.used, 0) AS BIGINT) AS used,
       coalesce(used.used, 0) > 0 AS kept,
       CASE WHEN coalesce(used.used, 0) > 0
            THEN CAST(floor(ln(CAST(tu.total_used AS DOUBLE)
                                / CAST(used.used AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT)
       END AS cost1
FROM vc LEFT JOIN used USING (piece), tu
ORDER BY vc.piece"""
    )


@register(
    "q257_unigram_em_round",
    _q257_oracle(),
    "unigram hard-EM re-estimation round (round 11): segment the "
    "corpus with the q253 costs (the q256 path DP), count occurrence-"
    "weighted piece USAGE along the winning paths, and re-estimate — "
    "pieces the segmenter never chooses leave the model (kept=false), "
    "survivors get cost1 = -ln(used/total_used) in micro-nats; the "
    "Kudo 2018 Viterbi-EM training step as one oracle-backed pass. "
    "Scale shape: corpus work = the distinct-word path DP + ONE "
    "piece-explode groupBy; the usage table is vocabulary-bounded "
    "(parameter-fixed), collected, and the model card assembled as a "
    "literal — the costed_vocab discipline end-to-end",
)
def q257(spark, sf_dir):
    import math

    from snowflake_cdc_spark.operators.unigram import viterbi_segment_paths

    wt, vc = _uni_vocab_df(spark, sf_dir)
    paths = viterbi_segment_paths(wt, vc, _UNI_MAX_WLEN, _UNI_MAX_PLEN)
    used_rows = (
        paths.select(
            "c", F.explode(F.split("segmentation", " ")).alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("c").cast("bigint").alias("used"))
        .collect()
    )
    used = {r.piece: r.used for r in used_rows}
    total_used = sum(used.values())
    card = [
        (
            r.piece,
            r.cnt,
            r.cost,
            used.get(r.piece, 0),
            used.get(r.piece, 0) > 0,
            (
                int(
                    math.floor(
                        math.log(total_used / used[r.piece]) * 1000000.0
                        + 0.5
                    )
                )
                if r.piece in used
                else None
            ),
        )
        for r in sorted(vc.collect(), key=lambda r: r.piece)
    ]
    return spark.createDataFrame(
        card,
        "piece string, cnt0 bigint, cost0 bigint, used bigint,"
        " kept boolean, cost1 bigint",
    )
