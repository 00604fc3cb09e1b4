"""Corpus-governance operators: per-group document caps.

Web-scale training corpora cap how many documents any one domain may
contribute (a handful of boilerplate-heavy domains otherwise dominate
the token budget). Semantics here: **keep the ``cap`` documents with
the smallest ``md5(id)`` per group** — a deterministic, layout- and
partitioning-invariant uniform choice (same selector family as
``operators/sampling.py``), so any engine can reproduce the exact
survivor set.

Scale design: the naive form is one window (``row_number`` over
``partition by group order by md5``), which hash-shuffles the corpus
once and then SORTS each group. At 100 TB a mega-domain (the normal
case: one crawler-friendly host with 10^9 pages) turns that per-group
sort into the bottleneck, and a window cannot be skew-split by AQE.
``cap_per_group`` therefore pre-filters with a per-group hash
threshold: group counts (tiny aggregate, broadcast) give
``frac = margin * cap / n_g``; only rows whose md5-derived uniform
falls below ``frac`` enter the window, bounding every group's sorted
set to ~``margin * cap`` rows w.h.p. A deterministic fallback re-runs
the plain window for any group the prefilter left with fewer than
``min(cap, n_g)`` survivors (binomially negligible at ``margin >= 4``,
but exactness must not rest on "w.h.p."), so the result is always
EXACTLY the naive semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# md5-prefix uniform in [0, 1): first 8 hex chars as an integer / 16^8.
_HEX_DENOM = float(16**8)


def _md5_key(id_col: str):
    return F.md5(F.col(id_col).cast("string"))


def _md5_uniform(id_col: str):
    return F.conv(F.substring(_md5_key(id_col), 1, 8), 16, 10).cast("double") / F.lit(
        _HEX_DENOM
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    prefilter: bool = True,
    margin: float = 4.0,
) -> DataFrame:
    """Keep the ``cap`` rows with the smallest ``(md5(id), id)`` per
    group. Returns the input columns plus ``rn`` (1-based rank within
    the group). Exact regardless of ``prefilter`` — the prefilter only
    bounds the windowed set, with a per-group fallback when it
    under-delivers."""
    w = Window.partitionBy(group_col).orderBy(_md5_key(id_col), id_col)
    ranked = lambda d: d.withColumn("rn", F.row_number().over(w))  # noqa: E731

    if not prefilter:
        return ranked(df).filter(F.col("rn") <= cap)

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n_g"))
    frac = F.least(F.lit(1.0), F.lit(margin * cap) / F.col("_n_g").cast("double"))
    with_frac = df.join(F.broadcast(counts), group_col).withColumn("_frac", frac)
    survivors = with_frac.filter(_md5_uniform(id_col) < F.col("_frac"))
    capped = ranked(survivors).filter(F.col("rn") <= cap)

    # Exactness guard: a group is short iff the prefilter kept fewer
    # than min(cap, n_g) rows (counts is the base so a group whose
    # prefilter kept ZERO rows is still caught). Short groups
    # (approximately never, by binomial concentration at margin>=4)
    # re-run the plain window. Proof of sufficiency: if >= min(cap,n_g)
    # rows pass the prefix threshold, every row of the true md5-top-cap
    # is among them — a top-cap row above the threshold would imply
    # >= min(cap,n_g) rows with strictly smaller full md5, a
    # contradiction.
    kept_counts = capped.groupBy(group_col).agg(F.count(F.lit(1)).alias("_kept"))
    short = (
        counts.join(kept_counts, group_col, "left")
        .filter(
            F.coalesce(F.col("_kept"), F.lit(0))
            < F.least(F.lit(cap), F.col("_n_g"))
        )
        .select(group_col)
    )
    ok = capped.join(F.broadcast(short), group_col, "left_anti")
    redo = ranked(df.join(F.broadcast(short), group_col, "left_semi")).filter(
        F.col("rn") <= cap
    )
    out_cols = df.columns + ["rn"]
    return ok.select(*out_cols).unionByName(redo.select(*out_cols))
