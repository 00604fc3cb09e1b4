"""Deterministic hash-based sampling.

``df.sample()`` is seed-dependent *per partitioning* — the same fraction
over the same data yields different rows if the file layout changes,
which makes results unreproducible across runs, engines, and cluster
sizes. For training-data pipelines (held-out splits, eval carve-outs,
down-sampling a 100 TB corpus) the sample must be a pure function of the
row key: every engine, every run, every repartitioning selects the same
rows, and membership can be re-derived later ("which split was this doc
in?").

The selector is an md5 prefix compare: keep a row iff the first 4 hex
chars of ``md5(cast(key as string))`` fall below ``fraction * 16^4``.
md5 is identical everywhere (Spark, DuckDB, Python), the predicate is a
scan-level filter (no shuffle, pushes through joins), and granularity is
1/65536. The same mechanism stratifies per group by salting the key with
the stratum name.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket_threshold", "hash_sample", "stratified_hash_sample"]


def hash_bucket_threshold(fraction: float) -> str:
    """Lowercase 4-hex-char threshold selecting ~``fraction`` of keys."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * 65536), 65535), "04x")


def _selector(key: Column, fraction: float) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, 4) < F.lit(
        hash_bucket_threshold(fraction)
    )


def hash_sample(df: DataFrame, key: str | Column, fraction: float) -> DataFrame:
    """Keep the deterministic ~``fraction`` subset of rows keyed by ``key``.

    Rows with equal keys are kept or dropped together (sampling is by
    key, not by row) — sampling ``lineitem`` on ``l_orderkey`` keeps
    whole orders.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    return df.filter(_selector(key_col, fraction))


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` without the seed
    lottery): each stratum gets its own md5 threshold, the key is salted
    with the stratum so the same key draws independently per stratum.

    The training-data shape this serves: rebalancing a corpus by
    language/source — "keep 5% of English, 100% of Maltese" — where the
    selection must stay reproducible across engines and re-partitions.
    Still a pure scan filter: no shuffle, no sampleBy seed dependence.
    """
    hash_col = F.substring(
        F.md5(F.concat_ws("\x1f", F.col(strata_col), F.col(key).cast("string"))),
        1,
        4,
    )
    thr = None
    for stratum, frac in fractions.items():
        t = F.lit(hash_bucket_threshold(frac))
        thr = F.when(F.col(strata_col) == stratum, t) if thr is None else thr.when(
            F.col(strata_col) == stratum, t
        )
    thr = (
        thr.otherwise(F.lit(hash_bucket_threshold(default_fraction)))
        if thr is not None
        else F.lit(hash_bucket_threshold(default_fraction))
    )
    return df.filter(hash_col < thr)


def weighted_sample_aes(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis-Spirakis A-ES
    (2006): each row draws a deterministic uniform u from md5(id) and is
    ranked by ``ln(u) / w`` (the log-monotone form of ``u^(1/w)``); the
    top-k ranks ARE a weighted sample without replacement. One scan +
    a TakeOrdered top-k — no global sort shuffle, no seed lottery:
    every engine, run, and partitioning picks the same k rows.

    Cross-engine exactness (the q124/q135 discipline): u is the exact
    dyadic ``(md5_52bit + 1) / 2^52`` in (0, 1], ``ln`` is the one
    tolerated libm call, and both engines evaluate the identical
    expression on identical inputs — bit-identical ranks, so the top-k
    set and its order hash-match. Zero/negative weights are excluded
    (their limit rank is -inf: never sampled)."""
    num = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    u = (num + F.lit(1)).cast("double") / F.lit(float(2**52))
    r = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__r", r)
        .orderBy(F.desc("__r"), id_col)
        .limit(k)
        .drop("__r")
    )
