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
