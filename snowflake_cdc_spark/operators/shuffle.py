"""Deterministic global shuffle (training-data lane, round 3).

Pre-training pipelines shuffle the corpus once, reproducibly, before
sequence packing — a random-but-fixed total order keyed by a seed. The
naive form is ``row_number() OVER (ORDER BY md5(seed || id))``: one
global sort, one serial region, the classic 100 TB anti-pattern.

This operator produces the IDENTICAL total rank with no global-order
region:

1. bucket = the md5 key's leading 16 bits scaled to ``n_buckets`` —
   a RANGE partition of the key space, so every key in bucket b sorts
   strictly before every key in bucket b+1 (fixed-width hex prefixes
   order lexicographically like the full key);
2. intra-bucket rank: ``row_number`` partitioned BY BUCKET — the only
   sorted region is one bucket (corpus/n_buckets rows, tuned to the
   cluster);
3. bucket offsets: counts per bucket (n_buckets rows — tiny), running
   sum, broadcast back; global rank = offset + intra rank.

Deterministic for a given (seed, n_buckets)... and independent OF
n_buckets: the bucket boundaries only split the already-ordered key
space, so the composed rank equals the naive global sort's rank for any
bucket count — which is exactly how the DuckDB oracle checks it (q120
computes the naive form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["shuffle_key", "deterministic_shuffle"]


def shuffle_key(id_col: Column | str, seed: int | str) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string")))


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int | str = 42,
    n_buckets: int = 64,
) -> DataFrame:
    """Append ``shuffle_rank`` (1-based, dense over the input) — the
    row's position in the seeded pseudo-random total order."""
    key = shuffle_key(id_col, seed)
    # leading 16 bits of the key, scaled: a range partition of hex-string
    # order (NOT a modulo — modulo would interleave buckets across the
    # key range and break cross-bucket ordering)
    bucket = F.floor(
        F.conv(F.substring(key, 1, 4), 16, 10).cast("long") * n_buckets / 65536
    ).alias("__bucket")
    keyed = df.select(F.col(id_col), key.alias("__key"), bucket)
    w_intra = Window.partitionBy("__bucket").orderBy("__key", id_col)
    ranked = keyed.withColumn("__intra", F.row_number().over(w_intra))
    # n_buckets rows — the single-partition window over it is driver-tiny
    counts = keyed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.select(
        "__bucket",
        (F.sum("__n").over(Window.orderBy("__bucket")) - F.col("__n")).alias("__off"),
    )
    return (
        ranked.join(F.broadcast(offsets), "__bucket")
        .select(
            id_col, (F.col("__off") + F.col("__intra")).alias("shuffle_rank")
        )
    )
