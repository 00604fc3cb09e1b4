"""Z-order (Morton-curve) write layout for multi-dimensional data skipping.

Partition pruning (sources/raw_zone.py) skips on ONE directory key; within
files, parquet min/max row-group stats prune on whatever the data happens
to be sorted by. A linear sort gives tight file ranges on the leading
column only — a filter on any other column still touches every file.
Z-ordering sorts by the interleaved bits of several columns at once, so
every file covers a small hyper-rectangle and min/max skipping works on
EACH of the z-columns independently (the Delta/Iceberg OPTIMIZE ZORDER
posture, built here from plain column expressions).

At 100 TB this is the difference between "point lookup on user_id touches
0.1% of files" and "touches all of them" on a table laid out for
time-range queries.

Everything is JVM-side codegen'd arithmetic: per column, rank-normalize
to ``bits``-bit unsigned ints (range scaling between the observed
min/max), then OR together the bit-interleave ``bit b of col i -> z bit
b*ncols + i``. The sort is one ``repartitionByRange(z) +
sortWithinPartitions(z)`` — a single range-exchange shuffle at write
time, amortized over every subsequent scan (same trade as bucketing,
operators/bucketing.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Range-normalize ``col`` to [0, 2^bits) as a long; constant columns
    (cmax == cmin) map to 0."""
    top = (1 << bits) - 1
    span = cmax.cast("double") - cmin.cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(F.floor(frac * (top + 1)).cast("long"), F.lit(top))


def z_value(scaled: list[Column], bits: int) -> Column:
    """Morton interleave of already-scaled ``bits``-bit longs: z bit
    ``b*n + i`` = bit ``b`` of column ``i``. O(bits × n) shift/mask ops,
    all inside whole-stage codegen."""
    n = len(scaled)
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
        for i, c in enumerate(scaled)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def with_z_value(
    df: DataFrame, cols: list[str], bits: int = 12, z_col: str = "__z"
) -> DataFrame:
    """Append the z-value column. Column min/max are computed in one
    aggregate pass and folded in as literals (two scans total — the same
    cost shape as a global sort, which also pre-scans for range bounds)."""
    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        _scaled(
            F.col(c),
            F.lit(stats[f"min_{c}"]),
            F.lit(stats[f"max_{c}"]),
            bits,
        )
        for c in cols
    ]
    return df.withColumn(z_col, z_value(scaled, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the Morton curve of
    ``cols``: range-partition on the z-value (contiguous curve segments
    per file), sort within partitions, drop the helper column."""
    zdf = with_z_value(df, cols, bits)
    parts = zdf.repartitionByRange(*( [num_files] if num_files else [] ), F.col("__z"))
    parts.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(path)


def file_stat_ranges(spark, path: str, cols: list[str]) -> list[dict[str, float]]:
    """Per-file normalized [min,max] coverage of each column, from parquet
    footer statistics (no data read). Coverage ≈ 1.0 on a column means a
    filter on it can never skip that file; the z-ordered layout drives
    every column's average toward 1/sqrt-family fractions."""
    import pyarrow.parquet as pq
    import os

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    glo: dict[str, list[float]] = {c: [float("inf"), float("-inf")] for c in cols}
    per_file: list[dict[str, list[float]]] = []
    for fp in files:
        meta = pq.ParquetFile(fp).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        mm: dict[str, list[float]] = {}
        for c in cols:
            lo, hi = float("inf"), float("-inf")
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx[c]).statistics
                lo = min(lo, float(st.min))
                hi = max(hi, float(st.max))
            mm[c] = [lo, hi]
            glo[c][0] = min(glo[c][0], lo)
            glo[c][1] = max(glo[c][1], hi)
        per_file.append(mm)
    out = []
    for mm in per_file:
        cov = {}
        for c in cols:
            span = glo[c][1] - glo[c][0]
            cov[c] = ((mm[c][1] - mm[c][0]) / span) if span > 0 else 0.0
        out.append(cov)
    return out
