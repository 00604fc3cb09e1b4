"""Exact equi-depth histogram without a global sort.

Equi-depth (equal-frequency) buckets are the optimizer/statistics
workhorse (DB2/Postgres-style column stats; selectivity estimation).
The naive form is ``ntile(k) OVER (ORDER BY value)`` — one global sort,
a single-partition serial region at 100 TB (the q120 anti-pattern, now
on a value column instead of a shuffle key).

Sort-free exact construction (same composition as
``operators/shuffle.py``, but range-partitioned by VALUE):

1. coarse range bucket = ``floor((value - min) / (max - min) * B)``
   (min/max from a 1-row broadcast aggregate) — a deterministic,
   monotone function of the value, so every row in range-bucket b sorts
   strictly at-or-before every row in b+1, and EQUAL values always land
   in the same bucket (ties can't straddle a boundary);
2. intra-bucket ``row_number`` by ``(value, id)`` — the only sorted
   region is one range bucket;
3. bucket counts → running-sum offsets (B rows, broadcast); global
   rank = offset + intra rank — IDENTICAL to the single-sort rank;
4. the equi-depth bucket comes from the rank by integer arithmetic
   (first ``n mod k`` buckets hold ``n div k + 1`` rows — the standard
   ntile fill), so the result is bit-identical to the sorted form and
   to any engine computing the same formula (q140's oracle does the
   single-sort + same formula — an independent algorithm).

Value skew caveat (documented, not hidden): the coarse buckets are
equal-WIDTH, so a pathological value distribution concentrates rows in
few range buckets and re-grows the sorted region; production stats
engines iterate (split hot range buckets) — at the fixture's scale one
level suffices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ntile_fill_sql(rn: str, n: str, k: int) -> str:
    """The oracle-side ntile-fill bucket CASE, text-shared across every
    lane that mirrors ``equidepth_assign`` in SQL (q140/q187/q233/q236/
    q238) — the ADVICE r08 q233 finding was exactly a hand-copied
    variant of this expression drifting from the engine formula; one
    generator keeps the two representations in one place. ``rn`` = the
    1-based rank expression, ``n`` = the total-count expression."""
    return (
        f"CASE WHEN {rn} <= ({n} % {k}) * ({n} // {k} + 1)\n"
        f"                  THEN ({rn} - 1) // ({n} // {k} + 1) + 1\n"
        f"                  ELSE ({n} % {k})\n"
        f"                       + ({rn} - ({n} % {k}) * ({n} // {k} + 1) - 1)\n"
        f"                         // ({n} // {k}) + 1\n"
        f"             END"
    )


def equidepth_assign(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 10,
    range_buckets: int = 64,
) -> DataFrame:
    """Per-ROW equi-depth bucket assignment (``id``, ``value_col``,
    ``bucket`` 1..k) by the sort-free composition in the module
    docstring — the building block shared by the histogram aggregate
    (q140) and per-row binning consumers (WOE feature binning, q187),
    where the row->bucket mapping itself is the deliverable."""
    src = df.filter(F.col(value_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(value_col).alias("__v")
    )
    ext = src.agg(
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
    )
    span = F.col("__hi") - F.col("__lo")
    rb = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(range_buckets - 1),
            F.floor((F.col("__v") - F.col("__lo")) / span * range_buckets),
        )
    )
    keyed = src.crossJoin(F.broadcast(ext)).withColumn("__rb", rb)
    w_intra = Window.partitionBy("__rb").orderBy("__v", "__id")
    ranked = keyed.withColumn("__intra", F.row_number().over(w_intra))
    counts = keyed.groupBy("__rb").agg(F.count(F.lit(1)).alias("__cnt"))
    offsets = counts.select(
        "__rb",
        (F.sum("__cnt").over(Window.orderBy("__rb")) - F.col("__cnt")).alias("__off"),
    )
    # standard ntile fill: first (n mod k) buckets hold (n div k) + 1 rows.
    # Pure integer arithmetic (div, %) — written identically in the
    # oracle; the n < k degenerate case falls entirely into the WHEN
    # branch (m*(q+1) = n), so the q=0 division is never reached.
    bucket = F.expr(
        f"CASE WHEN __rn <= (__n % {k}) * (__n div {k} + 1) "
        f"THEN (__rn - 1) div (__n div {k} + 1) + 1 "
        f"ELSE (__n % {k}) + (__rn - (__n % {k}) * (__n div {k} + 1) - 1) div (__n div {k}) + 1 END"
    )
    return (
        ranked.join(F.broadcast(offsets), "__rb")
        .withColumn("__rn", F.col("__off") + F.col("__intra"))
        .select(
            F.col("__id").alias(id_col),
            F.col("__v").alias(value_col),
            bucket.cast("bigint").alias("bucket"),
        )
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 10,
    range_buckets: int = 64,
) -> DataFrame:
    """(bucket 1..k, n, lo, hi) equal-frequency buckets of ``value_col``
    (NULLs excluded), ties broken by ``id_col``."""
    return (
        equidepth_assign(df, value_col, id_col, k, range_buckets)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
        .orderBy("bucket")
    )
