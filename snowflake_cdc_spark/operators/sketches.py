"""Deterministic count-min sketch (Cormode & Muthukrishnan 2005) —
mergeable frequency summaries whose answers are HASH-CHECKABLE, not
just bounded.

The engine's other approximate lanes (HLL q49, IVF q52, GK-percentile
q127, PQ q133) are nondeterministic-by-engine sketches and therefore
declared as bounded-error checks. A count-min sketch has no such
excuse: its only randomness is the hash family, so building it from
md5 (the engine-portable hash used by every dedup/sampling operator
here) makes the ENTIRE sketch — counters, estimates, heavy-hitter
set — bit-identical on any engine that can compute md5. The q134
oracle re-derives the full sketch in SQL and must hash-match.

Shape: ``d`` rows × 256 buckets; hash_i(key) = first two hex chars of
``md5(i || ':' || key)`` (a STRING bucket id — no numeric base
conversion needed on either engine). Standard CM guarantees hold:
``est >= true`` always; ``est <= true + eps*N`` w.h.p. across the d
rows.

Scale: the exploded build relation is ``d × |input|`` one-hot rows but
the aggregation is map-side-combined into at most ``d × 256`` counters
per partition — the sketch that crosses the shuffle is KBs regardless
of input size, and sketches of partitions/batches merge by addition
(the streaming story: one sketch per micro-batch, summed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(i: int, key) -> "F.Column":
    return F.substring(
        F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 2
    )


def countmin_sketch(df: DataFrame, key_col: str, d: int = 4) -> DataFrame:
    """Build the sketch: (i, b, cnt) with at most d×256 rows."""
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("i"), _bucket(i, F.col(key_col)).alias("b"))
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.i", "p.b")
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = 4
) -> DataFrame:
    """Point-estimate each key: min over the d rows of its bucket
    counter. ``keys`` may carry extra columns (they survive). The sketch
    is tiny — broadcast, never shuffled with the keys."""
    out = keys
    for i in range(d):
        s_i = sketch.filter(F.col("i") == i).select(
            F.col("b").alias(f"__b{i}"), F.col("cnt").alias(f"__c{i}")
        )
        out = out.withColumn(f"__b{i}", _bucket(i, F.col(key_col))).join(
            F.broadcast(s_i), f"__b{i}", "left"
        )
    est = F.least(*[F.coalesce(F.col(f"__c{i}"), F.lit(0)) for i in range(d)])
    return out.withColumn("est_cnt", est).drop(
        *[c for i in range(d) for c in (f"__b{i}", f"__c{i}")]
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002.
# Same portability property as count-min above: the "randomness" is md5,
# so registers, estimates, and merges are bit-identical on any engine.
# u_k is built from the first 13 hex chars (52 bits — an EXACT double:
# numerator < 2^52, denominator 16^13 = 2^52), so the estimate
# (k-1)/u_k is one correctly-rounded division of exact values — no
# accumulation order anywhere. Merge = union of hash sets, re-take the
# k smallest. Groups with fewer than k distinct keys degenerate to the
# exact distinct count (the sketch IS the value set).
# ---------------------------------------------------------------------------

_KMV_DENOM = float(16**13)  # 2^52


def kmv_sketch(
    df: DataFrame, key_col: str, group_col: str, k: int = 32
) -> DataFrame:
    """(group, h, rk): the k lexicographically-smallest distinct md5
    hashes per group. The distinct + window shuffle carries (group, 32B
    hash), never the payload."""
    from pyspark.sql import Window

    hashed = df.select(
        F.col(group_col), F.md5(F.col(key_col).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        hashed.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    )


def kmv_estimate(sketch: DataFrame, group_col: str, k: int = 32) -> DataFrame:
    """(group, kmv_est): (k-1)/u_k per group, or the exact count when the
    group holds fewer than k distinct values."""
    num = F.conv(F.substring(F.col("h"), 1, 13), 16, 10).cast("bigint")
    agg = sketch.groupBy(group_col).agg(
        F.max("rk").alias("__n_h"),
        F.max(F.when(F.col("rk") == k, num)).alias("__num"),
    )
    est = F.when(F.col("__n_h") < k, F.col("__n_h").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("__num").cast("double") / F.lit(_KMV_DENOM))
    )
    return agg.select(group_col, est.alias("kmv_est"))


def kmv_rolling_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_days: int = 7,
    k: int = 64,
) -> DataFrame:
    """Rolling ``window_days``-day distinct-count estimates from merged
    day-level KMV sketches — the workload that makes mergeable sketches
    earn their keep: exact rolling distinct is NON-additive (each day's
    window must re-scan ``window_days`` of raw data), while KMV reduces
    the corpus ONCE to <= k hashes per day and every window is a union
    of those sketch rows + re-take-k (tiny by construction:
    days x k x window rows).

    Output: (day_num, kmv_est) — day_num = days since 1970-01-01,
    windows ending on each observed day. Deterministic: md5 hashes,
    lexicographic top-k, exact dyadic u_k (see ``kmv_estimate``)."""
    from pyspark.sql import Window

    day = F.datediff(
        F.to_date(F.date_trunc("day", F.col(ts_col))),
        F.to_date(F.lit("1970-01-01")),
    )
    hashed = df.select(
        day.alias("day"), F.md5(F.col(key_col).cast("string")).alias("h")
    ).distinct()
    # day-level sketch: k smallest distinct hashes per day
    w_day = Window.partitionBy("day").orderBy("h")
    day_sketch = (
        hashed.withColumn("rk", F.row_number().over(w_day))
        .filter(F.col("rk") <= k)
        .select("day", "h")
    )
    # each sketch row contributes to the windows ending on day..day+w-1;
    # keep only windows ending on an observed day
    days = hashed.select("day").distinct()
    contrib = (
        day_sketch.withColumn(
            "end_day", F.explode(F.sequence(F.col("day"), F.col("day") + (window_days - 1)))
        )
        .join(days.withColumnRenamed("day", "end_day"), "end_day", "left_semi")
        .select("end_day", "h")
        .distinct()  # same hash may appear in several days of one window
    )
    w_end = Window.partitionBy("end_day").orderBy("h")
    merged = (
        contrib.withColumn("rk", F.row_number().over(w_end)).filter(F.col("rk") <= k)
    )
    est = kmv_estimate(merged.withColumnRenamed("end_day", "day"), "day", k=k)
    return est.select(F.col("day").alias("day_num"), "kmv_est")


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog (round 4) — the third mergeable sketch, and the
# one the engine-internal approx_count_distinct (q49) can only bound: built
# from md5, EVERY register and the estimate itself are engine-portable.
# ---------------------------------------------------------------------------


def hll_sketch(df: DataFrame, key_col: str, b: int = 8) -> DataFrame:
    """Build the register table: (bucket, reg) with at most 2^b rows —
    bucket = first two md5 hex chars (b=8 -> 256 buckets), reg = max
    rho over the bucket's keys. Mergeable by per-bucket MAX (the HLL
    union law), map-side-combined like the count-min build."""
    if b != 8:
        raise ValueError("string-bucket form is fixed at b=8 (2 hex chars)")
    h = F.md5(F.col(key_col).cast("string"))
    src = df.select(
        F.substring(h, 1, 2).alias("bucket"),
        F.substring(h, 3, 13).alias("__s"),
    ).withColumn("__t", F.expr("trim(LEADING '0' FROM __s)"))
    c1 = F.substring(F.col("__t"), 1, 1)
    nib = (
        F.when(c1 == "1", 3)
        .when(c1.isin("2", "3"), 2)
        .when(c1.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(F.length("__t") == 0, F.lit(53)).otherwise(
        4 * (13 - F.length("__t")) + nib + 1
    )
    return (
        src.withColumn("rho", rho.cast("int"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(registers: DataFrame, b: int = 8) -> DataFrame:
    """One-row (hll_estimate): the standard HLL-with-linear-counting
    estimator, deterministically. Every 2^-reg term is an exact dyadic
    (1 / (1 << reg)) whose partial sums stay exactly representable, so
    the harmonic sum is order-independent; absent buckets contribute
    2^0 = 1 each; the small-range branch uses the tolerated ``ln``.
    The final value is round_half_up'd for the cross-engine hash."""
    from snowflake_cdc_spark.functions.vectors import round_half_up

    m = 1 << b
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    agg = registers.agg(
        # python-API shiftleft requires a literal shift; the SQL form
        # takes a column
        F.sum(
            F.lit(1.0)
            / F.expr("cast(shiftleft(cast(1 as bigint), reg) as double)")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    v = F.lit(m) - F.col("n_present")  # zero-register buckets
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / (
        F.col("s_present") + v.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5) * F.lit(float(m))) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(round_half_up(est, 4).alias("hll_estimate"))


def kmv_intersection_estimate(a: DataFrame, b: DataFrame, k: int = 32) -> DataFrame:
    """Theta-style INTERSECTION estimate from two single-set KMV
    sketches (the set-algebra half that makes KMV a poor-man's theta
    sketch; union = merge + re-take-k already exists): θ = u_k of the
    UNION sketch, estimate = |{h : h in A-sketch ∧ h in B-sketch ∧
    h < θ}| / θ. Every ingredient is the q135 machinery — md5 hashes,
    lexicographic order (≡ numeric at fixed width), exact 52-bit dyadic
    θ — so the estimate itself is engine-portable. When the union holds
    fewer than k distinct hashes the sketches are lossless and the
    exact sketch-intersection count is returned.

    Inputs are ``kmv_sketch`` outputs for single sets (any group_col
    value): only their ``h`` columns are read."""
    from pyspark.sql import Window

    u = a.select("h").unionByName(b.select("h")).distinct()
    w = Window.orderBy("h")
    ranked = u.withColumn("rk", F.row_number().over(w))
    th = ranked.agg(
        F.count(F.lit(1)).alias("__n_u"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("__th"),
    )
    common = a.select("h").distinct().join(b.select("h").distinct(), "h")
    num = F.conv(F.substring(F.col("__th"), 1, 13), 16, 10).cast("bigint")
    agg = common.crossJoin(F.broadcast(th)).agg(
        F.sum(
            F.when(
                F.col("__th").isNull() | (F.col("h") < F.col("__th")), 1
            ).otherwise(0)
        ).cast("bigint").alias("__c"),
        F.max(F.col("__n_u")).alias("__n_u"),
        F.max(num).alias("__num"),
    )
    est = F.when(
        F.col("__n_u") < k, F.col("__c").cast("double")
    ).otherwise(
        F.col("__c").cast("double") / (F.col("__num").cast("double") / F.lit(_KMV_DENOM))
    )
    return agg.select(F.coalesce(est, F.lit(0.0)).alias("kmv_inter_est"))
