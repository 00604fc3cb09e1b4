"""Funnel analysis — ordered-sequence conversion counting (the product
-analytics staple: how many users did step1, then step2 AFTER it, then
step3 after that…).

Scale shape: ONE shuffle total. Events are filtered to the funnel's
step types at the scan, grouped once per user, time-sorted per user
(bounded: a user's own events), and the step times fall out of a single
``F.aggregate`` fold over the sorted array — an expression, not a UDF,
and not the k-fold join-chain (k shuffles + k scans) the naive form
runs. The fold's accumulator holds one timestamp per step: step i+1
fills only when step i is filled and the event is STRICTLY later — the
same semantics as the independent join-chain the DuckDB oracle runs
(t_{i+1} = min ts of step-(i+1) events with ts > t_i), asserted
equivalent by the hash check.

Determinism: only counts leave the operator; timestamps compare at
microsecond resolution on both engines (ns→us truncation in
``sources/io.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """(step, step_name, n_users): users whose event history contains
    the steps in strict temporal order (step i+1 strictly after step i;
    each step matched to its EARLIEST qualifying event).

    ``within``: optional per-transition conversion window (an INTERVAL
    string, e.g. ``"30 minutes"``) — step i+1 must land strictly after
    step i AND no later than step i's time + window. Real funnels are
    windowed: a purchase a month after the click is not a conversion.
    Semantics are ANCHORED: each step binds to the earliest event
    qualifying relative to the already-bound previous step; an expired
    window does not re-anchor to a later step-1 event (the same
    anchored chain the min-ts join oracle computes, so the two stay
    equivalent)."""
    k = len(steps)
    per_user = (
        events.filter(F.col(type_col).isin(steps))
        .groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(ts_col).alias("t"),
                                        F.col(type_col).alias("y")))
            ).alias("evs")
        )
    )

    def fold(acc, e):
        # acc: struct(t0..t{k-1}); fill the first unfilled step whose
        # predecessor is filled and strictly earlier than this event
        fields = []
        for i, s in enumerate(steps):
            cur = acc[f"t{i}"]
            ok = e["y"] == F.lit(s)
            if i > 0:
                ok = ok & acc[f"t{i-1}"].isNotNull() & (e["t"] > acc[f"t{i-1}"])
                if within is not None:
                    ok = ok & (
                        e["t"] <= acc[f"t{i-1}"] + F.expr(f"INTERVAL {within}")
                    )
            fields.append(
                F.coalesce(cur, F.when(ok, e["t"])).alias(f"t{i}")
            )
        return F.struct(*fields)

    ts_type = dict(events.dtypes)[ts_col]  # match the source's ts type
    init = F.struct(
        *[F.lit(None).cast(ts_type).alias(f"t{i}") for i in range(k)]
    )
    reached = per_user.select(F.aggregate("evs", init, fold).alias("r"))
    counts = reached.agg(
        *[
            # coalesce: F.sum over the EMPTY per-user relation (no event
            # matched any step) is NULL; the count of converting users is 0
            F.coalesce(
                F.sum(F.col(f"r.t{i}").isNotNull().cast("long")), F.lit(0)
            )
            .cast("bigint")
            .alias(f"n{i}")
            for i in range(k)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("r")).select("r.*").orderBy("step")
    )
