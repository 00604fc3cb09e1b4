"""Property-based verification (hypothesis) of the round-4 sweep-line
and funnel operators against pure-Python brute-force references — the
test-strategy discipline of test_property_ivm/scd/upsert applied to the
new lanes: the distributed decomposition must agree with the obvious
O(n²)/stateful reference for ANY generated input."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from snowflake_cdc_spark.operators.funnel import funnel_counts
from snowflake_cdc_spark.operators.sweepline import peak_concurrency_by_bucket

BASE = datetime(2024, 1, 1)


@st.composite
def intervals(draw):
    n = draw(st.integers(1, 25))
    out = []
    for _ in range(n):
        start = draw(st.integers(0, 5 * 60 - 1))  # minutes over 5 hours
        dur = draw(st.integers(1, 90))
        out.append((start, start + dur))
    return out


def _brute_peaks(iv):
    """hour -> (n_starts, peak) by evaluating concurrency at every
    boundary instant (the O(n²) definitional form, half-open)."""
    hours = {}
    for s, e in iv:
        hours.setdefault(s // 60, [0, 0])[0] += 1
    for h in set(list(hours) + [e // 60 for _, e in iv]):
        peak = 0
        boundaries = sorted(
            {t for s, e in iv for t in (s, e) if h * 60 <= t < (h + 1) * 60}
        )
        for t in boundaries:
            c = sum(1 for s, e in iv if s <= t < e)
            peak = max(peak, c)
        if boundaries:
            hours.setdefault(h, [0, 0])[1] = peak
    return {h: (v[0], v[1]) for h, v in hours.items() if v != [0, 0]}


class TestSweepLineProperty:
    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(iv=intervals())
    def test_matches_bruteforce_peaks(self, spark, iv):
        df = spark.createDataFrame(
            [
                (BASE + timedelta(minutes=s), BASE + timedelta(minutes=e))
                for s, e in iv
            ],
            "start_ts timestamp, end_ts timestamp",
        )
        got = {
            int((r.bucket_ts - BASE).total_seconds() // 3600): (r.n_starts, r.peak)
            for r in peak_concurrency_by_bucket(df).collect()
        }
        want = _brute_peaks(iv)
        # the operator emits rows only for hours containing boundaries;
        # compare on the union of keys where either side has a nonzero peak
        for h in set(got) | set(want):
            g = got.get(h, (0, 0))
            w = want.get(h, (0, 0))
            assert g[0] == w[0], (h, got, want, iv)
            if w[1]:
                assert g[1] == w[1], (h, got, want, iv)


@st.composite
def event_logs(draw):
    n = draw(st.integers(1, 30))
    return [
        (
            draw(st.integers(1, 4)),  # user
            draw(st.integers(0, 120)),  # minute
            draw(st.sampled_from(["a", "b", "c", "x"])),
        )
        for _ in range(n)
    ]


def _brute_funnel(rows, steps, within_min=None):
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, m, t in rows:
        by_user[u].append((m, t))
    counts = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        bound = [None] * len(steps)
        for m, t in evs:
            for i, s in enumerate(steps):
                if bound[i] is not None or t != s:
                    continue
                if i == 0:
                    bound[0] = m
                elif bound[i - 1] is not None and m > bound[i - 1] and (
                    within_min is None or m <= bound[i - 1] + within_min
                ):
                    bound[i] = m
                break  # an event binds at most one step
        for i, b in enumerate(bound):
            if b is not None:
                counts[i] += 1
    return counts


class TestFunnelProperty:
    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(rows=event_logs(), windowed=st.booleans())
    def test_matches_bruteforce_reference(self, spark, rows, windowed):
        df = spark.createDataFrame(
            [(u, BASE + timedelta(minutes=m), t) for u, m, t in rows],
            "user_id long, ts timestamp, event_type string",
        )
        steps = ["a", "b", "c"]
        kw = {"within": "30 minutes"} if windowed else {}
        got = [
            r.n_users
            for r in funnel_counts(df, steps, **kw).orderBy("step").collect()
        ]
        want = _brute_funnel(rows, steps, 30 if windowed else None)
        assert got == want, (rows, windowed)
