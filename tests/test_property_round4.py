"""Property-based verification (hypothesis) of the round-4 sweep-line
and funnel operators against pure-Python brute-force references — the
test-strategy discipline of test_property_ivm/scd/upsert applied to the
new lanes: the distributed decomposition must agree with the obvious
O(n²)/stateful reference for ANY generated input."""

from __future__ import annotations

from datetime import datetime, timedelta

from conftest import prop_settings
from hypothesis import example, given, settings
from hypothesis import strategies as st

from snowflake_cdc_spark.operators.funnel import funnel_counts
from snowflake_cdc_spark.operators.sweepline import peak_concurrency_by_bucket

import pytest

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow

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
    """hour -> (n_starts, peak) by evaluating concurrency at the hour
    START and at every boundary instant within the hour (the O(n²)
    definitional form, half-open) — concurrency is piecewise constant,
    changing only at boundaries, so those instants cover the true
    per-hour maximum including sessions carried in from prior hours
    (ADVICE r05: a bucket whose first boundary is an end still peaks at
    its carry-in)."""
    hours = {}
    for s, e in iv:
        hours.setdefault(s // 60, [0, 0])[0] += 1
    for h in set(list(hours) + [e // 60 for _, e in iv]):
        boundaries = sorted(
            {t for s, e in iv for t in (s, e) if h * 60 <= t < (h + 1) * 60}
        )
        if boundaries:
            peak = max(
                sum(1 for s, e in iv if s <= t < e)
                for t in [h * 60] + boundaries
            )
            hours.setdefault(h, [0, 0])[1] = peak
    return {h: (v[0], v[1]) for h, v in hours.items() if v != [0, 0]}


class TestSweepLineProperty:
    @prop_settings(12)
    @given(iv=intervals())
    # pinned counterexample (ADVICE r04): two intervals ending at the same
    # instant — a ROWS-frame over raw boundary rows exposed an intermediate
    # running-sum value inside the tied -1 group and overstated the peak
    @example(iv=[(30, 60), (0, 1), (0, 1), (0, 1), (30, 60), (31, 61)])
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
    @prop_settings(12)
    @given(rows=event_logs(), windowed=st.booleans())
    # pinned counterexample (VERDICT r04): one event whose type is in no
    # funnel step — F.sum over the empty relation returned NULL, not 0
    @example(rows=[(1, 0, "x")], windowed=False)
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


def _ref_bpe(word_counts, rounds):
    """Independent pure-Python Sennrich reference: symbol tuples +
    explicit greedy left-to-right merge — no string replace anywhere,
    so agreement validates the marker-wrapped replace construction."""
    from collections import Counter

    vocab = {w: tuple(w) for w in word_counts}
    merges = []
    for r in range(rounds):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        (l, rgt), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r + 1, l, rgt, l + rgt, cnt))
        nv = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rgt:
                    out.append(l + rgt)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[w] = tuple(out)
        vocab = nv
    return merges, vocab


class TestBpeProperty:
    @prop_settings(10)
    @given(
        words=st.dictionaries(
            st.text(alphabet="ab", min_size=1, max_size=6),
            st.integers(1, 5),
            min_size=1,
            max_size=8,
        )
    )
    def test_train_and_apply_match_reference(self, spark, words):
        from snowflake_cdc_spark.operators.bpe import apply_bpe, train_bpe

        df = spark.createDataFrame(
            list(words.items()), "word string, cnt bigint"
        )
        got = [tuple(r) for r in train_bpe(df, rounds=4).collect()]
        ref_merges, ref_vocab = _ref_bpe(words, 4)
        assert got == ref_merges, (words, got, ref_merges)
        toks = {r.word: r.n_bpe_tokens for r in apply_bpe(df, got).collect()}
        assert toks == {w: len(s) for w, s in ref_vocab.items()}, words


class TestBfsProperty:
    @prop_settings(10)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=25
        ),
        seeds=st.sets(st.integers(0, 9), min_size=1, max_size=3),
        hops=st.integers(1, 4),
    )
    def test_matches_python_bfs(self, spark, edges, seeds, hops):
        from collections import deque

        from snowflake_cdc_spark.operators.bfs import khop_distances

        adj = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
        dist = {s: 0 for s in seeds}
        frontier = deque(seeds)
        while frontier:
            u = frontier.popleft()
            if dist[u] >= hops:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    frontier.append(v)
        edf = spark.createDataFrame(
            edges or [(99, 99)], "src long, dst long"
        )
        sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
        got = {r.node: r.dist for r in khop_distances(edf, sdf, hops).collect()}
        assert got == dist, (edges, seeds, hops)


class TestBloomProperty:
    @prop_settings(10)
    @given(
        dim=st.sets(st.integers(0, 400), min_size=1, max_size=40),
        probe=st.lists(st.integers(0, 400), min_size=1, max_size=60),
        m=st.sampled_from([16, 64, 512]),
    )
    def test_never_a_false_negative(self, spark, dim, probe, m):
        from snowflake_cdc_spark.operators.bloom import (
            bloom_prefilter,
            build_bloom,
        )

        ddf = spark.createDataFrame([(k,) for k in dim], "k long")
        pdf = spark.createDataFrame(
            [(i, k) for i, k in enumerate(probe)], "i long, k long"
        )
        bloom = build_bloom(ddf, "k", k=3, m=m)
        passed = {r.i for r in bloom_prefilter(pdf, "k", bloom, k=3, m=m).collect()}
        must_pass = {i for i, k in enumerate(probe) if k in dim}
        assert must_pass <= passed, (dim, probe, m)


def _ref_kmeans(vectors, k, rounds):
    """Independent pure-Python integer Lloyd, straight from the
    definitions (md5-smallest seeds, argmin with lowest-cell ties,
    per-dim sum // count updates, empty cells drop)."""
    import hashlib
    import math

    q = {
        i: [math.floor((x + 1.0) * 10000.0 + 0.5) for x in v]
        for i, v in vectors.items()
    }
    seeds = sorted(
        q, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:k]
    cents = {c: q[s] for c, s in enumerate(seeds)}
    assign = {}
    for r in range(rounds):
        assign = {
            i: min(
                (sum((a - b) ** 2 for a, b in zip(v, cv)), c)
                for c, cv in sorted(cents.items())
            )
            for i, v in q.items()
        }
        if r == rounds - 1:
            break
        newc = {}
        for c in cents:
            members = [q[i] for i, (_, cc) in assign.items() if cc == c]
            if members:
                newc[c] = [sum(col) // len(members) for col in zip(*members)]
        cents = newc
    out = {}
    for _, (d, c) in sorted(assign.items()):
        n, s = out.get(c, (0, 0))
        out[c] = (n + 1, s + d)
    return out


class TestKmeansProperty:
    @prop_settings(8)
    @given(
        vecs=st.dictionaries(
            st.integers(0, 50),
            st.lists(
                st.integers(-50, 50).map(lambda i: i / 100.0),
                min_size=4,
                max_size=4,
            ),
            min_size=3,
            max_size=12,
        ),
        k=st.integers(2, 3),
        rounds=st.integers(2, 3),
    )
    def test_matches_python_lloyd(self, spark, vecs, k, rounds):
        from snowflake_cdc_spark.operators.kmeans_exact import kmeans_exact

        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<double>",
        )
        got = {
            r.cell: (r.n_members, r.inertia)
            for r in kmeans_exact(df, k=min(k, len(vecs)), rounds=rounds).collect()
        }
        want = _ref_kmeans(vecs, min(k, len(vecs)), rounds)
        assert got == want, (vecs, k, rounds)


class TestSetsimProperty:
    @prop_settings(8)
    @given(
        docs=st.dictionaries(
            st.integers(0, 15),
            st.sets(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
            min_size=2,
            max_size=10,
        )
    )
    def test_prefix_filter_equals_direct_for_any_corpus(self, spark, docs):
        from snowflake_cdc_spark.operators.setsim import (
            allpairs_jaccard_join,
            prefix_filter_join,
        )

        toks = spark.createDataFrame(
            [(d, t) for d, ts in docs.items() for t in ts],
            "doc_id long, tok string",
        )
        a = sorted(map(tuple, prefix_filter_join(toks, 6, 10).collect()))
        b = sorted(map(tuple, allpairs_jaccard_join(toks, 6, 10).collect()))
        assert a == b, docs
