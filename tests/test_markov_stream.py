"""Streaming Markov transition maintenance
(streaming/markov_stream.py): seam correctness, multi-batch parity vs
an independent reference over arbitrary splits, replay idempotence,
state carry-forward."""

from __future__ import annotations

from collections import Counter
from datetime import datetime

import pytest

from snowflake_cdc_spark.streaming.markov_stream import TransitionMaintainer

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow


def _ev(spark, rows):
    """rows: (user, second, seq, type)."""
    return spark.createDataFrame(
        [
            (u, datetime(2024, 1, 1, s // 3600, (s // 60) % 60, s % 60), q, t)
            for u, s, q, t in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )


def _ref_transitions(rows):
    by_user = {}
    for u, s, q, t in rows:
        by_user.setdefault(u, []).append((s, q, t))
    c = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            c[(a, b)] += 1
    return dict(c)


def _got(m, spark):
    return {
        (r.prev_type, r.next_type): r.n_transitions
        for r in m.transitions(spark).collect()
    }


class TestTransitionMaintainer:
    def test_batch_seam_transition_counted(self, spark, tmp_path):
        m = TransitionMaintainer(str(tmp_path / "mk"))
        # user 1: view(b0) -> click(b1): the seam pair must appear
        m.process_batch(_ev(spark, [(1, 1, 1, "view")]), 0)
        m.process_batch(_ev(spark, [(1, 2, 2, "click")]), 1)
        assert _got(m, spark) == {("view", "click"): 1}

    def test_single_batch_equals_batch_lane(self, spark, tmp_path):
        rows = [
            (1, 1, 1, "a"), (1, 2, 2, "b"), (1, 3, 3, "a"),
            (2, 1, 4, "b"), (2, 5, 5, "b"),
            (3, 9, 6, "c"),
        ]
        m = TransitionMaintainer(str(tmp_path / "mk"))
        m.process_batch(_ev(spark, rows), 0)
        assert _got(m, spark) == _ref_transitions(rows)

    @pytest.mark.parametrize("seed", [5, 23])
    def test_multi_batch_parity_over_arbitrary_splits(self, spark, tmp_path, seed):
        import random

        rng = random.Random(seed)
        rows = []
        s = 0
        for q in range(40):
            s += rng.randint(1, 3)
            rows.append((rng.randint(1, 5), s, q, rng.choice("abc")))
        # split the TIME-ORDERED feed at random points (the ordering
        # contract) into 1..5 batches
        cuts = sorted(rng.sample(range(1, len(rows)), rng.randint(1, 4)))
        batches, prev = [], 0
        for c in cuts + [len(rows)]:
            batches.append(rows[prev:c])
            prev = c
        m = TransitionMaintainer(str(tmp_path / f"mk{seed}"))
        for i, b in enumerate(batches):
            m.process_batch(_ev(spark, b), i)
        assert _got(m, spark) == _ref_transitions(rows)

    def test_replay_last_batch_is_idempotent(self, spark, tmp_path):
        m = TransitionMaintainer(str(tmp_path / "mk"))
        b0 = [(1, 1, 1, "a"), (2, 1, 2, "b")]
        b1 = [(1, 3, 3, "b"), (2, 4, 4, "b")]
        m.process_batch(_ev(spark, b0), 0)
        m.process_batch(_ev(spark, b1), 1)
        before = _got(m, spark)
        m.process_batch(_ev(spark, b1), 1)  # checkpoint-restart replay
        assert _got(m, spark) == before == _ref_transitions(b0 + b1)

    def test_state_carries_absent_users_forward(self, spark, tmp_path):
        m = TransitionMaintainer(str(tmp_path / "mk"))
        m.process_batch(_ev(spark, [(1, 1, 1, "a"), (2, 2, 2, "b")]), 0)
        m.process_batch(_ev(spark, [(2, 3, 3, "c")]), 1)  # user 1 silent
        m.process_batch(_ev(spark, [(1, 5, 4, "c")]), 2)  # user 1 returns
        assert _got(m, spark) == {("b", "c"): 1, ("a", "c"): 1}

    def test_probabilities_are_exact_ppm(self, spark, tmp_path):
        m = TransitionMaintainer(str(tmp_path / "mk"))
        rows = [(1, 1, 1, "a"), (1, 2, 2, "b"), (1, 3, 3, "a"), (1, 4, 4, "c")]
        m.process_batch(_ev(spark, rows), 0)
        got = {
            (r.prev_type, r.next_type): r.prob_ppm
            for r in m.transitions(spark).collect()
        }
        # from 'a': 1x ->b, 1x ->c of 2 total; from 'b': 1x ->a of 1
        assert got == {
            ("a", "b"): 500000,
            ("a", "c"): 500000,
            ("b", "a"): 1000000,
        }


def test_run_stream_e2e(spark, tmp_path):
    """Drive the maintainer through a REAL availableNow file stream —
    two files, one per micro-batch — and check totals against the
    independent reference over the whole feed."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        (1, 1, 1, "a"), (1, 2, 2, "b"), (2, 2, 3, "a"),
        (1, 4, 4, "a"), (2, 5, 5, "c"),
    ]
    df = _ev(spark, rows)
    df.filter("event_id <= 3").coalesce(1).write.parquet(src + "/f0")
    df.filter("event_id > 3").coalesce(1).write.parquet(src + "/f1")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    m = TransitionMaintainer(str(tmp_path / "state"))
    q = m.run_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    assert _got(m, spark) == _ref_transitions(rows)
