"""Streaming sessionization (streaming/session_stream.py): seam
extend/close branches, multi-batch parity vs an independent reference
over arbitrary splits, replay idempotence, silent-user carry."""

from __future__ import annotations

from datetime import datetime

import pytest

from snowflake_cdc_spark.streaming.session_stream import SessionMaintainer

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow

GAP = 100  # seconds


def _ev(spark, rows):
    """rows: (user, epoch_second_offset, seq)."""
    return spark.createDataFrame(
        [
            (u, datetime(2024, 1, 1, s // 3600, (s // 60) % 60, s % 60), q)
            for u, s, q in rows
        ],
        "user_id long, ts timestamp, event_id long",
    )


def _ref_sessions(rows, gap=GAP):
    """Independent reference: {(user, start_off, last_off, n, open)}
    with offsets in seconds from the epoch base."""
    by_user = {}
    for u, s, q in rows:
        by_user.setdefault(u, []).append((s, q))
    out = set()
    for u, evs in by_user.items():
        evs.sort()
        sessions = []
        for s, _ in evs:
            if sessions and s - sessions[-1][1] <= gap:
                st, _, n = sessions[-1]
                sessions[-1] = (st, s, n + 1)
            else:
                sessions.append((s, s, 1))
        for i, (st, la, n) in enumerate(sessions):
            out.add((u, st, la, n, i == len(sessions) - 1))
    return out


def _got(m, spark, include_open=True):
    base = datetime(2024, 1, 1).timestamp()
    return {
        (r.user, int(r.start_t - base), int(r.last_t - base), r.n_events, r.open)
        for r in m.sessions(spark, include_open=include_open).collect()
    }


class TestSessionMaintainer:
    def test_seam_extends_open_session(self, spark, tmp_path):
        m = SessionMaintainer(str(tmp_path / "s"), gap_seconds=GAP)
        m.process_batch(_ev(spark, [(1, 0, 1), (1, 50, 2)]), 0)
        m.process_batch(_ev(spark, [(1, 120, 3)]), 1)  # 70s after last
        assert _got(m, spark) == {(1, 0, 120, 3, True)}

    def test_seam_closes_open_session(self, spark, tmp_path):
        m = SessionMaintainer(str(tmp_path / "s"), gap_seconds=GAP)
        m.process_batch(_ev(spark, [(1, 0, 1)]), 0)
        m.process_batch(_ev(spark, [(1, 500, 2)]), 1)  # beyond the gap
        assert _got(m, spark) == {(1, 0, 0, 1, False), (1, 500, 500, 1, True)}

    def test_multi_session_batch(self, spark, tmp_path):
        m = SessionMaintainer(str(tmp_path / "s"), gap_seconds=GAP)
        rows = [(1, 0, 1), (1, 90, 2), (1, 300, 3), (1, 350, 4), (1, 900, 5)]
        m.process_batch(_ev(spark, rows), 0)
        assert _got(m, spark) == _ref_sessions(rows)

    @pytest.mark.parametrize("seed", [11, 42])
    def test_multi_batch_parity_over_arbitrary_splits(self, spark, tmp_path, seed):
        import random

        rng = random.Random(seed)
        rows, s = [], 0
        for q in range(36):
            s += rng.choice([5, 40, 150, 400])
            rows.append((rng.randint(1, 4), s, q))
        rows.sort(key=lambda r: (r[1], r[2]))
        cuts = sorted(rng.sample(range(1, len(rows)), rng.randint(1, 4)))
        batches, prev = [], 0
        for c in cuts + [len(rows)]:
            batches.append(rows[prev:c])
            prev = c
        m = SessionMaintainer(str(tmp_path / f"s{seed}"), gap_seconds=GAP)
        for i, b in enumerate(batches):
            m.process_batch(_ev(spark, b), i)
        assert _got(m, spark) == _ref_sessions(rows)

    def test_replay_last_batch_is_idempotent(self, spark, tmp_path):
        m = SessionMaintainer(str(tmp_path / "s"), gap_seconds=GAP)
        b0 = [(1, 0, 1), (2, 10, 2)]
        b1 = [(1, 50, 3), (2, 800, 4)]
        m.process_batch(_ev(spark, b0), 0)
        m.process_batch(_ev(spark, b1), 1)
        before = _got(m, spark)
        m.process_batch(_ev(spark, b1), 1)  # checkpoint-restart replay
        assert _got(m, spark) == before == _ref_sessions(b0 + b1)

    def test_silent_user_open_session_carries(self, spark, tmp_path):
        m = SessionMaintainer(str(tmp_path / "s"), gap_seconds=GAP)
        m.process_batch(_ev(spark, [(1, 0, 1), (2, 0, 2)]), 0)
        m.process_batch(_ev(spark, [(2, 50, 3)]), 1)  # user 1 silent
        assert _got(m, spark) == {(1, 0, 0, 1, True), (2, 0, 50, 2, True)}


def test_run_stream_e2e(spark, tmp_path):
    """Two-file availableNow stream; totals match the reference."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [(1, 0, 1), (2, 5, 2), (1, 60, 3), (1, 400, 4), (2, 90, 5)]
    rows.sort(key=lambda r: (r[1], r[2]))
    df = _ev(spark, rows)
    df.filter("event_id in (1, 2, 3)").coalesce(1).write.parquet(src + "/f0")
    df.filter("event_id in (4, 5)").coalesce(1).write.parquet(src + "/f1")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    m = SessionMaintainer(str(tmp_path / "state"), gap_seconds=GAP)
    q = m.run_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    assert _got(m, spark) == _ref_sessions(rows)
