"""Watermarked reorder pre-stage -> maintainer composition
(streaming/reorder.py, VERDICT r05 #5): the maintainers' documented
"late data belongs upstream in the watermarked lanes" contract,
demonstrated end to end — a planted late event crosses a batch boundary,
the watermark reorders it BEFORE the seam decision, and a too-late event
(older than the delay) is dropped by the standard watermark policy."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from snowflake_cdc_spark.streaming.reorder import watermarked_feed
from snowflake_cdc_spark.streaming.session_stream import SessionMaintainer

import pytest

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow

BASE = datetime(2024, 1, 1)


def _df(spark, rows):
    """rows: (user, epoch-offset seconds, seq)."""
    return spark.createDataFrame(
        [(u, BASE + timedelta(seconds=s), q) for u, s, q in rows],
        "user_id long, ts timestamp, event_id long",
    )


def _got(m, spark):
    base = BASE.timestamp()
    return {
        (r.user, int(r.start_t - base), int(r.last_t - base), r.n_events, r.open)
        for r in m.sessions(spark, include_open=True).collect()
    }


def test_late_event_reordered_before_seam_decision(spark, tmp_path):
    """File 2 delivers a LATE user-1 event (t=1200) after file 1 already
    carried a much later user-1 event (t=5400). Fed directly, that
    violates the maintainer's ordering contract; through the watermarked
    pre-stage (delay 90 min, 1 h windows) the [0, 3600) window stays open
    until the watermark passes, so the maintainer receives {0, 1200}
    together and only THEN sees {5400} — the seam decision (gap 30 min:
    5400 - 1200 > 1800 closes the session) runs on correctly ordered
    data. File 3 plants a TOO-late event (t=200, arriving a batch AFTER
    its window's state was emitted and evicted): the standard watermark
    policy drops it — asserted absent."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # user 9 exists to advance the watermark (max event time - delay)
    f0 = [(1, 0, 1), (1, 5400, 2), (9, 6000, 3)]       # wm after: 600
    f1 = [(1, 1200, 4), (9, 9100, 5)]                  # late-but-in-delay
    f2 = [(9, 13000, 7)]                               # evicts [0, 3600)
    f3 = [(1, 200, 6), (9, 16300, 8)]                  # too late: dropped
    for i, rows in enumerate((f0, f1, f2, f3)):
        _df(spark, rows).coalesce(1).write.parquet(f"{src}/f{i}")
    stream = (
        spark.readStream.schema(_df(spark, f0).schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    m = SessionMaintainer(str(tmp_path / "state"), gap_seconds=1800)
    q = watermarked_feed(
        stream,
        m.process_batch,
        checkpoint=str(tmp_path / "ckpt"),
        delay="90 minutes",
        window_size="1 hour",
    )
    q.awaitTermination(300)
    got = _got(m, spark)
    # user 1: the late event EXTENDED the first session before the seam
    # closed it; the too-late event left no trace. user 9's 13000/16300
    # windows are still held behind the watermark when the availableNow
    # feed drains — correctly undelivered, not lost (a longer feed
    # would flush them).
    assert got == {
        (1, 0, 1200, 2, False),
        (1, 5400, 5400, 1, True),
        (9, 6000, 6000, 1, False),
        (9, 9100, 9100, 1, True),
    }


def test_payload_cols_feed_transition_maintainer(spark, tmp_path):
    """The composition generalizes: TransitionMaintainer behind the
    same pre-stage, with event_type carried through payload_cols — a
    late event supplies the transition a direct feed would corrupt."""
    from snowflake_cdc_spark.streaming.markov_stream import (
        TransitionMaintainer,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)

    def _tdf(rows):
        return spark.createDataFrame(
            [
                (u, BASE + timedelta(seconds=s), q, t)
                for u, s, q, t in rows
            ],
            "user_id long, ts timestamp, event_id long, event_type string",
        )

    # true user-1 sequence: a(0) -> b(1200, LATE) -> c(5400)
    f0 = [(1, 0, 1, "a"), (1, 5400, 2, "c"), (9, 6000, 3, "x")]
    f1 = [(1, 1200, 4, "b"), (9, 9100, 5, "x")]
    f2 = [(9, 13000, 6, "x")]
    f3 = [(9, 16300, 7, "x")]
    for i, rows in enumerate((f0, f1, f2, f3)):
        _tdf(rows).coalesce(1).write.parquet(f"{src}/f{i}")
    stream = (
        spark.readStream.schema(_tdf(f0).schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    m = TransitionMaintainer(str(tmp_path / "state"))
    q = watermarked_feed(
        stream,
        m.process_batch,
        checkpoint=str(tmp_path / "ckpt"),
        payload_cols=("event_type",),
        delay="90 minutes",
        window_size="1 hour",
    )
    q.awaitTermination(300)
    got = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in m.transitions(spark).collect()
    }
    # a->b within the reordered first window, b->c across the seam
    # (a direct feed would have recorded a->c and c->b instead)
    assert got.get(("a", "b")) == 1
    assert got.get(("b", "c")) == 1
    assert ("a", "c") not in got and ("c", "b") not in got


def test_in_order_feed_matches_direct(spark, tmp_path):
    """With no late data, the composition is a pure reorder no-op: the
    reorder-fed maintainer and a directly-fed maintainer agree."""
    rows = [(1, 0, 1), (1, 900, 2), (1, 4000, 3), (2, 100, 4), (9, 99000, 5)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    _df(spark, rows).coalesce(1).write.parquet(f"{src}/f0")
    stream = (
        spark.readStream.schema(_df(spark, rows).schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    m = SessionMaintainer(str(tmp_path / "state"), gap_seconds=1800)
    q = watermarked_feed(
        stream, m.process_batch, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    direct = SessionMaintainer(str(tmp_path / "direct"), gap_seconds=1800)
    # user 9's sentinel advances the watermark past every other window;
    # its own window is held, so exclude it from the direct feed too
    direct.process_batch(_df(spark, rows[:4]), 0)
    assert _got(m, spark) == _got(direct, spark)
