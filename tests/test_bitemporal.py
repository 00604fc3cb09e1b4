"""Bitemporal point-in-time reads (operators/scd.py::bitemporal_as_of):
the retroactive-correction semantics and old-belief replay."""

from __future__ import annotations

from snowflake_cdc_spark.operators.scd import bitemporal_as_of


def _ch(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, valid_t int, tx_t int"
    )


def _read(ch, v, t):
    return {
        r.k: r.seg
        for r in bitemporal_as_of(ch, ["k"], "seg", "valid_t", "tx_t", v, t).collect()
    }


class TestBitemporalAsOf:
    ROWS = [
        (1, "A", 1, 1),       # original
        (1, "B", 5, 2),       # normal forward change
        (1, "A2", 1, 3),      # RETROACTIVE correction of the original
        (2, "X", 1, 1),
    ]

    def test_retro_correction_changes_the_past_only_later(self, spark):
        ch = _ch(spark, self.ROWS)
        # before the correction lands, the past reads as originally written
        assert _read(ch, 1, 2) == {1: "A", 2: "X"}
        # after it lands, the SAME valid time reads corrected
        assert _read(ch, 1, 3) == {1: "A2", 2: "X"}

    def test_old_belief_replays_exactly(self, spark):
        ch = _ch(spark, self.ROWS)
        # replaying known_at=1 after all corrections exist reproduces
        # the original belief — the audit property
        assert _read(ch, 5, 1) == {1: "A", 2: "X"}

    def test_forward_change_beats_retro_at_its_valid_time(self, spark):
        ch = _ch(spark, self.ROWS)
        # at valid 5, the forward change B is effective regardless of
        # the retro correction to valid 1
        assert _read(ch, 5, 3) == {1: "B", 2: "X"}

    def test_nothing_known_before_first_tx(self, spark):
        ch = _ch(spark, self.ROWS)
        assert _read(ch, 5, 0) == {}
