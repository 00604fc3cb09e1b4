"""Property-based verification of the consistent cross-table cut: for
ANY multi-table change log (including same-seq multi-table
transactions) and ANY horizon, consistent_cut equals a pure-Python
replay, and torn_transactions is zero under a global horizon — the
atomicity guarantee is not a fixture artifact."""

from __future__ import annotations

from conftest import prop_settings
from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.snapshot import (
    consistent_cut,
    torn_transactions,
)

SCHEMA = "seq long, table_name string, primary_key string, v long, is_delete boolean"


# a multiplexed log: (seq, table, key, value, is_delete); seqs REPEAT
# across tables (multi-table transactions) but are unique per
# (table, key) — the binlog contract (one change per row per commit)
@st.composite
def multi_logs(draw):
    n = draw(st.integers(1, 25))
    rows, used = [], set()
    for _ in range(n):
        seq = draw(st.integers(0, 9))
        table = draw(st.sampled_from(["A", "B", "C"]))
        key = draw(st.sampled_from(["k1", "k2"]))
        if (seq, table, key) in used:
            continue
        used.add((seq, table, key))
        rows.append(
            (
                seq,
                table,
                key,
                draw(st.integers(-50, 50)),
                draw(st.booleans()),
            )
        )
    return rows


def python_cut(log, horizon):
    state = {}
    for seq, table, key, v, is_del in sorted(log):
        if seq <= horizon:
            state[(table, key)] = (seq, v, is_del)
    return {
        tk: v
        for tk, (seq, v, is_del) in state.items()
        if not is_del
    }


@prop_settings(25)
@given(log=multi_logs(), horizon=st.integers(-1, 10))
def test_cut_matches_python_replay(spark, log, horizon):
    if not log:
        return
    ev = spark.createDataFrame(log, SCHEMA)
    got = {
        (r["table_name"], r["primary_key"]): r["v"]
        for r in consistent_cut(ev, horizon).collect()
    }
    assert got == python_cut(log, horizon)
    n = (
        torn_transactions(ev, F.col("seq") <= horizon)
        .collect()[0]["n_torn"]
    )
    assert n == 0, "a global horizon can never tear"
