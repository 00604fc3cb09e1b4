"""Property-based verification of the CDC merge semantics (hypothesis).

The oracle is a 20-line pure-Python replay: apply changes in seq order to
a dict. The engine must agree with it for ANY change log, and — the
property that actually matters at scale — for any PARTITIONING of that
log into micro-batches in ANY order (delivery order is not a correctness
input; that's what tombstone retention + the seq race buy us)."""

from __future__ import annotations

import pytest
from conftest import prop_settings
from hypothesis import given, settings
from hypothesis import strategies as st

from snowflake_cdc_spark.operators.upsert import (
    snapshot_hard_delete,
    snapshot_logical_delete,
)
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow


# a change log: list of (key, seq, value, is_delete) with unique seqs
@st.composite
def change_logs(draw):
    n = draw(st.integers(1, 30))
    keys = draw(st.lists(st.integers(0, 7), min_size=n, max_size=n))
    deletes = draw(st.lists(st.booleans(), min_size=n, max_size=n))
    values = draw(st.lists(st.integers(-100, 100), min_size=n, max_size=n))
    seqs = list(range(n))  # unique by construction (binlog positions)
    return list(zip(keys, seqs, values, deletes))


def python_oracle(log, hard: bool):
    state: dict[int, tuple] = {}
    for key, seq, value, is_delete in sorted(log, key=lambda r: r[1]):
        state[key] = (seq, value, is_delete)
    if hard:
        return {
            k: (seq, value)
            for k, (seq, value, is_delete) in state.items()
            if not is_delete
        }
    return {k: (seq, value, d) for k, (seq, value, d) in state.items()}


def to_df(spark, log):
    return spark.createDataFrame(
        [(k, s, v, d) for k, s, v, d in log],
        "key long, seq long, value long, is_delete boolean",
    )


@pytest.mark.parametrize("hard", [True, False])
@prop_settings(25)
@given(log=change_logs())
def test_snapshot_matches_python_oracle(spark, hard, log):
    df = to_df(spark, log)
    if hard:
        got = {
            r.key: (r.seq, r.value)
            for r in snapshot_hard_delete(df, ["key"]).collect()
        }
    else:
        got = {
            r.key: (r.seq, r.value, r.is_deleted)
            for r in snapshot_logical_delete(df, ["key"]).collect()
        }
    assert got == python_oracle(log, hard)


@prop_settings(15)
@given(
    log=change_logs(),
    batching=st.lists(st.integers(0, 2), min_size=30, max_size=30),
    order=st.permutations([0, 1, 2]),
)
def test_merge_commutative_over_any_batching(spark, tmp_path_factory, log, batching, order):
    """Split the log into up to 3 batches by an arbitrary assignment,
    apply them in an arbitrary order — the final snapshot must equal the
    one-shot oracle regardless."""
    sink = ParquetSnapshotSink(str(tmp_path_factory.mktemp("prop")))
    batches = {i: [] for i in range(3)}
    for row, b in zip(log, batching):
        batches[b].append(row)
    for i in order:
        if batches[i]:
            sink.merge(to_df(spark, batches[i]), "T", key_cols=["key"])
    want = python_oracle(log, hard=True)
    if not any(batches[i] for i in range(3)):
        return
    got = {r.key: (r.seq, r.value) for r in sink.read(spark, "T").collect()}
    assert got == want
