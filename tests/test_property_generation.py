"""Property test for the atomic multi-table publish (VERDICT r08 #3):
under ANY interleaving of per-table merges and generation publishes, a
generation reader observes exactly the per-table state as of the LAST
publish — never a mid-interleaving mix — and the manifest versions
always point at retained, readable snapshot versions.

Ops are modeled as a fuzzed sequence over two tables; the pure-Python
model tracks each table's applied horizon at every publish. Spark
merges are the expensive step, so the op lists stay short and the
example budget modest (the suite's prop_settings discipline)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from tests.conftest import prop_settings

import pytest

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow

TABLES = ("A", "B")

# an op is ("merge", table_idx, hi) or ("publish",)
_OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("merge"), st.integers(0, 1), st.integers(1, 6)
        ),
        st.tuples(st.just("publish")),
    ),
    min_size=2,
    max_size=6,
)


def _events(spark):
    rows = [
        (t, seq, seq * 10, False) for seq in range(1, 7) for t in TABLES
    ]
    return spark.createDataFrame(
        rows, "table_name string, seq bigint, pk bigint, is_delete boolean"
    )


@given(ops=_OPS)
@prop_settings(10)
def test_generation_read_equals_last_publish(spark, tmp_path_factory, ops):
    ev = _events(spark).persist()
    sink = ParquetSnapshotSink(str(tmp_path_factory.mktemp("genprop")))
    applied = {t: 0 for t in TABLES}  # max seq merged per table
    published: dict[str, int] | None = None  # state at last publish
    try:
        for op in ops:
            if op[0] == "merge":
                _, ti, hi = op
                table = TABLES[ti]
                changes = ev.filter(
                    (F.col("table_name") == table) & (F.col("seq") <= hi)
                ).drop("table_name")
                sink.merge(changes, table, key_cols=["pk"], seq_col="seq")
                applied[table] = max(applied[table], hi)
            else:
                sink.publish_generation()
                published = dict(applied)

            if published is not None:
                snap = sink.read_all_at_generation(spark)
                got = {
                    t: (df.agg(F.max("seq")).first()[0] or 0)
                    for t, df in snap.items()
                }
                want = {t: h for t, h in published.items() if h > 0}
                assert got == want, f"after {op}: {got} != {want}"
            else:
                assert sink.current_generation() == -1
    finally:
        ev.unpersist()
