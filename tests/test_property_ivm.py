"""Property-based verification of join-view maintenance (hypothesis).

Oracle: a pure-Python replay keeping two dicts (fact, dim) and joining
them from scratch at the end. The maintainer must agree for ANY pair of
change logs and ANY split of them into zipped micro-batches — the view
after the last batch is a pure function of the final snapshots, never
of the batching (delta-key recompute must not leave stale rows behind
when keys bounce between dimension values or get deleted and
re-inserted across batch boundaries)."""

from __future__ import annotations

import pytest
from conftest import prop_settings
from hypothesis import given, settings
from hypothesis import strategies as st

from snowflake_cdc_spark.operators.ivm import JoinViewMaintainer

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow


@st.composite
def scenario(draw):
    nf = draw(st.integers(1, 20))
    fact = [
        (
            draw(st.integers(0, 5)),  # fact key
            draw(st.integers(0, 3)),  # join key
            draw(st.integers(-50, 50)),  # payload
            s,  # unique seq
            draw(st.booleans()),  # is_delete
        )
        for s in range(nf)
    ]
    nd = draw(st.integers(1, 12))
    dim = [
        (
            draw(st.integers(0, 3)),  # dim key
            draw(st.integers(0, 99)),  # attr
            s,
            draw(st.booleans()),
        )
        for s in range(nd)
    ]
    n_batches = draw(st.integers(1, 4))
    f_cuts = sorted(draw(st.lists(st.integers(0, nf), min_size=n_batches - 1, max_size=n_batches - 1)))
    d_cuts = sorted(draw(st.lists(st.integers(0, nd), min_size=n_batches - 1, max_size=n_batches - 1)))
    return fact, dim, f_cuts, d_cuts


def _split(rows, cuts):
    out, prev = [], 0
    for c in cuts + [len(rows)]:
        out.append(rows[prev:c])
        prev = c
    return out


def python_oracle(fact_log, dim_log):
    f: dict[int, tuple] = {}
    for fk, jk, val, seq, dele in sorted(fact_log, key=lambda r: r[3]):
        f[fk] = (jk, val, dele)
    d: dict[int, tuple] = {}
    for dk, attr, seq, dele in sorted(dim_log, key=lambda r: r[2]):
        d[dk] = (attr, dele)
    view = set()
    for fk, (jk, val, dele) in f.items():
        if dele or jk not in d or d[jk][1]:
            continue
        view.add((fk, jk, val, d[jk][0]))
    return view


@prop_settings(15)
@given(sc=scenario())
def test_maintained_view_matches_python_oracle(spark, sc):
    fact, dim, f_cuts, d_cuts = sc
    m = JoinViewMaintainer("fk", "jk", "dk")
    for fb, db in zip(_split(fact, f_cuts), _split(dim, d_cuts)):
        m.apply_batch(
            spark.createDataFrame(
                fb, "fk long, jk long, val long, seq long, is_delete boolean"
            ),
            spark.createDataFrame(
                db, "dk long, attr long, seq long, is_delete boolean"
            ),
        )
    got = {(r.fk, r.jk, r.val, r.attr) for r in m.view.collect()}
    assert got == python_oracle(fact, dim)


def test_streaming_fact_side_maintenance(spark, tmp_path):
    """The maintainer under a REAL stream: fact changes arrive through
    foreachBatch micro-batches (static dimension seeded first); the view
    after the stream drains must equal the from-scratch join."""
    from pyspark.sql import functions as F

    fact_rows = [(i, i % 4, i * 10, i, i % 7 == 0) for i in range(60)]
    dim_rows = [(d, d * 100, 0, False) for d in range(4)]
    fschema = "fk long, jk long, val long, seq long, is_delete boolean"
    dschema = "dk long, attr long, seq long, is_delete boolean"

    src = str(tmp_path / "fact_stream")
    fdf = spark.createDataFrame(fact_rows, fschema)
    fdf.withColumn("__c", F.col("fk") % 3).repartition(3, "__c").drop("__c").write.parquet(src)

    m = JoinViewMaintainer("fk", "jk", "dk")
    # seed both sides (empty fact batch + full dim load)
    m.apply_batch(
        spark.createDataFrame([], fschema), spark.createDataFrame(dim_rows, dschema)
    )

    def on_batch(batch_df, batch_id):
        m.apply_batch(batch_df, None)

    q = (
        spark.readStream.schema(fdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {(r.fk, r.jk, r.val, r.attr) for r in m.view.collect()}
    assert got == python_oracle(fact_rows, dim_rows)
