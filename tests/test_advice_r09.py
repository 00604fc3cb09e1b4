"""Regression tests for the four ADVICE r08 findings.

1. q233's oracle used the linear ((r-1)*k)//n bucket formula while the
   engine uses the ntile fill — divergent whenever n % 4 == 2. The
   oracle now spells the same ntile CASE as q140; parity must hold on a
   corpus whose count is NOT divisible by 4.
2. config.py convergence wiring crashed on ``"convergence": false``.
3. PqIndexMaintainer: a re-arriving (updated) id left its stale code in
   the older generation — search() could return the id twice and
   compact() duplicated its row.
4. q226's freq_band used float log2, which flips at power-of-two counts
   across engines; functions/intmath.py::quarter_log2_band is the exact
   integer replacement and must equal floor(4*log2(c)) everywhere.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.intmath import (
    quarter_log2_band,
    quarter_log2_band_sql,
)
from snowflake_cdc_spark.operators.pq import build_pq
from snowflake_cdc_spark.streaming.pq_maintenance import PqIndexMaintainer
from tests.conftest import canon_rows

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow


# ----------------------------------------------------------- 1. q233


def test_q233_parity_when_count_not_divisible_by_k(spark, tmp_path):
    """10 documents (10 % 4 == 2): the linear formula and the ntile fill
    assign rank 6 to different buckets — the fixed oracle must still
    hash-match the engine."""
    from snowflake_cdc_spark.queries import REGISTRY, _load_extended

    _load_extended()
    spec = REGISTRY["q233_corpus_grid"]
    rows = [
        (i, " ".join(f"w{j}" for j in range(i + 1)) + " dup dup", "en", "s", 10)
        for i in range(10)
    ]
    sf_dir = str(tmp_path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": [r[3] for r in rows],
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        f"{sf_dir}/documents.parquet",
    )

    sdf = spec.spark_fn(spark, sf_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    a = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    b = canon_rows(duck_cols, duck_rows)
    assert a == b


# ----------------------------------------------------- 2. config guard


def test_config_convergence_false_disables(spark, tmp_path):
    from snowflake_cdc_spark.plans.config import pipeline_from_config

    base = {
        "tables": [
            {
                "full_table_name": "tpch.orders",
                "use_upsolver_primary_key_column": True,
                "logical_delete_col": "",
            }
        ],
        "sink": {"root": str(tmp_path / "wh")},
    }
    pipe = pipeline_from_config(spark, {**base, "convergence": False})
    assert pipe.convergence is None
    pipe = pipeline_from_config(spark, {**base, "convergence": None})
    assert pipe.convergence is None
    with pytest.raises(ValueError, match="convergence"):
        pipeline_from_config(spark, {**base, "convergence": "yes"})
    pipe = pipeline_from_config(
        spark,
        {
            **base,
            "maintenance": {"keep_versions": 2},
            "convergence": {},
        },
    )
    assert pipe.convergence is not None


# --------------------------------------- 3. re-arriving id dedup in PQ


def test_pq_maintainer_rearriving_id(spark):
    """id 5 arrives in gen 0, then RE-arrives (moved vector) in the
    batch that trips a new generation: search() must return it once per
    query (scored on the NEW vector) and compact() must keep one row."""
    rng = np.random.default_rng(3)
    dim, m, k = 8, 4, 16
    schema = "vec_id long, embedding array<double>"

    def mk(n, start, lo, hi):
        x = rng.uniform(lo, hi, (n, dim))
        return [(start + i, [float(v) for v in x[i]]) for i in range(n)]

    corpus = mk(120, 0, -1.0, 1.0)
    index = build_pq(spark.createDataFrame(corpus, schema), m=m, k=k, seed=11)
    maint = PqIndexMaintainer(index, threshold_ratio=2.0)

    # drifted batch RE-DELIVERS id 5 with a far-away updated vector
    shifted = mk(80, 3000, 9.0, 11.0)
    new_vec5 = [10.0] * dim
    maint.process_batch(
        spark.createDataFrame(shifted + [(5, new_vec5)], schema), 1
    )
    assert len(maint.versions) == 2, "shift must open a new generation"

    qdf = spark.createDataFrame([(1, new_vec5)], "query_id long, query_vec array<double>")
    hits = maint.search(qdf, k=10, shortlist=40).collect()
    ids = [r.vec_id for r in hits]
    assert ids.count(5) == 1, f"id 5 returned {ids.count(5)} times: {ids}"
    sim5 = [r.sim for r in hits if r.vec_id == 5][0]
    assert sim5 == pytest.approx(1.0, abs=1e-3), (
        "id 5 must be scored on its NEW vector (cosine ~1 to the query)"
    )

    maint.compact()
    codes = maint.codes[0]
    per_id = codes.groupBy("vec_id").count().filter(F.col("count") > 1)
    assert per_id.count() == 0, "compact() must keep one row per id"
    kept = codes.filter(F.col("vec_id") == 5).select("embedding").head()[0]
    assert kept == new_vec5, "compact() must keep the NEWEST generation's vector"


# ------------------------------------------- 4. exact quarter-log2 band


def test_quarter_log2_band_exact(spark):
    cases = (
        [2**e for e in range(0, 40)]
        + [2**e - 1 for e in range(1, 40)]
        + [2**e + 1 for e in range(1, 40)]
        + list(range(1, 300))
        + [10**9, 10**12, 2**62, 2**63 - 1]
    )
    cases = sorted(set(cases))
    ref = {c: (c**4).bit_length() - 1 for c in cases}  # floor(log2(c^4))

    df = spark.createDataFrame([(c,) for c in cases], "cnt long")
    got = {
        r.cnt: r.band
        for r in df.select("cnt", quarter_log2_band("cnt").alias("band")).collect()
    }
    assert got == ref

    con = duckdb.connect()
    con.execute("CREATE TABLE t(cnt BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(c,) for c in cases])
    sql_got = dict(
        con.execute(
            f"SELECT cnt, {quarter_log2_band_sql('cnt')} FROM t"
        ).fetchall()
    )
    assert sql_got == ref
