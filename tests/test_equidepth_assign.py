"""Per-row equi-depth assignment (operators/histogram.py::
equidepth_assign — the q140 refactor): bucket assignment must equal
the single-sort ntile fill exactly."""

from __future__ import annotations

import pytest

from snowflake_cdc_spark.operators.histogram import equidepth_assign


def _ntile_ref(vals, k):
    """Reference: sort by (value, id), standard ntile fill."""
    order = sorted(vals, key=lambda r: (r[1], r[0]))
    n = len(order)
    out = {}
    for rn, (i, _) in enumerate(order, start=1):
        q, m = divmod(n, k)
        if rn <= m * (q + 1):
            b = (rn - 1) // (q + 1) + 1
        else:
            b = m + (rn - m * (q + 1) - 1) // q + 1
        out[i] = b
    return out


@pytest.mark.parametrize("seed,k", [(1, 4), (9, 10)])
def test_assignment_matches_ntile_fill(spark, seed, k):
    import random

    rng = random.Random(seed)
    # duplicate values included: ties must break by id, not layout
    vals = [(i, rng.choice([1.5, 2.0, 3.25, 7.0, 9.5])) for i in range(1, 38)]
    df = spark.createDataFrame(vals, "id long, v double")
    got = {
        r.id: r.bucket for r in equidepth_assign(df, "v", "id", k=k).collect()
    }
    assert got == _ntile_ref(vals, k)


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 2.0)], "id long, v double"
    )
    got = equidepth_assign(df, "v", "id", k=2).collect()
    assert {r.id for r in got} == {1, 3}
