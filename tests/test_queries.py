"""t2 correctness: every declared query (SURVEY.md §2.9) hash-matches the
DuckDB oracle at sf0.01 — the same comparison the driver runs."""

from __future__ import annotations

import pytest

from snowflake_cdc_spark.queries import REGISTRY, _load_extended
from tests.conftest import assert_matches_oracle

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow

_load_extended()
ORACLE_BACKED = [name for name, spec in REGISTRY.items() if spec.oracle]


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    assert_matches_oracle(spark, duck, spec.spark_fn, spec.oracle)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_on_smoke_sf(spark, name):
    """t1 smoke: every declared query executes at sf0.001 with a stable schema."""
    from tests.conftest import SF_SMOKE

    df = REGISTRY[name].spark_fn(spark, SF_SMOKE)
    assert df.columns
    assert df.count() >= 0
