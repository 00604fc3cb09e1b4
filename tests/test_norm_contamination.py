"""Normalized decontamination lane (q223): punctuation-only differences
must be caught by the normalized lane and missed by the raw q214-style
lane."""

from __future__ import annotations

from snowflake_cdc_spark.queries import REGISTRY, _load_extended
from tests.conftest import SF_SMOKE


def test_normalized_lane_catches_what_raw_misses(spark):
    _load_extended()
    rows = (
        REGISTRY["q223_norm_contamination"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    )
    assert rows, "test split must be non-empty"
    for r in rows:
        # every raw window of the planted sentence straddles the
        # apostrophe perturbation: exactly the 5 planted normalized
        # grams are caught ONLY by the normalized lane
        assert r["caught_only_normalized"] == 5, r
        assert r["n_contam_norm"] >= 5
        # background (fixture) grams are pure [a-z ] so the two lanes
        # agree on them — the delta is entirely the planted sentence
        assert r["n_contam_norm"] - r["n_contam_raw"] == 5
