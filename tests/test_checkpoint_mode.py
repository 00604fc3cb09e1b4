"""The checkpoint escape hatch (operators/util.ckpt_eager/ckpt_lazy,
round-12 VERDICT item 8): every operator's lineage truncation routes
through one helper whose posture is switched session-wide by
``spark.snowflake_cdc.checkpoint.mode`` — ``local`` (default,
localCheckpoint) or ``reliable`` (fault-tolerant ``checkpoint()``).
Results must be identical in every mode; these tests drive a real
iterative lane (connected components, auto mode — probe loop, star
loop, shared-edge checkpoint all exercised) under each posture."""

from __future__ import annotations

import contextlib
import tempfile

import pytest

from snowflake_cdc_spark.operators.components import connected_components
from snowflake_cdc_spark.operators.util import (
    CKPT_DIR_KEY,
    CKPT_MODE_KEY,
    ckpt_eager,
    ckpt_lazy,
)


@contextlib.contextmanager
def _mode(spark, mode, ckpt_dir=None):
    spark.conf.set(CKPT_MODE_KEY, mode)
    if ckpt_dir is not None:
        spark.conf.set(CKPT_DIR_KEY, ckpt_dir)
    try:
        yield
    finally:
        spark.conf.unset(CKPT_MODE_KEY)
        if ckpt_dir is not None:
            spark.conf.unset(CKPT_DIR_KEY)


def _run_lane(spark):
    # a chain deep enough that algorithm="auto" fails the label-prop
    # probe and restarts on the star loop — both code paths truncate
    # lineage through the helper every round
    edges = [(i, i + 1) for i in range(1, 24)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, algorithm="auto")
    return sorted((r.node, r.component) for r in out.collect())


def test_reliable_mode_matches_local(spark):
    expected = _run_lane(spark)
    with tempfile.TemporaryDirectory() as d:
        with _mode(spark, "reliable", ckpt_dir=d):
            assert _run_lane(spark) == expected


def test_reliable_mode_eager_and_lazy(spark):
    import tempfile

    df = spark.range(10).withColumnRenamed("id", "n")
    with tempfile.TemporaryDirectory() as d:
        with _mode(spark, "reliable", ckpt_dir=d):
            assert df.transform(ckpt_eager).count() == 10
            assert df.transform(ckpt_lazy).count() == 10


def test_unknown_mode_fails_fast(spark):
    with _mode(spark, "bogus"):
        with pytest.raises(ValueError, match="checkpoint.mode"):
            spark.range(3).transform(ckpt_eager)


def test_reliable_mode_requires_dir(spark):
    # no checkpoint dir configured anywhere -> fail fast with guidance
    if not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        pytest.skip("session already has a checkpoint dir")
    with _mode(spark, "reliable"):
        with pytest.raises(ValueError, match=CKPT_DIR_KEY):
            spark.range(3).transform(ckpt_eager)
