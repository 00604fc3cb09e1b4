"""Z-order layout (operators/zorder.py): interleave correctness and the
data-skipping property — z-ordered files cover small ranges of BOTH
columns, linear-sorted files cover ~everything on the non-leading one."""

from __future__ import annotations

import pyspark.sql.functions as F

from snowflake_cdc_spark.operators.zorder import (
    file_stat_ranges,
    with_z_value,
    write_zordered,
)


def _uniform_grid(spark, n=200_000):
    # two independent uniform dims — the adversarial case for linear sort
    return spark.range(n).select(
        (F.col("id") * 2654435761 % 100_000).alias("x"),
        (F.col("id") * 40503 % 100_000).alias("y"),
    )


def test_z_value_orders_locally(spark):
    # points close in (x, y) get close z-values: the four quadrant
    # corners of a 2-bit space land in Morton order
    df = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 0), (1, 1)], "x long, y long"
    )
    out = with_z_value(df, ["x", "y"], bits=1)
    got = {(r.x, r.y): r["__z"] for r in out.collect()}
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}


def test_zorder_write_skips_on_both_dims(spark, tmp_path):
    df = _uniform_grid(spark)
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], bits=12, num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zcov = file_stat_ranges(spark, zpath, ["x", "y"])
    lcov = file_stat_ranges(spark, lpath, ["x", "y"])
    z_x = sum(c["x"] for c in zcov) / len(zcov)
    z_y = sum(c["y"] for c in zcov) / len(zcov)
    l_x = sum(c["x"] for c in lcov) / len(lcov)
    l_y = sum(c["y"] for c in lcov) / len(lcov)

    # linear: tight on the sort key, blind on the other
    assert l_x < 0.15
    assert l_y > 0.85
    # z-order: meaningfully tight on BOTH (16 curve segments over a 2-D
    # square -> each file covers a fraction of each axis)
    assert z_x < 0.6 and z_y < 0.6
    assert z_x + z_y < l_x + l_y

    # layout preserved the data
    import pyspark.sql.functions as F
    a = spark.read.parquet(zpath).agg(
        F.count(F.lit(1)), F.sum("x"), F.sum("y")
    ).collect()[0]
    b = df.agg(F.count(F.lit(1)), F.sum("x"), F.sum("y")).collect()[0]
    assert tuple(a) == tuple(b)
