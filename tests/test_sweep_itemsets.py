"""Bucketed sweep-line concurrency (operators/sweepline.py) and
a-priori frequent pairs (operators/itemsets.py): planted exactness."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.itemsets import frequent_pairs
from snowflake_cdc_spark.operators.sweepline import peak_concurrency_by_bucket


class TestSweepLine:
    def _iv(self, spark, rows):
        return spark.createDataFrame(
            [
                (datetime(2024, 1, 1, h1, m1), datetime(2024, 1, 1, h2, m2))
                for h1, m1, h2, m2 in rows
            ],
            "start_ts timestamp, end_ts timestamp",
        )

    def test_peak_with_cross_bucket_carry(self, spark):
        # three sessions span 00:50-01:20 -> hour 01 starts with carry 3;
        # one more starts 01:10 -> peak 4 in hour 01 though only 1 starts there
        iv = self._iv(
            spark,
            [(0, 50, 1, 20), (0, 51, 1, 20), (0, 52, 1, 20), (1, 10, 1, 30)],
        )
        rows = {r.bucket_ts.hour: (r.n_starts, r.peak)
                for r in peak_concurrency_by_bucket(iv).collect()}
        assert rows[0] == (3, 3)
        assert rows[1] == (1, 4)

    def test_half_open_touching_intervals_do_not_overlap(self, spark):
        # B starts exactly when A ends -> peak 1, not 2
        iv = self._iv(spark, [(0, 0, 0, 10), (0, 10, 0, 20)])
        rows = peak_concurrency_by_bucket(iv).collect()
        assert [(r.n_starts, r.peak) for r in rows] == [(2, 1)]


class TestFrequentPairs:
    def test_apriori_prune_and_counts(self, spark):
        rows = (
            # pair (1,2) in 3 baskets; (1,3) in 1 basket only
            [(b, i) for b in (10, 11, 12) for i in (1, 2)]
            + [(10, 3)]
            # a basket made ONLY of one-off items: zero candidates after
            # the frequent-item prune (the a-priori win)
            + [(99, i) for i in range(100, 110)]
        )
        df = spark.createDataFrame(rows, "basket long, item long")
        got = [(r.item_a, r.item_b, r.support)
               for r in frequent_pairs(df, min_support=2).collect()]
        assert got == [(1, 2, 3)]
        # duplicates within a basket collapse (set semantics)
        dup = spark.createDataFrame(rows + [(10, 1), (10, 2)], "basket long, item long")
        got2 = [(r.item_a, r.item_b, r.support)
                for r in frequent_pairs(dup, min_support=2).collect()]
        assert got2 == [(1, 2, 3)]


class TestInterpolateResample:
    def test_planted_interpolation_and_boundaries(self, spark):
        from snowflake_cdc_spark.operators.resample import interpolate_resample

        obs = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1, 1, 0), 10.0),
                (1, datetime(2024, 1, 1, 3, 0), 20.0),
                (1, datetime(2024, 1, 1, 3, 30), 100.0),
            ],
            "user_id long, ts timestamp, value double",
        )
        grid = spark.createDataFrame(
            [(1, datetime(2024, 1, 1, h, 0)) for h in range(0, 5)],
            "user_id long, grid_ts timestamp",
        )
        got = {r.grid_ts.hour: r.value
               for r in interpolate_resample(obs, grid).collect()}
        assert got[0] == 10.0   # before first obs -> backfill
        assert got[1] == 10.0   # exactly AT an observation
        assert got[2] == 15.0   # midpoint of (10, 20)
        assert got[3] == 20.0   # at the 3:00 observation (not the 3:30 one)
        assert got[4] == 100.0  # after last obs -> hold

    def test_single_observation_key_is_constant(self, spark):
        from snowflake_cdc_spark.operators.resample import interpolate_resample

        obs = spark.createDataFrame(
            [(7, datetime(2024, 1, 1, 2, 15), 42.5)],
            "user_id long, ts timestamp, value double",
        )
        grid = spark.createDataFrame(
            [(7, datetime(2024, 1, 1, h, 0)) for h in (0, 2, 4)],
            "user_id long, grid_ts timestamp",
        )
        vals = [r.value for r in interpolate_resample(obs, grid).collect()]
        assert vals == [42.5, 42.5, 42.5]
