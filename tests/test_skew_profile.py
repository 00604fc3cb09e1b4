"""Join-key skew profiler (operators/skew.py): planted distributions
with hand-computed Gini rationals and tie semantics."""

from __future__ import annotations

from snowflake_cdc_spark.operators.skew import skew_profile


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


class TestSkewProfile:
    def test_uniform_keys_gini_zero(self, spark):
        # counts x = [2, 2, 2]: sum(i*x) = 12, num = 2*12 - 4*6 = 0
        r = skew_profile(_df(spark, [1, 1, 2, 2, 3, 3]), "k", "t.k").collect()[0]
        assert (r.n_rows, r.n_distinct, r.max_count) == (6, 3, 2)
        assert (r.gini_num, r.gini_den) == (0, 18)

    def test_skewed_keys_exact_rational(self, spark):
        # counts ascending x = [1, 1, 4] (key 3 heavy):
        # sum(i*x) = 1 + 2 + 12 = 15; num = 30 - 4*6 = 6; den = 3*6 = 18
        r = skew_profile(
            _df(spark, [3, 3, 3, 3, 1, 2]), "k", "t.k"
        ).collect()[0]
        assert (r.max_count, r.top_key) == (4, "3")
        assert (r.gini_num, r.gini_den) == (6, 18)

    def test_top_key_tie_goes_to_smallest(self, spark):
        r = skew_profile(_df(spark, [5, 5, 2, 2, 9]), "k", "t.k").collect()[0]
        assert (r.max_count, r.top_key) == (2, "2")

    def test_top_key_string_keys_not_nulled(self, spark):
        # ADVICE r05: a bigint cast silently NULLed non-numeric keys —
        # the profiler is a general diagnostic, so strings must survive
        df = spark.createDataFrame(
            [("us",), ("us",), ("fr",)], "k string"
        )
        r = skew_profile(df, "k", "t.k").collect()[0]
        assert (r.max_count, r.top_key) == (2, "us")

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame([(1,), (None,), (1,)], "k long")
        r = skew_profile(df, "k", "t.k").collect()[0]
        assert (r.n_rows, r.n_distinct) == (2, 1)
