"""Unit semantics for the as-of join (operators/asof.py) and deterministic
hash sampling (operators/sampling.py). The oracle-level checks live in
test_queries.py (q58, q63); these pin the edge cases oracles can't reach:
strict-vs-inclusive boundary, timestamp ties, missing matches, and
partition-layout invariance of the sample."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.asof import asof_join
from snowflake_cdc_spark.operators.sampling import hash_bucket_threshold, hash_sample


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 20), (3, "k", 30), (4, "z", 5)],
        "id int, key string, ts int",
    )
    right = spark.createDataFrame(
        [("k", 10, "r10"), ("k", 20, "r20a"), ("k", 20, "r20b"), ("q", 1, "rq")],
        "key string, ts int, val string",
    )
    return left, right


def _lookup(df):
    return {r["id"]: r["match"] for r in df.collect()}


class TestAsofJoin:
    def test_strict_excludes_equal_ts(self, spark):
        left, right = _frames(spark)
        out = _lookup(
            asof_join(
                left, right, "key", "ts", "ts", {"val": "match"},
                tie_col="val", strict=True,
            )
        )
        # ts=10 strict: right@10 invisible -> NULL; ts=20: sees only right@10
        assert out == {1: None, 2: "r10", 3: "r20b", 4: None}

    def test_inclusive_includes_equal_ts(self, spark):
        left, right = _frames(spark)
        out = _lookup(
            asof_join(
                left, right, "key", "ts", "ts", {"val": "match"},
                tie_col="val", strict=False,
            )
        )
        # equal-ts rows visible; tie at ts=20 -> greatest tie_col wins
        assert out == {1: "r10", 2: "r20b", 3: "r20b", 4: None}

    def test_empty_right(self, spark):
        left, _ = _frames(spark)
        right = spark.createDataFrame([], "key string, ts int, val string")
        out = asof_join(left, right, "key", "ts", "ts", {"val": "match"})
        assert {r["match"] for r in out.collect()} == {None}
        assert out.count() == left.count()

    def test_preserves_left_columns_and_count(self, spark):
        left, right = _frames(spark)
        out = asof_join(
            left, right, "key", "ts", "ts", {"val": "match"}, tie_col="val"
        )
        assert out.columns == ["id", "key", "ts", "match"]
        assert out.count() == left.count()

    def test_multi_value_payload(self, spark):
        left, right = _frames(spark)
        out = asof_join(
            left,
            right,
            "key",
            "ts",
            "ts",
            {"val": "match", "ts": "match_ts"},
            tie_col="val",
        )
        rows = {r["id"]: (r["match"], r["match_ts"]) for r in out.collect()}
        assert rows[3] == ("r20b", 20)
        assert rows[1] == (None, None)


class TestHashSample:
    def test_threshold_bounds(self):
        assert hash_bucket_threshold(0.0) == "0000"
        assert hash_bucket_threshold(1.0) == "ffff"
        assert hash_bucket_threshold(0x1999 / 65536) == "1999"

    def test_deterministic_across_partitionings(self, spark):
        df = spark.range(0, 5000).withColumnRenamed("id", "k")
        a = sorted(r["k"] for r in hash_sample(df, "k", 0.1).collect())
        b = sorted(
            r["k"] for r in hash_sample(df.repartition(17), "k", 0.1).collect()
        )
        assert a == b
        # ~10% within loose tolerance
        assert 300 <= len(a) <= 700

    def test_keys_move_together(self, spark):
        # duplicate keys are kept/dropped as a unit
        df = spark.range(0, 1000).select((F.col("id") % 100).alias("k"))
        kept = hash_sample(df, "k", 0.2).groupBy("k").count().collect()
        assert all(r["count"] == 10 for r in kept)

    def test_fraction_validation(self):
        import pytest

        with pytest.raises(ValueError):
            hash_bucket_threshold(1.5)

    def test_stratified_fractions_and_determinism(self, spark):
        from pyspark.sql import functions as F

        from snowflake_cdc_spark.operators.sampling import stratified_hash_sample

        df = spark.range(0, 4000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
        )
        out = stratified_hash_sample(
            df, key="k", strata_col="g", fractions={"a": 0.1}, default_fraction=1.0
        )
        counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
        assert counts["b"] == 2000  # default 100%
        assert 100 <= counts["a"] <= 320  # ~10% of 2000
        # layout-invariant
        again = stratified_hash_sample(
            df.repartition(13), key="k", strata_col="g",
            fractions={"a": 0.1}, default_fraction=1.0,
        )
        assert sorted(r["k"] for r in out.collect()) == sorted(
            r["k"] for r in again.collect()
        )


class TestWeightedSampleAes:
    def test_layout_invariant_and_zero_weight_excluded(self, spark):
        from snowflake_cdc_spark.operators.sampling import weighted_sample_aes

        df = spark.range(0, 2000).select(
            F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("w")
        ).withColumn("w", F.when(F.col("k") % 10 == 0, 0).otherwise(F.col("w")))
        a = sorted(r.k for r in weighted_sample_aes(df, "w", 50, "k").collect())
        b = sorted(
            r.k
            for r in weighted_sample_aes(df.repartition(13), "w", 50, "k").collect()
        )
        assert a == b and len(a) == 50
        assert all(k % 10 != 0 for k in a)  # zero-weight rows never sampled

    def test_heavy_weights_dominate(self, spark):
        from snowflake_cdc_spark.operators.sampling import weighted_sample_aes

        rows = [(i, 10_000) for i in range(50)] + [
            (i, 1) for i in range(50, 1050)
        ]
        df = spark.createDataFrame(rows, "k long, w long")
        got = {r.k for r in weighted_sample_aes(df, "w", 50, "k").collect()}
        heavy = sum(1 for k in got if k < 50)
        # E[heavy] ~ 50 * (1 - tiny); a uniform sampler would pick ~2.4
        assert heavy >= 40, heavy
