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

    def test_empty_bucket_spine_reports_carry(self, spark):
        # one session 00:30 -> 03:10: hours 01 and 02 contain NO
        # boundary; the default output skips them, the spine mode
        # reports peak = carry = 1 (the session runs straight through)
        iv = self._iv(spark, [(0, 30, 3, 10), (0, 40, 0, 50)])
        default = {
            r.bucket_ts.hour for r in peak_concurrency_by_bucket(iv).collect()
        }
        assert default == {0, 3}
        spine = {
            r.bucket_ts.hour: (r.n_starts, r.peak)
            for r in peak_concurrency_by_bucket(
                iv, include_empty_buckets=True
            ).collect()
        }
        assert spine == {0: (2, 2), 1: (0, 1), 2: (0, 1), 3: (0, 1)}


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


class TestKmeansExact:
    def _blobs(self, spark):
        # three tight, well-separated 4-d blobs (20/30/50 members).
        # Lloyd only recovers blobs when initialization spreads across
        # them, so the blob labels are arranged such that the 3
        # md5-smallest vec_ids (the operator's deterministic seeds)
        # land one per blob — otherwise a merged-blob local optimum is
        # CORRECT Lloyd behavior, not a defect.
        import hashlib

        centers = {0: 0.0, 1: 0.3, 2: -0.4}
        sizes = {0: 20, 1: 30, 2: 50}
        ids = list(range(100))
        md5_order = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
        blob_of = {md5_order[0]: 0, md5_order[1]: 1, md5_order[2]: 2}
        remaining = {b: n - 1 for b, n in sizes.items()}
        for i in ids:
            if i in blob_of:
                continue
            b = next(bb for bb, left in remaining.items() if left > 0)
            blob_of[i] = b
            remaining[b] -= 1
        rows = []
        for i in ids:
            eps = ((i % 5) - 2) * 1e-3
            rows.append((i, [centers[blob_of[i]] + eps] * 4))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), sizes

    def test_recovers_planted_blobs(self, spark):
        from snowflake_cdc_spark.operators.kmeans_exact import kmeans_exact

        df, sizes = self._blobs(spark)
        res = kmeans_exact(df, k=3, rounds=3).collect()
        assert sorted(r.n_members for r in res) == sorted(sizes.values())
        # inertia is tiny: every member within 2e-3 of its blob center
        assert all(r.inertia < 4 * (0.003 * 10_000) ** 2 * 100 for r in res)

    def test_layout_invariant(self, spark):
        from snowflake_cdc_spark.operators.kmeans_exact import kmeans_exact

        df, _ = self._blobs(spark)
        a = sorted(map(tuple, kmeans_exact(df, k=3, rounds=2).collect()))
        b = sorted(
            map(tuple, kmeans_exact(df.repartition(7), k=3, rounds=2).collect())
        )
        assert a == b

    def test_collapsed_cells_drop_deterministically(self, spark):
        from snowflake_cdc_spark.operators.kmeans_exact import kmeans_exact

        # only TWO distinct point locations but k=4: after the first
        # update at most 2 cells keep members; the rest drop and the
        # final summary still accounts for every vector
        rows = [(i, [0.0] * 4) for i in range(10)] + [
            (i, [0.5] * 4) for i in range(10, 30)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        res = kmeans_exact(df, k=4, rounds=3).collect()
        assert sum(r.n_members for r in res) == 30
        assert len(res) <= 4 and all(r.inertia == 0 for r in res)


class TestIvfExact:
    def test_full_probe_equals_brute_force(self, spark):
        from snowflake_cdc_spark.operators.ivf_exact import ivf_exact_search
        from snowflake_cdc_spark.operators.kmeans_exact import (
            kmeans_fit,
            quantize_vectors,
        )
        from snowflake_cdc_spark.sources.io import read_table
        from tests.conftest import SF_ORACLE

        emb = read_table(spark, SF_ORACLE, "embeddings")
        centroids, assigned = kmeans_fit(emb, k=8, rounds=2)
        assigned = assigned.persist()
        try:
            qs = quantize_vectors(
                emb.filter(F.col("vec_id") % 25 == 0).select("vec_id", "embedding")
            ).select(F.col("vec_id").alias("query_id"), "qv")
            full = ivf_exact_search(centroids, assigned, qs, k=5, nprobe=8)
            # brute force on the same integer grid
            corpus = assigned.select(
                F.col("vec_id"), F.col("qv").alias("cqv")
            )
            brute = (
                qs.crossJoin(corpus)
                .filter(F.col("vec_id") != F.col("query_id"))
                .select(
                    "query_id",
                    "vec_id",
                    F.aggregate(
                        F.zip_with(
                            "qv", "cqv", lambda x, y: (x - y) * (x - y)
                        ),
                        F.lit(0).cast("bigint"),
                        lambda a, x: a + x,
                    ).alias("dist"),
                )
            )
            from pyspark.sql import Window

            w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
            brute = (
                brute.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 5)
                .drop("rn")
            )
            assert sorted(map(tuple, full.collect())) == sorted(
                map(tuple, brute.collect())
            )
            # pruned probe keeps decent recall on this corpus
            pruned = ivf_exact_search(centroids, assigned, qs, k=5, nprobe=4)
            got = {(r.query_id, r.vec_id) for r in pruned.collect()}
            want = {(r.query_id, r.vec_id) for r in brute.collect()}
            assert len(got & want) / len(want) >= 0.7
        finally:
            assigned.unpersist()


class TestGroupedOls:
    def test_planted_slopes_are_exact_rationals(self, spark):
        from snowflake_cdc_spark.operators.regression import grouped_ols_rational

        # group a: y = 3x exactly -> slope 3; group b: y = 10 - 2x
        rows = [("a", x, 3 * x) for x in range(10)] + [
            ("b", x, 10 - 2 * x) for x in range(10)
        ]
        df = spark.createDataFrame(rows, "g string, x long, y long")
        out = {r.g: (r.slope_num, r.slope_den, r.n_events)
               for r in grouped_ols_rational(df, "g", F.col("x"), F.col("y")).collect()}
        for g, want in (("a", 3), ("b", -2)):
            num, den, n = out[g]
            assert n == 10 and den > 0 and num == want * den

    def test_layout_invariant(self, spark):
        from snowflake_cdc_spark.operators.regression import grouped_ols_rational

        rows = [("g", x, (x * 7919) % 1000) for x in range(500)]
        df = spark.createDataFrame(rows, "g string, x long, y long")
        a = grouped_ols_rational(df, "g", F.col("x"), F.col("y")).collect()
        b = grouped_ols_rational(
            df.repartition(11), "g", F.col("x"), F.col("y")
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestCusumChangepoint:
    def test_planted_level_shift_found_exactly(self, spark):
        from snowflake_cdc_spark.operators.changepoint import cusum_changepoint

        # 40 points at level 10, then 60 at level 30: |S_k| peaks at the
        # boundary k=40 (scaled magnitude = k*(n*10 - Y) at its extremum)
        rows = [("g", i, 10) for i in range(40)] + [
            ("g", 40 + i, 30) for i in range(60)
        ]
        df = spark.createDataFrame(rows, "g string, i long, y long")
        r = cusum_changepoint(df, "g", "i", F.col("y")).first()
        n, Y = 100, 40 * 10 + 60 * 30
        expected_peak = abs(40 * (n * 10) - 40 * Y)
        assert (r.n, r.cp_index, r.cp_max_abs) == (100, 40, expected_peak)

    def test_tie_breaks_to_earliest_position(self, spark):
        from snowflake_cdc_spark.operators.changepoint import cusum_changepoint

        # symmetric square wave: |S| ties at multiple k -> earliest wins
        rows = [("g", 0, 0), ("g", 1, 2), ("g", 2, 0), ("g", 3, 2)]
        df = spark.createDataFrame(rows, "g string, i long, y long")
        r = cusum_changepoint(df, "g", "i", F.col("y")).first()
        # devs (n=4, Y=4): -4, +4, -4, +4 -> S = -4, 0, -4, 0; |S| max 4
        # at k=1 and k=3 -> earliest k=1
        assert (r.cp_index, r.cp_max_abs) == (1, 4)

    def test_layout_invariant(self, spark):
        from snowflake_cdc_spark.operators.changepoint import cusum_changepoint

        rows = [("a", i, (i * 31) % 97) for i in range(300)] + [
            ("b", i, 5 if i < 100 else 50) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "g string, i long, y long")
        x = [tuple(r) for r in cusum_changepoint(df, "g", "i", F.col("y")).collect()]
        y = [tuple(r) for r in cusum_changepoint(
            df.repartition(13), "g", "i", F.col("y")).collect()]
        assert x == y
        assert dict((t[0], t[2]) for t in x)["b"] == 100  # planted shift


class TestSkyline:
    @staticmethod
    def _skyline(pts):
        from pyspark.sql import Window

        dpts = pts.select("price_c", "size").distinct()
        w = (
            Window.orderBy("price_c", F.desc("size"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        front = (
            dpts.withColumn("bp", F.max("size").over(w))
            .filter(F.col("bp").isNull() | (F.col("size") > F.col("bp")))
            .select("price_c", "size")
        )
        return pts.join(front, ["price_c", "size"], "left_semi")

    def test_planted_frontier_keeps_duplicate_frontier_points(self, spark):
        # frontier pairs: (1,5) and (2,9); (2,4),(3,9),(3,1) dominated.
        # BOTH copies of (1,5) must survive — the strict > on raw rows
        # would drop the second (the bug the distinct-pair form fixes);
        # (3,9) is dominated by (2,9) (equal size, worse price)
        pts = spark.createDataFrame(
            [(1, 1, 5), (2, 2, 4), (3, 2, 9), (4, 3, 9), (5, 3, 1), (6, 1, 5)],
            "id long, price_c long, size long",
        )
        got = sorted(r.id for r in self._skyline(pts).collect())
        assert got == [1, 3, 6]

    def test_matches_bruteforce_dominance(self, spark):
        # independent O(n^2) dominance reference on a deterministic blob
        rows = [(i, (i * 37) % 23, (i * 61) % 19) for i in range(120)]
        pts = spark.createDataFrame(rows, "id long, price_c long, size long")
        got = sorted(r.id for r in self._skyline(pts).collect())
        want = sorted(
            i
            for i, p, sz in rows
            if not any(
                (p2 <= p and s2 >= sz) and (p2 < p or s2 > sz)
                for _, p2, s2 in rows
            )
        )
        assert got == want
