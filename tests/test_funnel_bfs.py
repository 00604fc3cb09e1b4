"""Funnel conversion (operators/funnel.py) and multi-source BFS
(operators/bfs.py): planted-sequence and planted-graph exactness."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.bfs import khop_distances
from snowflake_cdc_spark.operators.funnel import funnel_counts


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


class TestFunnel:
    def test_strict_order_and_earliest_match(self, spark):
        rows = [
            # u1 converts fully, in order
            (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
            # u2: purchase BEFORE click -> stops at click
            (2, 1, "view"), (2, 2, "purchase"), (2, 3, "click"),
            # u3: only views
            (3, 1, "view"), (3, 2, "view"),
            # u4: click with no prior view -> never enters funnel
            (4, 1, "click"), (4, 2, "purchase"),
            # u5: matched to EARLIEST view; purchase after later click
            (5, 1, "view"), (5, 5, "click"), (5, 6, "purchase"), (5, 4, "view"),
        ]
        got = {
            (r.step, r.step_name): r.n_users
            for r in funnel_counts(_ev(spark, rows), ["view", "click", "purchase"]).collect()
        }
        assert got == {(1, "view"): 4, (2, "click"): 3, (3, "purchase"): 2}

    def test_equal_timestamps_do_not_advance(self, spark):
        # click at the SAME second as the view: strict > rejects it
        rows = [(1, 1, "view"), (1, 1, "click"), (1, 2, "click")]
        got = {r.step_name: r.n_users
               for r in funnel_counts(_ev(spark, rows), ["view", "click"]).collect()}
        assert got == {"view": 1, "click": 1}
        rows2 = [(1, 1, "view"), (1, 1, "click")]
        got2 = {r.step_name: r.n_users
                for r in funnel_counts(_ev(spark, rows2), ["view", "click"]).collect()}
        assert got2 == {"view": 1, "click": 0}

    def test_zero_matching_events_counts_are_zero_not_null(self, spark):
        # VERDICT r04 #1: no event matches ANY step -> the per-user
        # relation is empty and F.sum over it is NULL; every step count
        # must coalesce to 0 (a user hits this the first time they typo
        # a step name). Registry twin: q150b_funnel_nomatch.
        rows = [(1, 0, "x")]
        got = funnel_counts(_ev(spark, rows), ["view", "click", "purchase"]).collect()
        assert [(r.step, r.step_name, r.n_users) for r in got] == [
            (1, "view", 0), (2, "click", 0), (3, "purchase", 0),
        ]
        # partial miss: only the absent middle/terminal steps are 0
        rows2 = [(1, 1, "view"), (2, 2, "view")]
        got2 = {r.step_name: r.n_users for r in funnel_counts(
            _ev(spark, rows2), ["view", "zz_absent", "purchase"]).collect()}
        assert got2 == {"view": 2, "zz_absent": 0, "purchase": 0}


class TestBfs:
    def _edges(self, spark, pairs):
        # undirected: both directions
        both = pairs + [(b, a) for a, b in pairs]
        return spark.createDataFrame(both, "src long, dst long")

    def test_chain_distances_and_hop_bound(self, spark):
        edges = self._edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)])
        seeds = spark.createDataFrame([(1,)], "node long")
        got = {r.node: r.dist for r in khop_distances(edges, seeds, 3).collect()}
        # 5 is 4 hops away -> outside max_hops; 8/9 disconnected
        assert got == {1: 0, 2: 1, 3: 2, 4: 3}

    def test_multi_source_takes_minimal_distance(self, spark):
        edges = self._edges(spark, [(1, 2), (2, 3), (3, 4), (4, 10), (10, 2)])
        seeds = spark.createDataFrame([(1,), (10,)], "node long")
        got = {r.node: r.dist for r in khop_distances(edges, seeds, 3).collect()}
        # node 4: dist 1 via seed 10 (not 3 via seed 1); node 3: 2 either way
        assert got == {1: 0, 10: 0, 2: 1, 4: 1, 3: 2}


class TestWindowedFunnel:
    def test_window_excludes_late_transitions(self, spark):
        rows = [
            # u1: click 10 min after view -> converts with 30-min window
            (1, 0, "view"), (1, 10, "click"),
            # u2: click 40 min after view -> window expired
            (2, 0, "view"), (2, 40, "click"),
        ]
        ev = spark.createDataFrame(
            [(u, datetime(2024, 1, 1, 0, m), t) for u, m, t in rows],
            "user_id long, ts timestamp, event_type string",
        )
        got = {r.step_name: r.n_users
               for r in funnel_counts(ev, ["view", "click"],
                                      within="30 minutes").collect()}
        assert got == {"view": 2, "click": 1}

    def test_anchored_no_reanchor(self, spark):
        # u1 has a second view (minute 45) whose 30-min window WOULD
        # cover the click at minute 55, but semantics anchor to the
        # EARLIEST view (minute 0) -> no conversion
        rows = [(1, 0, "view"), (1, 45, "view"), (1, 55, "click")]
        ev = spark.createDataFrame(
            [(u, datetime(2024, 1, 1, 0, m), t) for u, m, t in rows],
            "user_id long, ts timestamp, event_type string",
        )
        got = {r.step_name: r.n_users
               for r in funnel_counts(ev, ["view", "click"],
                                      within="30 minutes").collect()}
        assert got == {"view": 1, "click": 0}


class TestBfsEarlyExit:
    def test_stops_when_frontier_drains(self, spark):
        edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        seeds = spark.createDataFrame([(1,)], "node long")
        got = {r.node: r.dist for r in khop_distances(edges, seeds, 50).collect()}
        assert got == {1: 0, 2: 1}


class TestBoundedShortestPaths:
    def test_planted_weighted_graph(self, spark):
        from snowflake_cdc_spark.operators.bfs import bounded_shortest_paths

        # 1 -2-> 2 -2-> 3; direct 1 -9-> 3: within 3 rounds the 2-hop
        # path (4) beats the 1-hop (9); node 4 only via 3 edges (6)
        edges = spark.createDataFrame(
            [(1, 2, 2), (2, 3, 2), (1, 3, 9), (3, 4, 2)],
            "src long, dst long, w long",
        )
        seeds = spark.createDataFrame([(1,)], "node long")
        got = {r.node: r.d for r in bounded_shortest_paths(edges, seeds, 3).collect()}
        assert got == {1: 0, 2: 2, 3: 4, 4: 6}
        # with only 1 round the direct expensive edge is the best known
        got1 = {r.node: r.d for r in bounded_shortest_paths(edges, seeds, 1).collect()}
        assert got1 == {1: 0, 2: 2, 3: 9}

    def test_seed_distance_never_relaxes_above_zero(self, spark):
        from snowflake_cdc_spark.operators.bfs import bounded_shortest_paths

        edges = spark.createDataFrame([(1, 2, 5), (2, 1, 5)], "src long, dst long, w long")
        seeds = spark.createDataFrame([(1,), (2,)], "node long")
        got = {r.node: r.d for r in bounded_shortest_paths(edges, seeds, 3).collect()}
        assert got == {1: 0, 2: 0}
