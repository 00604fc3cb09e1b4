"""snapshot_diff (operators/diff.py) edge semantics: the one-aggregation
two-horizon diff must agree with the obvious two-snapshot construction
on every lifecycle shape — update, delete, reinsert-after-delete,
created-and-deleted-between-horizons, unchanged, NULL transitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.diff import snapshot_diff

SCHEMA = "k string, seq long, is_delete boolean, v1 int, v2 string"

# (k, seq, is_delete, v1, v2)
LOG = [
    ("upd", 1, False, 1, "x"),
    ("upd", 5, False, 2, "x"),        # changed: v1 only
    ("del", 1, False, 1, "x"),
    ("del", 5, True, None, None),     # removed
    ("add", 5, False, 9, "z"),        # added (born after s1)
    ("ghost", 4, False, 1, "g"),      # born after s1...
    ("ghost", 6, True, None, None),   # ...and deleted before s2 → no row
    ("same", 1, False, 7, "s"),
    ("same", 5, False, 7, "s"),       # re-asserted, identical → no row
    ("dead", 1, False, 1, "d"),
    ("dead", 2, True, None, None),    # deleted before s1 → absent both
    ("back", 1, False, 1, "b"),
    ("back", 2, True, None, None),
    ("back", 6, False, 1, "b"),       # reinsert after s1 → added
    ("nul", 1, False, None, "n"),
    ("nul", 5, False, 3, None),       # NULL→3 and n→NULL: both count
]

S1 = 3


def _diff(spark, s2=None):
    df = spark.createDataFrame(LOG, SCHEMA)
    return {
        r["k"]: (r["change_type"], tuple(r["changed_cols"]), r["n_changed_cols"])
        for r in snapshot_diff(df, ["k"], ["v1", "v2"], s1=S1, s2=s2).collect()
    }


def test_change_classification(spark):
    got = _diff(spark)
    assert got == {
        "upd": ("changed", ("v1",), 1),
        "del": ("removed", (), 0),
        "add": ("added", (), 0),
        "back": ("added", (), 0),
        "nul": ("changed", ("v1", "v2"), 2),
    }


def test_s2_bound_scopes_the_log(spark):
    got = _diff(spark, s2=5)
    # the 'back' reinsert at seq 6 is beyond s2=5, and its delete (seq 2)
    # is before s1 — absent at BOTH horizons → no row
    assert "back" not in got
    # 'ghost' was deleted at seq 6, also beyond s2 → visible as added
    assert got["ghost"] == ("added", (), 0)
    # full log: ghost born AND died between the horizons → no row at all
    assert "ghost" not in _diff(spark)


def test_single_exchange_plan(spark):
    """The whole diff is one hash aggregation: exactly one shuffle
    exchange, no join operator in the physical plan."""
    df = spark.createDataFrame(LOG, SCHEMA)
    plan = snapshot_diff(df, ["k"], ["v1", "v2"], s1=S1)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
