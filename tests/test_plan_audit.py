"""Plan-audit gate parser (tools/plan_audit.py): the tree-text parser
and the consumer classification on real plan shapes — the gate is only
as good as its parser (round-6 lesson: two regex bugs silently passed
corrupted chains before the fix)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from plan_audit import _name, _parse, audit_plan

GLOBAL_WINDOW = """AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number() windowspecdefinition(id#0L ASC NULLS FIRST)], [id#0L ASC NULLS FIRST]
   +- Sort [id#0L ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=12]
         +- Project [id#0L]
            +- Range (0, 100, step=1, splits=32)"""

PARTITIONED_WINDOW = """AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number()], [g#1L], [id#0L ASC NULLS FIRST]
   +- Sort [g#1L ASC NULLS FIRST, id#0L ASC NULLS FIRST], false, 0
      +- Exchange hashpartitioning(g#1L, 32), ENSURE_REQUIREMENTS, [plan_id=27]
         +- Range (0, 100, step=1, splits=32)"""

GLOBAL_AGG = """AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[], functions=[sum(x#3L)])
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]
      +- HashAggregate(keys=[], functions=[partial_sum(x#3L)])
         +- Range (0, 100, step=1, splits=32)"""

# the r06 parser bugs: ":- Node" under a Union, and a window on a
# BRANCH whose depth markers use ":  " continuation prefixes
UNION_BRANCHES = """AdaptiveSparkPlan isFinalPlan=false
+- Union
   :- SortAggregate(key=[], functions=[sum(c#13L)])
   :  +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=446]
   :     +- Project [c#13L]
   :        +- BroadcastExchange HashedRelationBroadcastMode, [plan_id=441]
   :           +- Window [sum(__cnt#30L) windowspecdefinition(__b#51L ASC NULLS FIRST)], [__b#51L ASC NULLS FIRST]
   :              +- Sort [__b#51L ASC NULLS FIRST], false, 0
   :                 +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=435]
   :                    +- Range (0, 100, step=1, splits=32)
   +- SortAggregate(key=[], functions=[sum(c#88L)])
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=476]
         +- Range (0, 100, step=1, splits=32)"""

CARTESIAN = """AdaptiveSparkPlan isFinalPlan=false
+- CartesianProduct (a#1L < b#2L)
   :- Range (0, 100, step=1, splits=32)
   +- Range (0, 3, step=1, splits=32)"""

BROADCAST_NLJ = """AdaptiveSparkPlan isFinalPlan=false
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- Range (0, 100, step=1, splits=32)
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=50]
      +- Range (0, 3, step=1, splits=32)"""

TAKE_ORDERED = """AdaptiveSparkPlan isFinalPlan=false
+- TakeOrderedAndProject(limit=10, orderBy=[x#1L ASC NULLS FIRST])
   +- Range (0, 100, step=1, splits=32)"""


class TestParser:
    def test_branch_marker_nodes_parse(self):
        nodes = _parse(UNION_BRANCHES)
        names = [_name(n) for _, n in nodes]
        assert "SortAggregate" in names and "-" not in names and ":" not in names

    def test_codegen_star_stripped(self):
        assert _name("*(3) HashAggregate(keys=[])") == "HashAggregate"

    def test_depths_monotone_on_branch(self):
        nodes = _parse(UNION_BRANCHES)
        by_name = {(_name(n)): d for d, n in nodes}
        assert by_name["Union"] < by_name["SortAggregate"]


class TestAuditRules:
    def test_global_window_flagged(self):
        assert audit_plan(GLOBAL_WINDOW) == [
            "global-window: Exchange SinglePartition -> Window"
        ]

    def test_partitioned_window_passes(self):
        assert audit_plan(PARTITIONED_WINDOW) == []

    def test_global_agg_passes(self):
        assert audit_plan(GLOBAL_AGG) == []

    def test_union_branch_window_found_once(self):
        # one global window (on the branch), both SortAggregate
        # single-partition finishers pass
        assert audit_plan(UNION_BRANCHES) == [
            "global-window: Exchange SinglePartition -> Window"
        ]

    def test_cartesian_flagged_broadcast_passes(self):
        assert audit_plan(CARTESIAN) == ["cartesian: CartesianProduct"]
        assert audit_plan(BROADCAST_NLJ) == []

    def test_take_ordered_passes(self):
        assert audit_plan(TAKE_ORDERED) == []


ROW_UDF = """AdaptiveSparkPlan isFinalPlan=false
+- Project [pythonUDF0#21 AS y#9]
   +- BatchEvalPython [f(x#0L)#8], [pythonUDF0#21]
      +- Range (0, 100, step=1, splits=32)"""

ARROW_UDF = """AdaptiveSparkPlan isFinalPlan=false
+- Project [pythonUDF0#21 AS y#9]
   +- ArrowEvalPython [f(x#0L)#8], [pythonUDF0#21], 200
      +- Range (0, 100, step=1, splits=32)"""


class TestPythonBoundary:
    def test_row_udf_flagged(self):
        flags = audit_plan(ROW_UDF)
        assert len(flags) == 1 and flags[0].startswith("row-udf: BatchEvalPython")

    def test_arrow_udf_flagged(self):
        flags = audit_plan(ARROW_UDF)
        assert flags == ["arrow-python: ArrowEvalPython"]

    def test_planted_row_udf_real_plan(self, spark):
        """The gate fires on a REAL row-at-a-time UDF plan, not just
        synthetic text (VERDICT r06 #5 'planted row-UDF test')."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        nasty = F.udf(lambda x: x + 1, LongType())
        df = spark.range(10).select(nasty("id").alias("y"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        flags = audit_plan(plan)
        assert any(f.startswith("row-udf: BatchEvalPython") for f in flags)

    def test_pandas_udf_real_plan_is_arrow_not_row(self, spark):
        from pyspark.sql.functions import pandas_udf

        plus_one = pandas_udf(lambda s: s + 1, "long")
        df = spark.range(10).select(plus_one("id").alias("y"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        flags = audit_plan(plan)
        assert any(f.startswith("arrow-python") for f in flags)
        assert not any(f.startswith("row-udf") for f in flags)
