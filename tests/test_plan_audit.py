"""Global plan-audit sweep: every registered BATCH query's physical
plan is built at sf0.001 and checked for the two classic
scale-killers — CartesianProduct on data-sized relations and
row-at-a-time Python evaluation (BatchEvalPython). Catches a
regression in ANY query the moment a refactor de-optimizes a plan,
without executing the queries.

BroadcastNestedLoopJoin is allowed: the repo's crossJoins are
broadcasts of 1-row/constant-size computed frames (bitmaps, totals,
anchors), which plan as BNLJ. Arrow-vectorized Python
(ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is allowed:
that is the sanctioned extension surface (operators/udf_surface.py).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as contract

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

BATCH_QUERIES = sorted(
    name for name in contract.queries() if not name.startswith("stream_")
)


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_scale_killers_in_plan(spark, sf_dir, name):
    df = contract.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    for bad in FORBIDDEN:
        assert bad not in plan, f"{name}: {bad} in physical plan"
