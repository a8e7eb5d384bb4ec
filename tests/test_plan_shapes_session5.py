"""Plan-shape regression gates for the session-5 operators (same contract
as test_plan_shapes_session4: the docstrings' scale claims must be visible
in the physical plan)."""

from __future__ import annotations

from wicsmmiretl_spark.operators.graph import butterfly_stats
from wicsmmiretl_spark.operators.layout import zonemap_pruning_report


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_butterfly_wedge_join_is_keyed_not_cartesian(spark):
    edges = [(i % 7, (i * 3) % 5) for i in range(40)]
    plan = _plan(butterfly_stats(spark.createDataFrame(edges, ["l", "r"]), "l", "r"))
    # Wedges come from the centre-keyed equi self-join, never an all-pairs.
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_zonemap_report_pins_the_layout_sort(spark):
    rows = [(a, b, a * 16 + b) for a in range(16) for b in range(16)]
    df = zonemap_pruning_report(
        spark.createDataFrame(rows, ["a", "b", "tb"]),
        cols=["a", "b"],
        n_files=8,
        predicates=[("a_band", {"a": (2, 5)}), ("b_band", {"b": (2, 5)})],
        tiebreak=["tb"],
    )
    plan = _plan(df)
    # The two ntile global sorts run ONCE per strategy when the lazy
    # checkpoint materializes; the 4 per-predicate report rows must scan
    # the pinned zone maps (ExistingRDD), not replay the Window.
    assert "Window" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan
