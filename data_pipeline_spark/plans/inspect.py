"""Physical-plan inspection helpers.

The engine's scale guarantees are plan properties, not hopes: filters reach
the Parquet scans, dimensions broadcast, aggregates partially combine
map-side, hot expressions stay inside whole-stage codegen.  These helpers
make those properties assertable in tests and dumpable for review
(tools/explain_plans.py).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def global_window_nodes(df: DataFrame) -> list[str]:
    """Return the simpleString of every WindowExec with an EMPTY partition
    spec in the physical plan — the 'move every row to one task' shape
    (Spark itself warns 'No Partition Defined for Window operation').

    Uses the pre-adaptive physical plan (``sparkPlan``) so the walk sees
    WindowExec nodes directly instead of the AQE wrapper.
    """
    hits: list[str] = []

    def walk(node) -> None:
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            hits.append(node.simpleString(120))
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().sparkPlan())
    return hits


def assert_plan(
    df: DataFrame,
    contains: list[str] | None = None,
    absent: list[str] | None = None,
) -> str:
    """Assert plan markers (e.g. 'PushedFilters: [IsNotNull',
    'BroadcastHashJoin') appear / don't appear; returns the plan text."""
    plan = plan_text(df)
    for marker in contains or []:
        assert marker in plan, f"plan must contain {marker!r}:\n{plan}"
    for marker in absent or []:
        assert marker not in plan, f"plan must NOT contain {marker!r}:\n{plan}"
    return plan
