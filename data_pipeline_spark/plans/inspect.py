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
