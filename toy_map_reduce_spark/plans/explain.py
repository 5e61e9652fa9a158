"""Plan inspection helpers — the engine's replacement for hand-checking
``.explain()`` output. Used by tests/test_plans.py to pin the physical-plan
properties that matter at 100 TB (pruning, pushdown, broadcast, partial
aggregation, top-k).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode)`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_properties(df: DataFrame) -> dict[str, bool | int | list[str]]:
    """Summarize scale-relevant properties of the physical plan."""
    plan = explain_str(df)
    read_schemas = [l.strip() for l in plan.splitlines() if "ReadSchema" in l]
    pushed = [l.strip() for l in plan.splitlines() if "PushedFilters" in l]
    return {
        "broadcast_join": "BroadcastHashJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        "topk": "TakeOrderedAndProject" in plan,
        "hash_aggregates": plan.count("HashAggregate"),
        "exchanges": plan.count("Exchange"),
        "read_schemas": read_schemas,
        "pushed_filters": pushed,
        "has_cartesian": "CartesianProduct" in plan,
        "python_udf": "BatchEvalPython" in plan or "ArrowEvalPython" in plan,
    }
