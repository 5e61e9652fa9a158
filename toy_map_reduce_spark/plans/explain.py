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


def single_partition_sites(plan: str) -> list[dict]:
    """Classify every ``Exchange SinglePartition`` in a simple-mode plan.

    A single-partition exchange funnels its entire input through ONE task —
    the canonical scale-killer when fed by raw corpus rows (the shape
    functions/ranks.py exists to eliminate), but perfectly fine when an
    aggregate below it bounds the rows crossing the wire to the group-key
    cardinality (one-row bounds tables, per-pid offset tables, final
    global summaries). ``raw_corpus_risk`` marks the former: a file scan
    in the exchange's subtree with NO intervening aggregate.

    KNOWN FALSE-NEGATIVE CLASS (r6 advisor): "aggregate below" is treated
    as cardinality-bounding, but an aggregate whose GROUP KEYS are
    corpus-grain (word, doc_id, custkey, ...) bounds nothing — e.g. the
    pre-fix text_zipf_slope shape (a row_number window over the full
    vocabulary aggregate) classifies as benign here. The pin in
    tests/test_plans.py is therefore "no UNAGGREGATED scan feeds a
    single-partition funnel", which excludes the raw-corpus shape but NOT
    every oversized funnel; corpus-grain-keyed aggregates feeding global
    windows are caught by the complementary range-partitioning pins
    (test_global_order_queries_are_range_partitioned,
    test_zipf_topk_is_take_ordered_not_global_rank) and by per-query plan
    review in scripts/plan_audit.py, not by this classifier.

    Used by scripts/plan_audit.py (human triage over the full registry)
    and tests/test_plans.py (CI pin: the risky set stays empty).
    """
    import re as _re

    lines = plan.splitlines()
    sites: list[dict] = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        indent = len(line) - len(line.lstrip(" +-:*("))
        subtree: list[str] = []
        for nxt in lines[i + 1:]:
            nind = len(nxt) - len(nxt.lstrip(" +-:*("))
            if nxt.strip() and nind <= indent:
                break
            subtree.append(nxt)
        sub = "\n".join(subtree)
        scan = "Scan parquet" in sub or "FileScan" in sub or "Scan csv" in sub \
            or "Scan json" in sub or "Scan text" in sub
        agg = bool(_re.search(r"HashAggregate|SortAggregate|ObjectHashAggregate", sub))
        sites.append({
            "line": line.strip(),
            "feeds_from_scan": scan,
            "aggregated_below": agg,
            "raw_corpus_risk": scan and not agg,
            "subtree_head": [l.strip() for l in subtree[:6]],
        })
    return sites
