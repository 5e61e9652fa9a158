#!/usr/bin/env python
"""Capture ``explain("formatted")`` + plan-shape stats for registered
queries into a directory — the r13 optimization round's measurement
baseline (guide §1: record the plan shape BEFORE touching anything).

Usage:
    python scripts/plan_snapshot.py OUTDIR [query ...]   # default: all benched

Writes OUTDIR/<query>.txt (formatted plan) and OUTDIR/_summary.json with
per-query {exchanges, single_partition_exchanges, joins, python_nodes,
codegen_spans, plan_lines, build_sec}. Planning only — nothing executes.
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from toy_map_reduce_spark.plans.explain import explain_str  # noqa: E402
from toy_map_reduce_spark.registry import all_specs  # noqa: E402
from toy_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    # argv guard (r13 advisor): no args / unknown names get the usage
    # line, not a bare IndexError/KeyError traceback
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tmr-plan-snapshot")
    specs = all_specs()
    if names:
        unknown = [n for n in names if n not in specs]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
        specs = {n: specs[n] for n in names}
    else:
        specs = {n: s for n, s in specs.items() if s.bench}
    summary: dict[str, dict] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        try:
            df = spec.builder(spark, sf_dir)
            plan = explain_str(df)
        except Exception as exc:  # noqa: BLE001
            summary[name] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        build_sec = round(time.perf_counter() - t0, 3)
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        summary[name] = {
            "exchanges": plan.count("Exchange"),
            "single_part": plan.count("SinglePartition"),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "python": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas") + plan.count("MapInArrow")
            + plan.count("FlatMapGroupsInPandas") + plan.count("PythonMapInArrow"),
            "scans": plan.count("Scan parquet") + plan.count("Scan text")
            + plan.count("Scan json") + plan.count("Scan csv"),
            "rowtoCol": plan.count("RowToColumnar") + plan.count("ColumnarToRow"),
            "sorts": len(re.findall(r"\bSort\b", plan)),
            "windows": plan.count("Window"),
            "codegen": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
            "plan_lines": plan.count("\n"),
            "build_sec": build_sec,
        }
    with open(os.path.join(outdir, "_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    err = {n: s for n, s in summary.items() if "err" in s}
    print(f"{len(summary)} plans -> {outdir}; {len(err)} errors")
    for n, s in err.items():
        print(f"  ERR {n}: {s['err']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
