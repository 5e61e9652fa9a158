#!/usr/bin/env python
"""Decompose per-query wall time into BUILD / PLAN / EXECUTE phases.

The r13 verdict's top perf item is the ~0.45 s per-query constant that
dominates the 69 zero-exchange queries (and is why the 8-core bench beat
the 32-core one at sf0.1). Before touching anything, split that constant
(guide §1: measure first):

  build   — spec.builder(spark, sf_dir): py4j round trips + eager
            Catalyst ANALYSIS of every intermediate DataFrame
  plan    — df.queryExecution.executedPlan force: optimization +
            physical planning (codegen compiles lazily at execute)
  execute — noop write of the PRE-BUILT DataFrame: job dispatch,
            task scheduling, actual compute, (re-)optimization under
            AQE, codegen

Each phase is timed per pass; per-query minimums print per phase. The
sum of phase minimums ~ the bench's per-query minimum (same session,
same release_scratch lifecycle).

Usage: python scripts/query_cost_split.py [--passes N] [q1 q2 ...]
       (no names = every bench-eligible query)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from toy_map_reduce_spark.registry import all_specs  # noqa: E402
from toy_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    args: list[str] = []
    passes = 3
    out_path = None
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--passes":
            i += 1
            passes = int(argv[i])
        elif a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--"):
            print(f"unknown flag: {a}", file=sys.stderr)
            return 2
        else:
            args.append(a)
        i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tmr-cost-split")
    from toy_map_reduce_spark.functions.ranks import release_scratch

    specs = {n: s for n, s in all_specs().items() if s.bench}
    if args:
        specs = {n: specs[n] for n in args}

    results: dict[str, dict[str, float]] = {}
    for name, spec in specs.items():
        mins = {"build": float("inf"), "plan": float("inf"),
                "execute": float("inf"), "total": float("inf")}
        for _ in range(passes):
            t0 = time.perf_counter()
            try:
                df = spec.builder(spark, sf_dir)
                t1 = time.perf_counter()
                # force optimization + physical planning without executing
                df._jdf.queryExecution().executedPlan()
                t2 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t3 = time.perf_counter()
            except Exception as exc:  # noqa: BLE001
                print(f"{name} FAILED: {exc}", file=sys.stderr)
                break
            finally:
                release_scratch()
            mins["build"] = min(mins["build"], t1 - t0)
            mins["plan"] = min(mins["plan"], t2 - t1)
            mins["execute"] = min(mins["execute"], t3 - t2)
            mins["total"] = min(mins["total"], t3 - t0)
        else:
            results[name] = {k: round(v, 4) for k, v in mins.items()}
            print(
                f"{name}: build={mins['build']:.3f} plan={mins['plan']:.3f} "
                f"execute={mins['execute']:.3f} total={mins['total']:.3f}",
                flush=True,
            )

    n = len(results)
    if n:
        for ph in ("build", "plan", "execute", "total"):
            s = sum(r[ph] for r in results.values())
            print(f"SUM {ph}: {s:.1f}s  mean {s / n:.3f}s over {n} queries")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
