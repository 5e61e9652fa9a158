#!/usr/bin/env python
"""Time a named subset of registered queries at $SPARK_GRAFT_SF_DIR
(default sf0.1), printing per-pass timings. Dev tool for iterating on a
specific query's plan without paying the full bench loop.

Usage: python scripts/bench_subset.py q1 q2 ... [--passes N]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from toy_map_reduce_spark.registry import all_specs  # noqa: E402
from toy_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    # accepts both '--passes=N' and '--passes N' (same fix as
    # bench_warm.py, r8 advisor: the usage string advertised the space
    # form but only '=' parsed, and the N leaked into the query list)
    args: list[str] = []
    passes = 3
    argv = sys.argv[1:]
    i = 0
    try:
        while i < len(argv):
            a = argv[i]
            if a == "--passes":
                i += 1
                passes = int(argv[i])
            elif a.startswith("--passes="):
                passes = int(a.split("=", 1)[1])
            elif a.startswith("--"):
                print(f"unknown flag: {a}", file=sys.stderr)
                return 2
            else:
                args.append(a)
            i += 1
    except (IndexError, ValueError):
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tmr-bench-subset")
    specs = all_specs()
    for name in args:
        spec = specs[name]
        ts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 4))
            from toy_map_reduce_spark.functions.ranks import release_scratch

            release_scratch()  # match bench.py: no cross-pass cache reuse
        print(f"{name}: min={min(ts)} all={ts}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
