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

from toy_map_reduce_spark.registry import all_specs
from toy_map_reduce_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1])
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
