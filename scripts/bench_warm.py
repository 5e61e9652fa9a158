#!/usr/bin/env python
"""Quiet-JVM warm re-time protocol — the reproducible form of the
adjudication the r6/r7 verdicts ran as prose when a bench timing drifted.

BENCH_DETAIL minimums come from a shared long-lived session timing ~390
queries back-to-back, so an individual number carries cross-query noise
(GC pressure, codegen-cache churn, who-paid-the-shared-staging ordering).
When scripts/bench_regress.py flags a query — or a cross-round diff looks
suspicious — the question is "what does this query cost in a QUIET JVM,
warm?", and the protocol is:

1. Fresh process = fresh JVM, nothing else running in it.
2. Pre-materialize the shared staging tables exactly as bench.py does
   (prewarm_staging), so the first timed pass isn't paying someone
   else's materialization.
3. N passes per query (default 6); pass 1 is discarded as the
   whole-stage-codegen / parquet-footer warm-up, the reported number is
   the min of the remaining passes ("warm_min"), with the full
   per-pass list kept for inspection.
4. Classification against a flagged BENCH_DETAIL entry: warm_min at or
   below the old noise band's max = noise, not regression; warm_min
   materially above it = a real plan change — go read the plan.

Usage:
    python scripts/bench_warm.py q1 q2 ... [--passes N] [--no-prewarm] [--calib]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/bench_warm.py orders_rfm

Prints one JSON line:
    {"sf": ..., "passes": N, "staging": {...},
     "queries": {name: {"warm_min": s, "all": [...]}}}

``--calib`` additionally runs bench.py's deterministic CPU probe in THIS
process and stamps ``calib_sec`` + ``boot_id`` into the line, so an
adjudicator invoked from a boot neither BENCH_DETAIL came from can
normalize the warm re-time against the host it actually ran on instead
of the stale old-vs-new probe ratio (r11 advisor,
scripts/bench_regress.py:207).
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
    # accepts both '--passes=N' and '--passes N' (r8 advisor: the usage
    # string advertised the space form but only '=' parsed)
    names: list[str] = []
    passes = 6
    prewarm = True
    calib = False
    argv = sys.argv[1:]
    i = 0
    try:
        while i < len(argv):
            a = argv[i]
            if a == "--no-prewarm":
                prewarm = False
            elif a == "--calib":
                calib = True
            elif a == "--passes":
                i += 1
                passes = int(argv[i])
            elif a.startswith("--passes="):
                passes = int(a.split("=", 1)[1])
            elif a.startswith("--"):
                print(f"unknown flag: {a}", file=sys.stderr)
                return 2
            else:
                names.append(a)
            i += 1
    except (IndexError, ValueError):
        print(__doc__)
        return 2
    if not names or passes < 2:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tmr-bench-warm")
    specs = all_specs()
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    calib_info: dict = {}
    if calib:
        from bench import CALIB_VERSION, _calibrate  # repo-root bench.py

        calib_info["calib_sec"] = _calibrate(spark)
        calib_info["calib_version"] = CALIB_VERSION
        try:
            with open("/proc/sys/kernel/random/boot_id") as fh:
                calib_info["boot_id"] = fh.read().strip()
        except OSError:
            pass

    staging: dict[str, float] = {}
    if prewarm:
        from toy_map_reduce_spark.operators.dedup import prewarm_staging

        staging = prewarm_staging(spark, sf_dir)

    from toy_map_reduce_spark.functions.ranks import release_scratch

    out: dict[str, dict] = {}
    for name in names:
        ts: list[float] = []
        for _ in range(passes):
            t0 = time.perf_counter()
            specs[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 4))
            release_scratch()  # the bench regime: no cross-pass rank scratch
        out[name] = {"warm_min": min(ts[1:]), "all": ts}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(json.dumps(
        {"sf": sf_val, "passes": passes, "staging": staging,
         **calib_info, "queries": out}
    ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
