#!/usr/bin/env python
"""Empirical scaling-curve smoke for the bench heavy tail (r9 verdict
task 5): time the most expensive queries at sf0.01 and sf0.1 (10x the
rows) and assert the growth exponent — the log-log slope
log10(t_big / t_small) — stays <= 1.2.

This is the empirical complement to plan reading: a superlinear blowup
(an accidental quadratic in a pair op, an O(n^2) LSH bucket that the
df-cap was supposed to bound) shows up as a slope near 2 long before
sf1-scale data exists to prove it. Fixed per-query overhead (JVM task
scheduling, plan compilation) biases the measured slope DOWN, so the
1.2 gate is conservative against false alarms while still catching a
quadratic (slope ~2) or a shuffle-explosion (slope >> 1) outright.

Streaming (S-tier) queries are excluded: their time is dominated by the
measured ~0.6 s query-start/stop floor, which makes a slope meaningless.

Usage:
    python scripts/scaling_smoke.py SCALING_r10.json          # top 10 from latest BENCH_DETAIL_r*.json
    python scripts/scaling_smoke.py out.json q1 q2 ...        # explicit queries
    SLOPE_MAX=1.3 TOP_N=15 python scripts/scaling_smoke.py out.json
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"
SF_RATIO = 10.0


def pick_queries(n: int) -> list[str]:
    """Top-n most expensive non-streaming queries from the most recent
    committed bench sidecar (highest round number, matching
    handoff_gate.sh's sort -V convention)."""
    sidecars = sorted(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*.json")))
    if not sidecars:
        raise SystemExit("no BENCH_DETAIL_r*.json to pick the heavy tail from")
    with open(sidecars[-1]) as f:
        detail = json.load(f)
    s_tier = set(detail.get("s_tier", []))
    timed = {
        k: v for k, v in detail["queries"].items() if v >= 0 and k not in s_tier
    }
    return [k for k, _ in sorted(timed.items(), key=lambda kv: -kv[1])[:n]]


def time_queries(spark, names: list[str], sf_dir: str, passes: int = 2) -> dict[str, float]:
    from toy_map_reduce_spark.functions.ranks import release_scratch
    from toy_map_reduce_spark.operators.dedup import prewarm_staging
    from toy_map_reduce_spark.registry import all_specs

    specs = all_specs()
    # shared dedup staging outside the timed window — same attribution
    # rule as bench.py; the slope must measure the query, not the stage
    prewarm_staging(spark, sf_dir)
    best: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            t0 = time.perf_counter()
            specs[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, math.inf), dt)
            release_scratch()
    return best


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    names = sys.argv[2:] or pick_queries(int(os.environ.get("TOP_N", "10")))
    slope_max = float(os.environ.get("SLOPE_MAX", "1.2"))

    from toy_map_reduce_spark.session import get_spark

    spark = get_spark("scaling-smoke")
    small = time_queries(spark, names, SF_SMALL)
    spark.catalog.clearCache()  # drop sf0.01 staging before the big run
    big = time_queries(spark, names, SF_BIG)

    report: dict[str, dict] = {}
    worst = ("", -math.inf)
    for name in names:
        slope = math.log10(big[name] / small[name]) / math.log10(SF_RATIO)
        report[name] = {
            "sec_sf0.01": round(small[name], 4),
            "sec_sf0.1": round(big[name], 4),
            "slope": round(slope, 3),
            "ok": slope <= slope_max,
        }
        if slope > worst[1]:
            worst = (name, slope)
    out = {
        "_summary": {
            "queries": len(names),
            "slope_max": slope_max,
            "worst": {"query": worst[0], "slope": round(worst[1], 3)},
            "fail": sum(1 for r in report.values() if not r["ok"]),
            "sf_pair": [SF_SMALL, SF_BIG],
        },
        "queries": report,
    }
    print(json.dumps(out["_summary"]))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    return 1 if out["_summary"]["fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
