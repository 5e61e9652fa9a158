#!/usr/bin/env python
"""Empirical scaling-curve smoke for the bench heavy tail (r9 verdict
task 5; two-decade fit since r12): time the most expensive queries at
sf0.01, sf0.1, and the sf1-equivalent benign corpus (10x the rows per
step, scripts/make_scale.py) and assert the growth exponent — the
log-log slope log10(t_big / t_small) per decade — stays <= 1.2 in
EVERY decade.

This is the empirical complement to plan reading: a superlinear blowup
(an accidental quadratic in a pair op, an O(n^2) LSH bucket that the
df-cap was supposed to bound) shows up as a slope near 2 long before
cluster-scale data exists to prove it. Fixed per-query overhead (JVM
task scheduling, plan compilation) biases the measured slope DOWN, so
the 1.2 gate is conservative against false alarms while still catching
a quadratic (slope ~2) or a shuffle-explosion (slope >> 1) outright.
One decade can still smooth over a superlinear term with a small
constant — the second decade (r11 verdict task 4) is where such a term
must surface, so the gate applies PER DECADE, not to the average.

The shared dedup staging stage (shingles/signatures, paid once per
corpus outside the per-query timings) is fitted as its own entry
``dedup_staging`` — it is the single biggest stage a 100 TB dedup run
would execute, and per-query slopes can't see it.

Streaming (S-tier) queries are excluded: their time is dominated by the
measured ~0.6 s query-start/stop floor, which makes a slope meaningless.

Usage:
    python scripts/scaling_smoke.py SCALING_r12.json       # top 10 from latest BENCH_DETAIL_r*.json
    python scripts/scaling_smoke.py out.json q1 q2 ...     # explicit queries
    SLOPE_MAX=1.3 TOP_N=15 python scripts/scaling_smoke.py out.json
    DECADES=1 python scripts/scaling_smoke.py out.json     # legacy one-decade mode
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMALL = "/root/testdata/sf0.01"
SF_MID = "/root/testdata/sf0.1"
SF_RATIO = 10.0  # rows ratio of a full-decade dir pair


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


def _staging_isolated(sf_dir: str, passes: int) -> float:
    """min-of-passes staging cost from a fresh subprocess (fresh JVM):
    clearCache between passes so each pass re-materializes."""
    import subprocess

    code = (
        "import sys, time, json; sys.path.insert(0, %r); "
        "from toy_map_reduce_spark.session import get_spark; "
        "from toy_map_reduce_spark.operators.dedup import prewarm_staging; "
        "spark = get_spark('staging-fit'); best = float('inf')\n"
        "for _ in range(%d):\n"
        "    spark.catalog.clearCache()\n"
        "    best = min(best, sum(prewarm_staging(spark, %r).values()))\n"
        "print(json.dumps({'staging': best}))"
    ) % (REPO, passes, sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800, check=True,
    )
    return round(json.loads(out.stdout.strip().splitlines()[-1])["staging"], 4)


def time_queries(
    spark, names: list[str], sf_dir: str, passes: int = 2
) -> dict[str, float]:
    from toy_map_reduce_spark.functions.ranks import release_scratch
    from toy_map_reduce_spark.operators.dedup import prewarm_staging
    from toy_map_reduce_spark.registry import all_specs

    specs = all_specs()
    # shared dedup staging outside the per-query timed window — same
    # attribution rule as bench.py; per-query slopes must measure the
    # query, not the stage. The stage itself is reported as the synthetic
    # entry "dedup_staging", timed min-of-passes (r12 advisor: a single
    # cold shot can eat one GC pause and flake the gated slope fit) in an
    # ISOLATED fresh subprocess: measured in this shared session, sf3
    # staging read 25.1 s vs 10.5 s in a clean session (r13) — the 2.4x
    # is GC/codegen residue from the hundreds of query executions before
    # it, i.e. session history masquerading as a scaling exponent. The
    # in-session prewarm below still runs (untimed) so per-query timings
    # keep their staging-amortized convention.
    best: dict[str, float] = {
        "dedup_staging": _staging_isolated(sf_dir, passes)
    }
    prewarm_staging(spark, sf_dir)
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
    decades = int(os.environ.get("DECADES", "2"))

    from toy_map_reduce_spark.session import get_spark

    sf_dirs = [SF_SMALL, SF_MID]
    ratios = [SF_RATIO]
    if decades >= 2:
        from make_scale import ensure_sf1_bench

        sf_dirs.append(ensure_sf1_bench())
        ratios.append(SF_RATIO)
    if decades >= 3:
        # third step (r12 verdict task 6): sf1 -> sf3-equivalent, a 3x
        # rows ratio — the slope normalizes by log10(3), so the gate is
        # ratio-correct even though the step is 0.48 of a decade
        from make_scale import ensure_sf3_bench

        sf_dirs.append(ensure_sf3_bench())
        ratios.append(3.0)

    spark = get_spark("scaling-smoke")
    # bracket the whole fit with bench.py's deterministic CPU probes —
    # the r13 first cut recorded a fit where EVERY sf0.1 entry ran
    # 1.5-3x its quiet value (ambient multi-tenant load, loadavg 14 with
    # zero local processes); a slope computed from contended timings is
    # not evidence in either direction, so the artifact self-reports.
    from bench import _calibrate

    calib_pre = _calibrate(spark)
    per_dir: list[dict[str, float]] = []
    for d in sf_dirs:
        spark.catalog.clearCache()  # drop the previous dir's staging
        per_dir.append(time_queries(spark, names, d))
    calib_post = _calibrate(spark)
    contended = abs(calib_post - calib_pre) / calib_pre > 0.2

    entries = ["dedup_staging"] + list(names)
    report: dict[str, dict] = {}
    worst = ("", -math.inf)
    for name in entries:
        rec: dict = {}
        slopes = []
        for i, d in enumerate(sf_dirs):
            rec[f"sec_{os.path.basename(d.rstrip('/'))}"] = round(
                per_dir[i][name], 4
            )
        for i in range(1, len(sf_dirs)):
            s = math.log10(per_dir[i][name] / per_dir[i - 1][name]) / math.log10(
                ratios[i - 1]
            )
            slopes.append(round(s, 3))
        rec["slopes"] = slopes
        rec["worst_slope"] = max(slopes)
        rec["ok"] = all(s <= slope_max for s in slopes)
        if name.startswith(("sim_topk", "sim_knn", "sim_ann")):
            # these benchmark queries draw their QUERY PANEL from the
            # corpus itself (vec_id % QUERY_STRIDE), so total work is
            # (panel size ∝ N) × (per-query probe cost) — the raw slope
            # carries a +1 exponent by benchmark construction; the
            # engine-relevant per-query exponent is slope - 1 (a fixed
            # production query stream only pays the per-query part)
            rec["panel_scales_with_corpus"] = True
            rec["per_query_slopes"] = [round(s - 1.0, 3) for s in slopes]
        report[name] = rec
        if rec["worst_slope"] > worst[1]:
            worst = (name, rec["worst_slope"])
    out = {
        "_summary": {
            "queries": len(entries),
            "slope_max": slope_max,
            "decades": len(sf_dirs) - 1,
            "ratios": ratios,
            "worst": {"query": worst[0], "slope": worst[1]},
            "fail": sum(1 for r in report.values() if not r["ok"]),
            "calib_pre": calib_pre,
            "calib_post": calib_post,
            "contended": contended,
            "sf_dirs": sf_dirs,
        },
        "queries": report,
    }
    print(json.dumps(out["_summary"]))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    if contended:
        print(
            "scaling_smoke: CONTENDED run (calib probe "
            f"{calib_pre} -> {calib_post}) — slopes are not evidence; rerun",
            file=sys.stderr,
        )
        return 1
    return 1 if out["_summary"]["fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
