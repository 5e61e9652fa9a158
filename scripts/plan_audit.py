#!/usr/bin/env python
"""Exhaustive single-partition-exchange audit across the whole registry.

``Exchange SinglePartition`` is the plan shape that funnels an entire
input through ONE task — the classic 100 TB scale-killer when the input
is corpus-grain (r5/r6 rewrote eight such sites into the distributed
exact-rank primitive, functions/ranks.py). It is perfectly fine when the
input is a tiny aggregate (a one-row bounds table, a per-group summary of
bounded cardinality), which is why a blanket plan ban is wrong and an
AUDIT + CI pin is right: this script prints the per-query triage, and
tests/test_plans.py::test_no_single_partition_exchange_feeds_from_raw_scan
keeps the risky set empty forever.

Classification (toy_map_reduce_spark/plans/explain.py
single_partition_sites): a site is ``raw_corpus_risk`` iff a file scan
sits in the exchange's subtree with NO aggregate between them — raw rows
crossing into one task. An aggregate below the exchange bounds the
crossing rows to group-key cardinality, the benign shape.

r9: the audit also reports ``build_side_risk`` (explain.py
build_side_risk) — broadcast joins hash-building from a persisted corpus
relation while the probe side touches no scan, the r7 graph_bfs_levels
bug class where Spark's stats-driven build-side choice picks the cached
corpus over the stats-less loop-carried frame. Both risky sets are
pinned empty by tests/test_plans.py.

Usage: python scripts/plan_audit.py [--json] [name ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from toy_map_reduce_spark.plans import (
    build_side_risk,
    explain_str,
    missed_broadcast,
    single_partition_sites,
)
from toy_map_reduce_spark.registry import all_specs
from toy_map_reduce_spark.session import get_spark


def main() -> int:
    as_json = "--json" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark("tmr-plan-audit")
    # same env convention as parity_gate.sh / the pytest conftest; SF may
    # be a comma-separated list (parity_report.py's form) — audit each
    # dir rather than treating the whole string as one bogus path
    sf_dirs = [
        d.strip()
        for d in os.environ.get(
            "SF",
            os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
        ).split(",")
        if d.strip()
    ]
    missing = [d for d in sf_dirs if not os.path.isdir(d)]
    if missing:
        print(f"SF dir(s) do not exist: {missing}", file=sys.stderr)
        return 2
    report: dict[str, list[dict]] = {}
    builds: dict[str, list[dict]] = {}
    missed: dict[str, list[dict]] = {}
    errors: dict[str, str] = {}
    for name, spec in sorted(all_specs().items()):
        if spec.tier == "S":
            continue  # streaming plans are inspected by tests/test_streaming.py
        if only and name not in only:
            continue
        for sf_dir in sf_dirs:
            key = name if len(sf_dirs) == 1 else f"{name}@{os.path.basename(sf_dir)}"
            try:
                plan = explain_str(spec.builder(spark, sf_dir), "simple")
                sites = single_partition_sites(plan)
                brisk = build_side_risk(plan)
                mb = missed_broadcast(plan)
            except Exception as e:
                errors[key] = f"{type(e).__name__}: {e}"[:200]
                continue
            if sites:
                report[key] = sites
            if brisk:
                builds[key] = brisk
            if mb:
                missed[key] = mb
    risky = {n: s for n, s in report.items() if any(x["raw_corpus_risk"] for x in s)}
    grainy = {n: s for n, s in report.items() if any(x["corpus_grain_keys"] for x in s)}
    if as_json:
        print(json.dumps({
            "risky": risky,
            "grain_risky": grainy,
            "build_side_risk": builds,
            "missed_broadcast": missed,
            "all": report,
            "errors": errors,
        }, indent=1))
    else:
        print(f"queries with Exchange SinglePartition: {len(report)}")
        print(f"  of which raw-corpus risk (scan, no aggregate below): {len(risky)}")
        print(f"  of which corpus-grain/unbounded-branch keyed: {len(grainy)}")
        print(f"broadcast joins building from persisted corpus: {len(builds)}")
        print(f"shuffle joins over an always-small dim (missed broadcast): {len(missed)}")
        for n, sites in sorted(report.items()):
            bad = any(x["raw_corpus_risk"] for x in sites) or n in grainy
            flag = "RISK" if bad else "ok  "
            print(f"  [{flag}] {n}: {len(sites)} site(s)")
            if bad:
                for x in sites:
                    if x["raw_corpus_risk"] or x["corpus_grain_keys"]:
                        print(f"         keys={x['corpus_grain_keys']}")
                        for l in x["subtree_head"]:
                            print(f"         | {l}")
        for n, b in sorted(builds.items()):
            print(f"  [BUILD] {n}: {b}")
        for n, b in sorted(missed.items()):
            print(f"  [SHUF ] {n}: {b}")
        for n, e in sorted(errors.items()):
            print(f"  [err ] {n}: {e}")
    return 1 if risky or grainy or builds or missed or errors else 0


if __name__ == "__main__":
    sys.exit(main())
