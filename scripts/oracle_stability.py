#!/usr/bin/env python
"""Oracle-evaluation stability gate (r10 verdict task 1/2).

Round 10 proved a green parity artifact can be a coin flip: DuckDB
1.0.x nondeterministically violates explicit NULLS FIRST/LAST placement
when a sort key column contains NULL on tiny inputs (reproduced 5-13%
per run on the edge degenerate corpus for the NULL-day-rollup argmax
family). The ENGINE answers were right; the ORACLE was unstable — the
worst failure mode a parity gate can have.

This script makes oracle stability a standing, measured property:

  dynamic sweep — every oracle-backed spec's SQL is evaluated
      --repeats times (default 30) per fixture dir, alternating the
      DuckDB thread count between reps (threads=max and threads=2) to
      perturb parallel-sort scheduling, with the canonical row
      serialization (tests/parity.py) compared across reps. Any oracle
      producing >1 distinct canonical result is UNSTABLE.

  static lint — best-effort regex pass flagging oracle SQL whose
      window ORDER BY / ORDER BY ... LIMIT sorts a day-grain rollup
      built from a nullable timestamp WITHOUT filtering the NULL-day
      row first (the exact shape that flaked in r10). Heuristic, so
      lint hits are WARNINGS; the dynamic sweep is the gate.

Exit status: nonzero iff the dynamic sweep finds any unstable oracle.

Usage:
  python scripts/oracle_stability.py [--dirs edge one empty]
      [--repeats 30] [--out ORACLE_STABILITY_rN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _connect(d: str):
    import duckdb

    from toy_map_reduce_spark.tables import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(d, t)}')"
        )
    return con


def dynamic_sweep(specs, fixture_dir: str, repeats: int) -> dict:
    """Run every oracle `repeats` times on one fixture dir; return
    {name: n_distinct_results} plus variant samples for unstable ones."""
    from tests.parity import canonical_rows, fetch_oracle

    con = _connect(fixture_dir)
    max_threads = os.cpu_count() or 8
    out = {}
    for name in sorted(specs):
        sql = specs[name].oracle
        if sql is None:
            continue
        seen: dict = {}
        for i in range(repeats):
            # alternate thread counts: the r10 flakes were scheduling-
            # dependent (rate varied with CPU contention), so perturb
            # the parallel-sort task split explicitly
            con.sql(f"SET threads={max_threads if i % 2 == 0 else 2}")
            rows = tuple(canonical_rows(fetch_oracle(con, sql)))
            seen[rows] = seen.get(rows, 0) + 1
        entry = {"distinct": len(seen), "stable": len(seen) == 1}
        if len(seen) > 1:
            entry["variants"] = [
                {"count": c, "sample": [list(r) for r in k[:3]]}
                for k, c in sorted(seen.items(), key=lambda kv: -kv[1])
            ]
        out[name] = entry
    con.close()
    return out


# --- static lint -----------------------------------------------------
# The r10 flake shape: a CTE rolls a nullable timestamp/date up to day
# grain (date_trunc over ts / o_orderdate, both nullable in the edge
# corpus), and a window ORDER BY or ORDER BY ... LIMIT then sorts by
# that day (or by an expression that is NULL on the NULL-day row).
# DuckDB can misplace the NULL row regardless of NULLS FIRST/LAST.
# The pinned repo rule: such rollups must filter the NULL timestamp
# BEFORE grouping (`WHERE ts IS NOT NULL` / `o_orderdate IS NOT NULL`).

_TRUNC_RE = re.compile(r"date_trunc\(\s*'(?:day|month|week|hour)'\s*,\s*(\w+)\s*\)", re.I)
_SORTED_LATER_RE = re.compile(r"(OVER\s*\(\s*[^)]*ORDER\s+BY|ORDER\s+BY[^;]*?LIMIT\s+\d)", re.I | re.S)


def static_lint(specs) -> dict:
    """Flag oracles that date_trunc a nullable source column, sort the
    result downstream, and never filter the source column's NULLs."""
    nullable_src = {"ts", "o_orderdate", "l_shipdate", "l_receiptdate", "l_commitdate"}
    hits = {}
    for name in sorted(specs):
        sql = specs[name].oracle
        if sql is None:
            continue
        cols = {m.group(1) for m in _TRUNC_RE.finditer(sql)} & nullable_src
        if not cols:
            continue
        if not _SORTED_LATER_RE.search(sql):
            continue
        unguarded = [
            c
            for c in sorted(cols)
            if not re.search(rf"\b{c}\s+IS\s+NOT\s+NULL", sql, re.I)
        ]
        if unguarded:
            hits[name] = unguarded
    return hits


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="*", default=["edge"])
    ap.add_argument("--repeats", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from toy_map_reduce_spark.registry import all_specs

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_degenerate import ensure_degenerate

    degen_root = ensure_degenerate()
    specs = all_specs()
    n_oracles = sum(1 for s in specs.values() if s.oracle is not None)

    result = {
        "repeats": args.repeats,
        "n_oracles": n_oracles,
        "dirs": {},
        "lint": static_lint(specs),
    }
    any_unstable = False
    for d in args.dirs:
        path = d if os.path.isdir(d) else os.path.join(degen_root, d)
        t0 = time.time()
        sweep = dynamic_sweep(specs, path, args.repeats)
        unstable = sorted(n for n, e in sweep.items() if not e["stable"])
        any_unstable = any_unstable or bool(unstable)
        result["dirs"][d] = {
            "fixture_dir": path,
            "elapsed_sec": round(time.time() - t0, 1),
            "n_checked": len(sweep),
            "unstable": unstable,
            "detail": {n: e for n, e in sweep.items() if not e["stable"]},
        }
        print(
            f"[{d}] {len(sweep)} oracles x {args.repeats} reps in "
            f"{result['dirs'][d]['elapsed_sec']}s — unstable: {unstable or 'none'}"
        )
    if result["lint"]:
        print(f"lint warnings (unguarded NULL-day rollup sort): {result['lint']}")
    else:
        print("lint: clean")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    return 1 if any_unstable else 0


if __name__ == "__main__":
    raise SystemExit(main())
