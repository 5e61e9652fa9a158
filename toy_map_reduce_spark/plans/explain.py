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
    vocabulary aggregate) classifies as benign under ``raw_corpus_risk``.
    ``corpus_grain_keys`` closes most of that gap (r7): it lists the
    corpus-grain column names appearing in the BOUNDING aggregate's group
    keys, UNLESS a TakeOrderedAndProject sits between the aggregate and
    the exchange (a top-k bounds the rows regardless of key grain).
    r8 hardening: group keys are resolved through ``AS`` alias chains by
    expression id (``custkey#1 AS ck#9`` can't slip the check under a
    rename), and the TakeOrdered exemption only applies on the
    exchange's DIRECT child chain — a top-k in a sibling join branch
    bounds that branch, not the rows crossing this exchange.
    scripts/plan_audit.py reports both fields; the CI pin keeps BOTH the
    ``raw_corpus_risk`` set and the ``corpus_grain_keys`` site set
    strictly empty (tests/test_plans.py — there is no allowlist; a new
    site must be rewritten or the pin fails).

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
            "corpus_grain_keys": _corpus_grain_keys(subtree) if (scan and agg) else [],
            "subtree_head": [l.strip() for l in subtree[:6]],
        })
    return sites


# Column names whose grain IS the corpus (or a table's full key space):
# an aggregate grouped on one of these bounds nothing the funnel can rely
# on. Kept conservative — names like `n`, `label`, `band` are bounded by
# construction and deliberately absent.
_CORPUS_GRAIN_COLS = frozenset({
    "word", "tok", "token", "shingle", "doc_id", "vec_id", "event_id",
    "o_orderkey", "l_orderkey", "custkey", "o_custkey", "c_custkey",
    "user_id", "text_hash", "h",
})


_AGG_KEYS_RE = None  # compiled lazily below
_ALIAS_RE = None
_COL_RE = None


def _direct_chain_len(subtree: list[str]) -> int:
    """Number of leading subtree lines on the exchange's DIRECT child
    chain. In explain text a node's non-last children print with ``:-``
    and their subtrees carry ``:`` in the leading columns, while a
    single child prints as a bare ``+-`` line — so the chain is the
    prefix of lines whose indentation contains no ``:``; the first
    colon-prefixed line marks a branching node (a join), and everything
    after it (including the branching node's colon-free LAST child) is
    off-chain."""
    n = 0
    for ln in subtree:
        head = ln[: len(ln) - len(ln.lstrip(" :+-*("))]
        if ":" in head or ln.lstrip().startswith(":"):
            break
        n += 1
    return n


def _corpus_grain_keys(subtree: list[str]) -> list[str]:
    """Corpus-grain column names in the FIRST (bounding) aggregate's group
    keys below a single-partition exchange — the r6 advisor's
    false-negative class.

    Alias-robust (r7 verdict task 6): every ``src#id AS tgt#id`` in the
    subtree contributes to an expression-id rename map, and each group
    key is resolved through that chain back to its root name before the
    grain check, so ``custkey AS ck`` still classifies as corpus grain.
    Scope-correct (r7 advisor): a TakeOrderedAndProject exempts the site
    only when it sits on the exchange's DIRECT child chain — in a
    sibling join branch it bounds that branch's rows, not the exchange's
    input. The bounding aggregate itself is taken from the direct chain
    when one exists there, else from the remaining subtree in pre-order
    (a join's output is at most as fine as its inputs' combined grain,
    so an off-chain aggregate's keys are still the best available grain
    signal — a known approximation, documented here)."""
    import re as _re

    global _AGG_KEYS_RE, _ALIAS_RE, _COL_RE
    if _AGG_KEYS_RE is None:
        _AGG_KEYS_RE = _re.compile(
            r"(?:Hash|Sort|ObjectHash)Aggregate\(keys=\[([^\]]*)\]"
        )
        _ALIAS_RE = _re.compile(r"(\w+)#(\d+)[A-Za-z]*\s+AS\s+(\w+)#(\d+)")
        _COL_RE = _re.compile(r"(\w+)#(\d+)")

    amap: dict[str, tuple[str, str]] = {}
    for ln in subtree:
        for m in _ALIAS_RE.finditer(ln):
            # first writer wins: ids are unique per plan, re-prints of
            # cached subtrees repeat the same mapping
            amap.setdefault(m.group(4), (m.group(1), m.group(2)))

    def resolve(name: str, eid: str) -> str:
        seen: set[str] = set()
        while eid in amap and eid not in seen:
            seen.add(eid)
            name, eid = amap[eid]
        return name

    chain_len = _direct_chain_len(subtree)
    keys_blob: str | None = None
    for idx, ln in enumerate(subtree):
        if idx < chain_len and "TakeOrderedAndProject" in ln:
            return []
        m = _AGG_KEYS_RE.search(ln)
        if m:
            keys_blob = m.group(1)
            break
    if keys_blob is None:
        return []
    names = {resolve(c.group(1), c.group(2)) for c in _COL_RE.finditer(keys_blob)}
    return sorted(names & _CORPUS_GRAIN_COLS)
