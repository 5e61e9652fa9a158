#!/usr/bin/env python
"""Generate the degenerate-input fixture dirs (r9 verdict task 3).

Three pathological SF dirs under data/degenerate/, each with all ten
fixture tables at the same schema as the driver fixtures:

  empty/ — every table ZERO rows (schema-preserving slice). The classic
           divergence sites: empty-group argmax via MIN(struct(...)),
           lag-seeded folds, window frames over empty partitions, and
           aggregates that return one NULL row vs zero rows.
  one/   — every table exactly ONE row (the first fixture row): single-
           row windows, self-joins that meet themselves, stddev of one
           sample (NULL on both engines), percentiles of a point mass.
  edge/  — three rows per table: the first fixture row; a row with a
           fresh primary key and every OTHER column NULL (all-NULL
           nullable columns); and a row with empty strings for every
           text column, an empty list for the embedding column, and
           zeros for numerics — the "present but empty" class
           (zero-length docs, zero-dim vectors, zero prices).

Values are copied or derived deterministically from the sf0.001
fixtures, so regeneration is stable across rounds for a given fixture
generation. Dirs are committed; ensure_degenerate() regenerates only if
a table file is missing (tests call it as a session fixture).

Usage: python scripts/make_degenerate.py [--force]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SRC_SF = "/root/testdata/sf0.001"
DEGEN_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "degenerate"
)

# first column of each fixture table is its (surrogate) key — kept
# non-NULL in the edge rows so the pathology under test is "NULL/empty
# payload", not "NULL key" (NULL join keys drop consistently on both
# engines and would just mask the payload edge cases)
_KEY_COL = 0


def _edge_rows(table):
    """Build the 3-row edge table from a source pyarrow table."""
    import pyarrow as pa

    schema = table.schema
    first = table.slice(0, 1).to_pylist()[0]
    names = schema.names
    key_name = names[_KEY_COL]
    # a fresh key beyond the fixture key space (max + 1 / + 2)
    key_vals = table.column(key_name).to_pylist()
    base = max(key_vals) if key_vals else 0

    null_row = {n: None for n in names}
    null_row[key_name] = base + 1

    empty_row = {}
    for field in schema:
        n = field.name
        t = field.type
        if n == key_name:
            empty_row[n] = base + 2
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            empty_row[n] = ""
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            empty_row[n] = []
        elif pa.types.is_integer(t):
            empty_row[n] = 0
        elif pa.types.is_floating(t):
            empty_row[n] = 0.0
        elif pa.types.is_timestamp(t):
            empty_row[n] = first[n]  # no "empty" timestamp; reuse row0's
        elif pa.types.is_boolean(t):
            empty_row[n] = False
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            empty_row[n] = b""
        else:
            empty_row[n] = None

    return pa.Table.from_pylist([first, null_row, empty_row], schema=schema)


def ensure_degenerate(force: bool = False) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from toy_map_reduce_spark.tables import TABLES, table_path

    for variant in ("empty", "one", "edge"):
        out_dir = os.path.join(DEGEN_ROOT, variant)
        os.makedirs(out_dir, exist_ok=True)
        for t in TABLES:
            dest = os.path.join(out_dir, f"{t}.parquet")
            if os.path.exists(dest) and not force:
                continue
            src = pq.read_table(table_path(SRC_SF, t))
            # strip the pandas metadata blob: it pins the SOURCE row
            # count nowhere but carries dtype hints irrelevant here
            src = src.replace_schema_metadata(None)
            if variant == "empty":
                out = src.slice(0, 0)
            elif variant == "one":
                out = src.slice(0, 1)
            else:
                out = _edge_rows(src)
            tmp = f"{dest}.tmp{os.getpid()}"
            pq.write_table(out, tmp)
            os.replace(tmp, dest)
    return DEGEN_ROOT


if __name__ == "__main__":
    root = ensure_degenerate(force="--force" in sys.argv)
    print(f"degenerate fixtures at {root}")
