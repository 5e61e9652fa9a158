#!/usr/bin/env python
"""Show the differing canonical rows for one query vs its DuckDB oracle —
the debugging companion to parity_report.py (which only records pass/fail).

Usage: SF=/root/testdata/sf0.1 python scripts/parity_diff.py QUERY [QUERY...]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    import duckdb

    from parity import canonical_rows, fetch_oracle
    from toy_map_reduce_spark.registry import all_specs
    from toy_map_reduce_spark.session import get_spark
    from toy_map_reduce_spark.tables import TABLES, table_path

    sf_dir = os.environ.get("SF", "/root/testdata/sf0.1")
    spark = get_spark("parity-diff", cores=8)
    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    specs = all_specs()
    for name in sys.argv[1:]:
        spec = specs[name]
        sdf = spec.builder(spark, sf_dir).toPandas()
        odf = fetch_oracle(duck, spec.oracle)
        srows, orows = Counter(canonical_rows(sdf)), Counter(canonical_rows(odf))
        only_s = list((srows - orows).elements())
        only_o = list((orows - srows).elements())
        print(f"== {name}: {len(only_s)} spark-only / {len(only_o)} oracle-only "
              f"of {len(sdf)} rows; cols={sorted(sdf.columns)}")
        # print the two sides independently (r9 advisor): zip() truncates
        # to the shorter list, silently hiding missing/extra rows — the
        # rows-only failure class — and positional pairing after sort can
        # associate unrelated rows
        import itertools

        for s, o in itertools.islice(
            itertools.zip_longest(sorted(only_s), sorted(only_o), fillvalue="<absent>"),
            8,
        ):
            print(f"  spark : {s}")
            print(f"  oracle: {o}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
