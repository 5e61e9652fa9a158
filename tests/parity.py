"""Spark ↔ DuckDB parity comparison, modeled on the driver's t2 check:
row-count + column names + order-insensitive value comparison.

Canonicalization: sort columns by name, stringify every cell (floats via
round-trip repr after rounding to 9 significant-ish decimals, timestamps
via ISO format, NULL sentinel), sort the row tuples, compare. Queries are
expected to round aggregated doubles *inside the query on both sides*
(SURVEY.md §7.4), so float fuzz here is a backstop, not the mechanism.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        # round to 9 decimals to absorb sub-ulp cross-engine noise
        return repr(round(v, 9))
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts is pd.NaT:
            # NULL dates render as NaT when the column is datetime64
            # (DuckDB DATE, any timestamp) but as None when it is object
            # (Spark DATE) — same NULL, one sentinel
            return "<NULL>"
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, date):
        # normalize DATE to midnight-timestamp form: pandas renders DuckDB
        # DATE columns as datetime64 while Spark yields datetime.date
        return v.isoformat() + "T00:00:00"
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [tuple(_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    out.sort()
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "?") -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    srows = canonical_rows(spark_pdf)
    orows = canonical_rows(oracle_pdf)
    if srows != orows:
        diffs = [(s, o) for s, o in zip(srows, orows) if s != o][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark, oracle): {diffs}"
        )


def run_parity(spark, duck, spec, sf_dir: str) -> None:
    # Scratch-release lifecycle (r6 advisor): the rank primitive persists
    # pid-stamped intermediates that only a consumer can release. The
    # query is fully materialized (toPandas) before the finally runs, so
    # releasing here is safe — unlike releasing between builds, which
    # would break pid stability for still-unmaterialized frames. Without
    # this, a 414-query parity session accumulates MEMORY_AND_DISK blocks
    # and every later query pays the GC pressure (~20% measured).
    from toy_map_reduce_spark.functions.ranks import release_scratch

    try:
        sdf = spec.builder(spark, sf_dir).toPandas()
        if spec.oracle is None:
            assert len(sdf) >= 0  # rows-only: builder ran and produced a frame
            return
        odf = duck.sql(spec.oracle).df()
        assert_frames_match(sdf, odf, name=spec.name)
    finally:
        release_scratch()
