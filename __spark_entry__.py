"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship word count (the reference's one and only
query — reference ``user/UserDefinedFunctions.scala``) at sf0.001.
``queries()`` / ``oracle_sql()`` are derived from the central registry in
``toy_map_reduce_spark.registry``; every operator module registers its
specs there (SURVEY.md §2.E is the contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from toy_map_reduce_spark.registry import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from toy_map_reduce_spark.operators.wordcount import wordcount

    return wordcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.E."""
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    entries (no exact SQL oracle — true sketches, binary-codec multimodal
    ops, iterative BPE, plan-introspection reports; 15 of 414 since the
    r10 promotions) are omitted."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
