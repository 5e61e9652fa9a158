"""Set operations (G tier) — absent from the reference (SURVEY.md §2.D).

Both distinct (UNION/INTERSECT/EXCEPT) and multiset (ALL) semantics:
Spark's ``union`` is UNION ALL; distinct semantics come from ``.distinct()``
/ ``intersect`` / ``exceptAll`` etc. At scale each distinct set op is one
shuffle on the full row — cheap here because inputs are pre-projected to
the key columns (column pruning reaches the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from toy_map_reduce_spark.registry import register
from toy_map_reduce_spark.tables import load


_SET_UNION_ORACLE = """
SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'
UNION
SELECT p_partkey FROM part WHERE p_size > 25
"""


@register("set_union", "G", oracle=_SET_UNION_ORACLE,
          doc="UNION (distinct): returned partkeys ∪ large-size partkeys")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "A")
        .select(F.col("l_partkey").alias("partkey"))
    )
    b = (
        load(spark, sf_dir, "part")
        .where(F.col("p_size") > 25)
        .select(F.col("p_partkey").cast("long").alias("partkey"))
    )
    return a.union(b).distinct()


_SET_UNION_ALL_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(COUNT(DISTINCT partkey) AS BIGINT) AS distinct_cnt
FROM (
  SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'
  UNION ALL
  SELECT p_partkey FROM part WHERE p_size > 25
)
"""


@register("set_union_all", "G", oracle=_SET_UNION_ALL_ORACLE,
          doc="UNION ALL (multiset) — summarized to counts to keep the parity payload small")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "A")
        .select(F.col("l_partkey").alias("partkey"))
    )
    b = (
        load(spark, sf_dir, "part")
        .where(F.col("p_size") > 25)
        .select(F.col("p_partkey").cast("long").alias("partkey"))
    )
    return a.union(b).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("partkey").alias("distinct_cnt"),
    )


_SET_INTERSECT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_intersect", "G", oracle=_SET_INTERSECT_ORACLE,
          doc="INTERSECT (distinct): customers with both finished and open orders")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(o)


_SET_EXCEPT_ORACLE = """
SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'
EXCEPT
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
"""


@register("set_except", "G", oracle=_SET_EXCEPT_ORACLE,
          doc="EXCEPT (distinct): partkeys returned under flag A but never under R")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select(F.col("l_partkey").alias("partkey"))
    r = li.where(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("partkey"))
    return a.subtract(r)


_SET_EXCEPT_ALL_ORACLE = """
SELECT partkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'
  EXCEPT ALL
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
)
GROUP BY partkey
"""


@register("set_except_all", "G", oracle=_SET_EXCEPT_ALL_ORACLE,
          doc="EXCEPT ALL (multiset difference with multiplicity)")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select(F.col("l_partkey").alias("partkey"))
    r = li.where(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("partkey"))
    return a.exceptAll(r).groupBy("partkey").agg(F.count(F.lit(1)).alias("cnt"))


_UNION_BY_NAME_ORACLE = """
SELECT key, name, acctbal, src FROM (
  SELECT c_custkey AS key, c_name AS name, NULL AS acctbal, 'cust' AS src
  FROM customer
  UNION ALL
  SELECT s_suppkey, NULL, round(s_acctbal, 2), 'supp' FROM supplier
)
"""


@register("set_union_by_name", "G", oracle=_UNION_BY_NAME_ORACLE,
          doc="Schema-evolving union: unionByName(allowMissingColumns=True) "
              "aligns by column NAME and null-extends absent columns — the "
              "union semantics batch evolution needs (positional union would "
              "silently misalign)")
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("key"),
        F.col("c_name").alias("name"),
        F.lit("cust").alias("src"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("key"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("supp").alias("src"),
    )
    return cust.unionByName(supp, allowMissingColumns=True).select(
        "key", "name", "acctbal", "src"
    )


_SET_INTERSECT_ALL_ORACLE = """
SELECT partkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'
  INTERSECT ALL
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
)
GROUP BY partkey
"""


@register("set_intersect_all", "G", oracle=_SET_INTERSECT_ALL_ORACLE,
          doc="INTERSECT ALL (multiset intersection: each value survives "
              "min(multiplicity_left, multiplicity_right) times) — "
              "completes the set-operator family")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select(F.col("l_partkey").alias("partkey"))
    r = li.where(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("partkey"))
    return a.intersectAll(r).groupBy("partkey").agg(F.count(F.lit(1)).alias("cnt"))
