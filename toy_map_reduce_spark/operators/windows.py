"""Window functions (G tier) — absent from the reference (SURVEY.md §2.D).

Determinism contract: every window ORDER BY carries a unique tiebreak
column (``o_orderkey``) so rank/row_number/lag/lead and ROWS frames are
reproducible — the driver hash-compares values, and DuckDB must walk the
exact same order.

Scale notes: a window partitioned by a key is one shuffle on that key,
then a per-partition sort — same cost shape as a groupBy. Never window
over an empty ``partitionBy()`` at scale (single-task global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from toy_map_reduce_spark.registry import register
from toy_map_reduce_spark.tables import load


_WINDOW_RANK_ORACLE = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER w AS rn,
         rank()       OVER w AS rnk,
         dense_rank() OVER w AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
)
WHERE rn <= 3
"""


@register("window_rank", "G", oracle=_WINDOW_RANK_ORACLE,
          doc="Ranking windows: top-3 orders per customer by price")
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


_WINDOW_ANALYTIC_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       round(lag(o_totalprice)  OVER w, 2) AS prev_price,
       round(lead(o_totalprice) OVER w, 2) AS next_price,
       round(SUM(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum3,
       round(AVG(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3,
       round(SUM(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


@register("window_analytic", "G", oracle=_WINDOW_ANALYTIC_ORACLE,
          doc="Analytic windows: lag/lead + ROWS-frame moving and running aggregates")
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    frame3 = w.rowsBetween(-2, 0)
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.sum("o_totalprice").over(frame3), 2).alias("moving_sum3"),
        F.round(F.avg("o_totalprice").over(frame3), 6).alias("moving_avg3"),
        F.round(F.sum("o_totalprice").over(running), 2).alias("running_sum"),
    )
