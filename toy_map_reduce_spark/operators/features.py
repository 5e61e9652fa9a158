"""Feature-engineering operators (X tier): per-group min-max / z-score
scaling and deterministic quantile bucketing — the numeric-normalization
stages of an ML feature pipeline, as exact window/aggregate compositions.

Scale notes (100 TB):
- Scaling stats are one map-side-combined groupBy per low-cardinality
  group key, broadcast back over the fact scan — the fact rows never
  shuffle (the window-function formulation would shuffle all of them; the
  groupBy+broadcast-join form is chosen deliberately, same reasoning as
  the capped_shingles df fix in dedup.py).
- ntile bucketing is globally sort-based by definition — the exact form
  is bounded here to the deterministic tie-broken ordering; the 100 TB
  path is approx_percentile boundaries + a range join, which
  agg_approx_percentile exhibits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from toy_map_reduce_spark.registry import register
from toy_map_reduce_spark.tables import load

N_BUCKETS = 10

_FEATURE_SCALE_ORACLE = """
WITH stats AS (
  SELECT l_returnflag,
         MIN(l_quantity) AS q_min, MAX(l_quantity) AS q_max,
         AVG(l_extendedprice) AS p_avg, stddev_samp(l_extendedprice) AS p_std
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       round((l.l_quantity - s.q_min) / (s.q_max - s.q_min), 6) AS qty_minmax,
       round((l.l_extendedprice - s.p_avg) / s.p_std, 6) AS price_z
FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
"""


@register("feature_scale", "X", oracle=_FEATURE_SCALE_ORACLE,
          doc="Per-group feature normalization: min-max scaling of "
              "quantity and z-score standardization of price within each "
              "return flag — the fit+transform of a feature pipeline as "
              "one aggregate + one broadcast join")
def feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fit = groupBy stats (3 rows), transform = broadcast join over the
    fact scan; the 100 TB fact side never shuffles. The same stats row
    is what a serving layer would persist as the scaler artifact."""
    li = load(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
        F.avg("l_extendedprice").alias("p_avg"),
        F.stddev_samp("l_extendedprice").alias("p_std"),
    )
    return li.join(F.broadcast(stats), "l_returnflag").select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.round(
            (F.col("l_quantity") - F.col("q_min")) / (F.col("q_max") - F.col("q_min")), 6
        ).alias("qty_minmax"),
        F.round(
            (F.col("l_extendedprice") - F.col("p_avg")) / F.col("p_std"), 6
        ).alias("price_z"),
    )


_QUANTILE_BUCKET_ORACLE = f"""
WITH b AS (
  SELECT l_extendedprice,
         ntile({N_BUCKETS}) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           AS bucket
  FROM lineitem
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(MIN(l_extendedprice), 2) AS lo,
       round(MAX(l_extendedprice), 2) AS hi
FROM b GROUP BY bucket
ORDER BY bucket
"""


@register("feature_quantile_bucket", "X", oracle=_QUANTILE_BUCKET_ORACLE,
          doc=f"Equal-frequency bucketing: ntile({N_BUCKETS}) over a "
              "deterministically tie-broken price ordering, reporting "
              "per-bucket counts and boundaries — the discretizer stage "
              "of a feature pipeline")
def feature_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile is a global sort — exact equal-frequency buckets cannot avoid
    it (same honesty note as agg_percentile). The ordering includes the
    key columns so ties are broken identically on both engines. At 100 TB
    the swap-in is approx_percentile cut points + comparison against the
    broadcast boundaries."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    b = li.select("l_extendedprice", F.ntile(N_BUCKETS).over(w).alias("bucket"))
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )
