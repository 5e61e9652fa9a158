"""Pipeline-monitoring operators (G tier): daily-volume anomaly flags
and a seasonal-naive forecast backtest — the freshness/volume alarms and
capacity-planning baselines an ingestion platform runs over its own
event stream, as exact aggregate compositions with DuckDB twins.

Scale notes (100 TB):
- Both operators aggregate the raw stream to a calendar rollup FIRST
  (map-side-combined groupBy to one row per day / month), so every
  ordered or global step downstream runs over calendar-sized input
  (10^3-10^4 rows regardless of event volume) — the same
  post-reduction-window discipline as timeseries_lag_corr.
- The anomaly thresholds (global mean/std of daily counts) come from a
  one-row aggregate broadcast back over the daily rollup, never from a
  whole-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from toy_map_reduce_spark.registry import register
from toy_map_reduce_spark.tables import load

# Flag a day when |n - mean| > Z_THRESHOLD * std of daily counts.
Z_THRESHOLD = 2.0

_ANOMALY_DAYS_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
g AS (SELECT AVG(n) AS mu, stddev_samp(n) AS sigma FROM daily)
SELECT d.day,
       CAST(d.n AS BIGINT) AS n,
       round((d.n - g.mu) / g.sigma, 4) AS z,
       abs(d.n - g.mu) > {Z_THRESHOLD} * g.sigma AS is_anomaly
FROM daily d CROSS JOIN g
ORDER BY d.day
"""


@register("events_anomaly_days", "G", oracle=_ANOMALY_DAYS_ORACLE,
          doc=f"Daily-volume anomaly screen: z-score of each day's event "
              f"count against the global mean/std, flagged beyond "
              f"{Z_THRESHOLD}σ — the ingestion-volume alarm that catches "
              "a dropped or doubled feed")
def events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events collapse to one row per day in a single partial-aggregated
    pass; mean/std are a one-row broadcast cross join over that rollup.
    No window anywhere — at 100 TB the whole check costs one scan plus
    a days-sized shuffle."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = daily.agg(F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma"))
    return (
        daily.crossJoin(F.broadcast(g))
        .select(
            "day",
            F.col("n").cast("long").alias("n"),
            F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
            (F.abs(F.col("n") - F.col("mu")) > Z_THRESHOLD * F.col("sigma")).alias(
                "is_anomaly"
            ),
        )
        .orderBy("day")
    )


# Seasonal period in months: forecast(m) = actual(m - 12).
SEASON_LAG = 12

_FORECAST_ORACLE = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         SUM(o_totalprice) AS revenue
  FROM orders GROUP BY 1
),
f AS (
  SELECT month, revenue,
         lag(revenue, {SEASON_LAG}) OVER (ORDER BY month) AS forecast
  FROM monthly
)
SELECT month,
       round(revenue, 2) AS revenue,
       round(forecast, 2) AS forecast,
       round(abs(revenue - forecast) / revenue, 6) AS ape
FROM f WHERE forecast IS NOT NULL
ORDER BY month
"""


@register("timeseries_forecast_naive", "G", oracle=_FORECAST_ORACLE,
          doc=f"Seasonal-naive forecast backtest: each month's revenue "
              f"predicted by the same month one year back (lag "
              f"{SEASON_LAG} over the monthly rollup), absolute "
              "percentage error per month — the baseline every fancier "
              "forecaster must beat")
def timeseries_forecast_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lag-12 window runs over the *monthly rollup* (one row per
    month — calendar-sized however big orders is), an explicitly
    documented post-reduction single-partition step, same as
    timeseries_lag_corr. The expensive part — raw orders to monthly —
    is one map-side-combined aggregate."""
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy("month")
    f = monthly.select(
        "month", "revenue", F.lag("revenue", SEASON_LAG).over(w).alias("forecast")
    )
    return (
        f.where(F.col("forecast").isNotNull())
        .select(
            "month",
            F.round("revenue", 2).alias("revenue"),
            F.round("forecast", 2).alias("forecast"),
            F.round(F.abs(F.col("revenue") - F.col("forecast")) / F.col("revenue"), 6).alias("ape"),
        )
        .orderBy("month")
    )
