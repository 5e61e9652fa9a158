"""Feature-engineering operators (X tier): per-group min-max / z-score
scaling and deterministic quantile bucketing — the numeric-normalization
stages of an ML feature pipeline, as exact window/aggregate compositions.

Scale notes (100 TB):
- Scaling stats are one map-side-combined groupBy per low-cardinality
  group key, broadcast back over the fact scan — the fact rows never
  shuffle (the window-function formulation would shuffle all of them; the
  groupBy+broadcast-join form is chosen deliberately, same reasoning as
  the capped_shingles df fix in dedup.py).
- ntile bucketing is exact WITHOUT a global sort: bucket sizes are
  arithmetic on the row count and bucket boundaries are exact order
  statistics from the GK + exact-on-boundary hybrid
  (operators/extras.py:_exact_order_stats) — two partial-aggregated
  scans replace the single-task sort the naive Window plan needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from toy_map_reduce_spark.operators.extras import (
    PCTL_SMALL_N,
    _exact_order_stats,
    ntile_size_sql,
    ntile_start_sql,
)
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
    # try_divide: a one-row group has q_max = q_min (zero range) and a
    # NULL sample stddev — both scalings are undefined there (NULL, the
    # DuckDB division result), not an ANSI error
    return li.join(F.broadcast(stats), "l_returnflag").select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.round(
            F.try_divide(
                F.col("l_quantity") - F.col("q_min"),
                F.col("q_max") - F.col("q_min"),
            ),
            6,
        ).alias("qty_minmax"),
        F.round(
            F.try_divide(F.col("l_extendedprice") - F.col("p_avg"), F.col("p_std")), 6
        ).alias("price_z"),
    )


_QUANTILE_BUCKET_ORACLE = f"""
WITH b AS (
  SELECT l_extendedprice,
         ntile({N_BUCKETS}) OVER (ORDER BY l_extendedprice NULLS FIRST, l_orderkey, l_linenumber NULLS FIRST)
           AS bucket
  FROM lineitem WHERE l_extendedprice IS NOT NULL
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(MIN(l_extendedprice), 2) AS lo,
       round(MAX(l_extendedprice), 2) AS hi
FROM b GROUP BY bucket
ORDER BY bucket
"""


@register("feature_quantile_bucket", "X", oracle=_QUANTILE_BUCKET_ORACLE,
          doc=f"Equal-frequency bucketing: exact ntile({N_BUCKETS}) bucket "
              "counts and boundaries WITHOUT the global sort — bucket "
              "sizes are arithmetic on n, and each boundary is an exact "
              "order statistic from the GK + exact-on-boundary hybrid")
def feature_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The key insight that retires the ntile window (r4 verdict item 3):
    this output needs NO per-row bucket assignment. ntile(N) bucket i
    always holds ranks [start_i, start_{i+1}-1] (sizes are pure
    arithmetic on n), and because price is the primary sort key, the
    bucket's min/max price are the order statistics at exactly those two
    ranks — the event_id-style tie-break columns never affect them. So
    the whole query is 2N exact order statistics via _exact_order_stats:
    two fully partial-aggregated scans, no Window, no shuffle of the
    fact. The old plan's single-task global sort is gone; this is the
    100 TB plan, exactly (not approximately)."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice").isNotNull()
    )
    # N-1 interior boundary windows, each walked ONCE at start-1 serving
    # BOTH adjacent order statistics (v1 = hi_i at start-1, v2 = lo_{i+1}
    # at start); the outer bounds are plain min/max
    windows = [
        (
            i / N_BUCKETS,
            f"{ntile_start_sql(i + 1, N_BUCKETS)} - 1",
            [("v1", f"hi_{i}"), ("v2", f"lo_{i + 1}")],
        )
        for i in range(1, N_BUCKETS)
    ]
    one = _exact_order_stats(
        li, "l_extendedprice", windows,
        extra_eps=(N_BUCKETS + 2) / PCTL_SMALL_N, with_minmax=True,
    )
    lo = {i: f"`lo_{i}`" for i in range(2, N_BUCKETS + 1)}
    hi = {i: f"`hi_{i}`" for i in range(1, N_BUCKETS)}
    lo[1], hi[N_BUCKETS] = "vmin", "vmax"
    structs = ", ".join(
        f"named_struct('bucket', {i}, 'n', {ntile_size_sql(i, N_BUCKETS)}, "
        f"'lo', round({lo[i]}, 2), 'hi', round({hi[i]}, 2))"
        for i in range(1, N_BUCKETS + 1)
    )
    # n > 0: trailing ntile buckets are empty when rows < buckets — the
    # oracle's GROUP BY never emits them (no-op at any real scale)
    return (
        one.selectExpr(f"inline(array({structs}))")
        .where(F.col("n") > 0)
        .orderBy("bucket")
    )


CHURN_HOLDOUT_DAYS = 14

_CHURN_LABELS_ORACLE = f"""
WITH cut AS (
  SELECT MAX(ts) - INTERVAL {CHURN_HOLDOUT_DAYS} DAY AS cutoff FROM events
),
pre AS (
  SELECT e.user_id,
         COUNT(*) AS n_events_pre,
         SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch_pre,
         round(SUM(e.value), 4) AS total_value_pre,
         COUNT(DISTINCT CAST(date_trunc('day', e.ts) AS DATE)) AS days_active_pre
  FROM events e CROSS JOIN cut WHERE e.ts < cut.cutoff
  GROUP BY e.user_id
),
post AS (
  SELECT DISTINCT e.user_id FROM events e CROSS JOIN cut WHERE e.ts >= cut.cutoff
)
SELECT p.user_id,
       CAST(p.n_events_pre AS BIGINT) AS n_events_pre,
       CAST(p.n_purch_pre AS BIGINT) AS n_purch_pre,
       p.total_value_pre,
       CAST(p.days_active_pre AS BIGINT) AS days_active_pre,
       po.user_id IS NULL AS churned
FROM pre p LEFT JOIN post po ON po.user_id = p.user_id
"""


@register("feature_churn_labels", "X", oracle=_CHURN_LABELS_ORACLE,
          doc=f"Temporal train-set builder for churn: features aggregated "
              f"STRICTLY before a {CHURN_HOLDOUT_DAYS}-day holdout cutoff, "
              "label = zero activity in the holdout — the split-by-time "
              "construction that makes label leakage structurally "
              "impossible (no post-cutoff row can reach a feature)")
def feature_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leakage guard is the dataflow itself: the cutoff is one
    broadcast scalar, features aggregate over ts < cutoff only, and the
    label is an anti-join-shaped left join against the post-cutoff
    user set — features and labels never read the same rows. Users
    with no pre-cutoff history are excluded (no features to train on).
    Both aggregates are single partial+final passes keyed on user_id."""
    ev = load(spark, sf_dir, "events")
    cut = ev.agg(
        (F.max("ts") - F.expr(f"INTERVAL {CHURN_HOLDOUT_DAYS} DAYS")).alias("cutoff")
    )
    tagged = ev.crossJoin(F.broadcast(cut))
    pre = (
        tagged.where(F.col("ts") < F.col("cutoff"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events_pre"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long").alias("n_purch_pre"),
            F.round(F.sum("value"), 4).alias("total_value_pre"),
            F.countDistinct(F.date_trunc("day", "ts").cast("date"))
            .cast("long").alias("days_active_pre"),
        )
    )
    post = (
        tagged.where(F.col("ts") >= F.col("cutoff"))
        .select("user_id").distinct()
        .withColumn("active_post", F.lit(True))
    )
    return pre.join(post, "user_id", "left").select(
        "user_id", "n_events_pre", "n_purch_pre", "total_value_pre",
        "days_active_pre",
        F.col("active_post").isNull().alias("churned"),
    )
