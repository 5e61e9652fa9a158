"""Deterministic sketch operators (X tier): count-min frequency estimation
and Bloom-filter membership — classic streaming sketches re-expressed as
exact relational compositions, so a DuckDB oracle can verify every counter
bit-for-bit (unlike HLL/GK, whose engine-internal layouts force rows-only
checks — see agg_approx_distinct / agg_approx_percentile).

Hashing is md5-prefix arithmetic (``conv(substr(md5(x), 1, 8), 16, 10)``
on Spark ≡ ``CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)`` on DuckDB —
verified identical), never engine-native hash(): cross-engine determinism
is the whole point.

Scale notes (100 TB):
- The count-min counter table is D×W cells REGARDLESS of corpus size —
  that is the sketch's contract. Building it is one map-side-combined
  groupBy over (depth, position); hot words melt into partial sums.
- The Bloom bitmap is ≤ M distinct positions; membership probing joins
  4-rows-per-word against a broadcast bitmap.
- Both sketches are mergeable by construction (counters add; bitmaps OR),
  which is what makes them the 100 TB alternative to exact distinct
  structures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from toy_map_reduce_spark.registry import register
from toy_map_reduce_spark.tables import load

CM_DEPTH = 4      # independent hash rows
CM_WIDTH = 512    # counters per row
CM_TOP = 20       # report the top-N words by exact count

BLOOM_M = 2048    # bits
BLOOM_K = 3       # hashes per key
BLOOM_MEMBER_MIN_LEN = 6  # membership set: words of length >= 6


def _h(col, seed, mod: int):
    """Deterministic cross-engine hash: first 8 md5 hex chars as int, mod."""
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))), 1, 8), 16, 10)
        .cast("long") % mod
    )


def _h_sql(expr: str, seed: int, mod: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5({expr} || '#{seed}'), 1, 8)) AS BIGINT) % {mod}"
    )


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
    )


_CM_POS_SQL = " UNION ALL ".join(
    f"SELECT word, c, {d} AS d, {_h_sql('word', d, CM_WIDTH)} AS pos FROM wc"
    for d in range(1, CM_DEPTH + 1)
)

_COUNT_MIN_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (
  SELECT word, COUNT(*) AS c FROM toks WHERE word <> '' GROUP BY word
),
pos AS ({_CM_POS_SQL}),
counters AS (
  SELECT d, pos, SUM(c) AS cell FROM pos GROUP BY d, pos
),
est AS (
  SELECT p.word, MIN(ct.cell) AS cm_est
  FROM pos p JOIN counters ct ON p.d = ct.d AND p.pos = ct.pos
  GROUP BY p.word
)
SELECT wc.word, CAST(wc.c AS BIGINT) AS exact_count,
       CAST(est.cm_est AS BIGINT) AS cm_estimate,
       CAST(est.cm_est - wc.c AS BIGINT) AS overestimate
FROM wc JOIN est ON wc.word = est.word
ORDER BY wc.c DESC NULLS LAST, wc.word NULLS FIRST
LIMIT {CM_TOP}
"""


@register("sketch_count_min", "X", oracle=_COUNT_MIN_ORACLE,
          doc=f"Count-min sketch ({CM_DEPTH}×{CM_WIDTH}, md5-derived hash "
              "rows) over the word stream, estimates vs exact counts for "
              "the top words — overestimate is provably ≥ 0 and the "
              "counter table is fixed-size at any corpus scale")
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch build is groupBy(d, pos) over 4 rows per distinct word —
    D×W cells out regardless of input size, partial-aggregated map-side.
    Estimation joins each word's 4 cells against the broadcast counter
    table and takes the min. The exact counts exist here only to exhibit
    the error bound; a production pipeline ships the 2 KB counter table
    instead of the word distribution."""
    wc = _words(spark, sf_dir).groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    pos = wc.select(
        "word", "c",
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), _h(F.col("word"), d, CM_WIDTH).alias("pos"))
                for d in range(1, CM_DEPTH + 1)
            ])
        ).alias("dp"),
    ).select("word", "c", F.col("dp.d").alias("d"), F.col("dp.pos").alias("pos"))
    counters = pos.groupBy("d", "pos").agg(F.sum("c").alias("cell"))
    est = (
        pos.join(F.broadcast(counters), ["d", "pos"])
        .groupBy("word")
        .agg(F.min("cell").alias("cm_est"))
    )
    return (
        wc.join(est, "word")
        .select(
            "word",
            F.col("c").cast("long").alias("exact_count"),
            F.col("cm_est").cast("long").alias("cm_estimate"),
            (F.col("cm_est") - F.col("c")).cast("long").alias("overestimate"),
        )
        .orderBy(F.col("exact_count").desc(), "word")
        .limit(CM_TOP)
    )


_BLOOM_POS_SQL = " UNION ALL ".join(
    f"SELECT word, is_member, {_h_sql('word', 100 + k, BLOOM_M)} AS pos FROM vocab"
    for k in range(1, BLOOM_K + 1)
)

_BLOOM_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
vocab AS (
  SELECT word, len(word) >= {BLOOM_MEMBER_MIN_LEN} AS is_member
  FROM toks WHERE word <> '' GROUP BY word
),
pos AS ({_BLOOM_POS_SQL}),
bitmap AS (
  SELECT DISTINCT pos FROM pos WHERE is_member
),
probe AS (
  SELECT p.word, p.is_member,
         COUNT(DISTINCT p.pos) AS n_own,
         COUNT(DISTINCT b.pos) AS n_hit
  FROM pos p LEFT JOIN bitmap b ON p.pos = b.pos
  GROUP BY p.word, p.is_member
),
flagged AS (
  SELECT word, is_member, (n_hit = n_own) AS maybe_member FROM probe
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(COUNT(*) FILTER (WHERE is_member) AS BIGINT) AS n_members,
       CAST(COUNT(*) FILTER (WHERE maybe_member) AS BIGINT) AS n_flagged,
       CAST(COUNT(*) FILTER (WHERE maybe_member AND NOT is_member) AS BIGINT)
         AS n_false_pos,
       round(CAST(COUNT(*) FILTER (WHERE maybe_member AND NOT is_member) AS DOUBLE)
             / greatest(COUNT(*) FILTER (WHERE NOT is_member), 1), 6) AS fp_rate
FROM flagged
"""


@register("sketch_bloom_filter", "X", oracle=_BLOOM_ORACLE,
          doc=f"Bloom filter ({BLOOM_M} bits, {BLOOM_K} md5-derived "
              "hashes): long words form the member set, every vocabulary "
              "word probes the bitmap — no false negatives by "
              "construction, false-positive rate measured exactly")
def sketch_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bitmap is ≤ M distinct positions (a few KB broadcast) however
    large the member set; probing is a 3-rows-per-word broadcast join and
    a per-word all-positions-hit check. No false negatives is structural
    (every member's positions are in the bitmap); the measured FP rate is
    the capacity signal that tells a pipeline when to grow M."""
    vocab = (
        _words(spark, sf_dir)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            "word",
            (F.length("word") >= BLOOM_MEMBER_MIN_LEN).alias("is_member"),
        )
    )
    pos = vocab.select(
        "word", "is_member",
        F.explode(
            F.array(*[
                _h(F.col("word"), 100 + k, BLOOM_M)
                for k in range(1, BLOOM_K + 1)
            ])
        ).alias("pos"),
    )
    bitmap = pos.where("is_member").select("pos").distinct()
    probe = (
        pos.join(F.broadcast(bitmap.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("word", "is_member")
        .agg(
            F.countDistinct("pos").alias("n_own"),
            F.countDistinct(F.when(F.col("hit") == 1, F.col("pos"))).alias("n_hit"),
        )
        .withColumn("maybe_member", F.col("n_hit") == F.col("n_own"))
    )
    fp = F.count(F.when(F.col("maybe_member") & ~F.col("is_member"), 1))
    return probe.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.count(F.when(F.col("is_member"), 1)).alias("n_members"),
        F.count(F.when(F.col("maybe_member"), 1)).alias("n_flagged"),
        fp.alias("n_false_pos"),
        F.round(
            fp.cast("double")
            / F.greatest(F.count(F.when(~F.col("is_member"), 1)), F.lit(1)),
            6,
        ).alias("fp_rate"),
    )


HLL_RSDS = (0.05, 0.02, 0.01)


@register("agg_hll_precision_sweep", "X", oracle=None, bench=False,
          doc="HyperLogLog precision/cost sweep: approx_count_distinct of "
              "user_id at three relative-standard-deviation settings vs "
              "the exact count, with signed error in parts-per-million — "
              "the knob-tuning table for cardinality sketches. Rows-only "
              "(no DuckDB HLL++ twin); error bounds pytest-pinned")
def agg_hll_precision_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tradeoff this table quantifies: HLL++ register count (and so
    per-group sketch memory) grows ~1/rsd², while error shrinks
    linearly — rsd 0.05 is 2^11 registers/KBs, 0.01 is 2^16/~64 KB per
    group. All four counts come from ONE aggregate pass (shared scan,
    map-side partial sketches merged tree-wise), which is exactly how a
    100 TB distinct-count runs: no sort, no shuffle of raw values."""
    ev = load(spark, sf_dir, "events")
    aggs = [F.countDistinct("user_id").alias("exact")]
    for rsd in HLL_RSDS:
        aggs.append(
            F.approx_count_distinct("user_id", rsd).alias(f"rsd_{int(rsd * 1000)}")
        )
    row = ev.agg(*aggs).first()
    exact = row["exact"]
    out = []
    for rsd in HLL_RSDS:
        est = row[f"rsd_{int(rsd * 1000)}"]
        err_ppm = ((est - exact) * 1_000_000) // exact if exact else 0
        out.append((f"rsd_{rsd}", exact, est, err_ppm))
    return spark.createDataFrame(
        out, "setting string, exact long, estimate long, err_ppm long"
    )


ROLLING_DAYS = 7


@register("timeseries_rolling_distinct_hll", "X", oracle=None, bench=True,
          doc=f"Rolling {ROLLING_DAYS}-day distinct users via mergeable "
              "Datasketches HLL: one per-day sketch, then hll_union_agg "
              "over a 7-row window — the pattern that makes rolling "
              "distinct FEASIBLE at scale (exact rolling distinct cannot "
              "reuse work across overlapping windows). Rows-only; "
              "accuracy vs brute-force exact pytest-pinned")
def timeseries_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why sketches, stated with the costs: exact rolling distinct must
    re-scan every window's raw rows (overlap work is not reusable —
    distinct doesn't decompose), so a w-day window costs w× the scan.
    HLL sketches DO merge: one pass builds a KB-sized sketch per day,
    and each rolling value is a union of w tiny sketches — the window
    operates over |days| rows regardless of event volume. The same
    sketches also roll up to weekly/monthly for free (agg_hll_merge
    shows the re-aggregation path).

    The frame is a RANGE over a day ordinal (days since epoch), not a
    ROWS frame over the daily rollup: on a feed with missing calendar
    days a 7-ROW frame silently spans more than 7 calendar days, while
    rangeBetween(-(w-1), 0) on the ordinal keeps exactly the trailing
    w-day calendar window regardless of gaps (gapped-feed pytest in
    tests/test_llm_ops.py pins this)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    daily = daily.withColumn(
        "day_ord", F.datediff("day", F.lit("1970-01-01"))
    )
    w = Window.orderBy("day_ord").rangeBetween(-(ROLLING_DAYS - 1), 0)
    rolled = daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        .cast("long").alias("rolling_users_est"),
        F.hll_sketch_estimate("sk").cast("long").alias("day_users_est"),
    )
    return rolled


GK_ACCURACIES = (100, 1000, 10000)


@register("agg_gk_accuracy_sweep", "X", oracle=None, bench=False,
          doc="Greenwald-Khanna percentile accuracy/cost sweep: "
              "approx_percentile(p50, p99) at accuracy 100/1000/10000 vs "
              "the exact percentiles, error in value units — the quantile "
              "twin of agg_hll_precision_sweep's cardinality table. "
              "Rows-only (no DuckDB GK); rank-error bounds pytest-pinned")
def agg_gk_accuracy_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GK knob trades memory (O(accuracy) tuples per partial) for a
    1/accuracy rank-error guarantee — at accuracy 10000 the p99 of a
    billion rows is wrong by at most ~0.01% of ranks, with KB-scale
    mergeable state per group. All six sketches and both exact
    percentiles come from ONE aggregate pass."""
    o = load(spark, sf_dir, "orders")
    aggs = [
        F.percentile("o_totalprice", 0.5).alias("exact_p50"),
        F.percentile("o_totalprice", 0.99).alias("exact_p99"),
    ]
    for acc in GK_ACCURACIES:
        aggs += [
            F.percentile_approx("o_totalprice", 0.5, acc).alias(f"p50_{acc}"),
            F.percentile_approx("o_totalprice", 0.99, acc).alias(f"p99_{acc}"),
        ]
    row = o.agg(*aggs).first()

    def r2(v):  # empty input: every percentile is NULL — propagate, don't crash
        return round(v, 2) if v is not None else None

    def err2(a, b):
        return round(abs(a - b), 2) if a is not None and b is not None else None

    out = []
    for acc in GK_ACCURACIES:
        out.append(
            (
                acc,
                r2(row["exact_p50"]),
                r2(row[f"p50_{acc}"]),
                err2(row[f"p50_{acc}"], row["exact_p50"]),
                r2(row["exact_p99"]),
                r2(row[f"p99_{acc}"]),
                err2(row[f"p99_{acc}"], row["exact_p99"]),
            )
        )
    return spark.createDataFrame(
        out,
        "accuracy long, exact_p50 double, approx_p50 double, err_p50 double, "
        "exact_p99 double, approx_p99 double, err_p99 double",
    )
