#!/usr/bin/env python
"""Measure skew mitigation on an actually-skewed corpus (r10 verdict
task 3): until r11 the salted-join/salted-wordcount plans were asserted
to help under skew but only ever ran on benign-distribution fixtures.

Corpus: data/skewed_bench (scripts/make_skewed.py — sf0.1 fact tables
replicated 16x: 9.6M lineitem rows with ~25% on ONE supplier key vs a
~2.1k-row median key ≈ 1000x key skew; 1.6M events with ~20% on one hot
user).

Two kinds of measurement, because local[32] hides stragglers:

  wall-clock  — warm-min over PASSES per matchup. On one 32-thread box
      the balanced map stage (scan + shuffle write of all 9.6M rows)
      dominates, so wall deltas are REAL but small; on a 1000-executor
      cluster the reduce straggler IS the wall clock.
  straggler profile — per-task duration quantiles of the reduce stage
      (Spark REST API, stage with the largest shuffle-read volume per
      run): max/median task time. THIS is the quantity salting fixes:
      plain join concentrates the hot key's rows in one task; salted
      splits them SALT_N ways. The ratio transfers to any cluster size;
      wall-clock at local scale does not.

Join rows run with broadcast DISABLED so a shuffle join is actually on
the table (with defaults the 16k-row dim broadcasts and skew is moot —
reported as join_broadcast_ref, the plan the registry query uses). The
AQE row needs TWO non-defaults to fire at this scale, both measured
facts worth knowing: (a) skewedPartitionThresholdInBytes down from 256m
to 1m — the gate compares COMPRESSED shuffle bytes, and 2.6M near-
identical int64s lz4-compress to ~1 MB; (b) forceOptimizeSkewedJoin=
true — without it OptimizeSkewedJoin declines to split because the
downstream groupBy(s_nationkey) re-shuffles anyway and the rule refuses
to add exchanges. On a 100 TB corpus (a) fires by itself; (b) is
exactly why the explicit salted rewrite exists for join+agg pipelines.

Measured on this corpus (r11): plain row skew 11.5x (max task 2.58M
rows) -> salted 3.6x (831k; residual is (key,salt)-hash collisions over
32 buckets) -> AQE-split 1.5x (311k). Wordcount salting measures ~1.0x:
map-side partial aggregation already absorbs count skew — the salted
variant's value is the pattern, not this corpus.

Usage: python scripts/skew_bench.py [--out skew_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

PASSES = 3


class StageProbe:
    """Pull reduce-stage task-duration quantiles from the UI REST API."""

    def __init__(self, spark):
        self.base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        self.api = f"{self.base}/api/v1/applications/{app_id}"

    def _get(self, path: str):
        with urllib.request.urlopen(f"{self.api}{path}") as r:
            return json.loads(r.read())

    def completed_stage_ids(self) -> set[int]:
        return {s["stageId"] for s in self._get("/stages?status=COMPLETE")}

    def reduce_straggler(self, before: set[int]) -> dict:
        """Among stages completed since `before`, pick the one reading the
        most shuffle rows (the join/agg reduce stage) and return its task
        duration quantiles."""
        stages = [
            s
            for s in self._get("/stages?status=COMPLETE")
            if s["stageId"] not in before and s.get("shuffleReadRecords", 0) > 0
        ]
        if not stages:
            return {}
        s = max(stages, key=lambda x: x["shuffleReadRecords"])
        q = self._get(
            f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
            "?quantiles=0.5,0.95,1.0"
        )
        med, p95, mx = (round(v / 1000.0, 3) for v in q["duration"])
        # task-duration ratios are contaminated by 32-way CPU contention
        # on one box (every task slows together), so ALSO report the
        # per-task shuffle-read-record distribution — the deterministic
        # quantity salting actually changes; on a real cluster task time
        # tracks it linearly
        rr = q.get("shuffleReadMetrics", {}).get("readRecords")
        rmed, _rp95, rmx = (int(v) for v in rr) if rr else (None, None, None)
        return {
            "stage_id": s["stageId"],
            "n_tasks": s["numCompleteTasks"],
            "shuffle_read_records": s["shuffleReadRecords"],
            "task_sec_median": med,
            "task_sec_p95": p95,
            "task_sec_max": mx,
            "straggler_ratio": round(mx / med, 2) if med > 0 else None,
            "task_rows_median": rmed,
            "task_rows_max": rmx,
            "row_skew_ratio": round(rmx / rmed, 2) if rmed else None,
        }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from make_skewed import ensure_skewed_bench
    from toy_map_reduce_spark.operators.joins import _SALT_N
    from toy_map_reduce_spark.operators.misc import wordcount_salted
    from toy_map_reduce_spark.operators.wordcount import tokenize
    from toy_map_reduce_spark.operators.analytics import sessionize_events
    from toy_map_reduce_spark.session import get_spark
    from toy_map_reduce_spark.tables import load

    sf_dir = ensure_skewed_bench()
    spark = get_spark(
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4079"},
    )
    probe = StageProbe(spark)

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity", "l_orderkey", "l_linenumber"
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")

    hot = li.groupBy("l_suppkey").count().orderBy(F.desc("count")).limit(1).collect()[0]
    n_rows = li.count()
    med_key = li.groupBy("l_suppkey").count().agg(
        F.expr("percentile_approx(count, 0.5)")
    ).collect()[0][0]
    profile = {
        "lineitem_rows": n_rows,
        "hot_suppkey": hot["l_suppkey"],
        "hot_rows": hot["count"],
        "hot_share": round(hot["count"] / n_rows, 4),
        "median_key_rows": int(med_key),
        "key_skew_x": round(hot["count"] / med_key, 1),
    }

    def plain_join():
        return (
            li.join(sup, li.l_suppkey == sup.s_suppkey)
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        )

    def salted_join():
        fact = li.withColumn(
            "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT_N))
        )
        dim = sup.withColumn(
            "salt",
            F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(_SALT_N)])),
        )
        return (
            fact.join(dim, (fact.l_suppkey == dim.s_suppkey) & (fact.salt == dim.salt))
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        )

    # correctness cross-check first: the salted join must be a pure
    # physical rewrite — identical result to the plain join
    base = {r["s_nationkey"]: (r["n"], round(r["q"], 2)) for r in plain_join().collect()}
    alt = {r["s_nationkey"]: (r["n"], round(r["q"], 2)) for r in salted_join().collect()}
    assert base == alt, "salted join diverged from plain join"

    conf = spark.conf
    results = {}

    def measure(name: str, build):
        # warmup, then PASSES timed runs; straggler profile from the last
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        _ = time.time() - t0
        times = []
        prof = {}
        for _i in range(PASSES):
            before = probe.completed_stage_ids()
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            prof = probe.reduce_straggler(before) or prof
        results[name] = {"wall_sec": round(min(times), 3), "reduce_stage": prof}

    # coalescing OFF for the join matchups: AQE otherwise merges the 32
    # reduce partitions into ~6 large ones, which hides the hot key
    # inside an already-large partition (observed: straggler ratio 1.75
    # with coalescing vs the true per-key skew of ~300x) AND keeps the
    # skew-join splitter's 5x-median factor from ever firing. A real
    # cluster sizes shuffle partitions to cores, the same setting.
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    measure("join_plain_noaqe", plain_join)
    measure("join_salted_noaqe", salted_join)
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    # without force, OptimizeSkewedJoin declines to split because the
    # downstream groupBy(s_nationkey) needs a re-shuffle either way and
    # the rule refuses to ADD exchanges (observed: row skew unchanged at
    # 11.5x with the rule nominally on) — exactly why the explicit
    # salted rewrite exists for join+agg pipelines
    conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    measure("join_plain_aqeskew", plain_join)
    conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
    conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    conf.unset("spark.sql.autoBroadcastJoinThreshold")
    measure("join_broadcast_ref", plain_join)
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    docs = load(spark, sf_dir, "documents")
    measure(
        "wc_plain",
        lambda: tokenize(docs).groupBy("word").agg(F.count(F.lit(1)).alias("cnt")),
    )
    measure("wc_salted", lambda: wordcount_salted(spark, sf_dir))
    measure("session_hot", lambda: sessionize_events(spark, sf_dir))

    def stragg(name):
        return results[name]["reduce_stage"].get("task_sec_max")

    def rskew(name):
        return results[name]["reduce_stage"].get("row_skew_ratio")

    out = {
        "sf_dir": sf_dir,
        "passes": PASSES,
        "salt_n": _SALT_N,
        "profile": profile,
        "results": results,
        "ratios": {
            "join_row_skew_plain": rskew("join_plain_noaqe"),
            "join_row_skew_salted": rskew("join_salted_noaqe"),
            "join_row_skew_aqeskew": rskew("join_plain_aqeskew"),
            "join_straggler_plain_vs_salted": (
                round(stragg("join_plain_noaqe") / stragg("join_salted_noaqe"), 2)
                if stragg("join_salted_noaqe")
                else None
            ),
            "join_straggler_plain_vs_aqeskew": (
                round(stragg("join_plain_noaqe") / stragg("join_plain_aqeskew"), 2)
                if stragg("join_plain_aqeskew")
                else None
            ),
            "join_wall_plain_vs_salted": round(
                results["join_plain_noaqe"]["wall_sec"]
                / results["join_salted_noaqe"]["wall_sec"],
                3,
            ),
            "wc_wall_plain_vs_salted": round(
                results["wc_plain"]["wall_sec"] / results["wc_salted"]["wall_sec"], 3
            ),
        },
    }
    line = json.dumps(out, sort_keys=True)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
