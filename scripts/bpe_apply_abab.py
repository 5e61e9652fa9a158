#!/usr/bin/env python
"""Isolated ABAB for the r13 tokenize_bpe_apply cache-lifecycle fix
(r13 verdict task 3): the driver's single cross-boot comparison showed
-15% after 964f017 while the builder's interleaved A/B was a wash — this
script settles it with >= 6 same-session alternations of

  A (r13 fix, shipped): words.cache() + register_scratch(words) — the
    final compression aggregate reads the cached vocab table
  B (pre-r13): words.cache() + words.unpersist() before returning — the
    caller's materialization recomputes the corpus-wide explode+groupBy

Both variants run the identical train+encode pipeline; only the cache
lifecycle differs. Timing = build + noop materialize, release_scratch
after each run (bench.py's convention).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/bpe_apply_abab.py [--alts N]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from toy_map_reduce_spark.functions.ranks import (  # noqa: E402
    register_scratch,
    release_scratch,
)
from toy_map_reduce_spark.operators.textstats import (  # noqa: E402
    bpe_apply,
    bpe_train,
)
from toy_map_reduce_spark.session import get_spark  # noqa: E402
from toy_map_reduce_spark.tables import load  # noqa: E402


def _build(spark, sf_dir, keep_cache: bool):
    from toy_map_reduce_spark.functions.text import norm_text

    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(norm_text(F.col("text")), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .cache()
    )
    merges = bpe_train(words)
    enc = bpe_apply(words, merges)
    out = enc.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_words"),
        F.sum("freq").cast("long").alias("corpus_words"),
        F.sum(F.length("word") * F.col("freq")).cast("long").alias("chars_total"),
        F.sum(F.col("n_sym") * F.col("freq")).cast("long").alias("tokens_total"),
        F.round(
            F.sum(F.col("n_sym") * F.col("freq"))
            / F.sum(F.length("word") * F.col("freq")).cast("double"),
            6,
        ).alias("tokens_per_char"),
    )
    if keep_cache:
        register_scratch(words)  # variant A — the shipped r13 fix
    else:
        words.unpersist()  # variant B — the pre-r13 lifecycle
    return out


def main() -> int:
    alts = 6
    for a in sys.argv[1:]:
        if a.startswith("--alts="):
            alts = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tmr-bpe-abab")
    times: dict[str, list[float]] = {"A_keep": [], "B_unpersist": []}
    # one untimed warmup of each variant (codegen + footer caches)
    for keep in (True, False):
        _build(spark, sf_dir, keep).write.format("noop").mode("overwrite").save()
        release_scratch()
    for i in range(alts):
        for label, keep in (("A_keep", True), ("B_unpersist", False)):
            t0 = time.perf_counter()
            _build(spark, sf_dir, keep).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            release_scratch()
            times[label].append(round(dt, 4))
            print(f"alt {i + 1} {label}: {dt:.3f}s", flush=True)
    for label, ts in times.items():
        print(
            f"{label}: min={min(ts):.3f} median={sorted(ts)[len(ts) // 2]:.3f} "
            f"all={ts}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
