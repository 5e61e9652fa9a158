"""Watermark semantics pinned with a crafted two-batch replay: batch 1
advances the watermark, batch 2 delivers late rows — rows older than
(max event time − watermark) must be dropped by the stateful dedup, and
append-mode window aggs must only emit finalized windows.

Deterministic by construction: file source + availableNow triggers + fixed
event times (never wall clock — SURVEY.md §7.4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def two_batch_dir(tmp_path):
    return str(tmp_path / "stream_in")


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _read_stream(spark, path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return spark.readStream.schema(schema).parquet(path)


def test_watermark_drops_late_duplicates(spark, two_batch_dir):
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 1, 12, m, 0)

    # batch 1: watermark advances to 12:30 - 10min = 12:20
    _write_batch(
        spark,
        two_batch_dir,
        [(1, t(0), 1, "click", 1.0), (2, t(30), 2, "click", 1.0)],
    )

    dedup = (
        _read_stream(spark, two_batch_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["user_id", "event_type"])
        .select("event_id", "user_id", "event_type")
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # batch 2: event_id=3 is LATE (12:05 < watermark 12:20) and a duplicate
    # key of an EVICTED state row — semantics: dropDuplicates state older
    # than the watermark is evicted, and late input is dropped, so id=3
    # must NOT appear; id=4 (fresh key, on time) must appear
    _write_batch(
        spark,
        two_batch_dir,
        [(3, t(5), 1, "click", 1.0), (4, t(31), 3, "view", 1.0)],
    )
    q2 = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_dedup2")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    batch1_ids = {r.event_id for r in spark.table("wm_dedup").collect()}
    assert batch1_ids == {1, 2}
    all_ids = {r.event_id for r in spark.table("wm_dedup2").collect()}
    assert 3 not in all_ids, "late-arriving row behind the watermark must be dropped"
    assert 4 in all_ids


def test_append_mode_emits_only_finalized_windows(spark, two_batch_dir):
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 1, 12, m, 0)
    _write_batch(
        spark,
        two_batch_dir,
        [
            (1, t(0), 1, "click", 1.0),
            (2, t(1), 1, "click", 1.0),
            (3, t(30), 2, "view", 1.0),  # pushes watermark past the first window
        ],
    )
    agg = (
        _read_stream(spark, two_batch_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.start").alias("ws"), "cnt")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r.ws.minute, r.cnt) for r in spark.table("wm_append").collect()}
    # the 12:00 window (cnt=2) is finalized by the 12:30 event; the 12:30
    # window is still open → must NOT be emitted in append mode
    assert (0, 2) in rows
    assert all(m != 30 for m, _ in rows)
