#!/usr/bin/env python
"""Streaming crash-recovery driver (r12 verdict task 5) — run by
tests/test_streaming_recovery.py in a SUBPROCESS so it can SIGKILL itself
mid-stream without taking pytest down.

The kill point is the sharpest one available from userland: inside the
foreachBatch function of the kill epoch, AFTER the epoch's sink write has
landed but BEFORE Structured Streaming records the batch commit in the
checkpoint (the commit log entry is written only after foreachBatch
returns). That is precisely the window where a non-idempotent sink
double-writes on recovery — the same failure mode as the reference's
append-mode FileWriter duplication hazard (WorkerServiceImpl.scala:92-93,
deliberately not reproduced; SURVEY.md §4.3) — so the assertions in the
test are only satisfiable if BOTH of Spark's exactly-once halves work:
checkpoint replay reruns the uncommitted epoch with the SAME epoch id,
and the epoch-scoped idempotent writer makes the rerun a no-op overwrite.

Modes (both mirror registered S-tier queries, streaming/windows.py):
  dedup   — stream_dedup_state's plan: watermark + dropDuplicates. Sink:
            one parquet dir per epoch, mode=overwrite (epoch-id
            idempotence). Recovery must restore the DEDUP STATE STORE:
            duplicates arriving after the crash of keys seen before it
            can only be suppressed by recovered state, never by replay.
  febatch — stream_foreachbatch_sink's plan: complete-mode agg +
            foreachBatch overwriting ONE target. Recovery must restore
            the AGGREGATION state store: post-restart epochs only see
            post-crash files, so correct final totals prove the running
            counts came back from the checkpoint.

A kill-flag file makes the suicide once-only: the replayed epoch finds
the flag and runs to completion.

Usage: python tests/crash_driver.py MODE SRC SINK CKPT KILLFLAG KILL_EPOCH
Exit: killed by SIGKILL (rc -9) on the crash run; rc 0 on the resume run.
"""

from __future__ import annotations

import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mode, src, sink, ckpt, killflag = sys.argv[1:6]
    kill_epoch = int(sys.argv[6])

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from toy_map_reduce_spark.session import get_spark

    spark = get_spark("crash-driver", cores=2, shuffle_partitions=2)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    # maxFilesPerTrigger=1 → one micro-batch per input file, so "between
    # micro-batches" is a real, file-addressable boundary
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def maybe_die(epoch_id: int) -> None:
        if epoch_id == kill_epoch and not os.path.exists(killflag):
            with open(killflag, "w") as fh:
                fh.write(str(epoch_id))
            os.kill(os.getpid(), signal.SIGKILL)  # no atexit, no cleanup

    if mode == "dedup":
        out = (
            stream.withWatermark("ts", "10 minutes")
            .dropDuplicates(["user_id", "event_type"])
            .select("user_id", "event_type")
        )

        def write_epoch(batch_df, epoch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(
                os.path.join(sink, f"epoch={epoch_id}")
            )
            maybe_die(epoch_id)

        output_mode = "append"
    elif mode == "febatch":
        out = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )

        def write_epoch(batch_df, epoch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(sink)
            maybe_die(epoch_id)

        output_mode = "complete"
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    q = (
        out.writeStream.outputMode(output_mode)
        .foreachBatch(write_epoch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
