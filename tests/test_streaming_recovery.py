"""Crash-recovery proof for the S-tier (r12 verdict task 5): SIGKILL the
streaming driver between a micro-batch's sink write and its checkpoint
commit, restart from the checkpoint, and assert exactly-once sink state.

Each scenario runs tests/crash_driver.py twice in SUBPROCESSES (fresh JVM
each — the restart is a real process-death restart, not an in-session
stop/start): run 1 dies by SIGKILL inside the kill epoch's foreachBatch
(write landed, commit not yet logged — the exact window where a
non-idempotent sink double-writes, the reference's append-mode hazard,
SURVEY.md §4.3); run 2 resumes from the same checkpoint and must (a)
replay the uncommitted epoch idempotently and (b) recover the state
store, because the post-crash input is crafted so that a reset state
would produce observably wrong output:

  dedup   — file written AFTER the crash repeats keys first seen BEFORE
            it; only a recovered dropDuplicates state store suppresses
            them (replay alone cannot — the dupes are in a new file).
  febatch — complete-mode totals must cover pre-crash files the restarted
            query never re-reads; only recovered aggregation state can.

Assertions read the sink with DuckDB — no Spark in the pytest process, so
a wedged subprocess can't poison the suite's shared session.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
from datetime import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DRIVER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "crash_driver.py")
KILL_EPOCH = 1  # second micro-batch: epoch 0 committed, epoch 1 in flight


def _t(minute: int) -> datetime:
    return datetime(2024, 1, 1, 12, minute, 0)


def _write_file(src_dir: str, name: str, rows) -> None:
    os.makedirs(src_dir, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(table, os.path.join(src_dir, name))


def _run_driver(mode: str, src: str, sink: str, ckpt: str, flag: str):
    return subprocess.run(
        [sys.executable, DRIVER, mode, src, sink, ckpt, flag, str(KILL_EPOCH)],
        capture_output=True,
        text=True,
        timeout=300,
    )


def _crash_then_resume(mode: str, tmp_path, files) -> str:
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    flag = str(tmp_path / "killflag")
    for name, rows in files[: KILL_EPOCH + 1]:
        _write_file(src, name, rows)

    crashed = _run_driver(mode, src, sink, ckpt, flag)
    # the driver must have died by OUR SIGKILL, not finished or errored
    assert crashed.returncode == -signal.SIGKILL, (
        crashed.returncode,
        crashed.stderr[-2000:],
    )
    assert os.path.exists(flag), "kill flag missing — suicide never fired"
    # the kill epoch's write landed before the commit: sink data exists
    # for an epoch the checkpoint does NOT record as committed
    commits = os.path.join(ckpt, "commits")
    committed = {
        int(f) for f in os.listdir(commits) if f.isdigit()
    } if os.path.isdir(commits) else set()
    assert KILL_EPOCH not in committed, committed

    # post-crash input: present only for the resumed run
    for name, rows in files[KILL_EPOCH + 1 :]:
        _write_file(src, name, rows)

    resumed = _run_driver(mode, src, sink, ckpt, flag)
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    return sink


# key schedule: file0 establishes (1,click) and (2,view); file1 (the kill
# epoch) repeats (1,click) and adds (3,click); file2 — written only after
# the crash — repeats BOTH pre-crash keys and adds (4,view). Timestamps
# stay within a 4-minute span so the 10-minute watermark never drops
# anything and every suppression is the state store's doing.
_DEDUP_FILES = [
    ("b0.parquet", [(1, _t(0), 1, "click", 1.0), (2, _t(1), 2, "view", 2.0)]),
    ("b1.parquet", [(3, _t(2), 1, "click", 3.0), (4, _t(2), 3, "click", 4.0)]),
    ("b2.parquet", [(5, _t(3), 2, "view", 5.0), (6, _t(3), 1, "click", 6.0),
                    (7, _t(4), 4, "view", 7.0)]),
]

_FEBATCH_FILES = [
    ("b0.parquet", [(1, _t(0), 1, "click", 1.0), (2, _t(1), 2, "view", 2.0)]),
    ("b1.parquet", [(3, _t(2), 1, "click", 3.0), (4, _t(2), 3, "click", 4.0)]),
    ("b2.parquet", [(5, _t(3), 2, "view", 5.0), (6, _t(4), 4, "view", 7.5)]),
]


def test_dedup_state_survives_sigkill(tmp_path):
    sink = _crash_then_resume("dedup", tmp_path, _DEDUP_FILES)
    rows = duckdb.sql(
        f"SELECT user_id, event_type FROM read_parquet('{sink}/epoch=*/*.parquet')"
        " ORDER BY user_id, event_type"
    ).fetchall()
    # exactly-once AND state-recovered: each key once, including the
    # post-crash duplicates of pre-crash keys
    assert rows == [(1, "click"), (2, "view"), (3, "click"), (4, "view")], rows


def test_foreachbatch_agg_state_survives_sigkill(tmp_path):
    sink = _crash_then_resume("febatch", tmp_path, _FEBATCH_FILES)
    rows = duckdb.sql(
        f"SELECT event_type, cnt, sum_value FROM read_parquet('{sink}/*.parquet')"
        " ORDER BY event_type"
    ).fetchall()
    # totals over ALL files — epoch 0's rows are only countable via
    # recovered aggregation state, epoch 1's only via idempotent replay
    assert rows == [("click", 3, 8.0), ("view", 3, 14.5)], rows
