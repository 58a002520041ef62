"""Custom stateful streaming operators (applyInPandasWithState):
streaming sessionization must match the batch sessionizer's closed
sessions, and keyed state must survive across micro-batches."""

import datetime
import glob
import os
import shutil
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from website_indexer_spark.streaming.state import (
    host_rate_budget_stream,
    sessionize_stream,
)

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _mk_events():
    # three users; user 1 has 3 sessions, user 2 has 2, user 3 has 1
    base = datetime.datetime(2026, 1, 1)
    m = datetime.timedelta(minutes=1)
    rows = []
    eid = 0

    def ev(user, minutes, value=1.0):
        nonlocal eid
        rows.append((eid, base + minutes * m, user, value))
        eid += 1

    for start in (0, 120, 300):  # user 1: gaps of 2h / 3h
        for i in range(4):
            ev(1, start + 5 * i)
    for start in (10, 400):  # user 2
        for i in range(3):
            ev(2, start + 7 * i, 2.0)
    for i in range(5):  # user 3: one session
        ev(3, 50 + 3 * i)
    return rows


def _batch_sessions(spark, rows):
    ev = spark.createDataFrame(rows, EVENTS_SCHEMA)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)),
                F.lit(10**9),
            )
            > 1800
        ).cast("long"),
    )
    w2 = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = gapped.withColumn("session_id", F.sum("new_session").over(w2))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    )


def _run_sessions(spark, src_dir, out_table, ckpt, max_files=None):
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(src_dir)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {out_table}").collect()


def _write_file_per_trigger(spark, chunks, schema, src, scratch):
    """One flat parquet FILE per chunk with strictly increasing mtimes
    so the streaming file source's oldest-first order is the chunk
    order."""
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(chunks):
        tmp = os.path.join(scratch, f"tmp{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.copyfile(part, os.path.join(src, f"chunk{i}.parquet"))
        time.sleep(1.1)  # distinct mtimes => deterministic file order


def _closed_key_set(batch_rows):
    """Batch sessions minus each user's trailing (still-open) one."""
    by_user = {}
    for r in batch_rows:
        by_user.setdefault(r["user_id"], []).append(r)
    closed = []
    for user, sess in by_user.items():
        sess.sort(key=lambda r: r["session_start"])
        closed.extend(sess[:-1])
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in closed
    }


def test_stream_sessions_match_batch_single_batch(spark, tmp_path):
    rows = _mk_events()
    src = str(tmp_path / "events")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    got = _run_sessions(spark, src, "sess_single", str(tmp_path / "ckpt"))
    want = _closed_key_set(_batch_sessions(spark, rows))
    got_keys = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in got
    }
    assert got_keys == want
    assert len(want) == 3  # users 1+2 contribute 2+1 closed sessions


def test_stream_sessions_state_across_batches(spark, tmp_path):
    """Events split time-ordered across files, one file per trigger:
    sessions spanning micro-batch boundaries must still close once
    with the full event count (state carries the open session)."""
    rows = sorted(_mk_events(), key=lambda r: r[1])
    src = str(tmp_path / "events")
    third = len(rows) // 3
    chunks = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    _write_file_per_trigger(spark, chunks, EVENTS_SCHEMA, src, str(tmp_path))
    got = _run_sessions(
        spark, src, "sess_multi", str(tmp_path / "ckpt"), max_files=1
    )
    want = _closed_key_set(_batch_sessions(spark, rows))
    got_keys = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in got
    }
    assert got_keys == want


def test_host_budget_ledger_accumulates(spark, tmp_path):
    src = str(tmp_path / "reqs")
    waves = [
        [("a.test",)] * 3 + [("b.test",)] * 1,
        [("a.test",)] * 2 + [("b.test",)] * 2,
    ]
    _write_file_per_trigger(spark, waves, "host string", src, str(tmp_path))
    stream = (
        spark.readStream.schema("host string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        host_rate_budget_stream(stream, budget=4)
        .writeStream.format("memory")
        .queryName("ledger")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM ledger").collect()
    finals = {}
    for r in rows:
        cur = finals.get(r["host"])
        if cur is None or r["total_requests"] > cur["total_requests"]:
            finals[r["host"]] = r
    assert finals["a.test"]["total_requests"] == 5
    assert finals["a.test"]["over_budget"] is True
    assert finals["b.test"]["total_requests"] == 3
    assert finals["b.test"]["over_budget"] is False


def test_first_seen_stream_dedups_across_batches(spark, tmp_path):
    """Streaming seen-set (A3's twin): a URL emitted in batch 0 must
    be swallowed when it reappears in batch 1; new URLs still emit."""
    from website_indexer_spark.streaming.state import first_seen_stream

    waves = [
        [("u1",), ("u2",), ("u2",)],  # in-batch dupe too
        [("u2",), ("u3",), ("u1",)],  # all but u3 already seen
    ]
    src = str(tmp_path / "urls")
    _write_file_per_trigger(spark, waves, "url string", src, str(tmp_path))
    stream = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        first_seen_stream(stream, "url")
        .writeStream.format("memory")
        .queryName("seen_once")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT key FROM seen_once").collect()
    keys = [r["key"] for r in rows]
    assert sorted(keys) == ["u1", "u2", "u3"]  # each exactly once


def test_stream_sessions_tolerate_late_events(spark, tmp_path):
    """A late event (ts < state.last_ts) arriving in a later
    micro-batch must fold into the open session — never regress
    last_ts, never open a negative-gap phantom session (ADVICE r2)."""
    base = datetime.datetime(2026, 1, 1)
    m = datetime.timedelta(minutes=1)
    ev = lambda eid, minutes: (eid, base + minutes * m, 9, 1.0)  # noqa: E731
    waves = [
        [ev(0, 0), ev(1, 10)],          # open session [0, 10]
        [ev(2, 5), ev(3, 100)],         # late t=5 folds in; t=100 closes it
        [ev(4, 95), ev(5, 200)],        # late t=95 extends start back; t=200 closes
    ]
    src = str(tmp_path / "events")
    _write_file_per_trigger(spark, waves, EVENTS_SCHEMA, src, str(tmp_path))
    got = _run_sessions(
        spark, src, "sess_late", str(tmp_path / "ckpt"), max_files=1
    )
    keys = sorted(
        (r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in got
    )
    assert keys == [
        (base + 0 * m, base + 10 * m, 3, 3.0),    # includes the late t=5
        (base + 95 * m, base + 100 * m, 2, 2.0),  # start extended back to 95
    ]
