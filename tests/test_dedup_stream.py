"""Streaming incremental dedup (streaming/dedup_stream.py): batch
parity with the cumulative dedup_against_snapshot semantics,
exactly-once replay after a torn batch, and the storage-partitioned
probe (hash set absent from the plan)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.streaming.dedup_stream import (
    DedupStreamStore,
    dedup_stream_step,
)

SCHEMA = "doc_id long, text string"

# three waves: in-batch dup (11/12), cross-batch dups (20 repeats
# wave 1's text; 31 repeats its own wave's), and a re-delivered row
WAVES = [
    [(10, "alpha"), (11, "beta"), (12, "beta"), (13, "gamma")],
    [(20, "alpha"), (21, "delta"), (22, "delta"), (23, "epsilon")],
    [(30, "delta"), (31, "zeta"), (32, "zeta"), (10, "alpha")],
]


def _py_oracle(waves):
    seen, accepted = set(), []
    for wave in waves:
        in_batch = {}
        for i, t in wave:
            if t not in in_batch:
                in_batch[t] = min(
                    i2 for i2, t2 in wave if t2 == t
                )
        for t, i in sorted(in_batch.items(), key=lambda kv: kv[1]):
            if t not in seen:
                seen.add(t)
                accepted.append((i, t))
    return sorted(accepted)


def _run_waves(spark, out, waves, start=0):
    step = dedup_stream_step(str(out))
    for j, wave in enumerate(waves):
        step(spark.createDataFrame(wave, SCHEMA), start + j)


def test_stream_matches_cumulative_oracle(spark, tmp_path):
    out = tmp_path / "dstream"
    _run_waves(spark, out, WAVES)
    store = DedupStreamStore(str(out))
    got = sorted(
        (r["doc_id"], r["text"])
        for r in store.read_accepted(spark).collect()
    )
    assert got == _py_oracle(WAVES)
    # lineage counters committed per batch
    ms = store.manifests()
    assert [m["counters"]["rows_in"] for m in ms] == [4, 4, 4]
    assert sum(m["counters"]["accepted"] for m in ms) == len(got)


def test_replay_after_torn_batch_is_exactly_once(spark, tmp_path):
    out = tmp_path / "dstream2"
    _run_waves(spark, out, WAVES[:2])
    store = DedupStreamStore(str(out))
    # simulate a crash after batch 2's data landed but before the
    # manifest: write batch 3, then delete its marker
    step = dedup_stream_step(str(out))
    step(spark.createDataFrame(WAVES[2], SCHEMA), 2)
    os.remove(store._manifest_path(2))
    assert store.last_committed() == 1
    # Structured Streaming replays the batch; result identical
    step(spark.createDataFrame(WAVES[2], SCHEMA), 2)
    got = sorted(
        (r["doc_id"], r["text"])
        for r in store.read_accepted(spark).collect()
    )
    assert got == _py_oracle(WAVES)


def test_redelivered_batch_fully_swallowed(spark, tmp_path):
    """At-least-once delivery: replaying an ALREADY-COMMITTED wave as
    a new batch accepts nothing new."""
    out = tmp_path / "dstream3"
    _run_waves(spark, out, WAVES)
    step = dedup_stream_step(str(out))
    step(spark.createDataFrame(WAVES[1], SCHEMA), 99)
    store = DedupStreamStore(str(out))
    assert store.manifests()[-1]["counters"]["accepted"] == 0
    got = sorted(
        (r["doc_id"], r["text"])
        for r in store.read_accepted(spark).collect()
    )
    assert got == _py_oracle(WAVES)


def test_real_stream_source(spark, tmp_path):
    """Drive the skin through an actual Structured Streaming query
    (file source, one file per micro-batch, availableNow)."""
    src = tmp_path / "src"
    for j, wave in enumerate(WAVES):
        spark.createDataFrame(wave, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"wave{j}"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "wave*"))
    )
    out = tmp_path / "dstream4"
    q = (
        stream.writeStream.foreachBatch(dedup_stream_step(str(out)))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["text"])
        for r in DedupStreamStore(str(out)).read_accepted(spark).collect()
    }
    # file-source batch ordering isn't guaranteed to match WAVES
    # order, but the ACCEPTED TEXT SET is order-independent and the
    # accepted count per text is exactly one
    assert {t for _, t in got} == {
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta"
    }
    assert len(got) == 6


def test_probe_is_storage_partitioned(spark, tmp_path):
    """After a committed batch, the next batch's anti-join must not
    scan the hash layout as a Spark relation: only the probe side's
    exchange appears, membership runs in an Arrow-batched stage."""
    out = tmp_path / "dstream5"
    _run_waves(spark, out, WAVES[:1])
    from website_indexer_spark.operators.frontier import (
        exclude_keys_bucketed,
    )

    store = DedupStreamStore(str(out))
    batch = spark.createDataFrame(WAVES[1], SCHEMA).withColumn(
        "content_hash", F.xxhash64("text")
    )
    probe = exclude_keys_bucketed(
        batch, store.hash_bucket_files(), 8, key="content_hash"
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "parquet" not in plan  # layout never enters the plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
