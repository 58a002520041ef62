"""Frontier-state operators: URL-seen dedup, Bloom prefilter,
politeness budgets, skew salting, and distributed ordered enumeration.

These are the custom physical operators SURVEY.md §4.2 calls out — all
composed from DataFrame built-ins except the Bloom filter build/probe,
which is Arrow-batched pandas (numpy bit ops, no per-row Python).

Reference analogues:
* seen-set: plugin.py:104-106's ``requested_urls`` list + the
  (crawl,url) unique constraint (models.py:77-79)
* politeness: wpull --wait serial pacing (wpull/crawler.py:36-41),
  re-expressed as a per-host budget per superstep
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

URL_HASH = lambda col: F.xxhash64(col)  # noqa: E731 — canonical url hash


# --------------------------------------------------------------------
# Bloom prefilter (SURVEY.md §4.2.2)
#
# At 10^10 seen URLs, anti-joining the full frontier against the seen
# table every superstep shuffles both sides. The Bloom filter is built
# per seen-partition (mapInPandas -> one bitmap row each), OR-merged at
# the driver, and broadcast; frontier rows whose hashes are definitely
# absent skip the exact join. Bloom-positive rows still go through the
# exact anti-join, so the final seen set is EXACT (false positives only
# cost a join probe, never a wrong dedup).
# --------------------------------------------------------------------

BLOOM_K = 4  # hash probes per key


def _bloom_positions(hashes: np.ndarray, nbits: int) -> Iterator[np.ndarray]:
    h = hashes.astype(np.uint64)
    h1 = h
    h2 = (h * np.uint64(0x9E3779B97F4A7C15)) ^ (h >> np.uint64(29))
    for i in range(BLOOM_K):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(nbits)).astype(np.int64)


def build_bloom(seen: DataFrame, nbits: int = 1 << 23) -> bytes:
    """Build a Bloom bitmap over seen.url_hash: one partial bitmap per
    partition, bitwise-OR merged on the driver. nbits is sized by the
    caller from the manifest's seen-count (target ~10 bits/key)."""
    nbytes = nbits // 8

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(nbytes, dtype=np.uint8)
        nonempty = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nonempty = True
            hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
            for pos in _bloom_positions(hashes, nbits):
                np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if nonempty:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    parts = seen.select("url_hash").mapInPandas(
        per_partition, "bitmap binary"
    ).collect()
    merged = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return merged.tobytes()


def bloom_maybe_seen_udf(spark, bitmap: bytes, nbits: int):
    """Returns a vectorized predicate column fn: url_hash -> maybe-seen.
    The bitmap travels to executors as a Spark broadcast variable."""
    bc = spark.sparkContext.broadcast(bitmap)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        hashes = url_hash.to_numpy(dtype=np.int64)
        result = np.ones(len(hashes), dtype=bool)
        for pos in _bloom_positions(hashes, nbits):
            result &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(result)

    return maybe_seen


def anti_join_seen(
    frontier: DataFrame,
    seen: DataFrame,
    bloom: Optional[Tuple] = None,
) -> DataFrame:
    """A3 request-once dedup: frontier rows not in the seen set.

    With a Bloom prefilter (bitmap, nbits, spark) only maybe-seen rows
    pay the exact anti-join shuffle; definitely-unseen rows bypass it.
    Both sides of the exact join are hashed on url_hash, so the join
    shuffles on a uniformly-distributed key (no host skew).
    """
    f = frontier.withColumn("url_hash", URL_HASH(F.col("url")))
    if bloom is None:
        return f.join(
            seen.select("url_hash").distinct(), "url_hash", "left_anti"
        ).drop("url_hash")
    spark, bitmap, nbits = bloom
    maybe = bloom_maybe_seen_udf(spark, bitmap, nbits)
    f = f.withColumn("_maybe_seen", maybe(F.col("url_hash")))
    fast_path = f.filter(~F.col("_maybe_seen"))
    slow_path = f.filter(F.col("_maybe_seen")).join(
        seen.select("url_hash").distinct(), "url_hash", "left_anti"
    )
    return fast_path.unionByName(slow_path).drop("url_hash", "_maybe_seen")


# --------------------------------------------------------------------
# Politeness budget (A11) + mega-host salting (SURVEY.md §4.2.1)
# --------------------------------------------------------------------

def politeness_select(
    frontier: DataFrame,
    host_budget: Optional[int],
    salt_buckets: int = 1,
) -> Tuple[DataFrame, DataFrame]:
    """Select up to ``host_budget`` URLs per host for this superstep in
    BFS order (depth, discovery_seq); the remainder stays queued.

    Returns (selected, deferred). With salt_buckets > 1, a mega-host's
    rows are pre-limited per salt bucket (budget/S each) before the
    exact per-host window, so no single task sorts a whole mega-host.
    Salting is deterministic (hash of url), preserving reproducibility.
    """
    if host_budget is None:
        return frontier, frontier.limit(0)

    df = frontier
    if salt_buckets > 1:
        # Pre-limit per (host, salt): each bucket keeps at most the
        # full budget, bounding any single task's sort to ~budget rows
        # while guaranteeing the exact window below still sees every
        # row it could select. Deferred rows must NOT be lost, so the
        # pre-limit only bounds the *selected* side's candidates.
        salt_w = Window.partitionBy(
            F.col("host"), F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
        ).orderBy("depth", "discovery_seq")
        df = df.withColumn("_srn", F.row_number().over(salt_w))
        candidates = df.filter(F.col("_srn") <= host_budget).drop("_srn")
        overflow = df.filter(F.col("_srn") > host_budget).drop("_srn")
        w = Window.partitionBy("host").orderBy("depth", "discovery_seq")
        ranked = candidates.withColumn("_rn", F.row_number().over(w))
        selected = ranked.filter(F.col("_rn") <= host_budget).drop("_rn")
        deferred = ranked.filter(F.col("_rn") > host_budget).drop("_rn").unionByName(
            overflow
        )
        return selected, deferred

    w = Window.partitionBy("host").orderBy("depth", "discovery_seq")
    ranked = df.withColumn("_rn", F.row_number().over(w))
    selected = ranked.filter(F.col("_rn") <= host_budget).drop("_rn")
    deferred = ranked.filter(F.col("_rn") > host_budget).drop("_rn")
    return selected, deferred


# --------------------------------------------------------------------
# Distributed ordered enumeration (discovery_seq assignment)
#
# BFS order must be totally reproducible: links are enqueued in
# (parent discovery_seq, sorted-href) order. A naive global
# row_number() puts the whole delta in ONE task; instead we
# range-partition by the order key, count rows per partition, and add
# per-partition offsets — the classic scalable zipWithIndex, kept in
# DataFrame land (mapInPandas does the intra-partition cumcount).
# --------------------------------------------------------------------

def assign_ordered_seq(
    df: DataFrame,
    order_cols: List[str],
    start: int,
    out_col: str = "discovery_seq",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    if num_partitions:
        parts = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    else:
        parts = df.repartitionByRange(*[F.col(c) for c in order_cols])
    # persist: the count job and the numbering job must see the SAME
    # physical partitioning (range-bound sampling is not re-run).
    parts = parts.sortWithinPartitions(*order_cols).persist()

    counts = (
        parts.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .orderBy("_pid")
        .collect()
    )
    offsets = {}
    acc = start
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]

    from pyspark.sql import types as T

    # fresh StructType — StructType.add would MUTATE the DataFrame's
    # cached schema and corrupt df.columns
    schema = T.StructType(
        list(parts.schema.fields) + [T.StructField(out_col, T.LongType(), False)]
    )

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas preserves sortWithinPartitions order; partition id
        # comes from TaskContext so the offset table applies exactly.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, start)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = np.arange(base, base + len(pdf), dtype=np.int64)
            base += len(pdf)
            yield pdf

    return parts.mapInPandas(number, schema)
