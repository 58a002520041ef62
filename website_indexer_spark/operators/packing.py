"""Training-shard packing: assign documents to fixed token-budget
shards, deterministically, without a global sort.

A pretraining pipeline's last hop turns a cleaned corpus into shard
files of roughly equal token mass (so every data-loader worker streams
the same amount of work). The classic formulation is a greedy
sequential scan — cumulative token count, cut a shard each time the
running total crosses the budget — which is inherently serial. The
scale-safe re-expression used here is **two-level**:

1. route every document to one of ``n_buckets`` independent streams
   by a cheap deterministic key (``doc_id % n_buckets``) — buckets
   are the unit of parallelism AND the unit of output layout (one
   writer task per bucket, mirroring the seen/dims bucket stores in
   sources/tables.py);
2. inside each bucket, order documents by an md5 shuffle key (the
   same keyed-md5 protocol as operators/sampling.py:hash_sample, so
   the order is reproducible across runs and engines), take a
   cumulative token sum with a window, and cut shards greedily:
   a document belongs to ``shard = floor(tokens_before / budget)``.

At 100 TB the plan is: narrow projection (id, bucket, token count —
the TEXT COLUMN IS DROPPED before any exchange), one hash exchange on
``bucket``, one in-partition sort per bucket. Each bucket's window
state is (id, bigint) pairs only, so a bucket sized at ~10^8 docs
sorts ~3 GB — pick ``n_buckets`` so that holds (the default 8 is the
sandbox setting, same knob story as SEEN_BUCKETS). No global
ordering, no driver participation, no UDF.

Token counts use the whitespace protocol from functions/textstats.py
(``len(filter(split(trim(text)))``) so the count matches the
``token_counts`` oracle gate exactly.

Semantics (pinned by the DuckDB oracle in plans/catalog.py):
* every document lands in exactly one (bucket, shard);
* within a bucket, shard k's documents are exactly the contiguous
  md5-order run whose STARTING stream offset (cumulative tokens of
  the docs before it) lies in [k*budget, (k+1)*budget) — interval
  binning on the token stream, so every shard's token mass is the
  budget plus-or-minus the documents straddling its two boundaries
  (a straddler belongs to the shard where it STARTS);
* empty documents (0 tokens) ride along with their position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from website_indexer_spark.functions.textstats import whitespace_token_count

DEFAULT_BUDGET = 2_000
DEFAULT_BUCKETS = 8


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = DEFAULT_BUDGET,
    n_buckets: int = DEFAULT_BUCKETS,
    salt: str = "pack",
) -> DataFrame:
    """(doc_id, bucket, shard_id, n_tokens, tokens_before) — the shard
    assignment table. ``tokens_before`` is the in-shard-stream offset
    (cumulative tokens of earlier docs in the same bucket), kept in
    the output because a writer needs it to place the doc inside the
    shard without re-scanning.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")

    # narrow FIRST: the window below must never shuffle text
    slim = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int").alias("bucket"),
        whitespace_token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))).alias(
            "_pk"
        ),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_pk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        slim.withColumn(
            "tokens_before", (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        )
        .withColumn(
            "shard_id",
            F.floor(F.col("tokens_before") / F.lit(budget_tokens)).cast("int"),
        )
        .select("doc_id", "bucket", "shard_id", "n_tokens", "tokens_before")
    )


def shard_manifest(assignments: DataFrame) -> DataFrame:
    """Roll the assignment table up to one row per (bucket, shard):
    doc count + token mass — the writer's work list and the
    balance-check artifact. Same exchange key as the packing window
    (bucket), so under AQE this folds onto the existing partitioning.
    """
    return assignments.groupBy("bucket", "shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )


__all__ = ["pack_documents", "shard_manifest", "DEFAULT_BUDGET", "DEFAULT_BUCKETS"]
