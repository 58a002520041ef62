"""Exact distributed quantile bucketing over bounded-cardinality
integer scores — the CCNet head/middle/tail split, Spark-first.

CCNet (Wenzek et al. 2020) does not threshold perplexity at a fixed
value: it sorts each language's documents by LM score and cuts the
corpus into thirds. A literal translation is a global sort — the one
plan shape this repo bans. But every gated score in this engine is an
*integer* with bounded cardinality by construction (milli-nat
quantization means a score column has at most ~tens of thousands of
distinct values no matter how many documents exist), and an exact
quantile over a bounded-cardinality column needs no sort of the data:

1. histogram: ``groupBy(value).count()`` — ONE partial-aggregated
   exchange; the corpus collapses map-side to <=|V| rows;
2. CDF: a running sum over the *histogram*, |V| rows in one task
   (the same bounded-small-side contract as stratified sampling's
   stratum counts — documented, and enforced nowhere near the
   corpus);
3. cut counts: ``c_i = (N * num_i) // den_i`` — exact bigint
   arithmetic from rational cut fractions (never a float quantile);
4. bucket map: value -> bucket from ``cdf(v) <= c_i`` comparisons —
   histogram-sized, broadcast back onto the corpus (no second
   corpus exchange).

Tie policy (the determinism contract): all rows sharing a value v
share cdf(v) and therefore a bucket — a tie group never splits. A
heavy tie straddling a cut lands wholly in the LATER bucket (its
cdf exceeds the cut), so bucket sizes are <= their exact quota with
the remainder pushed down — byte-stable across engines, unlike any
row_number tiebreak over equal scores.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CUTS: tuple[tuple[int, int], ...] = ((1, 3), (2, 3))
DEFAULT_LABELS: tuple[str, ...] = ("head", "middle", "tail")


def value_bucket_map(
    df: DataFrame,
    value_col: str,
    cuts: Sequence[tuple[int, int]] = DEFAULT_CUTS,
    labels: Sequence[str] = DEFAULT_LABELS,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """([*group_cols,] value, bucket) — the histogram-sized
    quantile-bucket lookup table (module docstring for the protocol).
    ``cuts`` are rational fractions (num, den), strictly increasing;
    ``labels`` has len(cuts)+1 entries.

    With ``group_cols`` the quantiles are PER GROUP (CCNet's split is
    per language, not global): the histogram keys on (group, value),
    the CDF window partitions by group — still bounded by the
    histogram, now per group — and each group's cut counts use its
    own windowed total, so every group gets its own exact thirds.
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError("need len(cuts)+1 labels")
    from pyspark.sql import Window

    group_cols = list(group_cols)
    # lazily checkpointed (the lmscore pattern): the CDF and the
    # totals both derive from the histogram — without this Catalyst
    # re-derives each branch from the corpus scan and the corpus is
    # exchanged twice
    hist = (
        df.groupBy(
            *[F.col(c) for c in group_cols],
            F.col(value_col).alias("_v"),
        )
        .agg(F.count("*").alias("_c"))
        .localCheckpoint(eager=False)
    )
    # running sums over the bounded histogram — NOT the corpus (the
    # ungrouped form is a single |V|-row task; the grouped form
    # partitions by group and stays histogram-sized per group)
    w_cdf = Window.partitionBy(*group_cols).orderBy("_v")
    w_tot = Window.partitionBy(*group_cols)
    cdf = hist.withColumn(
        "_cum", F.sum("_c").over(w_cdf)
    ).withColumn("_n", F.sum("_c").over(w_tot))
    bucket = F.lit(labels[-1])
    for (num, den), label in zip(reversed(cuts), reversed(labels[:-1])):
        cut_count = F.expr(f"(_n * {int(num)}) div {int(den)}")
        bucket = F.when(F.col("_cum") <= cut_count, F.lit(label)).otherwise(
            bucket
        )
    return cdf.select(
        *group_cols, F.col("_v").alias(value_col), bucket.alias("bucket")
    )


def bucket_by_value_quantiles(
    df: DataFrame,
    value_col: str,
    cuts: Sequence[tuple[int, int]] = DEFAULT_CUTS,
    labels: Sequence[str] = DEFAULT_LABELS,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """``df`` + a ``bucket`` column assigning each row its exact
    (per-group) quantile bucket. One corpus exchange (the histogram's
    partial aggregate); the (group, value)->bucket map joins back via
    broadcast.

    The map join is NULL-SAFE on every key (eqNullSafe): a NULL
    group (unknown language) or NULL value is its own histogram row
    and must rejoin its bucket instead of silently dropping — the
    stratified-sampling three-valued-logic lesson applied by
    construction."""
    bmap = value_bucket_map(df, value_col, cuts, labels, group_cols)
    keys = [*group_cols, value_col]
    bmap = bmap.select(
        *[F.col(c).alias(f"_bm_{c}") for c in keys], "bucket"
    )
    cond = None
    for c in keys:
        clause = df[c].eqNullSafe(F.col(f"_bm_{c}"))
        cond = clause if cond is None else cond & clause
    return df.join(F.broadcast(bmap), cond).drop(
        *[f"_bm_{c}" for c in keys]
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int | None = None,
) -> DataFrame:
    """The CCNet split proper: (doc_id, n_tokens, logloss_milli,
    bucket head/middle/tail) — corpus-self-trained LM score
    (operators/lmscore.py) bucketed into exact thirds by the
    histogram protocol. Lower logloss = more typical = head."""
    from website_indexer_spark.operators.lmscore import (
        DEFAULT_VOCAB_K,
        unigram_logloss,
    )

    scored = unigram_logloss(
        df, id_col, text_col, vocab_k or DEFAULT_VOCAB_K
    )
    return bucket_by_value_quantiles(scored, "logloss_milli").select(
        "doc_id", "n_tokens", "logloss_milli", "bucket"
    )


__all__ = [
    "DEFAULT_CUTS",
    "DEFAULT_LABELS",
    "bucket_by_value_quantiles",
    "ccnet_buckets",
    "value_bucket_map",
]
