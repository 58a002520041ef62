"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023), relationally.

DSIR ranks raw web documents by how much more likely their hashed
n-gram bag is under a *target* distribution (Wikipedia/books-quality
text) than under the *raw* crawl distribution, then keeps the top of
that ranking. The published recipe: hash word bigrams into B buckets,
fit two bag-of-buckets unigram models (target vs raw) with add-one
smoothing, and score each document by its summed per-feature
log-likelihood ratio. This module re-expresses it as three DataFrame
stages with no model artifact and no Python in the hot path:

1. FEATURES: lowercase whitespace terms (the exact tokenization of
   lmscore/redact — already oracle-pinned), consecutive-pair bigrams
   via ``zip_with`` over two array slices, bucket id from the md5
   16-bit prefix (the repo's cross-engine hash protocol: DuckDB can
   reproduce ``conv(substring(md5(g),1,4),16,10)`` with strpos
   arithmetic, so the gate hash-matches).
2. COUNTS (scan 1): ONE groupBy(bucket) with a conditional sum
   computes BOTH models' counts — the target is a boolean column, so
   target and raw counts ride the same partial (map-side) aggregate
   and only <=B rows ever cross the exchange. Totals derive from the
   counts frame (localCheckpointed, the lmscore pattern) as a
   broadcast 1-row cross join — no driver collect.
3. SCORE (scan 2): per-bucket log ratio
       lr(b) = ln( ((tgt_b+1)/(T+B)) / ((raw_b+1)/(R+B)) )
   floor-quantized to integer milli-nats in the <=B-row scores frame,
   then a broadcast equi-join features->scores and a groupBy(doc_id)
   **integer** sum. Quantizing per bucket (not per document) makes
   the per-doc weight a sum of bigints — byte-stable under any
   summation order, a strictly stronger float protocol than
   lm_logloss's quantize-after-mean (only the single ln per bucket
   carries the documented <=1-ulp libm variance). The ratio is
   assembled as (exact-int casts -> one multiply -> one divide), each
   step IEEE-correctly-rounded, so engines agree on the ln argument
   bit-for-bit.

Scale shape at 100 TB: two corpus scans (count, score — the inherent
minimum for a self-normalized score), one exchange of <=B count rows,
one exchange of ~1 row/doc (the explode stream partial-aggregates
per doc_id map-side because a document's bigrams never leave its
input partition), and a broadcast that is <=B rows BY CONSTRUCTION —
the bucket count caps the model exactly the way lmscore's vocab_k
caps the vocabulary, which is why scoring is never a big-big join.
Documents with fewer than two tokens have no bigram features and are
dropped (any length gate kills them far earlier in a real pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DSIR_BUCKETS = 65_536  # md5 16-bit prefix IS the bucket id


def _bigram_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    extra: list[Column] | None = None,
) -> DataFrame:
    """(doc_id, bucket [, *extra]) — one row per bigram occurrence."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    n = F.size(toks)
    grams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rows = df.select(
        F.col(id_col).alias("doc_id"),
        *(extra or []),
        F.explode(grams).alias("gram"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("gram")), 1, 4), 16, 10).cast(
            "long"
        ),
        F.lit(int(n_buckets)),
    )
    return rows.select(
        "doc_id", *[c for c in rows.columns if c not in ("doc_id", "gram")],
        bucket.alias("bucket"),
    )


def dsir_bucket_scores(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(bucket, raw_ct, tgt_ct, lr_milli) — the <=``n_buckets``-row
    importance model. ``is_target`` is any boolean Column over ``df``
    (e.g. a trusted-source flag); both models come out of one scan."""
    feats = _bigram_buckets(
        df, id_col, text_col, n_buckets, extra=[is_target.alias("_t")]
    )
    stats = (
        feats.groupBy("bucket")
        .agg(
            F.count("*").alias("raw_ct"),
            F.coalesce(
                F.sum(F.col("_t").cast("long")), F.lit(0)
            ).alias("tgt_ct"),
        )
        .localCheckpoint(eager=False)
    )
    totals = stats.agg(
        F.coalesce(F.sum("raw_ct"), F.lit(0)).alias("_raw_total"),
        F.coalesce(F.sum("tgt_ct"), F.lit(0)).alias("_tgt_total"),
    )
    b = F.lit(int(n_buckets))
    ratio = (
        (F.col("tgt_ct") + F.lit(1)).cast("double")
        * (F.col("_raw_total") + b).cast("double")
    ) / (
        (F.col("raw_ct") + F.lit(1)).cast("double")
        * (F.col("_tgt_total") + b).cast("double")
    )
    return (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "raw_ct",
            "tgt_ct",
            F.floor(F.lit(1000.0) * F.log(ratio)).cast("long").alias(
                "lr_milli"
            ),
        )
    )


def dsir_logratio(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc_id, n_bigrams, weight_milli) — per-document DSIR
    importance weight in integer milli-nats (sum of the per-bucket
    quantized log ratios over the document's bigram occurrences;
    higher = more target-like). Zero-bigram documents are dropped."""
    scores = dsir_bucket_scores(
        df, is_target, id_col, text_col, n_buckets
    )
    feats = _bigram_buckets(df, id_col, text_col, n_buckets)
    return (
        feats.join(F.broadcast(scores.select("bucket", "lr_milli")), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lr_milli").alias("weight_milli"),
        )
        .select("doc_id", "n_bigrams", "weight_milli")
    )


def dsir_head(
    df: DataFrame,
    is_target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Top-``k`` documents by (weight_milli desc, doc_id asc) — the
    DSIR selection step as a TakeOrderedAndProject (per-task top-k
    heaps; no global sort)."""
    return (
        dsir_logratio(df, is_target, id_col, text_col, n_buckets)
        .orderBy(F.col("weight_milli").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )


__all__ = [
    "DSIR_BUCKETS",
    "dsir_bucket_scores",
    "dsir_logratio",
    "dsir_head",
]
