"""DSIR importance resampling (operators/dsir.py) vs a plain-Python
oracle, plus the plan properties that make it a 100-TB shape: the
bucket-score model is broadcast (never a big-big join), the per-doc
weight is an integer sum, and the feature stream partial-aggregates
before the doc exchange."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from website_indexer_spark.operators.dsir import (
    DSIR_BUCKETS,
    dsir_bucket_scores,
    dsir_head,
    dsir_logratio,
)

DOCS = [
    (0, "the quick brown fox", True),
    (1, "the quick red fox", True),
    (2, "buy cheap pills now buy cheap", False),
    (3, "the quick brown fox jumps", False),
    (4, "singleton", False),  # <2 tokens: no bigrams, dropped
    (5, "", False),
    (6, "buy cheap pills", False),
]


def _df(spark, docs=DOCS):
    return spark.createDataFrame(
        docs, "doc_id long, text string, is_t boolean"
    )


def _bucket(gram: str, n_buckets: int = DSIR_BUCKETS) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:4], 16) % n_buckets


def _py_oracle(docs, n_buckets=DSIR_BUCKETS):
    """(bucket -> (raw, tgt, lr_milli), doc -> (n, weight))."""
    feats = []
    for doc_id, text, is_t in docs:
        toks = [t for t in text.lower().strip().split() if t]
        for a, b in zip(toks, toks[1:]):
            feats.append((doc_id, _bucket(f"{a} {b}", n_buckets), is_t))
    stats = {}
    for _, b, is_t in feats:
        raw, tgt = stats.get(b, (0, 0))
        stats[b] = (raw + 1, tgt + (1 if is_t else 0))
    rt = sum(r for r, _ in stats.values())
    tt = sum(t for _, t in stats.values())
    scores = {
        b: math.floor(
            1000.0
            * math.log(
                (float(t + 1) * float(rt + n_buckets))
                / (float(r + 1) * float(tt + n_buckets))
            )
        )
        for b, (r, t) in stats.items()
    }
    weights = {}
    for doc_id, b, _ in feats:
        n, w = weights.get(doc_id, (0, 0))
        weights[doc_id] = (n + 1, w + scores[b])
    return stats, scores, weights


def test_bucket_scores_match_python_oracle(spark):
    stats, scores, _ = _py_oracle(DOCS)
    got = {
        r["bucket"]: (r["raw_ct"], r["tgt_ct"], r["lr_milli"])
        for r in dsir_bucket_scores(_df(spark), F.col("is_t")).collect()
    }
    assert got == {
        b: (r, t, scores[b]) for b, (r, t) in stats.items()
    }


def test_logratio_matches_python_oracle(spark):
    _, _, weights = _py_oracle(DOCS)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["weight_milli"])
        for r in dsir_logratio(_df(spark), F.col("is_t")).collect()
    }
    assert got == weights
    # target-looking docs outrank the spam: doc 3 shares 3 of its 4
    # bigrams with the target slice, doc 2/6 share none
    assert got[3][1] > got[2][1] and got[3][1] > got[6][1]


def test_zero_bigram_docs_dropped(spark):
    got = {r["doc_id"] for r in dsir_logratio(_df(spark), F.col("is_t")).collect()}
    assert 4 not in got and 5 not in got


def test_head_order_and_cut(spark):
    _, _, weights = _py_oracle(DOCS)
    want = sorted(weights.items(), key=lambda kv: (-kv[1][1], kv[0]))[:2]
    got = dsir_head(_df(spark), F.col("is_t"), 2).collect()
    assert [(r["doc_id"], r["weight_milli"]) for r in got] == [
        (d, w) for d, (_, w) in want
    ]


def test_small_bucket_count_collisions_fold(spark):
    """With n_buckets=4 grams collide; counts/scores must still match
    the oracle run at the same bucket count."""
    stats, scores, weights = _py_oracle(DOCS, n_buckets=4)
    got = {
        r["bucket"]: (r["raw_ct"], r["tgt_ct"], r["lr_milli"])
        for r in dsir_bucket_scores(
            _df(spark), F.col("is_t"), n_buckets=4
        ).collect()
    }
    assert got == {b: (r, t, scores[b]) for b, (r, t) in stats.items()}
    gotw = {
        r["doc_id"]: (r["n_bigrams"], r["weight_milli"])
        for r in dsir_logratio(
            _df(spark), F.col("is_t"), n_buckets=4
        ).collect()
    }
    assert gotw == weights


def test_plan_broadcast_model_no_cartesian(spark):
    """Scoring joins the model via broadcast; the only non-broadcast
    exchanges are the bucket-count and per-doc aggregates; the top-k
    is TakeOrderedAndProject."""
    df = _df(spark).localCheckpoint()
    scored = dsir_logratio(df, F.col("is_t"))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    top = dsir_head(df, F.col("is_t"), 2)
    tplan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in tplan
