"""Exact quantile bucketing (operators/quantiles.py): the
histogram-CDF protocol vs a Python oracle, the tie rule (a value
group straddling a cut lands wholly in the later bucket), and the
plan shape (one corpus exchange, broadcast map join, no corpus-wide
window/sort)."""

from __future__ import annotations

import pytest

from website_indexer_spark.operators.quantiles import (
    bucket_by_value_quantiles,
    ccnet_buckets,
    value_bucket_map,
)


def _py_buckets(values, cuts=((1, 3), (2, 3)), labels=("head", "middle", "tail")):
    n = len(values)
    hist = {}
    for v in values:
        hist[v] = hist.get(v, 0) + 1
    cum, cdf = 0, {}
    for v in sorted(hist):
        cum += hist[v]
        cdf[v] = cum
    cut_counts = [(n * num) // den for num, den in cuts]
    out = {}
    for v in hist:
        b = labels[-1]
        for c, lab in zip(reversed(cut_counts), reversed(labels[:-1])):
            if cdf[v] <= c:
                b = lab
        out[v] = b
    return out


def _df(spark, values):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "doc_id long, score long"
    )


def test_matches_python_oracle(spark):
    values = [5, 1, 9, 1, 7, 3, 3, 3, 8, 2, 6, 4]
    want = _py_buckets(values)
    got = {
        r["score"]: r["bucket"]
        for r in bucket_by_value_quantiles(
            _df(spark, values), "score"
        ).collect()
    }
    assert got == want


def test_exact_thirds_on_distinct_values(spark):
    values = list(range(1, 10))  # 9 distinct values -> perfect thirds
    got = [
        (r["score"], r["bucket"])
        for r in bucket_by_value_quantiles(
            _df(spark, values), "score"
        ).collect()
    ]
    by = dict(got)
    assert [by[v] for v in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )


def test_tie_group_never_splits(spark):
    # 6 copies of value 1 and 3 copies of 2: cut at 3 falls inside
    # the 1-group (cdf(1)=6 > 3) -> the WHOLE group moves to middle;
    # head is empty
    values = [1] * 6 + [2] * 3
    got = {
        r["score"]: r["bucket"]
        for r in bucket_by_value_quantiles(
            _df(spark, values), "score"
        ).collect()
    }
    assert got == _py_buckets(values)
    assert got[1] == "middle" and got[2] == "tail"


def test_custom_cuts_and_labels(spark):
    values = list(range(10))
    got = {
        r["score"]: r["bucket"]
        for r in bucket_by_value_quantiles(
            _df(spark, values),
            "score",
            cuts=((9, 10),),
            labels=("keep", "drop"),
        ).collect()
    }
    assert [got[v] for v in range(9)] == ["keep"] * 9
    assert got[9] == "drop"


def test_label_arity_validated(spark):
    with pytest.raises(ValueError):
        value_bucket_map(
            _df(spark, [1]), "score", cuts=((1, 2),), labels=("only",)
        )


def test_ccnet_buckets_cover_and_order(spark):
    docs = spark.createDataFrame(
        [
            (i, " ".join(["common"] * 5 + [f"rare{i % 4}"] * (i % 4)))
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    rows = ccnet_buckets(docs).collect()
    assert len(rows) == 12
    # bucket boundaries respect score order: max(head) <= min(middle)
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["logloss_milli"])
    order = ["head", "middle", "tail"]
    present = [b for b in order if b in by_bucket]
    for a, b in zip(present, present[1:]):
        assert max(by_bucket[a]) <= min(by_bucket[b])


def test_plan_one_corpus_exchange_broadcast_map(spark):
    df = _df(spark, list(range(100))).localCheckpoint()
    out = bucket_by_value_quantiles(df, "score")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the corpus-keyed histogram exchange runs once inside the
    # checkpoint job; the visible plan re-exchanges NOTHING
    # corpus-sized — only the bounded histogram's SinglePartition
    # hops remain
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Exchange SinglePartition" in plan


def test_negative_values_order_correctly(spark):
    values = [-5, -5, -1, 0, 3, 3, 7, 8, 9]
    want = _py_buckets(values)
    got = {
        r["score"]: r["bucket"]
        for r in bucket_by_value_quantiles(
            _df(spark, values), "score"
        ).collect()
    }
    assert got == want
    assert got[-5] == "head" and got[9] == "tail"


def test_per_group_thirds_and_null_group(spark):
    """Per-group quantiles: each group gets its own exact split, and
    a NULL group is a real group (null-safe map join — the
    stratified-sampling three-valued-logic lesson)."""
    rows = []
    for i, v in enumerate(range(1, 10)):          # group a: 1..9
        rows.append((i, "a", v))
    for i, v in enumerate(range(10, 16)):         # group b: 10..15
        rows.append((100 + i, "b", v))
    for i, v in enumerate([7, 8, 9]):             # NULL group
        rows.append((200 + i, None, v))
    df = spark.createDataFrame(
        rows, "doc_id long, grp string, score long"
    )
    out = bucket_by_value_quantiles(
        df, "score", group_cols=["grp"]
    ).collect()
    assert len(out) == len(rows)  # nothing dropped, incl. NULL grp
    by = {(r["grp"], r["score"]): r["bucket"] for r in out}
    # group a: 9 values -> perfect thirds
    assert [by[("a", v)] for v in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    # group b: 6 values -> 2/2/2
    assert [by[("b", v)] for v in range(10, 16)] == (
        ["head"] * 2 + ["middle"] * 2 + ["tail"] * 2
    )
    # NULL group: 3 values -> 1/1/1, split independently of a/b
    assert [by[(None, v)] for v in (7, 8, 9)] == [
        "head", "middle", "tail"
    ]
