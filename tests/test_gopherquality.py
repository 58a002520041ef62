"""Gopher document-quality rule set (functions/gopherquality.py):
hand-computed docs vs an independent Python oracle, threshold edge
behavior, and the zero-exchange plan property."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.functions.gopherquality import (
    GOPHER_STOPWORDS,
    gopher_quality_filter,
    gopher_quality_stats,
)

DOCS = [
    # (doc_id, text)
    (0, "the cat sat on the mat and that have with be to of it"),  # all 8 stopwords-ish
    (1, "• bullet one two\n• bullet three four\nplain line here."),
    (2, "trailing thought goes on...\nand another one…\nshort line."),
    (3, "### symbols ## here ... and … more #"),
    (4, "12345 67890 11111 22222 alpha"),
    (5, ""),
    (6, "x " * 60),  # 60 one-char words -> mean_word_len 1
]


def _py_oracle(doc_id: int, text: str, wrap: int = 10) -> dict:
    toks = [t for t in re.split(r"\s+", text.strip()) if t]
    n_words = len(toks)
    safe_w = max(n_words, 1)
    if "\n" in text:
        lines = [
            re.sub(r"^\s+|\s+$", "", l) for l in text.split("\n")
        ]
        lines = [l for l in lines if l]
    elif toks:
        lines = [
            " ".join(toks[i * wrap : (i + 1) * wrap])
            for i in range((len(toks) + wrap - 1) // wrap)
        ]
    else:
        lines = []
    safe_l = max(len(lines), 1)
    symbols = len(re.findall(r"#|\.\.\.|…", text))
    bullets = sum(
        1
        for l in lines
        if any(l.startswith(p) for p in ["•", "‣", "▶", "- ", "* "])
    )
    ell = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
    alpha = sum(1 for t in toks if re.search("[A-Za-z]", t))
    stop = sum(
        1 for w in GOPHER_STOPWORDS if w in [t.lower() for t in toks]
    )
    return {
        "doc_id": doc_id,
        "n_words": n_words,
        "mean_word_len": sum(len(t) for t in toks) / safe_w,
        "symbol_word_ratio": symbols / safe_w,
        "bullet_line_frac": bullets / safe_l,
        "ellipsis_line_frac": ell / safe_l,
        "alpha_word_frac": alpha / safe_w,
        "stopword_hits": stop,
    }


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_stats_match_python_oracle(spark, docs_df):
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_stats(docs_df).collect()
    }
    for doc_id, text in DOCS:
        exp = _py_oracle(doc_id, text)
        g = got[doc_id]
        for k, v in exp.items():
            assert g[k] == pytest.approx(v), (doc_id, k, g[k], v)


def test_empty_doc_is_all_zero(spark, docs_df):
    row = (
        gopher_quality_stats(docs_df)
        .filter(F.col("doc_id") == 5)
        .collect()[0]
    )
    assert row["n_words"] == 0
    assert row["mean_word_len"] == 0.0
    assert row["stopword_hits"] == 0


def test_filter_keeps_original_columns_and_rows(spark):
    # doc A passes every rule; B fails stopwords; C fails mean length
    base = " ".join(
        ["the", "be", "to", "of", "and"] + ["finance"] * 55
    )
    rows = [
        (1, base, "keep"),
        (2, " ".join(["finance"] * 60), "no-stopwords"),
        (3, "the be " + "x " * 58, "short-words"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "tag"])
    kept = gopher_quality_filter(df).collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert set(kept[0].asDict()) == {"doc_id", "text", "tag"}


def test_bullet_and_ellipsis_rules(spark):
    bullets = "\n".join(["• item %d" % i for i in range(10)])
    ell = "\n".join(["thought %d..." % i for i in range(10)])
    ok_text = " ".join(["the", "of"] + ["word"] * 55)
    df = spark.createDataFrame(
        [(1, bullets), (2, ell), (3, ok_text)], ["doc_id", "text"]
    )
    kept = [r["doc_id"] for r in gopher_quality_filter(df).collect()]
    assert kept == [3]


def test_stats_plan_has_no_exchange(spark, docs_df):
    plan = gopher_quality_stats(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_filter_plan_has_no_exchange_or_join(spark, docs_df):
    plan = (
        gopher_quality_filter(docs_df, min_words=1, min_stopword_hits=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
