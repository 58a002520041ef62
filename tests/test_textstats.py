"""Text-analysis function tests (SURVEY.md training-data additions):
token counting, language ID, quality scoring, winnowing fingerprints.
Python-side oracles are independent re-derivations, not the kernel."""

import re

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.functions import textstats as ts


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and that is that"),
    (1, "el perro y el gato de la casa que los vecinos en madrid"),
    (2, "le chat et le chien de la maison des voisins est un animal"),
    (3, "der hund und die katze von dem haus ist ein tier im garten"),
    (4, "的 了 是 在 我 有 和 不 人 这"),
    (5, "zzz qqq xxx www"),  # no stopwords anywhere
    (6, "Numbers 123 and punct!! mixed-case Text, right?"),
    (7, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_token_counts(spark, docs_df):
    rows = {
        r["doc_id"]: r
        for r in docs_df.select(
            "doc_id",
            ts.whitespace_token_count(F.col("text")).alias("ws"),
            ts.regex_token_count(F.col("text")).alias("re"),
        ).collect()
    }
    for doc_id, text in DOCS:
        assert rows[doc_id]["ws"] == len(text.split()), text
        assert rows[doc_id]["re"] == len(re.findall(ts.TOKEN_REGEX, text)), text


def test_lang_id(spark, docs_df):
    rows = {
        r["doc_id"]: r["lang"]
        for r in docs_df.select(
            "doc_id", ts.lang_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert rows[0] == "en"
    assert rows[1] == "es"
    assert rows[2] == "fr"
    assert rows[3] == "de"
    assert rows[4] == "zh"
    assert rows[5] == "und"
    assert rows[7] == "und"


def test_quality_columns(spark, docs_df):
    row = (
        docs_df.filter(F.col("doc_id") == 0)
        .select(*ts.quality_columns(F.col("text")))
        .first()
    )
    text = DOCS[0][1]
    toks = text.split()
    assert row["n_tokens"] == len(toks)
    assert row["n_chars"] == len(text)
    assert row["mean_word_len"] == pytest.approx(
        sum(len(t) for t in toks) / len(toks)
    )
    # 'the' x2, 'and' x1, 'that' x2, 'over' not, 'is' x1 => en stopword hits
    en_hits = sum(
        1 for t in toks if any(t in ts.STOPWORDS[lang] for lang in ts.LANGS)
    )
    assert row["stopword_ratio"] == pytest.approx(en_hits / len(toks))
    assert row["punct_ratio"] == 0.0


def test_quality_filter(spark, docs_df):
    kept = ts.quality_filter(docs_df, min_tokens=5, min_stopword_ratio=0.1)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 in ids
    assert 5 not in ids  # no stopwords
    assert 7 not in ids  # empty


def test_winnow_fingerprints_deterministic():
    text = "the quick brown fox jumps over the lazy dog" * 3
    a = ts.winnow_fingerprints(text)
    b = ts.winnow_fingerprints(text)
    assert a == b and len(a) > 0
    assert ts.winnow_fingerprints("") == []
    assert len(ts.winnow_fingerprints("abc")) == 0  # shorter than k
    assert len(ts.winnow_fingerprints("abcdefgh")) == 1


def test_winnow_shared_fingerprints_on_near_dup():
    base = "consumer financial protection bureau publishes complaint data " * 5
    near = base + "with one extra tail sentence appended"
    fa, fb = set(ts.winnow_fingerprints(base)), set(ts.winnow_fingerprints(near))
    # shared prefix => large fingerprint overlap
    assert len(fa & fb) >= len(fa) * 0.6


def test_fingerprint_overlap_pairs(spark):
    base = "spark shuffles partition data across executors for joins " * 4
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + "plus a small suffix change"),
            (3, "completely different text about gardening tulips in spring"),
        ],
        ["doc_id", "text"],
    )
    pairs = ts.fingerprint_overlap_pairs(df, "doc_id", min_common=2).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}
