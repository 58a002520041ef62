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


# ------------------------------------------------------------------
# Gopher/MassiveText repetition stats (textstats.repetition_stats).
# Oracle: an independent Python re-derivation of the documented
# definitions (block comment at textstats.py repetition section).
# ------------------------------------------------------------------

REP_DOCS = [
    # newline doc: real lines, one duplicated
    (0, "aaa bbb\naaa bbb\nccc ddd"),
    # single-line doc that wraps every 10 tokens: first two wrapped
    # lines identical, third short and unique
    (1, " ".join(["w%d" % i for i in range(10)] * 2 + ["u0 u1 u2"])),
    # heavy bigram repetition (top_ngram + dup_ngram signals)
    (2, "spam ham " * 20),
    # clean prose, no repetition (long enough that its single most
    # common bigram is a small char fraction, as in real documents)
    (3, " ".join("tok%02d word%02d" % (i, i) for i in range(40))),
    # empty + whitespace-only
    (4, ""),
    (5, "   "),
    # blank lines dropped from real-line derivation
    (6, "left side\n\n \nleft side\nright side"),
]


def _rep_oracle(text, wrap=10, top_n=2, dup_n=5):
    from collections import Counter

    toks = text.split()
    if "\n" in text:
        lines = [l.strip() for l in text.split("\n") if l.strip() != ""]
    elif toks:
        lines = [
            " ".join(toks[i : i + wrap]) for i in range(0, len(toks), wrap)
        ]
    else:
        lines = []
    chars = max(len(text), 1)
    lc = Counter(lines)
    n_lines = len(lines)
    dup_line_frac = 1.0 - len(lc) / n_lines if n_lines else 0.0
    line_chars = sum(len(l) for l in lines)
    dup_line_char_frac = (
        sum((c - 1) * len(l) for l, c in lc.items()) / max(line_chars, 1)
    )

    def grams(n):
        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    tg = grams(top_n)
    if tg:
        cnt, ln = max((c, len(g)) for g, c in tg.items())
        top_frac = cnt * ln / chars
    else:
        top_frac = 0.0
    dg = grams(dup_n)
    dup_frac = sum((c - 1) * len(g) for g, c in dg.items() if c > 1) / chars
    return (n_lines, dup_line_frac, dup_line_char_frac, top_frac, dup_frac)


def test_repetition_stats_vs_python_oracle(spark):
    df = spark.createDataFrame(REP_DOCS, ["doc_id", "text"])
    rows = {
        r["doc_id"]: r for r in ts.repetition_stats(df).collect()
    }
    assert set(rows) == {d for d, _ in REP_DOCS}  # empty docs survive
    for doc_id, text in REP_DOCS:
        exp = _rep_oracle(text)
        got = rows[doc_id]
        assert got["n_lines"] == exp[0], (doc_id, "n_lines")
        assert got["dup_line_frac"] == pytest.approx(exp[1]), doc_id
        assert got["dup_line_char_frac"] == pytest.approx(exp[2]), doc_id
        assert got["top_ngram_char_frac"] == pytest.approx(exp[3]), doc_id
        assert got["dup_ngram_char_frac"] == pytest.approx(exp[4]), doc_id


def test_repetition_stats_hand_values(spark):
    # doc 0 fully hand-computed: lines [aaa bbb, aaa bbb, ccc ddd]
    df = spark.createDataFrame([REP_DOCS[0]], ["doc_id", "text"])
    r = ts.repetition_stats(df).first()
    assert r["n_lines"] == 3
    assert r["dup_line_frac"] == pytest.approx(1 / 3)
    assert r["dup_line_char_frac"] == pytest.approx(7 / 21)
    # bigram 'aaa bbb' x2, text length 23
    assert r["top_ngram_char_frac"] == pytest.approx(2 * 7 / 23)
    # only two distinct 5-grams, each once
    assert r["dup_ngram_char_frac"] == 0.0


def test_repetition_filter_drops_spammy(spark):
    df = spark.createDataFrame(
        [REP_DOCS[2], REP_DOCS[3]], ["doc_id", "text"]
    )
    kept = ts.repetition_filter(df, id_col="doc_id")
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {3}  # spam ham x20 trips top/dup-ngram thresholds
    # all original columns survive
    assert set(kept.columns) == {"doc_id", "text"}


def test_repetition_stats_seeded_adversarial_corpus(spark):
    """200 seeded nasty docs (newline/whitespace mixes, unicode,
    heavy repeats, near-empty) vs the independent Python oracle in
    ONE Spark job."""
    import random

    rng = random.Random(20260819)
    vocab = ["a", "bb", "ccc", "éé", "中文", "x" * 30, "1"]
    docs = []
    for i in range(200):
        n = rng.randrange(0, 40)
        toks = [rng.choice(vocab) for _ in range(n)]
        sep_pool = [" ", "  ", "\n", " \n ", "\t"]
        text = "".join(
            t + rng.choice(sep_pool) for t in toks
        )
        if rng.random() < 0.2:
            text = text * rng.randrange(2, 5)  # force repetition
        docs.append((i, text))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in ts.repetition_stats(df).collect()}
    assert len(rows) == 200
    for doc_id, text in docs:
        exp = _rep_oracle(text)
        got = rows[doc_id]
        assert got["n_lines"] == exp[0], (doc_id, repr(text))
        for col, want in zip(
            ["dup_line_frac", "dup_line_char_frac",
             "top_ngram_char_frac", "dup_ngram_char_frac"],
            exp[1:],
        ):
            assert got[col] == pytest.approx(want), (doc_id, col, repr(text))


def test_lang_id_model_seam(spark):
    """lang_id(col, model=...) — the classifier seam (r4 verdict item
    7): a stub fastText-class batch predictor rides the pandas-UDF
    wrapper; model=None keeps the native heuristic (same plan, same
    values as before the seam existed)."""
    import pandas as pd

    from website_indexer_spark.functions.textstats import lang_id

    df = spark.createDataFrame(
        [("the cat sat",), ("der hund lief",), (None,)], ["text"]
    )

    def stub_model(texts: pd.Series):
        # batch contract: Series[str] in, sequence of codes out
        assert isinstance(texts, pd.Series)
        return ["stub-en" if "the" in t else "stub-xx" for t in texts]

    got = {
        r["text"]: r["lang"]
        for r in df.select(
            "text", lang_id(F.col("text"), model=stub_model).alias("lang")
        ).collect()
    }
    assert got["the cat sat"] == "stub-en"
    assert got["der hund lief"] == "stub-xx"
    assert got[None] == "stub-xx"  # NULL text reaches the model as ""

    # model=None: the gated heuristic, unchanged
    base = {
        r["text"]: r["lang"]
        for r in df.select(
            "text", lang_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert base["the cat sat"] == "en"
