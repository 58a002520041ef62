"""Text-analysis functions for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Everything here operates on a `text:string` column (the `documents`
table, or crawled page text). The scoring/counting functions are pure
native Column expressions — JVM-side, whole-stage-codegen, no Python
— so they cost one projection over a 100 TB scan. Fingerprinting
(winnowing) needs a rolling min over k-gram hashes and is the one
Arrow-batched pandas UDF in this module.

These are engine additions beyond the reference's surface (the
reference stores `language` straight from the <html lang> attribute,
/root/reference/crawler/parser.py:73, and has no quality/token/
fingerprint notion); they follow the same vectorized-UDF rules as the
crawl kernel.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --------------------------------------------------------------------
# Tokenization — whitespace tokens and a BPE-ish regex segmentation.
# The regex splits runs of letters, runs of digits, and single other
# non-space symbols, approximating byte-pair-style pretokenization.
# --------------------------------------------------------------------

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens as array<string> (empty-string safe)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def whitespace_token_count(col: Column) -> Column:
    return F.size(tokens(col))


def regex_token_count(col: Column) -> Column:
    """BPE-ish token count via regexp_count (JVM-side)."""
    return F.regexp_count(col, F.lit(TOKEN_REGEX))


# --------------------------------------------------------------------
# Language ID — tiny stopword-list n-gram heuristic. Score per
# language = number of tokens (with multiplicity) in that language's
# stopword set; argmax wins, ties broken by the fixed LANGS order.
# Pure Column expressions => identical semantics in ANSI SQL (the
# DuckDB oracle mirrors this exactly).
# --------------------------------------------------------------------

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "ist", "ein", "im"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "不", "人", "这"],
}
LANGS = ["en", "es", "fr", "de", "zh"]


def lang_scores(col: Column) -> List[Column]:
    toks = tokens(F.lower(col))
    scores = []
    for lang in LANGS:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias(
                f"score_{lang}"
            )
        )
    return scores


def lang_id(col: Column) -> Column:
    """Predicted language code, 'und' when no stopword hits at all."""
    toks = tokens(F.lower(col))
    score_cols = []
    for lang in LANGS:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        score_cols.append(F.size(F.filter(toks, lambda t: F.array_contains(sw, t))))
    best = F.greatest(*score_cols)
    expr = F.lit("und")
    # first language (in LANGS order) achieving the max wins — build
    # the CASE back-to-front so earlier langs take precedence
    for lang, score in zip(reversed(LANGS), reversed(score_cols)):
        expr = F.when((best > 0) & (score == best), F.lit(lang)).otherwise(expr)
    return expr


# --------------------------------------------------------------------
# Quality scoring — classic cheap document-quality signals (length,
# mean word length, stopword ratio, punctuation ratio). All integer
# counts divided in double precision, so any SQL engine reproduces
# the values bit-exactly.
# --------------------------------------------------------------------

def quality_columns(col: Column) -> List[Column]:
    toks = tokens(col)
    n_tokens = F.size(toks)
    n_chars = F.length(col)
    sw_all = F.array(
        *[F.lit(w) for lang in LANGS for w in STOPWORDS[lang]]
    )
    n_stop = F.size(F.filter(tokens(F.lower(col)), lambda t: F.array_contains(sw_all, t)))
    n_punct = F.regexp_count(col, F.lit(r"[^\w\s]"))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    token_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return [
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        (token_chars.cast("double") / safe_tokens.cast("double")).alias(
            "mean_word_len"
        ),
        (n_stop.cast("double") / safe_tokens.cast("double")).alias("stopword_ratio"),
        (
            n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
        ).alias("punct_ratio"),
    ]


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    min_stopword_ratio: float = 0.0,
    max_punct_ratio: float = 0.3,
) -> DataFrame:
    """Gopher-style keep/drop rule over the quality columns."""
    q = df.select("*", *quality_columns(F.col(text_col)))
    return q.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )


# --------------------------------------------------------------------
# Document fingerprinting — winnowing (Schleimer/Wilkerson/Aiken,
# SIGMOD'03): rolling hash over character k-grams, keep the min hash
# of every window of w consecutive k-gram hashes (rightmost min).
# The per-doc fingerprint set is order-free, so docs sharing content
# chunks share fingerprints. Vectorized per Arrow batch with numpy.
# --------------------------------------------------------------------

FP_K = 8   # k-gram length (chars)
FP_W = 4   # window of consecutive k-gram hashes

_B = np.uint64(1000003)
_MASK = np.uint64((1 << 61) - 1)


def _kgram_hashes(text: str, k: int) -> np.ndarray:
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    # polynomial rolling hash of every k-byte window, computed
    # vectorized via cumulative powers (exact in uint64 mod 2^64)
    # powers of B mod 2^64 (python ints, then cast — numpy scalar
    # uint64 multiply warns on intended wraparound)
    powers_py = [1] * k
    for i in range(1, k):
        powers_py[i] = (powers_py[i - 1] * int(_B)) & ((1 << 64) - 1)
    powers = np.array(powers_py, dtype=np.uint64)
    out = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        out += data[j : n - k + 1 + j] * powers[k - 1 - j]
    return out & _MASK


def winnow_fingerprints(text: str, k: int = FP_K, w: int = FP_W) -> List[int]:
    h = _kgram_hashes(text, k)
    if len(h) == 0:
        return []
    if len(h) <= w:
        return [int(h.min())]
    # rightmost-min per sliding window of w
    windows = np.lib.stride_tricks.sliding_window_view(h, w)
    mins = windows.min(axis=1)
    return sorted({int(m) for m in mins})


@pandas_udf(T.ArrayType(T.LongType()))
def fingerprint_udf(text: pd.Series) -> pd.Series:
    return text.map(
        lambda t: [np.int64(np.uint64(v)).item() for v in winnow_fingerprints(t)]
        if t is not None
        else None
    )


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprints", fingerprint_udf(F.col(text_col)))


def fingerprint_overlap_pairs(
    df: DataFrame, id_col: str, min_common: int = 2
) -> DataFrame:
    """Candidate near-dup pairs sharing >= min_common fingerprints.
    Explode + self-join on the fingerprint (uniform 61-bit key, so the
    shuffle is skew-free), then count per pair."""
    fp = with_fingerprints(df).select(
        F.col(id_col).alias("doc"), F.explode("fingerprints").alias("fp")
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("common_fps"))
        .filter(F.col("common_fps") >= min_common)
    )
