"""Gopher/MassiveText document-level quality rules (Rae et al. 2021,
appendix A1.1 — the non-repetition half; the repetition half lives in
functions/textstats.py::repetition_stats).

Signals per document, all computed in ONE narrow projection — native
Column expressions only, zero exchanges, no Python — so the whole
rule set fuses into the parquet scan and costs a projection at
100 TB exactly like at sf0.001:

* ``n_words``           — whitespace word count
* ``mean_word_len``     — token chars / n_words (single IEEE double
                          division of two exact ints — bit-identical
                          in any engine, the catalog-wide protocol)
* ``symbol_word_ratio`` — '#' / '...' / '…' occurrences per word
* ``bullet_line_frac``  — lines starting with a bullet glyph
* ``ellipsis_line_frac``— lines ending with an ellipsis
* ``alpha_word_frac``   — words containing >=1 [A-Za-z]
* ``stopword_hits``     — how many of the required stop words appear
                          at least once (distinct presence, not count)

Line derivation shares ``textstats.wrapped_lines`` with the
repetition and C4 families (real newlines verbatim when present,
else a deterministic wrap every ``wrap_tokens`` tokens) so every
line-level rule in the engine sees the same line set.

The keep rule (``gopher_quality_filter``) applies the A1 table's
thresholds: 50 <= words <= 100k, 3 <= mean word length <= 10,
symbol-to-word ratio <= 0.1, <=10% bullet lines, <=30% ellipsis
lines, >=80% alpha words, >=2 distinct stop words. The stop-word
list is a parameter (Gopher's canonical 8 by default); corpora with
a different function-word inventory pass their own list.

This is an engine addition beyond the reference's surface (the
reference indexes pages, it does not score them); it is the standard
pre-training quality gauntlet every web pipeline runs between crawl
and dedup.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from website_indexer_spark.functions.textstats import tokens, wrapped_lines

# Gopher's required stop words (Rae et al. 2021 A1.1).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Bullet prefixes: the common glyphs plus dash/star list markers
# (dash/star require a following space so hyphenated words and
# emphasis markers do not count as bullets).
BULLET_PREFIXES = ["•", "‣", "▶", "- ", "* "]
ELLIPSIS_SUFFIXES = ["...", "…"]

# '#' anywhere, a literal three-dot run, or the one-char ellipsis.
# Leftmost non-overlapping semantics match between Java regex (Spark)
# and RE2 (DuckDB) for this alternation.
_SYMBOL_RE = r"#|\.\.\.|…"


def gopher_quality_columns(
    text: Column,
    wrap_tokens: int = 10,
    stopwords: Sequence[str] = tuple(GOPHER_STOPWORDS),
    toks: Optional[Column] = None,
) -> List[Column]:
    """The seven signal columns (see module docstring). Pass a
    pre-materialized token array via ``toks`` when composing with
    other token consumers — Catalyst does not CSE across
    higher-order-function lambdas (SURVEY §10.22), so tokenization
    must live in its own projection to run once."""
    if toks is None:
        toks = tokens(text)
    n_words = F.size(toks)
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    word_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    lines = wrapped_lines(text, wrap_tokens=wrap_tokens, toks=toks)
    n_lines = F.size(lines)
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")

    def _starts_bullet(l: Column) -> Column:
        pred = F.lit(False)
        for p in BULLET_PREFIXES:
            pred = pred | l.startswith(p)
        return pred

    def _ends_ellipsis(l: Column) -> Column:
        pred = F.lit(False)
        for s in ELLIPSIS_SUFFIXES:
            pred = pred | l.endswith(s)
        return pred

    def _has_stopword(w: str) -> Column:
        return F.exists(toks, lambda t: F.lower(t) == F.lit(w)).cast("int")

    stop_hits: Column = F.lit(0)
    for w in stopwords:
        stop_hits = stop_hits + _has_stopword(w)

    return [
        n_words.alias("n_words"),
        (word_chars.cast("double") / safe_words).alias("mean_word_len"),
        (
            F.regexp_count(text, F.lit(_SYMBOL_RE)).cast("double") / safe_words
        ).alias("symbol_word_ratio"),
        (
            F.size(F.filter(lines, _starts_bullet)).cast("double") / safe_lines
        ).alias("bullet_line_frac"),
        (
            F.size(F.filter(lines, _ends_ellipsis)).cast("double") / safe_lines
        ).alias("ellipsis_line_frac"),
        (
            F.size(
                F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
            ).cast("double")
            / safe_words
        ).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    ]


def gopher_quality_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    wrap_tokens: int = 10,
    stopwords: Sequence[str] = tuple(GOPHER_STOPWORDS),
) -> DataFrame:
    """(id_col, the seven signals) — one narrow projection, tokenized
    once in an owned lower projection."""
    toked = df.select(
        F.col(id_col), F.col(text_col).alias("_text"), tokens(F.col(text_col)).alias("_toks")
    )
    return toked.select(
        id_col,
        *gopher_quality_columns(
            F.col("_text"),
            wrap_tokens=wrap_tokens,
            stopwords=stopwords,
            toks=F.col("_toks"),
        ),
    )


def gopher_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.1,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    wrap_tokens: int = 10,
    stopwords: Sequence[str] = tuple(GOPHER_STOPWORDS),
) -> DataFrame:
    """The Gopher A1 keep rule: rows of ``df`` (all original columns)
    whose signals stay inside every threshold. Still one narrow
    projection + filter — no join, no shuffle: the signals are
    recomputed inline on the filtered scan, which is the 100 TB-shape
    (a semi-join back to df would add an exchange for nothing)."""
    toked = df.select(
        "*", tokens(F.col(text_col)).alias("_gq_toks")
    )
    cols = gopher_quality_columns(
        F.col(text_col),
        wrap_tokens=wrap_tokens,
        stopwords=stopwords,
        toks=F.col("_gq_toks"),
    )
    staged = toked.select("*", *cols)
    kept = staged.filter(
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
    )
    return kept.select(*df.columns)
