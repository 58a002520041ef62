"""C4-style line-level web-text cleaning (Raffel et al. 2020 §2.2,
the `c4_utils` rules published with T5) as a pure narrow Spark plan.

The reference (cfpb/website-indexer) stores page text verbatim
(crawler/parser.py:83-99) and has no cleaning notion; this module is
part of the training-data suite: the line-level gauntlet every
C4-descendant pipeline (C4, mC4, RefinedWeb's line-wise rules,
FineWeb) runs between extraction and dedup.

Rules implemented (all public):
* keep a line only if it ends in terminal punctuation (. ! ? ");
* ... and has >= `min_words_per_line` (default 3) whitespace words;
* ... and does not contain "javascript" (case-insensitive);
* ... and does not contain a cookie/policy boilerplate phrase
  (the T5 list: "terms of use", "privacy policy", "cookie policy",
  "uses cookies", "use of cookies", "use cookies");
* drop the whole page if "lorem ipsum" (case-insensitive) or a curly
  brace "{" appears anywhere in the raw text;
* drop the whole page if fewer than `min_lines` (default 3) lines
  survive. C4 counts *sentences* via an English sentence tokenizer;
  surviving-line count is the documented deviation (COVERAGE.md) —
  it is the same signal for line-wrapped web text and needs no
  language-specific model.

Execution shape: ONE projection of higher-order functions over the
text column — filter/transform/array_join on the line array — so the
whole operator is narrow (zero exchanges), whole-stage-codegen
JVM-side, and costs one pass over a 100 TB scan. Line derivation
reuses `textstats.wrapped_lines` (real newlines when present,
wrap-every-10-tokens otherwise) so the repetition family and the
cleaner agree on what a "line" is.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from website_indexer_spark.functions.textstats import tokens, wrapped_lines

TERMINAL_PUNCT_RE = r'[.!?"]$'

# T5's published boilerplate phrase list (c4_utils.py) — a line
# containing any of these is dropped regardless of punctuation.
BAD_PHRASES = [
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
]

DEFAULT_MIN_WORDS = 3
DEFAULT_MIN_LINES = 3


def line_keep(
    line: Column,
    min_words: int = DEFAULT_MIN_WORDS,
    require_terminal_punct: bool = True,
) -> Column:
    """C4 per-line keep predicate (a Column, usable inside
    higher-order lambdas). ``require_terminal_punct=False`` drops the
    sentence-final-punctuation rule (T5's strictest line filter) while
    keeping the min-words + boilerplate rules — for corpora that are
    legitimate text but not sentence-punctuated (transcripts, code
    docs, the synthetic gate corpus)."""
    lower = F.lower(line)
    bad = F.lit(False)
    for phrase in BAD_PHRASES:
        bad = bad | F.contains(lower, F.lit(phrase))
    words = F.size(F.filter(F.split(line, r"\s+"), lambda w: w != ""))
    keep = (
        (words >= F.lit(min_words))
        & ~F.contains(lower, F.lit("javascript"))
        & ~bad
    )
    if require_terminal_punct:
        keep = F.regexp_like(line, F.lit(TERMINAL_PUNCT_RE)) & keep
    return keep


def page_bad(text: Column) -> Column:
    """C4 page-level drop predicate: lorem ipsum / curly brace."""
    return F.contains(F.lower(text), F.lit("lorem ipsum")) | F.contains(
        text, F.lit("{")
    )


def c4_line_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = DEFAULT_MIN_WORDS,
    wrap_tokens: int = 10,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """Per-doc cleaning outcome: (id, n_lines, n_kept, bad_page,
    clean_text). clean_text is the surviving lines joined by newlines
    (original order — `filter` is order-preserving). Narrow plan:
    zero exchanges, one projection chain."""
    text = F.col(text_col)
    toked = df.select(
        F.col(id_col).alias(id_col),
        text.alias("_text"),
        tokens(text).alias("_toks"),
    )
    lines = wrapped_lines(F.col("_text"), wrap_tokens, toks=F.col("_toks"))
    staged = toked.select(
        id_col,
        F.col("_text"),
        lines.alias("_lines"),
        F.filter(
            lines, lambda l: line_keep(l, min_words_per_line, require_terminal_punct)
        ).alias("_kept"),
    )
    return staged.select(
        id_col,
        F.size("_lines").alias("n_lines"),
        F.size("_kept").alias("n_kept"),
        page_bad(F.col("_text")).alias("bad_page"),
        F.array_join("_kept", "\n").alias("clean_text"),
    )


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = DEFAULT_MIN_WORDS,
    min_lines: int = DEFAULT_MIN_LINES,
    wrap_tokens: int = 10,
    keep_cols: Optional[list] = None,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """Surviving docs with text replaced by the cleaned rebuild:
    drops bad pages and pages with < min_lines surviving lines,
    returns (id, *keep_cols, text=clean_text, n_lines, n_kept).
    Still one narrow projection + filter — the stats and the gate
    compose into the same whole-stage-codegen span."""
    keep_cols = keep_cols or [
        c for c in df.columns if c not in (id_col, text_col)
    ]
    text = F.col(text_col)
    toked = df.select(
        id_col,
        *keep_cols,
        text.alias("_text"),
        tokens(text).alias("_toks"),
    )
    lines = wrapped_lines(F.col("_text"), wrap_tokens, toks=F.col("_toks"))
    staged = toked.select(
        id_col,
        *keep_cols,
        F.col("_text"),
        F.filter(
            lines, lambda l: line_keep(l, min_words_per_line, require_terminal_punct)
        ).alias("_kept"),
    )
    return (
        staged.filter(
            (~page_bad(F.col("_text")))
            & (F.size("_kept") >= F.lit(min_lines))
        )
        .select(
            id_col,
            *keep_cols,
            F.array_join("_kept", "\n").alias(text_col),
            F.size("_kept").alias("n_kept"),
        )
    )
