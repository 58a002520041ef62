"""Encoding-quality signals for web text — the ftfy/charset-normalizer
class of checks, reduced to native column expressions.

Web corpora are full of decode damage: U+FFFD replacement characters
(the upstream decoder already gave up), stray C0/C1 control bytes
(binary junk or charset mislabeling), and "mojibake" — UTF-8 bytes
decoded as Latin-1/Windows-1252, which leaves characteristic pilot
sequences ('Ã'+continuation for 2-byte codepoints, 'â€¦'-style runs
for 3-byte punctuation, 'ï»¿' for a re-decoded BOM). Real pipelines
either repair these (ftfy) or drop/penalize the page; repair needs a
byte-level model, but *detection* is pure character arithmetic and
belongs in the scan projection.

Each counter is ``length(text) - length(regexp_replace(text, pat,
''))`` — characters matched, a measure both engines compute
identically (the patterns are literal characters and single-char
classes, so RE2 and Java regex agree). ``badness_permille`` is
``floor(1000 * bad / n_chars)`` computed as ONE IEEE double division
of exact-integer operands in both engines, so the gate hashes
bit-identically (the fractional gap 1/n_chars dwarfs double rounding
error for any real document length).

The marker list is deliberately a heuristic (a genuine 'Â' in
Latin-script text can false-positive); the signal is meant for
thresholding, and the default keep-threshold tolerates a few permille.

Execution shape: ONE narrow projection, zero exchanges, no Python —
fuses into whatever scan feeds it at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# U+FFFD: the decoder already substituted something unrepresentable.
REPLACEMENT_RE = "�"

# C0 controls minus \t\n\r, DEL, and the C1 block — none belong in
# decoded text; their presence means binary junk or charset mislabel.
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]"

# UTF-8-decoded-as-Latin-1/Win-1252 pilot characters: 'Ã'/'Â' lead
# every mangled 2-byte codepoint, 'â€' every mangled curly quote /
# dash / ellipsis, 'ï»¿' is a re-decoded BOM.
MOJIBAKE_RE = "(?:Ã|Â|â€|ï»¿)"

DEFAULT_MAX_PERMILLE = 5


def _matched_chars(text: Column, pattern: str) -> Column:
    return (
        F.length(text) - F.length(F.regexp_replace(text, pattern, ""))
    ).cast("long")


def _badness_permille(text: Column) -> Column:
    bad = (
        _matched_chars(text, REPLACEMENT_RE)
        + _matched_chars(text, CONTROL_RE)
        + _matched_chars(text, MOJIBAKE_RE)
    )
    n = F.length(text).cast("long")
    return F.floor(
        (F.lit(1000).cast("long") * bad)
        / F.greatest(n, F.lit(1).cast("long"))
    ).cast("long")


def encoding_columns(text: Column) -> list[Column]:
    """The per-document signal columns (attachable to any projection):
    n_chars, repl_chars, ctrl_chars, moji_chars, badness_permille."""
    return [
        F.length(text).cast("long").alias("n_chars"),
        _matched_chars(text, REPLACEMENT_RE).alias("repl_chars"),
        _matched_chars(text, CONTROL_RE).alias("ctrl_chars"),
        _matched_chars(text, MOJIBAKE_RE).alias("moji_chars"),
        _badness_permille(text).alias("badness_permille"),
    ]


def encoding_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, repl_chars, ctrl_chars, moji_chars,
    badness_permille) — one narrow projection."""
    return df.select(
        F.col(id_col), *encoding_columns(F.col(text_col))
    )


def encoding_filter(
    df: DataFrame,
    text_col: str = "text",
    max_permille: int = DEFAULT_MAX_PERMILLE,
) -> DataFrame:
    """Keep documents whose decode-damage density stays at or under
    ``max_permille`` characters per thousand. Pure filter — survivor
    rows pass through unchanged."""
    return df.filter(
        _badness_permille(F.col(text_col)) <= F.lit(int(max_permille))
    )


__all__ = [
    "CONTROL_RE",
    "DEFAULT_MAX_PERMILLE",
    "MOJIBAKE_RE",
    "REPLACEMENT_RE",
    "encoding_columns",
    "encoding_filter",
    "encoding_stats",
]
