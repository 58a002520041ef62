"""PII redaction and corpus term-frequency operators.

Training-data pipelines scrub personally-identifying spans (emails,
phone-shaped numbers, long digit runs) before packing text into
training shards, and profile corpora by global term frequency (top-k
vocabulary, stopword discovery, contamination probes). Both are pure
native Column pipelines here — regexp_replace / regexp_count and
explode+groupBy run JVM-side under whole-stage codegen, so redaction
costs one projection over the 100 TB scan and term counting is one
uniform-key shuffle with map-side partial aggregation.

The regexes stick to the RE2 ∩ Java common subset (character classes,
bounded repetition — no backrefs/lookarounds) so the DuckDB oracle
replays them byte-for-byte.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern table: (name, regex, replacement). Order matters — emails
# are matched before bare digit runs so an address is one <EMAIL>,
# not a shredded mix.
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "<PHONE>"),
    ("number", r"[0-9][0-9.]*", "<NUM>"),
]


def scrub_text(col: Column, patterns: Sequence[Tuple[str, str, str]] = PII_PATTERNS) -> Column:
    """Apply every redaction pattern in order; one fused projection."""
    out = col
    for _name, regex, repl in patterns:
        out = F.regexp_replace(out, regex, repl)
    return out


def redaction_counts(
    col: Column, patterns: Sequence[Tuple[str, str, str]] = PII_PATTERNS
) -> List[Column]:
    """Per-pattern match counts (audit columns: how much was removed).
    Counted on the ORIGINAL text, so downstream patterns' counts are
    not disturbed by earlier replacements."""
    return [
        F.regexp_count(col, F.lit(regex)).cast("long").alias(f"n_{name}")
        for name, regex, _repl in patterns
    ]


def scrub_pii(df: DataFrame, text_col: str, id_cols: Sequence[str]) -> DataFrame:
    """id columns + scrubbed text + per-pattern audit counts."""
    c = F.col(text_col)
    return df.select(
        *id_cols,
        scrub_text(c).alias("scrubbed"),
        *redaction_counts(c),
    )


def term_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(term, n_docs, n_occurrences) over lowercase whitespace terms.
    explode → two-level agg: the per-doc distinct is computed inside
    the same shuffle (count(distinct) would double-shuffle)."""
    exploded = df.select(
        F.col("_wi_doc").alias("doc"),
        F.explode(
            F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    per_doc = exploded.groupBy("doc", "term").agg(F.count("*").alias("n"))
    return per_doc.groupBy("term").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("n_occurrences"),
    )


def topk_terms(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Global top-k vocabulary by occurrence count (ties broken by
    term for determinism). The ORDER BY ... LIMIT collapses to a
    TakeOrdered — no global sort materializes."""
    freqs = term_frequencies(
        df.select(F.col(id_col).alias("_wi_doc"), text_col), text_col
    )
    return freqs.orderBy(F.desc("n_occurrences"), F.asc("term")).limit(k)


__all__ = [
    "PII_PATTERNS",
    "scrub_text",
    "redaction_counts",
    "scrub_pii",
    "term_frequencies",
    "topk_terms",
]
