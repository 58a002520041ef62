"""Dedup text normalization + compression-ratio quality signal.

``normalize_for_dedup`` is the canonicalization every published
near-dup pipeline applies before hashing (FineWeb / Dolma / CCNet
convention): lowercase, strip punctuation, map digit runs to a
single '0', collapse whitespace. Two docs differing only in case,
punctuation, numbers, or spacing hash identically afterwards, which
is the point — feed it to dedup_exact / MinHash / paragraph dedup as
the key projection. Pure native expressions (one narrow projection,
no Python), mirrored exactly in ANSI/DuckDB SQL, so gates hash-match.
Unicode NFD folding is deliberately out: Spark has no native
normalizer, a per-row Python round trip would put the hot dedup key
path on the slow path, and the corpora this engine gates on are
already NFC.

``compression_ratio`` is the Dolma/DCLM repetition signal the
repetition_stats family cannot see (it counts exact line/n-gram
repeats; the compressor sees ALL redundancy): deflate(text) bytes /
utf-8 bytes. Needs zlib, so it is an Arrow-batched pandas UDF — the
engine's documented slow path, used where no native expression
exists. zlib output depends on the zlib build, so the driver gate is
rows-only; semantics are pinned by pytest against zlib directly.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---- dedup normalization (native) -----------------------------------


def normalize_for_dedup(col: Column) -> Column:
    """lowercase → punctuation out → digit runs to '0' → whitespace
    collapsed + trimmed. Order matters: punctuation removal may merge
    digit runs, so digits fold after; the whitespace collapse runs
    last so removals never leave double spaces."""
    out = F.lower(col)
    out = F.regexp_replace(out, r"[^\w\s]|_", " ")
    out = F.regexp_replace(out, r"[0-9]+", "0")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def with_dedup_key(
    df: DataFrame, text_col: str = "text", key_col: str = "dedup_key"
) -> DataFrame:
    """md5 of the normalized text — drop-in key for dedup_exact /
    dedup_against_snapshot in place of raw md5(text)."""
    return df.withColumn(
        key_col, F.md5(normalize_for_dedup(F.col(text_col)))
    )


# ---- compression ratio (Arrow-batched pandas UDF) --------------------

COMPRESSION_LEVEL = 6  # zlib default — the level Dolma's taggers use


@pandas_udf(T.DoubleType())
def compression_ratio_udf(text: Iterator[pd.Series]) -> Iterator[pd.Series]:
    import zlib

    for s in text:
        def ratio(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, COMPRESSION_LEVEL)) / len(raw)

        yield s.map(ratio)


def with_compression_ratio(
    df: DataFrame, text_col: str = "text", out_col: str = "compression_ratio"
) -> DataFrame:
    """deflate bytes / utf-8 bytes per doc (low = repetitive). Empty
    docs report 1.0 (nothing to compress, nothing repetitive)."""
    return df.withColumn(out_col, compression_ratio_udf(F.col(text_col)))


def compression_filter(
    df: DataFrame,
    text_col: str = "text",
    min_ratio: float = 0.25,
    max_ratio: float = 1.1,
    min_bytes: int = 256,
) -> DataFrame:
    """Keep docs whose ratio sits in the plausible-prose band: far
    below it the doc is machine-repetition; above ~1.05 it is
    high-entropy non-text (base64 blobs, minified noise). Docs under
    ``min_bytes`` bypass the band entirely — deflate's ~11-byte
    header dominates short inputs (a 20-byte sentence "expands" to
    ratio ≈ 1.4), so the signal is undefined there; length-based
    rules (Gopher n_words) own that regime."""
    staged = with_compression_ratio(df, text_col=text_col, out_col="_cr")
    short = F.octet_length(F.col(text_col)) < min_bytes
    return staged.filter(
        short | ((F.col("_cr") >= min_ratio) & (F.col("_cr") <= max_ratio))
    ).drop("_cr")
