"""Dedup normalization + compression ratio (functions/textnorm.py)."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.functions.textnorm import (
    COMPRESSION_LEVEL,
    compression_filter,
    normalize_for_dedup,
    with_compression_ratio,
    with_dedup_key,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (0, "Hello, World! Call 555-1234 now."),
        (1, "hello world call 0 0 now"),          # normalizes same as 0
        (2, "HELLO   world!!! call 4-2 now"),     # also same
        (3, "something else entirely"),
        (4, ""),
        (5, "aaaa " * 500),                       # hyper-compressible
        (6, "under_score mixed_case"),            # '_' is punctuation here
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_normalize_cases(spark, df):
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", normalize_for_dedup(F.col("text")).alias("n")
        ).collect()
    }
    assert got[0] == "hello world call 0 0 now"
    assert got[0] == got[1] == got[2]
    assert got[4] == ""
    assert got[6] == "under score mixed case"


def test_dedup_key_merges_variants(spark, df):
    keys = {
        r["doc_id"]: r["dedup_key"] for r in with_dedup_key(df).collect()
    }
    assert keys[0] == keys[1] == keys[2]
    assert keys[3] != keys[0]


def test_compression_ratio_matches_zlib(spark, df):
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in with_compression_ratio(df).collect()
    }
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    for d, t in rows.items():
        raw = t.encode("utf-8")
        exp = (
            1.0
            if not raw
            else len(zlib.compress(raw, COMPRESSION_LEVEL)) / len(raw)
        )
        assert got[d] == pytest.approx(exp), d
    assert got[5] < 0.05  # repetition compresses away
    assert got[3] > 0.5   # short prose does not


def test_compression_filter_drops_repetition(spark, df):
    kept = {r["doc_id"] for r in compression_filter(df).collect()}
    assert 5 not in kept        # machine repetition (long + compressible)
    # short docs bypass the band (deflate header dominates them)
    assert {0, 1, 2, 3, 4, 6} <= kept


def test_compression_filter_band_on_long_docs(spark):
    import hashlib

    # genuinely high-entropy "prose" (distinct hex words — a shared
    # sentence template would itself compress below the band)
    prose = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(80)
    )
    rows = [(0, prose), (1, "repeat me " * 200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {r["doc_id"] for r in compression_filter(df).collect()}
    assert kept == {0}


def test_normalized_plan_is_narrow(spark, df):
    p = (
        df.select(normalize_for_dedup(F.col("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p and "Python" not in p


def test_compression_udf_is_arrow_batched(spark, df):
    p = (
        with_compression_ratio(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in p  # vectorized, not row-at-a-time
