"""Encoding-quality signals (functions/encoding.py): counter
semantics on hand-built damage, the exact permille protocol, filter
behavior, and the zero-exchange plan."""

from __future__ import annotations

from website_indexer_spark.functions.encoding import (
    encoding_filter,
    encoding_stats,
)

CLEAN = "a perfectly ordinary sentence."
MOJI = "it was cafÃ© o’clock â€™ ï»¿x"
REPL = "bad � bytes � here"
CTRL = "null \x00 and bell \x07 and C1 \x9f"
TABS = "tabs\tand\nnewlines\rare fine"


def _df(spark):
    rows = [
        (0, CLEAN),
        (1, MOJI),
        (2, REPL),
        (3, CTRL),
        (4, TABS),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counters(spark):
    got = {
        r["doc_id"]: r for r in encoding_stats(_df(spark)).collect()
    }
    assert got[0]["repl_chars"] == got[0]["ctrl_chars"] == got[0]["moji_chars"] == 0
    # MOJI: 'Ã' (1) + 'â€' (2) + 'ï»¿' (3) = 6 chars; the genuine
    # U+2019 curly quote is NOT counted
    assert got[1]["moji_chars"] == 6
    assert got[1]["repl_chars"] == 0
    assert got[2]["repl_chars"] == 2
    assert got[3]["ctrl_chars"] == 3
    # \t \n \r never count as damage
    assert got[4]["ctrl_chars"] == 0 and got[4]["badness_permille"] == 0
    # empty text: no division blowup
    assert got[5]["n_chars"] == 0 and got[5]["badness_permille"] == 0


def test_permille_exact(spark):
    got = {
        r["doc_id"]: r for r in encoding_stats(_df(spark)).collect()
    }
    for d in (1, 2, 3):
        r = got[d]
        bad = r["repl_chars"] + r["ctrl_chars"] + r["moji_chars"]
        assert r["badness_permille"] == 1000 * bad // max(r["n_chars"], 1)


def test_filter_keeps_clean_rows_verbatim(spark):
    kept = encoding_filter(_df(spark)).collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 4, 5]
    assert {r["text"] for r in kept} == {CLEAN, TABS, ""}


def test_filter_threshold(spark):
    # damage density ~ hundreds of permille here; a huge threshold
    # readmits everything
    assert encoding_filter(_df(spark), max_permille=1000).count() == 6


def test_plan_is_narrow(spark):
    df = _df(spark).localCheckpoint()
    for q in (encoding_stats(df), encoding_filter(df)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


def test_hostile_unicode_batch_matches_python(spark):
    """Exotic-but-legal unicode (astral plane, combining marks, RTL,
    mid-string BOM, full C1 sweep) — Spark counters must equal a
    plain-Python re implementation of the same patterns."""
    import re as _re

    cases = [
        "emoji \U0001F600\U0001F680 stay clean",
        "combining é̂̃ accents",
        "rtl שלום text",
        "mid-string bom ﻿ alone is fine, trio ï»¿ is not",
        "".join(chr(c) for c in range(0x80, 0xA0)),  # full C1 block
        "Ã©" * 10,  # repeated mojibake pilot
        "AÂ B",  # nbsp read as cp1252: 'Â' pilot
        "plain ascii only",
    ]
    ctrl_re = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
    moji_re = _re.compile("(?:Ã|Â|â€|ï»¿)")

    def py(t):
        moji = sum(len(m) for m in moji_re.findall(t))
        return (
            len(t),
            t.count("�"),
            len(ctrl_re.findall(t)),
            moji,
        )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_chars"],
            r["repl_chars"],
            r["ctrl_chars"],
            r["moji_chars"],
        )
        for r in encoding_stats(df).collect()
    }
    for i, t in enumerate(cases):
        assert got[i] == py(t), (i, t)
