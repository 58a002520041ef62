"""Dedup operator tests with independent Python oracles."""

import itertools

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.operators import dedup


def _jaccard(a: str, b: str, n: int = 2) -> float:
    def grams(t):
        toks = t.split()
        return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))}

    ga, gb = grams(a), grams(b)
    if not ga or not gb:
        return 0.0
    return len(ga & gb) / len(ga | gb)


BASE = "spark shuffles partition data across executors for large joins"
CORPUS = [
    (0, BASE),
    (1, BASE),  # exact dup of 0
    (2, BASE + " with adaptive query execution"),  # near dup
    (3, "completely different text about gardening tulips in early spring"),
    (4, "completely different text about gardening roses in early spring"),
    (5, "the tiny doc"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_exact_dedup(spark, corpus_df):
    groups = dedup.exact_dedup_groups(corpus_df, "doc_id", "text").collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in groups}
    assert by_keep[0] == 2  # docs 0,1 collapse
    assert sum(by_keep.values()) == len(CORPUS)

    kept = dedup.exact_dedup(corpus_df, "doc_id", "text")
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids == [0, 2, 3, 4, 5]


def test_shingles_empty_and_short(spark):
    df = spark.createDataFrame([(1, ""), (2, "one"), (3, "one two")], ["doc_id", "text"])
    rows = dedup.shingles(df, "doc_id", "text", n=2).collect()
    assert {(r["doc"], r["shingle"]) for r in rows} == {(3, "one two")}


def test_jaccard_pairs_matches_oracle(spark, corpus_df):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(
            corpus_df, "doc_id", "text", n=2, threshold=0.3
        ).collect()
    }
    expect = {}
    for (ia, ta), (ib, tb) in itertools.combinations(CORPUS, 2):
        j = _jaccard(ta, tb)
        if j >= 0.3:
            expect[(min(ia, ib), max(ia, ib))] = j
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k])


def test_jaccard_max_shingle_df_guard(spark, corpus_df):
    # df cap of 1 removes every shingle shared by 2+ docs => no pairs
    got = dedup.jaccard_pairs(
        corpus_df, "doc_id", "text", n=2, threshold=0.01, max_shingle_df=1
    ).collect()
    assert got == []


def test_minhash_lsh_pairs(spark, corpus_df):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(
            corpus_df, "doc_id", "text", n=2, threshold=0.5
        ).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            corpus_df, "doc_id", "text", n=2, bands=16, rows_per_band=4, threshold=0.5
        ).collect()
    }
    # precision 1 by construction; recall should be total here (the
    # planted dups are far above threshold)
    assert lsh <= exact
    assert (0, 1) in lsh and (0, 2) in lsh


def test_minhash_signature_deterministic(spark, corpus_df):
    s1 = dedup.minhash_signatures(corpus_df, "doc_id", "text").collect()
    s2 = dedup.minhash_signatures(corpus_df, "doc_id", "text").collect()
    assert sorted((r["doc"], tuple(r["signature"])) for r in s1) == sorted(
        (r["doc"], tuple(r["signature"])) for r in s2
    )
    sig = {r["doc"]: r["signature"] for r in s1}
    assert sig[0] == sig[1]  # identical text => identical signature
    assert sig[0] != sig[3]


def test_simhash_pairs_match_bruteforce(spark, corpus_df):
    sigs = {
        r["doc"]: r["simhash"]
        for r in dedup.simhash_signatures(corpus_df, "doc_id", "text").collect()
    }
    max_h = 12
    expect = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        ham = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        if ham <= max_h:
            expect.add((a, b, ham))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_pairs(
            corpus_df, "doc_id", "text", max_hamming=max_h, blocks=16
        ).collect()
    }
    # banding guarantees completeness when max_hamming < blocks
    assert got == expect
    assert (0, 1, 0) in got  # exact dup => distance 0


def test_minhash_lsh_precision_and_recall(spark):
    """The driver gate for dedup_minhash_lsh is rows-only (its recall
    vs exact all-pairs jaccard is 1-(1-j^r)^b < 1, so an exact-SQL
    oracle would be a luck-based gate — ADVICE r1). The operator's
    contract is pinned here instead: precision 1.0 (every reported
    pair really has capped-free jaccard >= t, guaranteed by the
    exact-verify stage) and recall near the S-curve bound on the
    driver's own testdata."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(
            docs, "doc_id", "text", n=2, threshold=0.7
        ).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=2, bands=16, rows_per_band=4, threshold=0.7
        ).collect()
    }
    assert lsh <= exact  # precision 1.0
    if exact:
        # at j=0.7 the per-pair capture probability is
        # 1-(1-0.7^4)^16 ≈ 0.99; demand >= 0.9 overall
        assert len(lsh) >= 0.9 * len(exact)


# ------------------------------------------------------------------
# Span-level exact substring dedup (dedup.duplicate_spans /
# remove_duplicate_spans — Lee et al. ACL 2022 ExactSubstr,
# re-expressed relationally). Oracle: independent Python
# re-derivation of "merge runs of >=2x L-token shingles".
# ------------------------------------------------------------------

SPAN_DOCS = [
    (0, "a b c d e f g h"),                     # shares a..f with doc 1
    (1, "x y a b c d e f q r"),
    (2, "p q r s t p q r s t"),                  # within-doc repeat
    (3, "unique0 unique1 unique2 unique3 unique4 unique5 unique6"),
    (4, "one two"),                              # shorter than a shingle
    (5, ""),
]


def _span_oracle(docs, L=5, min_count=2):
    from collections import Counter

    sh = {}  # doc -> [(pos, gram)]
    for d, t in docs:
        toks = t.split()
        sh[d] = [
            (i, " ".join(toks[i : i + L]))
            for i in range(len(toks) - L + 1)
        ]
    cnt = Counter(g for lst in sh.values() for _, g in lst)
    spans = {}
    for d, lst in sh.items():
        hits = [p for p, g in lst if cnt[g] >= min_count]
        out = []
        for p in sorted(hits):
            if out and p <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], p + L), out[-1][2] + 1)
            else:
                out.append((p, p + L, 1))
        spans[d] = out
    return spans


def test_duplicate_spans_vs_python_oracle(spark):
    df = spark.createDataFrame(SPAN_DOCS, ["doc_id", "text"])
    got = {}
    for r in dedup.duplicate_spans(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_shingles"])
        )
    exp = {
        d: sorted(s) for d, s in _span_oracle(SPAN_DOCS).items() if s
    }
    assert {d: sorted(s) for d, s in got.items()} == exp
    # hand-check the interesting shapes
    assert exp[0] == [(0, 6, 2)]       # a..f run = two merged shingles
    assert exp[1] == [(2, 8, 2)]
    assert exp[2] == [(0, 10, 2)]      # touching islands merge
    assert 3 not in exp and 4 not in exp and 5 not in exp


def test_remove_duplicate_spans(spark):
    df = spark.createDataFrame(SPAN_DOCS, ["doc_id", "text"])
    rows = {
        r["doc_id"]: r for r in dedup.remove_duplicate_spans(df).collect()
    }
    assert set(rows) == {d for d, _ in SPAN_DOCS}  # all docs survive
    spans = _span_oracle(SPAN_DOCS)
    for d, t in SPAN_DOCS:
        toks = t.split()
        cut = {
            i for s, e, _ in spans.get(d, []) for i in range(s, e)
        }
        exp = " ".join(tok for i, tok in enumerate(toks) if i not in cut)
        assert rows[d]["clean_text"] == exp, d
        assert rows[d]["n_tokens_removed"] == len(cut & set(range(len(toks))))
    # pass-through docs are token-normalized, not byte-identical
    assert rows[3]["clean_text"] == SPAN_DOCS[3][1]
    assert rows[5]["clean_text"] == ""


def test_duplicate_spans_seeded_adversarial_corpus(spark):
    """150 seeded docs over a tiny vocabulary (so cross-doc shingle
    collisions are common) vs the Python oracle in one job — both
    the span sets and the removal output."""
    import random

    rng = random.Random(42424242)
    vocab = ["w0", "w1", "w2", "w3"]
    docs = [
        (
            i,
            " ".join(
                rng.choice(vocab) for _ in range(rng.randrange(0, 25))
            ),
        )
        for i in range(150)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    exp = {d: sorted(s) for d, s in _span_oracle(docs).items() if s}
    got = {}
    for r in dedup.duplicate_spans(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_shingles"])
        )
    assert {d: sorted(s) for d, s in got.items()} == exp
    rows = {
        r["doc_id"]: r for r in dedup.remove_duplicate_spans(df).collect()
    }
    spans = _span_oracle(docs)
    for d, t in docs:
        toks = t.split()
        cut = {i for s, e, _ in spans.get(d, []) for i in range(s, e)}
        want = " ".join(tok for i, tok in enumerate(toks) if i not in cut)
        assert rows[d]["clean_text"] == want, d
