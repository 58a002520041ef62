"""Benchmark decontamination + distinctive terms vs pure-Python
reference implementations."""

from collections import Counter

from website_indexer_spark.operators.decontam import (
    contamination_report,
    decontaminate,
    distinctive_terms,
)


def _trigrams(text):
    t = [x for x in text.strip().split() if x]
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (3, "completely novel training text with no overlap at all"),
    (5, "the quick brown cat naps"),  # shares ONE trigram with doc 0
]
BENCH = [
    (0, "the quick brown fox runs away fast"),
    (2, "another benchmark question entirely different words"),
]


def test_contamination_report_counts(spark):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_shared_ngrams"], r["n_benchmark_docs"])
        for r in contamination_report(corpus, bench, n=3, min_hits=1).collect()
    }
    bench_grams = {i: _trigrams(t) for i, t in BENCH}
    want = {}
    for i, t in CORPUS:
        shared = _trigrams(t) & set().union(*bench_grams.values())
        docs = sum(1 for g in bench_grams.values() if g & _trigrams(t))
        if shared:
            want[i] = (len(shared), docs)
    assert got == want
    assert 1 in got and 3 not in got  # fox doc flagged, novel doc clean


def test_min_hits_threshold(spark):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    flagged = {
        r["doc_id"]
        for r in contamination_report(corpus, bench, n=3, min_hits=2).collect()
    }
    # doc 5 shares exactly one trigram ("the quick brown") -> filtered
    assert 5 not in flagged and 1 in flagged


def test_decontaminate_removes_flagged(spark):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    kept = {r["doc_id"] for r in decontaminate(corpus, bench, n=3).collect()}
    assert kept == {3}


def test_benchmark_df_cap_drops_stop_shingles(spark):
    # a shingle present in EVERY benchmark doc is capped out at df<=1
    bench_rows = [(i, "common stop phrase number %d" % i) for i in range(4)]
    corpus = spark.createDataFrame(
        [(101, "common stop phrase here")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame(bench_rows, ["doc_id", "text"])
    uncapped = contamination_report(corpus, bench, n=3).collect()
    capped = contamination_report(
        corpus, bench, n=3, max_shingle_df=1
    ).collect()
    assert len(uncapped) == 1 and len(capped) == 0


def test_distinctive_terms_matches_python(spark):
    rows = [
        (1, "apple apple banana shared shared shared"),
        (2, "banana cherry shared"),
        (3, "cherry cherry date shared shared"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"])
        for r in distinctive_terms(docs, k=2).collect()
    }
    df = Counter()
    for _i, t in rows:
        df.update(set(t.split()))
    want = {}
    for i, t in rows:
        tf = Counter(t.split())
        ranked = sorted(
            tf.items(), key=lambda kv: (-kv[1] / df[kv[0]], kv[0])
        )[:2]
        for rank, (term, n) in enumerate(ranked, 1):
            want[(i, rank)] = (term, n, df[term])
    assert got == want
