"""Benchmark decontamination: n-gram overlap between a training
corpus and a benchmark/eval set.

The standard LLM-pipeline step (cf. GPT-3 appendix C / The Pile /
Dolma dedup tooling — all public): a training document is
*contaminated* if it shares at least `min_hits` distinct n-grams with
any benchmark document; contaminated docs are dropped or flagged
before training. At 100 TB this is the same shape as the shingle
inverted index in operators/dedup.py: explode both sides to
(doc, shingle), equi-join on the shingle — a uniform key — and count
distinct collisions per (corpus doc, benchmark doc) pair.

Scale notes:
* The join is shingle-keyed; ubiquitous shingles (stop phrases) are
  the skew + quadratic-blowup risk, capped by document frequency on
  the BENCHMARK side (`max_shingle_df`) — the side that defines
  contamination and is small enough (thousands of eval docs) that the
  cap costs one extra tiny aggregate. Same guard as jaccard_pairs.
* The benchmark side is typically broadcast-sized after dedup
  (eval sets are MBs, not TBs); Catalyst/AQE picks broadcast-hash
  automatically at that size, so the 100 TB corpus side never
  shuffles.
* Output is per corpus-doc (a semi-join-shaped aggregate), not the
  full pair list, so the result stays corpus-bounded.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from website_indexer_spark.operators.dedup import shingles


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
    max_shingle_df: Optional[int] = None,
) -> DataFrame:
    """Per contaminated corpus doc: how many distinct n-grams it
    shares with the benchmark and how many benchmark docs it touches.

    Returns (doc_id, n_shared_ngrams, n_benchmark_docs) for docs with
    at least `min_hits` shared n-grams.
    """
    c = shingles(corpus, id_col, text_col, n=n).select(
        F.col("doc").alias("c_doc"), "shingle"
    )
    b = shingles(benchmark, id_col, text_col, n=n).select(
        F.col("doc").alias("b_doc"), "shingle"
    )
    if max_shingle_df is not None:
        keep = (
            b.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        b = b.join(keep, "shingle")
    hits = c.join(b, "shingle")
    report = hits.groupBy("c_doc").agg(
        F.countDistinct("shingle").alias("n_shared_ngrams"),
        F.countDistinct("b_doc").alias("n_benchmark_docs"),
    )
    return report.filter(F.col("n_shared_ngrams") >= min_hits).select(
        F.col("c_doc").alias(id_col), "n_shared_ngrams", "n_benchmark_docs"
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
    max_shingle_df: Optional[int] = None,
) -> DataFrame:
    """The corpus minus contaminated docs (left-anti against the
    report's doc ids)."""
    bad = contamination_report(
        corpus,
        benchmark,
        id_col=id_col,
        text_col=text_col,
        n=n,
        min_hits=min_hits,
        max_shingle_df=max_shingle_df,
    ).select(id_col)
    return corpus.join(bad, id_col, "left_anti")


def distinctive_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k most distinctive terms per document, scored tf/df — term
    frequency damped by corpus document frequency (a linear-idf
    variant of TF-IDF; the log-idf swap is one line, kept out of the
    oracle-gated path because tf/df is a SINGLE integer division whose
    IEEE double result is bit-identical across engines, while log()
    may differ in the last ulp between libm implementations).

    Two uniform-key shuffles (term-level df, doc-level rank window);
    the rank window partitions by doc so no global sort exists.
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    df_ = toks.select("doc", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    scored = tf.join(df_, "term").withColumn(
        "score", F.col("tf") / F.col("df")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc").alias(id_col), "term", "tf", "df", "rank"
        )
    )


__all__ = ["contamination_report", "decontaminate", "distinctive_terms"]
