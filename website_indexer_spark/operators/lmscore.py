"""CCNet-style language-model quality scoring, relationally.

CCNet (Wenzek et al. 2020) buckets web documents by the perplexity of
a small LM trained on a trusted corpus; the head (lowest perplexity)
is kept for pretraining. The honest Spark-first reduction of that
idea — with no external model artifact — is a **corpus-self-trained
unigram LM with a capped vocabulary**:

1. TRAIN: lowercase whitespace terms (the exact protocol of
   functions/redact.py:term_frequencies, so the tokenization is
   already oracle-pinned), global occurrence counts, keep the top-K
   vocabulary (ties broken by term — deterministic), pool everything
   else into one UNK bucket whose count is ``N - sum(top-K)``.
2. SCORE: per-document mean negative log-likelihood under add-one
   smoothing over the K+1-symbol vocabulary:
       p(t) = (count(t) + 1) / (N + K + 1),  count(UNK) = pooled
   Lower = more typical of the corpus; the CCNet head/tail split is
   then a threshold or quantile over this column.

Scale shape (the part that matters at 100 TB):
* the TRAIN side is explode → partial-aggregated groupBy(term) →
  TakeOrdered(K) — the hot-token skew lands in map-side combine, and
  only K+1 rows survive, so the model is always broadcastable no
  matter the corpus size (this is WHY the vocabulary is capped: an
  uncapped term table would make scoring a big-big join);
* the SCORE side is explode → **broadcast** join against the K-row
  model → groupBy(doc). One corpus exchange (on doc_id), one tiny
  broadcast; the corpus-global scalars (N, V, pooled UNK count) ride
  along as a broadcast 1-row cross join rather than a driver collect,
  so the whole thing stays one lazy plan.

Hash-gate float protocol: the score is emitted as
``logloss_milli = floor(1000 * mean(-ln p))`` (bigint). JVM and
DuckDB ``ln`` agree to <=1 ulp and the sum across a document differs
only by addition order (~1e-13 absolute), so a 1e-3 floor bucket is
deterministic across engines for practical purposes; the raw double
deliberately does NOT appear in the gated output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_VOCAB_K = 1_000


def _terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )


def _term_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        _terms(df, id_col, text_col)
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )


def _top_vocab(counts: DataFrame, vocab_k: int) -> DataFrame:
    return counts.orderBy(F.desc("cnt"), F.asc("term")).limit(vocab_k)


def unigram_model(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = DEFAULT_VOCAB_K,
) -> DataFrame:
    """(term, cnt) for the top-``vocab_k`` terms by global count
    (count desc, term asc — fully deterministic). TakeOrdered, not a
    global sort: K rows reach the driver regardless of corpus size."""
    return _top_vocab(_term_counts(df, id_col, text_col), vocab_k)


def unigram_logloss(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = DEFAULT_VOCAB_K,
) -> DataFrame:
    """(doc_id, n_tokens, logloss_milli) — per-document mean negative
    log-likelihood under the corpus-self-trained capped-vocab unigram
    LM, in integer milli-nats. Documents with zero tokens are dropped
    (a mean over nothing is undefined; they'd be killed by any length
    gate long before an LM gate anyway).

    The train side materializes ONE term-counts frame (term-
    cardinality-sized, orders below the corpus) via a lazy
    localCheckpoint, and the vocabulary AND all three model scalars
    (N, |V|, covered mass) derive from it — so the corpus itself is
    scanned exactly twice end-to-end (once to count, once to score),
    the inherent minimum for train-then-score. Without the
    checkpoint, Catalyst re-derives each scalar's lineage from the
    raw scan and the plan reads the corpus four times."""
    toks = _terms(df, id_col, text_col)
    counts = _term_counts(df, id_col, text_col).localCheckpoint(eager=False)
    vocab = _top_vocab(counts, vocab_k)

    # corpus scalars as a broadcast 1-row frame (no driver collect):
    # N = total tokens (sum over ALL term counts, not just the vocab),
    # k_eff = |vocab| (< vocab_k on tiny corpora),
    # oov = N - tokens covered by the vocab
    totals = counts.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_total")
    ).crossJoin(
        F.broadcast(
            vocab.agg(
                F.count("*").alias("k_eff"),
                F.coalesce(F.sum("cnt"), F.lit(0)).alias("covered"),
            )
        )
    )

    scored = (
        toks.join(F.broadcast(vocab), "term", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "lnp",
            F.log(
                (
                    F.coalesce(
                        F.col("cnt"),  # known term
                        F.col("n_total") - F.col("covered"),  # pooled UNK
                    )
                    + F.lit(1)
                ).cast("double")
                / (F.col("n_total") + F.col("k_eff") + F.lit(1)).cast("double")
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.floor(F.lit(-1000.0) * F.avg("lnp")).cast("bigint").alias(
                "logloss_milli"
            ),
        )
        .select("doc_id", "n_tokens", "logloss_milli")
    )


def perplexity_head(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = DEFAULT_VOCAB_K,
    max_logloss_milli: int = 6_500,
) -> DataFrame:
    """The CCNet 'head' cut: survivors whose mean logloss stays under
    the threshold. Returns the original rows (semi-join shape — the
    scored frame is the filter, not the payload)."""
    keep = unigram_logloss(df, id_col, text_col, vocab_k).where(
        F.col("logloss_milli") <= F.lit(max_logloss_milli)
    )
    return df.join(
        keep.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )


__all__ = [
    "unigram_model",
    "unigram_logloss",
    "perplexity_head",
    "DEFAULT_VOCAB_K",
]
