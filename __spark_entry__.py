"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship pipeline over /root/testdata/sf0.001: the
                 training-data path (quality scoring + language ID +
                 substring search) over the documents table.
queries()      — one entry per implemented operator from SURVEY.md §2
                 + the training-data operator suite; implementations
                 live in website_indexer_spark/plans/catalog.py.
oracle_sql()   — DuckDB-equivalent SQL for every SQL-expressible
                 entry (approximate sketch operators are rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from website_indexer_spark.plans.catalog import ORACLE_SQL, SPARK_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    documents -> quality columns -> language ID -> substring search,
    aggregated per (pred_lang, source): the text-pipeline core in one
    plan (scan -> native projections -> partial agg, no UDF). The
    fuller composition (dedup + decontam + sampling chained into one
    hash-matched plan) is the `pretrain_pipeline` catalog gate.
    """
    from pyspark.sql import functions as F

    from website_indexer_spark.functions import textstats as ts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    enriched = docs.select(
        "doc_id",
        "source",
        ts.lang_id(F.col("text")).alias("pred_lang"),
        *ts.quality_columns(F.col("text")),
        F.contains(F.lower(F.col("text")), F.lit("merge")).alias("mentions_merge"),
    )
    return (
        enriched.groupBy("pred_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("mentions_merge").cast("long")).alias("n_mentioning_merge"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("pred_lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data suite (see plans/catalog.py for the inventory)."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB SQL mirrors; keys without an entry (dedup_simhash,
    fingerprint_overlap, ann_lsh, ann_ivf, embedding_dup_pairs_lsh)
    are approximate/sketch operators pinned by pytest instead."""
    return dict(ORACLE_SQL)
