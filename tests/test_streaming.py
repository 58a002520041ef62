"""Structured Streaming ingest tests: the streaming extraction must
produce exactly the batch extraction's rows (same kernel, same
routing), with exactly-once append across incremental triggers."""

import os

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.sources.synth import generate_web_pages
from website_indexer_spark.streaming import ingest


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "web_pages")
    generate_web_pages(spark, n_pages=120, n_hosts=3, partitions=4).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _run_stream(spark, corpus_dir, out_dir):
    stream = ingest.stream_web_pages(spark, corpus_dir, max_files_per_trigger=2)
    routed = ingest.extract_stream(stream, "host0.test")
    q = ingest.write_routed_stream(
        routed, os.path.join(out_dir, "routed"), os.path.join(out_dir, "ckpt")
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(out_dir, "routed"))


def test_stream_matches_batch(spark, corpus_dir, tmp_path):
    got = _run_stream(spark, corpus_dir, str(tmp_path))

    batch = ingest.extract_stream(
        spark.read.parquet(corpus_dir), "host0.test"
    )
    assert got.count() == batch.count()
    got_pages = {
        (r["url"], r["title"], r["text"])
        for r in got.filter("record_type = 'page'").collect()
    }
    batch_pages = {
        (r["url"], r["title"], r["text"])
        for r in batch.filter("record_type = 'page'").collect()
    }
    assert got_pages == batch_pages
    assert got.filter("record_type = 'error'").count() == batch.filter(
        "record_type = 'error'"
    ).count()


def test_stream_exactly_once_on_restart(spark, corpus_dir, tmp_path):
    """Re-running with the same checkpoint must not duplicate rows."""
    first = _run_stream(spark, corpus_dir, str(tmp_path)).count()
    again = _run_stream(spark, corpus_dir, str(tmp_path)).count()
    assert first == again


def test_windowed_page_rate(spark, corpus_dir, tmp_path):
    routed = ingest.extract_stream(
        spark.read.parquet(corpus_dir), "host0.test"
    )
    rate = ingest.windowed_page_rate(routed, window="1 hour")
    rows = rate.collect()
    assert sum(r["n_pages"] for r in rows) == routed.filter(
        "record_type = 'page'"
    ).count()
    assert all(r["window_start"] is not None for r in rows)
