"""Delta-table compaction (the Iceberg rewrite_data_files analogue):
readers must see identical rows before/after, a mid-crawl compaction
must not disturb resume, and a crash at either marker state must
self-heal."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.oracle_crawler import fixture_site
from tests.conftest import web_dict_to_df
from website_indexer_spark.plans.crawl import run_crawl
from website_indexer_spark.sources.tables import CrawlStore


def _crawl(spark, tmp_path, sub="c", **kw):
    web, seed = fixture_site()
    return run_crawl(
        spark, web_dict_to_df(spark, web), seed, str(tmp_path / sub), **kw
    )


def _rows(store, name):
    if name == "routed":
        from website_indexer_spark.sources.tables import ROUTED_SCHEMA

        # timestamp is wall-clock for NULL-warc_ts fixtures: excluded
        # so row sets compare across independent runs
        df = store.backend.read_table("routed", ROUTED_SCHEMA).drop("timestamp")
    else:
        df = store.read_all(name)
    return {
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in df.collect()
    }


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    res = _crawl(spark, tmp_path)
    store = res.store
    before = {n: _rows(store, n) for n in ("seen", "routed", "dims")}
    stats = store.compact()
    for name in ("seen", "routed", "dims"):
        assert _rows(store, name) == before[name], name
        assert stats[name]["files_after"] <= stats[name]["files_before"]
    # multi-superstep tables really did merge into one delta dir
    # (seen keeps its hash-bucketed layout: ≤ SEEN_BUCKETS files)
    from website_indexer_spark.sources.tables import SEEN_BUCKETS

    assert stats["seen"]["files_after"] <= SEEN_BUCKETS
    seen_dirs = [
        e
        for e in os.listdir(os.path.join(store.root, "seen"))
        if e.startswith("superstep=")
    ]
    assert len(seen_dirs) == 1


def test_compact_then_resume_matches_uncompacted(spark, tmp_path):
    """Stop a crawl mid-run, compact, resume: final state must equal
    an uninterrupted crawl's (the seen anti-join and counters read
    through the compacted layout)."""
    full = _crawl(spark, tmp_path, sub="full")
    partial = _crawl(spark, tmp_path, sub="part", max_supersteps=2)
    assert partial.supersteps == 2
    partial.store.compact()
    web, seed = fixture_site()
    resumed = run_crawl(
        spark,
        web_dict_to_df(spark, web),
        seed,
        str(tmp_path / "part"),
        resume=True,
    )
    assert resumed.pages == full.pages
    assert resumed.requested == full.requested
    assert _rows(resumed.store, "routed") == _rows(full.store, "routed")
    assert _rows(resumed.store, "seen") == _rows(full.store, "seen")


def test_compaction_crash_recovery(spark, tmp_path):
    res = _crawl(spark, tmp_path)
    store = res.store
    backend = store.backend
    want = _rows(store, "seen")

    # crash state A: rewrite finished, swap not started
    # (.compacted_ready exists, old deltas still present)
    upto = backend.last_committed()
    tdir, tmp, ready = backend._compaction_dirs("seen")
    merged = store.read_all("seen")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_COMPACTION.json"), "w") as f:
        json.dump({"upto": upto}, f)
    os.rename(tmp, ready)
    backend.recover_compaction("seen")
    assert not os.path.isdir(ready)
    assert _rows(store, "seen") == want

    # crash state B: rewrite torn mid-write (.compacting only) — must
    # be dropped, table untouched
    os.makedirs(tmp)
    with open(os.path.join(tmp, "junk.parquet"), "w") as f:
        f.write("torn")
    backend.recover_compaction("seen")
    assert not os.path.isdir(tmp)
    assert _rows(store, "seen") == want

    # rollback_uncommitted (the resume entrypoint) also recovers
    os.makedirs(tmp)
    backend.rollback_uncommitted()
    assert not os.path.isdir(tmp)


def test_viewer_queries_after_compaction(spark, tmp_path):
    from website_indexer_spark.plans import queries as vq

    res = _crawl(spark, tmp_path)
    store = res.store
    pages_before = store.read_all("pages").count()
    comps_before = {
        tuple(r) for r in vq.component_list(store.read_all("pages")).collect()
    }
    store.compact()
    assert store.read_all("pages").count() == pages_before
    comps_after = {
        tuple(r) for r in vq.component_list(store.read_all("pages")).collect()
    }
    assert comps_after == comps_before


def test_compaction_crash_recovery_markerless_ready(spark, tmp_path):
    """Legacy crash shape: a .compacted_ready dir WITHOUT its
    _COMPACTION.json (pre-fix _finish_compaction deleted the marker
    before the swap). recover_compaction must fall back to
    upto=last_committed() instead of raising, and the rows survive."""
    res = _crawl(spark, tmp_path)
    store = res.store
    backend = store.backend
    want = _rows(store, "seen")

    tdir, tmp, ready = backend._compaction_dirs("seen")
    merged = store.read_all("seen")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.rename(tmp, ready)  # NO marker inside
    backend.recover_compaction("seen")
    assert not os.path.isdir(ready)
    assert _rows(store, "seen") == want
    # resume path must not be wedged either
    backend.rollback_uncommitted()
    assert _rows(store, "seen") == want


def test_compaction_crash_recovery_stray_marker(spark, tmp_path):
    """Crash between the dest rename and the marker delete leaves a
    stray _COMPACTION.json inside the committed superstep dir: reads
    must be unaffected and recover must clean it."""
    res = _crawl(spark, tmp_path)
    store = res.store
    backend = store.backend
    want = _rows(store, "seen")

    stats = store.compact()
    upto = stats["seen"]["upto"]
    stray = os.path.join(
        store.root, "seen", f"superstep={upto}", "_COMPACTION.json"
    )
    with open(stray, "w") as f:
        json.dump({"upto": upto}, f)
    # _-prefixed files are invisible to the parquet reader
    assert _rows(store, "seen") == want
    backend.recover_compaction("seen")
    assert not os.path.exists(stray)
    assert _rows(store, "seen") == want
