"""Store-level bucket-count config (VERDICT r3 #3), legacy flat-layout
detection (ADVICE r3), rebucketing via compaction, and the parallel
above-threshold seen/dims delta write (VERDICT r3 #2).

The bucket counts are PHYSICAL layout: a probe run with a different
count than the files were written with silently mis-buckets and forgets
committed keys. So the counts live in <root>/store_meta.json, fixed at
creation, validated on open, and only changeable through a compaction
rewrite (CrawlStore.rebucket)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import web_dict_to_df
from tests.oracle_crawler import crawl as oracle_crawl, fixture_site
from website_indexer_spark.operators import frontier as FR
from website_indexer_spark.plans import crawl as C
from website_indexer_spark.sources.tables import (
    SEEN_SCHEMA,
    CrawlStore,
)


def _crawl(spark, tmp_path, name, **kwargs):
    web, seed = fixture_site()
    return C.run_crawl(
        spark, web_dict_to_df(spark, web), seed, str(tmp_path / name), **kwargs
    )


def _seen_urls(store):
    return sorted(r["url"] for r in store.read_all("seen").collect())


def _bucket_dirs(root, table="seen"):
    out = set()
    for dirpath, dirs, _files in os.walk(os.path.join(root, table)):
        for d in dirs:
            if d.startswith("bucket="):
                out.add(int(d.split("=", 1)[1]))
    return out


def test_nondefault_bucket_count_crawl_resume_compact(spark, tmp_path, monkeypatch):
    """A store created with seen_buckets=5/dims_buckets=3 keeps that
    layout through crawl + reopen + forced bucketed anti-join +
    compaction, matching the oracle crawler throughout."""
    root = str(tmp_path / "c")
    CrawlStore(spark, root, seen_buckets=5, dims_buckets=3)  # create meta
    monkeypatch.setattr(C, "BROADCAST_FETCH_THRESHOLD", -1)  # force bucketed
    monkeypatch.setattr(C, "DIM_BROADCAST_THRESHOLD", -1)
    web, seed = fixture_site()
    oracle = oracle_crawl(web, seed)
    result = C.run_crawl(spark, web_dict_to_df(spark, web), seed, root)
    assert result.store.seen_buckets == 5
    assert result.store.dims_buckets == 3
    assert {r["url"] for r in result.store.read_all("pages").collect()} == set(
        oracle.pages
    )
    assert set(_seen_urls(result.store)) == set(oracle.requested)
    assert _bucket_dirs(root, "seen") <= set(range(5))
    assert _bucket_dirs(root, "dims") <= set(range(3))

    # reopen with no args: counts come from the meta, layout still probes
    store2 = CrawlStore(spark, root)
    assert store2.seen_buckets == 5 and store2.dims_buckets == 3
    probe = store2.read_all("seen")
    assert (
        FR.exclude_keys_bucketed(
            probe, store2.seen_bucket_files(), store2.seen_buckets
        ).count()
        == 0
    )

    # compaction preserves the configured count
    store2.compact()
    assert _bucket_dirs(root, "seen") <= set(range(5))
    store3 = CrawlStore(spark, root)
    assert set(_seen_urls(store3)) == set(oracle.requested)
    assert (
        FR.exclude_keys_bucketed(
            store3.read_all("seen"), store3.seen_bucket_files(), 5
        ).count()
        == 0
    )


def test_bucket_count_mismatch_raises(spark, tmp_path):
    root = str(tmp_path / "m")
    CrawlStore(spark, root, seen_buckets=5)
    with pytest.raises(ValueError, match="seen_buckets mismatch"):
        CrawlStore(spark, root, seen_buckets=7)
    with pytest.raises(ValueError, match="dims_buckets mismatch"):
        CrawlStore(spark, root, dims_buckets=7)
    # matching explicit counts are fine
    s = CrawlStore(spark, root, seen_buckets=5, dims_buckets=8)
    assert s.seen_buckets == 5


def test_legacy_store_without_meta(spark, tmp_path):
    """A committed store that predates store_meta.json reopens with the
    module defaults (its layout's counts); a differing explicit count
    raises instead of silently mis-bucketing."""
    result = _crawl(spark, tmp_path, "l")
    root = result.store.root
    os.remove(os.path.join(root, "store_meta.json"))
    store = CrawlStore(spark, root)
    assert store.seen_buckets == 8 and store.dims_buckets == 8
    assert store.bucketed_path_available("seen")
    os.remove(os.path.join(root, "store_meta.json"))
    with pytest.raises(ValueError, match="predates store_meta"):
        CrawlStore(spark, root, seen_buckets=16)


def test_flat_legacy_layout_detected_and_repaired(spark, tmp_path):
    """ADVICE r3: committed seen deltas written FLAT (pre-bucketed-
    layout store) are invisible to bucketed_files — the store must
    disable the bucketed fast path (fallback = scanned anti-join stays
    exact) until compact() rewrites the layout."""
    root = str(tmp_path / "f")
    store = CrawlStore(spark, root)
    rows = [(i * 7919, f"u{i}") for i in range(40)]
    flat = spark.createDataFrame(rows, SEEN_SCHEMA)
    store.write_delta("seen", flat.coalesce(1), 0)  # no bucket dirs
    store.commit(0, {"requested": 40})
    assert not store.backend.bucketed_layout_ok("seen")
    assert not store.bucketed_path_available("seen")
    # the bucketed probe WOULD forget all 40 committed keys:
    probe = store.read_all("seen")
    assert (
        FR.exclude_keys_bucketed(
            probe, store.seen_bucket_files(), store.seen_buckets
        ).count()
        == 40
    )
    # compact() recomputes the bucket column and restores the fast path
    store.compact(tables=["seen"])
    assert store.bucketed_path_available("seen")
    assert (
        FR.exclude_keys_bucketed(
            store.read_all("seen"), store.seen_bucket_files(), store.seen_buckets
        ).count()
        == 0
    )


def test_flat_legacy_crawl_resume_falls_back_scanned(spark, tmp_path, monkeypatch):
    """End-to-end: resume a crawl whose committed seen layout is flat,
    with the broadcast threshold forced off — the driver must take the
    scanned fallback (not the bucketed probe) and never re-request a
    committed URL."""
    web, seed = fixture_site()
    oracle = oracle_crawl(web, seed)
    root = str(tmp_path / "r")
    # phase 1: full crawl, then simulate a crash after superstep last-1
    first = C.run_crawl(spark, web_dict_to_df(spark, web), seed, root)
    store = first.store
    last = store.last_committed()
    assert last >= 1
    os.remove(store._manifest_path(last))
    # flatten the still-committed seen layout in place (legacy store)
    import shutil

    seen_rows = CrawlStore(spark, root).read_all("seen").collect()
    shutil.rmtree(os.path.join(root, "seen"))
    flat = spark.createDataFrame(
        [(r["url_hash"], r["url"]) for r in seen_rows], SEEN_SCHEMA
    )
    fresh = CrawlStore(spark, root)
    fresh.backend.write_delta("seen", flat.coalesce(1), 0)
    for k in range(1, last):
        fresh.backend.write_delta(
            "seen", spark.createDataFrame([], SEEN_SCHEMA).coalesce(1), k
        )
    os.remove(os.path.join(root, "store_meta.json"))
    # phase 2: resume with the bucketed path forced on by wave size —
    # the layout check must reroute to the scanned anti-join
    monkeypatch.setattr(C, "BROADCAST_FETCH_THRESHOLD", -1)
    monkeypatch.setattr(C, "DIM_BROADCAST_THRESHOLD", -1)
    result = C.run_crawl(
        spark, web_dict_to_df(spark, web), seed, root, resume=True
    )
    assert set(_seen_urls(result.store)) == set(oracle.requested)
    assert {r["url"] for r in result.store.read_all("pages").collect()} == set(
        oracle.pages
    )
    # request-once: no URL admitted twice into the seen table
    seen_df = result.store.read_all("seen")
    assert seen_df.count() == seen_df.select("url").distinct().count()


def test_rebucket_rewrites_layout(spark, tmp_path):
    result = _crawl(spark, tmp_path, "rb")
    store = result.store
    root = store.root
    want = set(_seen_urls(store))
    res = store.rebucket(seen_buckets=5, dims_buckets=3)
    assert set(res) == {"seen", "dims"}
    assert store.seen_buckets == 5 and store.dims_buckets == 3
    assert _bucket_dirs(root, "seen") <= set(range(5))
    assert _bucket_dirs(root, "dims") <= set(range(3))
    assert set(_seen_urls(store)) == want
    assert store.bucketed_path_available("seen")
    assert (
        FR.exclude_keys_bucketed(
            store.read_all("seen"), store.seen_bucket_files(), 5
        ).count()
        == 0
    )
    # the new count survives reopen; the old count now mismatches
    store2 = CrawlStore(spark, root)
    assert store2.seen_buckets == 5
    with pytest.raises(ValueError, match="mismatch"):
        CrawlStore(spark, root, seen_buckets=8)


def test_rebucket_pending_disables_fast_path(spark, tmp_path):
    """A crash between the meta update and the compaction rewrite
    leaves rebucket_pending set — the bucketed path must stay off
    (counts in meta may not match files) until compact() finishes."""
    result = _crawl(spark, tmp_path, "p")
    store = result.store
    meta = dict(store._meta)
    meta["seen_buckets"] = 5
    meta["rebucket_pending"] = ["seen"]
    store._write_meta(meta)
    assert not store.bucketed_path_available("seen")
    assert store.bucketed_path_available("dims")
    # finishing the rebucket restores it
    store.compact(tables=["seen"])
    meta = dict(store._meta)
    meta.pop("rebucket_pending")
    store._write_meta(meta)
    assert store.bucketed_path_available("seen")
    assert _bucket_dirs(store.root, "seen") <= set(range(5))


def test_parallel_delta_write_above_threshold(spark, tmp_path, monkeypatch):
    """VERDICT r3 #2: above DELTA_WRITE_SINGLE_TASK_MAX the seen/dims
    deltas are written by one task PER BUCKET (repartition by the
    bucket column) instead of coalesce(1) — same bucket=dir layout,
    multiple distinct writer tasks — and the layout still drives an
    exact bucketed anti-join and an oracle-identical crawl."""
    monkeypatch.setattr(C, "DELTA_WRITE_SINGLE_TASK_MAX", -1)
    web, seed = fixture_site()
    oracle = oracle_crawl(web, seed)
    root = str(tmp_path / "pw")
    result = C.run_crawl(spark, web_dict_to_df(spark, web), seed, root)
    assert {r["url"] for r in result.store.read_all("pages").collect()} == set(
        oracle.pages
    )
    assert set(_seen_urls(result.store)) == set(oracle.requested)
    # multiple distinct writer tasks: part files carry the task's
    # partition index; coalesce(1) would make them all part-00000
    part_ids = set()
    for _b, paths in result.store.seen_bucket_files().items():
        for p in paths:
            part_ids.add(os.path.basename(p).split("-")[1])
    assert len(part_ids) > 1, part_ids
    # and the multi-task layout is still a correct probe source
    assert (
        FR.exclude_keys_bucketed(
            result.store.read_all("seen"),
            result.store.seen_bucket_files(),
            result.store.seen_buckets,
        ).count()
        == 0
    )


def test_meta_file_contents(spark, tmp_path):
    root = str(tmp_path / "mf")
    CrawlStore(spark, root, seen_buckets=12)
    with open(os.path.join(root, "store_meta.json")) as f:
        meta = json.load(f)
    assert meta == {
        "layout_version": 2,
        "seen_buckets": 12,
        "dims_buckets": 8,
    }


def test_manifest_records_per_partition_lineage(spark, tmp_path):
    """Each committed manifest carries the superstep's per-partition
    lineage: every data file written (routed/seen/dims/frontier), with
    footer row counts — and the recorded sums agree with the committed
    counters. Compaction does NOT rewrite history: old manifests keep
    the lineage of what their commit actually produced."""
    result = _crawl(spark, tmp_path, "lin")
    store = result.store
    manifests = list(store.manifests())
    assert manifests, "crawl committed nothing"
    total_seen = 0
    for m in manifests:
        files = m.get("files", {})
        assert set(files) >= {"routed", "seen", "frontier"} - (
            set() if m["counters"]["enqueued"] else {"frontier"}
        ), (m["superstep"], sorted(files))
        for table, per_file in files.items():
            assert per_file, table
            for rel, rows in per_file.items():
                assert rel.endswith(".parquet") and rows >= 0, (table, rel)
        # per-file seen rows sum to the superstep's requested counter
        if "seen" in files:
            total_seen += sum(files["seen"].values())
        routed_sum = sum(files.get("routed", {}).values())
        assert routed_sum == (
            m["counters"]["pages"]
            + m["counters"]["errors"]
            + m["counters"]["redirects"]
        ), m["superstep"]
    assert total_seen == result.requested
    before = [json.dumps(m, sort_keys=True) for m in store.manifests()]
    store.compact()
    after = [json.dumps(m, sort_keys=True) for m in store.manifests()]
    assert before == after  # lineage log is immutable history
