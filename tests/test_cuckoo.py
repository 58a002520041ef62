"""StripedCuckoo — the deletable Bloom alternative the north-star spec
names ("Bloom/cuckoo filter union-merged each superstep").

Covers the same guarantees the StripedBloom suite pins
(test_frontier_scale.py) plus the cuckoo-specific ones:

* no false negatives across incremental updates and disk reloads
* false-positive rate sanity at design load (16-bit fp, 4-way buckets)
* deletion: deleted keys probe definitely-not; survivors keep the
  no-false-negative guarantee (collision-free test set, asserted)
* stripe-owned executor-side update: one file per touched stripe
* capacity overflow raises (wrapped) CuckooCapacityError
* maintain_bloom kind dispatch + persisted-kind-wins on resume
* full crawl with seen_filter="cuckoo" forced on reaches the exact
  oracle state (the filter is only ever a maybe/definitely-not
  prefilter in front of the exact seen check)
* hypothesis: membership superset property over arbitrary int64 keys
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import web_dict_to_df
from tests.oracle_crawler import crawl as oracle_crawl
from tests.test_crawl import _assert_equivalent, _rich_site, _spark_crawl
from website_indexer_spark.operators import cuckoo as CK
from website_indexer_spark.operators.cuckoo import StripedCuckoo
from website_indexer_spark.operators.frontier import StripedBloom
from website_indexer_spark.plans import crawl as C


def _hashes(spark, lo, hi):
    return spark.range(lo, hi).select(F.xxhash64("id").alias("url_hash"))


# ---------------------------------------------------------------- units


def test_cuckoo_incremental_no_false_negatives(spark, tmp_path):
    root = str(tmp_path)
    ck = StripedCuckoo.create(root, expected_keys=1000)
    d1 = _hashes(spark, 0, 500)
    ck.update(d1)
    assert ck.built_keys == 500 and ck.version == 1

    ck2 = StripedCuckoo.load(root)
    assert ck2.version == 1 and ck2.n_slots == ck.n_slots
    maybe = ck2.probe_udf()
    assert d1.filter(~maybe(F.col("url_hash"))).count() == 0  # no FNs

    d2 = _hashes(spark, 1000, 1500)
    ck2.update(d2)
    assert ck2.built_keys == 1000 and ck2.version == 2
    ck3 = StripedCuckoo.load(root)
    maybe3 = ck3.probe_udf()
    both = d1.unionByName(d2)
    assert both.filter(~maybe3(F.col("url_hash"))).count() == 0


def test_cuckoo_false_positive_rate(spark, tmp_path):
    """Disjoint probes: FPR must be far under Bloom-typical 1% —
    the 16-bit-fp design point is ~1.2e-4."""
    ck = StripedCuckoo.create(str(tmp_path), expected_keys=5000)
    ck.update(_hashes(spark, 0, 5000))
    maybe = ck.probe_udf()
    hits = _hashes(spark, 100_000, 120_000).filter(maybe(F.col("url_hash"))).count()
    assert hits / 20_000 < 0.005


def test_cuckoo_stripe_files_and_counters(spark, tmp_path):
    ck = StripedCuckoo.create(str(tmp_path), expected_keys=2000, n_stripes=8)
    ck.update(_hashes(spark, 0, 2000))
    files = [p for p in (tmp_path / "cuckoo").iterdir() if p.name.startswith("stripe=")]
    assert 1 <= len(files) <= 8
    # fixed-size stripe tables: n_slots * 4 slots * 2 bytes each
    assert all(p.stat().st_size == ck.n_slots * CK.SLOTS * 2 for p in files)
    # updating the same keys again inserts nothing new
    before = {p.name: p.read_bytes() for p in files}
    ck.update(_hashes(spark, 0, 2000), n_keys=0)
    after = {
        p.name: p.read_bytes()
        for p in (tmp_path / "cuckoo").iterdir()
        if p.name.startswith("stripe=")
    }
    assert before == after and ck.built_keys == 2000


def test_cuckoo_delete(spark, tmp_path):
    """Delete half the keys; deleted probe False, survivors keep the
    no-FN guarantee. The test set is asserted collision-free on
    (stripe, bucket, fp) so over-deletion cannot occur by chance."""
    ck = StripedCuckoo.create(str(tmp_path), expected_keys=400)
    all_keys = _hashes(spark, 0, 200)
    u = CK._as_uint64(
        np.array([r["url_hash"] for r in all_keys.collect()], dtype=np.int64)
    )
    fp, i1, _ = CK._buckets_of(u, ck.n_slots)
    s = CK._stripe_of(u, ck.n_stripes)
    triples = set(zip(s.tolist(), i1.tolist(), fp.tolist()))
    assert len(triples) == len(u), "pick a different range: fp collision"

    ck.update(all_keys)
    # split by parity of the original id (hash parity would be fine too)
    keep = spark.range(0, 200).filter("id % 2 = 0").select(
        F.xxhash64("id").alias("url_hash")
    )
    drop = spark.range(0, 200).filter("id % 2 = 1").select(
        F.xxhash64("id").alias("url_hash")
    )
    removed = ck.delete(drop)
    assert removed == 100 and ck.built_keys == 100
    maybe = ck.probe_udf()
    assert drop.filter(maybe(F.col("url_hash"))).count() == 0
    assert keep.filter(~maybe(F.col("url_hash"))).count() == 0
    # deleting a never-inserted key is a no-op
    assert ck.delete(_hashes(spark, 10_000, 10_010)) == 0


def test_cuckoo_stripe_autoscaling():
    """Stripe count grows with expected keys so each stripe table
    stays point-read-sized (~32 MB) at any total filter size."""
    small = StripedCuckoo.create("/tmp/_ck_small_probe", expected_keys=1000)
    assert small.n_stripes == 8
    big = StripedCuckoo.create("/tmp/_ck_big_probe", expected_keys=10**9)
    per_stripe_bytes = big.n_slots * CK.SLOTS * 2
    assert per_stripe_bytes <= 2 * CK.TARGET_STRIPE_BYTES
    assert big.capacity_keys >= 10**9
    assert big.n_stripes <= CK.MAX_STRIPES
    StripedCuckoo.destroy("/tmp/_ck_small_probe")
    StripedCuckoo.destroy("/tmp/_ck_big_probe")


def test_cuckoo_capacity_overflow_raises(spark, tmp_path):
    ck = StripedCuckoo.create(str(tmp_path), expected_keys=1, n_slots=64)
    with pytest.raises(Exception, match="CuckooCapacityError|over design load"):
        # 8 stripes * 64 slots * 4 = 2048 capacity; 40k keys overflow
        ck.update(_hashes(spark, 0, 40_000))


def test_insert_stripe_vectorized_matches_membership():
    """Pure-numpy unit: inserted set == probed set, duplicates dedupe."""
    rng = np.random.default_rng(7)
    u = rng.integers(0, 2**63, size=3000, dtype=np.int64).view(np.uint64)
    u = np.concatenate([u, u[:100]])  # duplicates
    table = np.zeros((2048, CK.SLOTS), dtype=np.uint16)
    ins, present = CK._insert_stripe(table, u)
    assert present >= 100
    fp, i1, i2 = CK._buckets_of(u, 2048)
    assert bool(CK._contains(table, fp, i1, i2).all())


@settings(deadline=None, max_examples=25, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200))
def test_cuckoo_numpy_superset_property(keys):
    """Any inserted key (incl. duplicates, 0, extremes) must probe
    True — the no-false-negative invariant, hash-independent."""
    u = np.array(keys, dtype=np.int64).view(np.uint64)
    table = np.zeros((256, CK.SLOTS), dtype=np.uint16)
    CK._insert_stripe(table, u)
    if len(u):
        fp, i1, i2 = CK._buckets_of(u, 256)
        assert bool(CK._contains(table, fp, i1, i2).all())


# ------------------------------------------------------ maintain dispatch


def test_maintain_filter_kind_dispatch_and_resume(spark, tmp_path):
    root = str(tmp_path / "st")
    keys = _hashes(spark, 0, 300)
    filt = C.maintain_bloom(
        root, None, keys, keys, 300, 300, use_bloom=True, seen_filter="cuckoo"
    )
    assert isinstance(filt, StripedCuckoo)
    # resume: persisted kind wins over a conflicting request
    filt2 = C.maintain_bloom(
        root, None, keys, keys, 300, 0, use_bloom=True, seen_filter="bloom"
    )
    assert isinstance(filt2, StripedCuckoo)
    # capacity-driven rebuild keeps the kind and stays a superset
    big = _hashes(spark, 0, 50_000)
    filt3 = C.maintain_bloom(
        root, filt2, big, big, 50_000, 49_700, use_bloom=True, seen_filter="bloom"
    )
    assert isinstance(filt3, StripedCuckoo)
    assert filt3.capacity_keys >= 50_000
    maybe = filt3.probe_udf()
    assert big.filter(~maybe(F.col("url_hash"))).count() == 0
    # default kind unchanged: a fresh store still creates a Bloom
    fresh = C.maintain_bloom(
        str(tmp_path / "st2"), None, keys, keys, 300, 300, use_bloom=True
    )
    assert isinstance(fresh, StripedBloom)


# ------------------------------------------------------------ integration


@pytest.mark.slow
def test_spark_crawl_cuckoo_path(spark, tmp_path):
    """seen_filter='cuckoo' forced on: exact same final state (the
    filter only skips definitely-unseen; correctness unaffected) —
    the cuckoo twin of test_spark_crawl_bloom_path."""
    web, seed = _rich_site()
    oracle = oracle_crawl(web, seed)
    result = _spark_crawl(
        spark, tmp_path, web, seed, use_bloom=True, seen_filter="cuckoo"
    )
    _assert_equivalent(result, result.store, oracle)
    import os

    assert os.path.isdir(str(tmp_path / "crawl" / "cuckoo"))
    assert not os.path.isdir(str(tmp_path / "crawl" / "bloom"))
