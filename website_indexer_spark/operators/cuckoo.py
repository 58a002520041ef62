"""Striped cuckoo filter over ``url_hash`` keys — the deletable
alternative to :class:`~website_indexer_spark.operators.frontier.StripedBloom`
for the crawl's approximate seen-set prefilter (A3).

The north-star spec names "a partition-local Bloom/cuckoo filter
union-merged each superstep"; the Bloom variant has been the default
since round 1, this module adds the cuckoo variant with the SAME
external contract (``load/create/destroy/update/probe_udf/version/
built_keys/capacity_keys``), so every call site that duck-types the
filter (``anti_join_seen``, ``anti_join_seen_bucketed``, the
``maintain_bloom`` superstep helper, the streaming skin) accepts either
kind unchanged.

Why ship both (reference analogue: the crawler keeps ONE in-memory
``requested_urls`` list — crawler/wpull/plugin.py:104-106 — which is
exact but single-process; at 10^10 URLs an approximate prefilter in
front of the exact committed-seen check is the distributed analogue):

* Bloom: simplest union-merge (bitwise OR), smallest constant factor.
* Cuckoo (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
  CoNEXT 2014 — public paper): supports DELETION (a recrawl/invalidate
  deployment can evict a url-hash without rebuilding the filter),
  lower false-positive rate per bit at typical loads (16-bit
  fingerprints, 4-way buckets → FPR ≈ 2·4/2^16 ≈ 1.2e-4), and
  bounded two-location probes (at most 2 cache lines per key vs k
  scattered bit reads).

Scale design, mirroring StripedBloom's (frontier.py:291-308) but with
one improvement: updates never funnel through the driver at all.

* layout: one fixed-size table file per stripe under
  ``<root>/cuckoo/stripe=<s>.bin`` (uint16 little-endian array of
  shape [n_slots, 4]) plus ``meta.json``. A key's stripe comes from
  hash bits 32-47 — disjoint from the fingerprint bits (48-63) and
  the in-stripe index bits (low bits), so each stripe is an
  independent cuckoo table and a task needs only its own stripe file.
* update: the delta repartitions by stripe; each task owns its
  stripe(s) exclusively, loads the stripe table, inserts, and writes
  back atomically (tmp + rename). Executor-side end to end — the
  driver only collects per-stripe row COUNTS (statistics), never
  fingerprints (StripedBloom's update still merges partial bitmaps on
  the driver one bucket at a time; the cuckoo layout removes even
  that).
* probe: vectorized pandas UDF; lazily loads only the stripes present
  in its Arrow batch, per-worker cache keyed by filter version.
* insertion is mostly vectorized: delta keys are bulk-deduped against
  the table, then placed in sweeps (per candidate-bucket × slot, one
  unique-bucket winner per sweep via ``np.unique``); only keys whose
  both buckets fill (rare below the 0.84 design load) fall to the
  classic per-key kick loop, with DETERMINISTIC eviction (slot =
  kick % 4) so rebuilds are reproducible. Exceeding capacity raises
  :class:`CuckooCapacityError` — the superstep maintainer reacts
  exactly as it does for an undersized Bloom: re-create at 4× and
  rebuild from the committed seen history.

Deletion caveat (standard for cuckoo filters): only delete keys that
were actually inserted; two distinct keys colliding on (stripe,
bucket, fingerprint) are stored once (inserts dedupe), so deleting one
also forgets the other with probability ≈ 8/2^16 per pair. The crawl
never relies on deletion for correctness — the committed seen table
stays the source of truth and the filter is only ever consulted as a
maybe/definitely-not prefilter.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_BITS = 16
SLOTS = 4  # fingerprints per bucket (b=4 — the paper's sweet spot)
TARGET_LOAD = 0.84  # design load factor for sizing (paper: ~0.95 max)
MAX_KICKS = 500
MIN_STRIPE_SLOTS = 64  # floor keeps tiny test filters valid
# auto-sizing targets ~32 MB per stripe table so a probe task's lazy
# point-read (and an update task's read-modify-write) stays bounded
# regardless of total filter size; 10^10 keys → ~24 GB of fingerprints
# → ~750 stripes (the 16 stripe-hash bits allow up to 65536)
TARGET_STRIPE_BYTES = 32 << 20
MAX_STRIPES = 1 << 16

# per-executor-worker cache: dir -> (version, {stripe: table})
_CUCKOO_CACHE: dict = {}


class CuckooCapacityError(RuntimeError):
    """Raised when an insert cannot find a home within MAX_KICKS —
    the filter is over its design load; re-create larger and rebuild
    from the committed seen history (maintain_bloom does this)."""


def _as_uint64(hashes: np.ndarray) -> np.ndarray:
    return hashes.astype(np.int64).view(np.uint64)


def _fp_of(u: np.ndarray) -> np.ndarray:
    """16-bit fingerprint from hash bits 48-63; 0 is reserved for
    empty slots so a 0 fingerprint remaps to 1."""
    fp = ((u >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _fp_hash(fp: np.ndarray) -> np.ndarray:
    """Scramble the fingerprint for the partner-bucket XOR (Murmur
    finalizer-style multiply; the constant is MurmurHash2's public M)."""
    x = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
    x ^= x >> np.uint64(13)
    return x


def _buckets_of(u: np.ndarray, n_slots: int) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """(fingerprint, primary bucket, partner bucket) — partner =
    primary XOR hash(fp), the partial-key cuckoo trick that lets a
    stored fingerprint compute its other bucket without the key."""
    fp = _fp_of(u)
    mask = np.uint64(n_slots - 1)
    i1 = (u & mask).astype(np.int64)
    i2 = (i1.view(np.uint64) ^ (_fp_hash(fp) & mask)).astype(np.int64)
    return fp, i1, i2


def _stripe_of(u: np.ndarray, n_stripes: int) -> np.ndarray:
    """Stripe from hash bits 32-47 — disjoint from fingerprint and
    index bits. Must agree with stripe_expr() below."""
    return (((u >> np.uint64(32)) & np.uint64(0xFFFF)) % np.uint64(n_stripes)).astype(
        np.int64
    )


def stripe_expr(col, n_stripes: int):
    """The Spark-side twin of _stripe_of for repartitioning deltas so
    each update task owns whole stripes (shiftrightunsigned matches
    the numpy uint64 logical shift for negative int64 hashes)."""
    return F.pmod(
        F.shiftrightunsigned(col, 32).bitwiseAND(F.lit(0xFFFF)), F.lit(n_stripes)
    )


def _contains(table: np.ndarray, fp: np.ndarray, i1: np.ndarray, i2: np.ndarray) -> np.ndarray:
    f = fp[:, None]
    return ((table[i1] == f).any(axis=1)) | ((table[i2] == f).any(axis=1))


def _insert_stripe(
    table: np.ndarray, u: np.ndarray
) -> "tuple[int, int]":
    """Insert the stripe's delta hashes into its table in place.
    Returns (inserted, already_present). Raises CuckooCapacityError
    when a key cannot be placed within MAX_KICKS."""
    n_slots = table.shape[0]
    fp, i1, i2 = _buckets_of(u, n_slots)

    # bulk dedupe: drop keys already in the table, and same-(bucket,
    # fp) duplicates within the delta (same url_hash twice, or an
    # fp-colliding pair — stored once, by design)
    fresh = ~_contains(table, fp, i1, i2)
    pair = i1.astype(np.uint64) << np.uint64(16) | fp.astype(np.uint64)
    _, first_idx = np.unique(pair, return_index=True)
    keep = np.zeros(len(u), dtype=bool)
    keep[first_idx] = True
    pending = np.flatnonzero(fresh & keep)
    present = int(len(u) - pending.size)

    # vectorized placement sweeps: for each (candidate bucket, slot)
    # pick one winner per unique bucket whose slot is empty; repeat
    # until a full sweep makes no progress
    inserted = 0
    progress = True
    while pending.size and progress:
        progress = False
        for cand in (i1, i2):
            for slot in range(SLOTS):
                if not pending.size:
                    break
                empty = table[cand[pending], slot] == 0
                idxs = pending[empty]
                if idxs.size == 0:
                    continue
                b = cand[idxs]
                _, first = np.unique(b, return_index=True)
                chosen = idxs[first]
                table[b[first], slot] = fp[chosen]
                inserted += chosen.size
                pending = np.setdiff1d(pending, chosen, assume_unique=True)
                progress = True

    # kick loop for the (rare) overflow keys — deterministic eviction
    mask = np.uint64(n_slots - 1)
    for k in pending:
        cur_fp = np.uint16(fp[k])
        idx = int(i1[k])
        placed = False
        for kick in range(MAX_KICKS):
            row = table[idx]
            empties = np.flatnonzero(row == 0)
            if empties.size:
                row[empties[0]] = cur_fp
                placed = True
                break
            s = kick % SLOTS
            victim = row[s]
            row[s] = cur_fp
            cur_fp = victim
            idx = int(
                np.uint64(idx) ^ (_fp_hash(np.array([cur_fp], dtype=np.uint16))[0] & mask)
            )
        if not placed:
            raise CuckooCapacityError(
                f"cuckoo stripe over design load (n_slots={n_slots}); "
                "re-create with a larger capacity and rebuild"
            )
        inserted += 1
    return inserted, present


class StripedCuckoo:
    """Persistent, stripe-partitioned cuckoo filter with the same
    lifecycle contract as StripedBloom (see module docstring)."""

    def __init__(
        self, root: str, n_stripes: int, n_slots: int, version: int, built_keys: int
    ):
        self.root = root
        self.n_stripes = n_stripes
        self.n_slots = n_slots  # per stripe; power of two
        self.version = version
        self.built_keys = built_keys

    # --- layout ---------------------------------------------------
    @staticmethod
    def _dir(root: str) -> str:
        return os.path.join(root, "cuckoo")

    def _stripe_path(self, stripe: int) -> str:
        return os.path.join(self._dir(self.root), f"stripe={stripe}.bin")

    @classmethod
    def _meta_path(cls, root: str) -> str:
        return os.path.join(cls._dir(root), "meta.json")

    # --- lifecycle ------------------------------------------------
    @classmethod
    def load(cls, root: str) -> Optional["StripedCuckoo"]:
        path = cls._meta_path(root)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            meta = json.load(f)
        return cls(
            root,
            meta["n_stripes"],
            meta["n_slots"],
            meta["version"],
            meta["built_keys"],
        )

    @classmethod
    def create(
        cls,
        root: str,
        expected_keys: int,
        n_stripes: Optional[int] = None,
        n_slots: Optional[int] = None,
    ) -> "StripedCuckoo":
        """Size per-stripe slot count from the expected key count at
        the design load (power of two for the XOR partner trick).
        With ``n_stripes`` unset the stripe count auto-scales so each
        stripe table stays ~TARGET_STRIPE_BYTES — point-read-sized at
        any total filter size. ``n_slots`` overrides slot sizing
        (tests force tiny tables)."""
        if n_stripes is None:
            total_bytes = int(expected_keys / TARGET_LOAD) * 2  # uint16 fp
            n_stripes = min(
                MAX_STRIPES, max(8, -(-total_bytes // TARGET_STRIPE_BYTES))
            )
        if n_slots is None:
            need = max(1, int(np.ceil(expected_keys / (n_stripes * SLOTS * TARGET_LOAD))))
            n_slots = max(MIN_STRIPE_SLOTS, 1 << int(np.ceil(np.log2(need))))
        if n_slots & (n_slots - 1):
            raise ValueError("n_slots must be a power of two")
        os.makedirs(cls._dir(root), exist_ok=True)
        for name in os.listdir(cls._dir(root)):
            if name.startswith("stripe="):
                os.remove(os.path.join(cls._dir(root), name))
        filt = cls(root, n_stripes, n_slots, version=0, built_keys=0)
        filt._write_meta()
        return filt

    @classmethod
    def destroy(cls, root: str) -> None:
        import shutil

        if os.path.isdir(cls._dir(root)):
            shutil.rmtree(cls._dir(root))

    def _write_meta(self) -> None:
        meta = {
            "n_stripes": self.n_stripes,
            "n_slots": self.n_slots,
            "version": self.version,
            "built_keys": self.built_keys,
            "fp_bits": FP_BITS,
            "slots_per_bucket": SLOTS,
        }
        tmp = self._meta_path(self.root) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, self._meta_path(self.root))

    @property
    def capacity_keys(self) -> int:
        return int(self.n_stripes * self.n_slots * SLOTS * TARGET_LOAD)

    # --- table IO ---------------------------------------------------
    def _load_table(self, stripe: int) -> np.ndarray:
        path = self._stripe_path(stripe)
        if os.path.exists(path):
            return np.fromfile(path, dtype=np.uint16).reshape(self.n_slots, SLOTS).copy()
        return np.zeros((self.n_slots, SLOTS), dtype=np.uint16)

    def _store_table(self, stripe: int, table: np.ndarray) -> None:
        path = self._stripe_path(stripe)
        tmp = path + ".tmp"
        table.astype(np.uint16).tofile(tmp)
        os.replace(tmp, path)

    # --- update -----------------------------------------------------
    def update(self, delta: DataFrame, n_keys: Optional[int] = None) -> None:
        """Union-merge the delta's url_hash keys into the stripe
        tables, executor-side: repartition by stripe so each task owns
        its stripe files exclusively, insert, write back atomically.
        The driver collects only per-stripe counters. Raises
        CuckooCapacityError (re-raised from the task) past design
        load — callers re-create at 4× and rebuild, exactly like an
        undersized Bloom."""
        n_stripes, n_slots = self.n_stripes, self.n_slots
        root = self.root
        meta_n_slots = n_slots

        def per_stripes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc: dict = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                u = _as_uint64(pdf["url_hash"].to_numpy(dtype=np.int64))
                s = _stripe_of(u, n_stripes)
                for st in np.unique(s):
                    acc.setdefault(int(st), []).append(u[s == st])
            shadow = StripedCuckoo(root, n_stripes, meta_n_slots, 0, 0)
            for st, chunks in acc.items():
                table = shadow._load_table(st)
                ins, pres = _insert_stripe(table, np.concatenate(chunks))
                shadow._store_table(st, table)
                yield pd.DataFrame(
                    {"stripe": [st], "inserted": [ins], "present": [pres]}
                )

        stats = (
            delta.select("url_hash")
            .repartition(n_stripes, stripe_expr(F.col("url_hash"), n_stripes))
            .mapInPandas(per_stripes, "stripe int, inserted long, present long")
            .collect()
        )
        merged = sum(r["inserted"] for r in stats)
        self.version += 1
        self.built_keys += n_keys if n_keys is not None else merged
        self._write_meta()

    # --- delete -----------------------------------------------------
    def delete(self, delta: DataFrame) -> int:
        """Remove the delta's url_hash keys (which MUST have been
        inserted — see the module-docstring caveat). Same stripe-owned
        executor-side execution as update(). Returns the number of
        fingerprints actually cleared."""
        n_stripes, n_slots = self.n_stripes, self.n_slots
        root = self.root

        def per_stripes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc: dict = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                u = _as_uint64(pdf["url_hash"].to_numpy(dtype=np.int64))
                s = _stripe_of(u, n_stripes)
                for st in np.unique(s):
                    acc.setdefault(int(st), []).append(u[s == st])
            shadow = StripedCuckoo(root, n_stripes, n_slots, 0, 0)
            for st, chunks in acc.items():
                table = shadow._load_table(st)
                uu = np.concatenate(chunks)
                fp, i1, i2 = _buckets_of(uu, n_slots)
                removed = 0
                for k in range(len(uu)):
                    done = False
                    for idx in (int(i1[k]), int(i2[k])):
                        row = table[idx]
                        hit = np.flatnonzero(row == fp[k])
                        if hit.size:
                            row[hit[0]] = 0
                            removed += 1
                            done = True
                            break
                    if not done:
                        pass  # deleting a never-inserted key is a no-op
                shadow._store_table(st, table)
                yield pd.DataFrame({"stripe": [st], "removed": [removed]})

        stats = (
            delta.select("url_hash")
            .repartition(n_stripes, stripe_expr(F.col("url_hash"), n_stripes))
            .mapInPandas(per_stripes, "stripe int, removed long")
            .collect()
        )
        removed = sum(r["removed"] for r in stats)
        self.version += 1
        self.built_keys = max(0, self.built_keys - removed)
        self._write_meta()
        return removed

    # --- probe ------------------------------------------------------
    def probe_udf(self):
        """Vectorized predicate: url_hash -> maybe-seen. Same contract
        as StripedBloom.probe_udf (True = take the exact check; False
        = definitely not inserted)."""
        from pyspark.sql.functions import pandas_udf

        n_stripes, n_slots = self.n_stripes, self.n_slots
        version = self.version
        cuckoo_dir = self._dir(self.root)

        @pandas_udf("boolean")
        def maybe_seen(url_hash: pd.Series) -> pd.Series:
            cached = _CUCKOO_CACHE.get(cuckoo_dir)
            if cached is None or cached[0] != version:
                cached = (version, {})
                _CUCKOO_CACHE[cuckoo_dir] = cached
            tables = cached[1]
            u = _as_uint64(url_hash.to_numpy(dtype=np.int64))
            s = _stripe_of(u, n_stripes)
            fp, i1, i2 = _buckets_of(u, n_slots)
            result = np.zeros(len(u), dtype=bool)
            for st in np.unique(s):
                table = tables.get(int(st))
                if table is None:
                    path = os.path.join(cuckoo_dir, f"stripe={int(st)}.bin")
                    if os.path.exists(path):
                        table = np.fromfile(path, dtype=np.uint16).reshape(
                            n_slots, SLOTS
                        )
                    else:
                        table = np.zeros((n_slots, SLOTS), dtype=np.uint16)
                    tables[int(st)] = table
                sel = s == st
                result[sel] = _contains(table, fp[sel], i1[sel], i2[sel])
            return pd.Series(result)

        return maybe_seen
