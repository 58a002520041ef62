"""Storage layer: schemas + a snapshot-versioned Parquet table store.

Locally there are no Iceberg jars (verified — SURVEY.md preamble), so
"Iceberg table" is emulated by a superstep-partitioned Parquet layout
with a JSON manifest as the atomic commit marker:

    <root>/
      crawl.json                      # run manifest (config, status)
      routed/superstep=K/record_type=page|error|redirect/*.parquet
      seen/superstep=K/...            # delta of newly-requested urls
      dims/superstep=K/kind=component|link/  # MERGE-new keys only
      frontier/superstep=K/...        # FULL next frontier after step K
      manifests/K.json                # commit marker + counters
      bloom/bucket=B.bin              # striped persistent Bloom filter

A superstep K is committed iff manifests/K.json exists; readers only
read ``superstep <= last_committed`` (partition pruning does the
filtering at scan time), so a job killed mid-write leaves no torn
state and ``resume`` restarts from the last committed superstep.
On a cluster with Iceberg jars the same interface maps onto real
Iceberg snapshots (MERGE/append + snapshot metadata); that swap is a
config change, not a redesign.

Reference analogue: the Crawl row lifecycle + synchronous ORM writes
(/root/reference/crawler/models.py:19-52, crawler/writer.py:14-43);
the manifest counters are the north_rule's per-partition lineage.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- schemas (FIXTURES.md §2 / SURVEY.md §1.3) -----------------------

WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        # auxiliary response metadata for routing (FIXTURES.md §1);
        # absent columns default to 200/text/html at load time
        T.StructField("status_code", T.IntegerType()),
        T.StructField("location", T.StringType()),
        T.StructField("content_type", T.StringType()),
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("discovery_seq", T.LongType(), False),
        T.StructField("parent_url", T.StringType()),
        T.StructField("parent_host", T.StringType()),
        T.StructField("fetch_method", T.StringType()),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
    ]
)

# per-run Crawl-delay override table (plans/crawl.py writes it bucket-
# aligned with the frontier snapshot layout; politeness selection
# tasks point-read only their own bucket's overrides)
BUDGETS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("budget", T.LongType(), False),
    ]
)

# The seen table's physical layout is hash-bucketed by url_hash
# (bucket = pmod(url_hash, SEEN_BUCKETS) as a partition dir under each
# superstep delta) so the above-broadcast-threshold anti-join can run
# storage-partitioned — each probe task point-reads exactly its
# bucket's files, no seen-side scan or exchange (operators/frontier.py
# exclude_keys_bucketed). Iceberg analogue: bucket(N, url_hash)
# partition transform. 8 buckets keeps local file counts sane; a
# deployment sizes this so one bucket's hash column fits a task
# (~4096 buckets at 10^10 seen keys = ~20 MB/task).
#
# These module values are only the DEFAULTS for newly created stores:
# the layout is physical, so the effective counts are store-level
# config persisted in <root>/store_meta.json at creation, validated on
# open (a mismatching explicit count raises), and threaded through the
# crawl/compaction via CrawlStore.seen_buckets / .dims_buckets.
# Changing a live store's count = a compaction rewrite
# (CrawlStore.rebucket); the bucketed fast paths disable themselves
# while a rebucket is pending, so a crash mid-rewrite can never
# mis-bucket a probe.
SEEN_BUCKETS = 8

# The dims table gets the same treatment, sub-partitioned
# kind=K/bucket=B with bucket = pmod(xxhash64(kind, key), DIMS_BUCKETS)
# — the hash only ROUTES rows to buckets; the storage-partitioned
# MERGE probe (operators/dims.py dim_upsert_delta_bucketed) decides
# membership on the exact (kind, key) strings it reads from the
# bucket's files, so hash collisions cannot drop a genuinely-new key.
DIMS_BUCKETS = 8

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("crawl_id", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_seq", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("html", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("components", T.ArrayType(T.StringType())),
    ]
)

ERRORS_SCHEMA = T.StructType(
    [
        T.StructField("crawl_id", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("url", T.StringType(), False),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("referrer", T.StringType()),
    ]
)

REDIRECTS_SCHEMA = T.StructType(
    ERRORS_SCHEMA.fields + [T.StructField("location", T.StringType())]
)

# Unified routed-results table: pages/errors/redirects share one
# superset schema + record_type discriminator so each superstep
# commits ONE write job for all three sinks (the extracted DataFrame
# is cached once and fanned out inside a single action — the
# "exchange reuse across the multi-sink fan-out" of SURVEY.md §4.2).
ROUTED_SCHEMA = T.StructType(
    [
        T.StructField("record_type", T.StringType(), False),  # page|error|redirect
        T.StructField("crawl_id", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_seq", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("html", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("components", T.ArrayType(T.StringType())),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("referrer", T.StringType()),
        T.StructField("location", T.StringType()),
    ]
)

_ROUTED_VIEWS = {
    "pages": ("page", PAGES_SCHEMA),
    "errors": ("error", ERRORS_SCHEMA),
    "redirects": ("redirect", REDIRECTS_SCHEMA),
}

# Materialized dimension tables (reference writer.py:22-43's global
# unique Component/Link rows): append-new-keys-only deltas per
# superstep — the MERGE upsert pattern (operators/dims.py). Both
# dimensions share ONE physical table keyed (kind, key) so each
# superstep pays a single upsert job; readers get per-kind views
# (kind is a partition column, so the views partition-prune).
DIMS_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # component|link
        T.StructField("key", T.StringType(), False),
    ]
)

_DIM_VIEWS = {
    "dim_components": ("component", "class_name"),
    "dim_links": ("link", "href"),
}

_DELTA_SCHEMAS = {
    "seen": SEEN_SCHEMA,
    "dims": DIMS_SCHEMA,
}

DELTA_TABLES = ("routed", "seen", "dims")
SNAPSHOT_TABLES = ("frontier",)


def build_spark(
    app_name: str = "website-indexer-spark",
    master: Optional[str] = None,
    shuffle_partitions: int = 32,
    extra_conf: Optional[Dict[str, str]] = None,
) -> SparkSession:
    """Session builder with the engine's required configs: AQE (runtime
    coalescing + skew-join splitting), Arrow with bounded batches for
    multi-MB html blobs."""
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
        "spark.sql.session.timeZone": "UTC",
        "spark.ui.enabled": "false",
        # v2 commit: tasks move outputs into place at task commit, so
        # job commit is O(1) instead of a serial driver-side rename
        # per file — the crawl writes 4 small deltas per superstep and
        # the rename fan-out was measurable fixed cost. Safe here: the
        # manifest marker (not the output dir) is the commit point, so
        # a torn v2 write is invisible exactly like a torn v1 write.
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    }
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


class TableBackend:
    """The physical table layer behind CrawlStore: how superstep
    deltas are written, committed atomically, and scanned back. This
    is exactly the seam where a real lakehouse format drops in — the
    parquet-manifest implementation below emulates Iceberg snapshot
    semantics on bare files; ``IcebergBackend`` maps the same calls
    onto genuine Iceberg operations (needs the runtime jars, absent
    in this sandbox — see its docstring)."""

    def write_delta(
        self, name: str, df: DataFrame, superstep: int, partition_by=None
    ) -> None:
        raise NotImplementedError

    def read_table(self, name: str, schema: T.StructType) -> DataFrame:
        """All committed rows of a logical table."""
        raise NotImplementedError

    def read_snapshot(
        self, name: str, superstep: int, schema: T.StructType
    ) -> DataFrame:
        """One superstep's full snapshot of a SNAPSHOT_TABLES table."""
        raise NotImplementedError

    def footer_counts(self, name: str, superstep: int) -> Dict[str, int]:
        raise NotImplementedError

    def commit(self, superstep: int, counters: dict) -> None:
        raise NotImplementedError

    def last_committed(self) -> int:
        raise NotImplementedError

    def read_manifest(self, superstep: int) -> dict:
        raise NotImplementedError

    def rollback_uncommitted(self) -> None:
        raise NotImplementedError

    def clear(self) -> None:
        raise NotImplementedError

    def compact_table(
        self, name: str, schema: T.StructType, partition_by=None, augment=None
    ) -> Dict[str, int]:
        """Rewrite a delta table's accumulated superstep files into one
        coalesced superstep (file-count maintenance — the Iceberg
        ``rewrite_data_files`` analogue). ``augment`` (df -> df)
        recomputes derived partition columns (e.g. the seen table's
        bucket) before the rewrite. Returns before/after counts."""
        raise NotImplementedError

    def bucketed_files(self, name: str) -> Dict[int, List[str]]:
        """Committed parquet files of ``name`` grouped by their
        ``bucket=B`` partition value — the storage-partitioned join's
        unit of work (Iceberg: per-bucket data files from the manifest)."""
        raise NotImplementedError

    def snapshot_bucket_files(
        self, name: str, superstep: int
    ) -> Dict[int, List[str]]:
        """One snapshot's parquet files grouped by ``bucket=`` dir
        ({} for a flat snapshot) — the frontier's storage-partitioned
        politeness selection reads these (Iceberg: the snapshot's
        per-bucket data files)."""
        raise NotImplementedError

    def bucketed_layout_ok(self, name: str) -> bool:
        """True iff EVERY committed parquet file of ``name`` sits under
        a ``bucket=`` partition dir — i.e. ``bucketed_files`` sees the
        whole committed table. A store written before the bucketed
        layout existed (flat superstep dirs) returns False and callers
        must fall back to the scanned anti-join / streamed MERGE, or
        run ``compact()`` (whose augment recomputes buckets) first —
        otherwise the storage-partitioned probe would silently forget
        those committed keys (ADVICE r3)."""
        raise NotImplementedError


class IcebergBackend(TableBackend):
    """Honest stub for running CrawlStore on real Apache Iceberg
    tables. Untestable here — the sandbox has no Iceberg runtime jars
    — so every call raises with the wiring a deployment needs:

    * session conf:
        spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
        spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.crawl.type=hadoop   (or hive/rest)
        spark.sql.catalog.crawl.warehouse=<shared-storage-root>
    * write_delta  -> df.writeTo(f"crawl.{name}").append() with the
      superstep as a partition column (days/bucket transforms on
      url_hash for the seen table)
    * commit       -> the append's snapshot commit IS the marker;
      counters land in snapshot summary properties
    * last_committed/rollback -> snapshot metadata + rollback_to
    * the dims MERGE delta (operators/dims.py) -> MERGE INTO
      crawl.dims USING delta ON kind,key WHEN NOT MATCHED THEN INSERT
    * compact_table -> CALL crawl.system.rewrite_data_files(
      table => 'crawl.<name>', options => map('target-file-size-bytes', ...))
      followed by expire_snapshots / remove_orphan_files
    """

    def __init__(self, spark: SparkSession, catalog: str = "crawl"):
        raise NotImplementedError(
            "IcebergBackend needs the Iceberg runtime jars "
            "(spark.jars.packages=org.apache.iceberg:iceberg-spark-"
            "runtime-...) and a configured spark.sql.catalog.<name>; "
            "neither is available in this environment. Use the default "
            "ParquetManifestBackend, which emulates the same snapshot-"
            "commit semantics on bare parquet."
        )

    # -- deployment wiring as PURE string emitters (VERDICT r3 #9):
    # nothing below needs jars, so the exact statements a deployment
    # would run are pinned by tests/test_iceberg_contract.py goldens
    # instead of trusted prose.

    _SQL_TYPES = {  # keyed by DataType.simpleString()
        "string": "STRING",
        "bigint": "BIGINT",
        "int": "INT",
        "timestamp": "TIMESTAMP",
        "binary": "BINARY",
        "array<string>": "ARRAY<STRING>",
    }

    # partition spec per logical table: superstep first (every reader
    # prunes on it), then the same layout keys ParquetManifestBackend
    # encodes as directories — bucket(N, ...) is Iceberg's native form
    # of the hash-bucketed seen/dims layout the storage-partitioned
    # anti-join/MERGE probes.
    _PARTITION_SPECS = {
        "routed": ("superstep", "record_type"),
        "seen": ("superstep", "bucket({seen_buckets}, url_hash)"),
        "dims": ("superstep", "kind", "bucket({dims_buckets}, key)"),
        # frontier: flat by default; run_crawl(frontier_buckets=...)
        # switches the snapshot to the host-bucketed layout that the
        # storage-partitioned politeness selection point-reads — in
        # Iceberg that is a native bucket(B, host) partition transform
        # (create_table_ddl emits it when frontier_buckets is given)
        "frontier": ("superstep",),
        # crawl_budgets: the per-run Crawl-delay override table,
        # bucket-ALIGNED with the frontier layout (same B, same host
        # key) so each politeness-selection task point-reads only its
        # own bucket's overrides; no superstep column — the table is
        # overwritten whole once per run
        "crawl_budgets": ("bucket({frontier_buckets}, host)",),
    }

    # tables that are per-run overwrite artifacts, not superstep deltas
    _NO_SUPERSTEP = {"crawl_budgets"}

    @classmethod
    def session_conf(
        cls,
        warehouse: str,
        catalog: str = "crawl",
        version: str = "1.10.0",
        catalog_type: str = "hadoop",
    ) -> Dict[str, str]:
        """The spark-submit --conf set that activates this backend."""
        return {
            "spark.jars.packages": (
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:"
                + version
            ),
            f"spark.sql.catalog.{catalog}": (
                "org.apache.iceberg.spark.SparkCatalog"
            ),
            f"spark.sql.catalog.{catalog}.type": catalog_type,
            f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        }

    @classmethod
    def create_table_ddl(
        cls,
        name: str,
        schema: T.StructType,
        catalog: str = "crawl",
        seen_buckets: int = SEEN_BUCKETS,
        dims_buckets: int = DIMS_BUCKETS,
        frontier_buckets: Optional[int] = None,
    ) -> str:
        """CREATE TABLE for one logical table, with the superstep as a
        partition column (added to the schema — in the parquet layout
        it is a directory, in Iceberg a real column; per-run overwrite
        tables like crawl_budgets carry no superstep).

        ``frontier_buckets`` activates the host-bucketed frontier
        snapshot layout (the politeness_select_bucketed work units) as
        a native bucket(B, host) transform, and is REQUIRED for
        crawl_budgets — the override table must share the frontier's
        exact bucket function or the point-reads mis-route."""
        cols = [
            f"  {f.name} {cls._SQL_TYPES[f.dataType.simpleString()]}"
            + ("" if f.nullable else " NOT NULL")
            for f in schema.fields
        ]
        if name not in cls._NO_SUPERSTEP:
            cols.append("  superstep INT NOT NULL")
        spec_parts = cls._PARTITION_SPECS[name]
        if name == "frontier" and frontier_buckets:
            spec_parts = ("superstep", f"bucket({int(frontier_buckets)}, host)")
        if name == "crawl_budgets" and not frontier_buckets:
            raise ValueError(
                "crawl_budgets is bucket-aligned with the frontier "
                "layout: pass frontier_buckets=<same B as the frontier>"
            )
        spec = ", ".join(
            p.format(
                seen_buckets=seen_buckets,
                dims_buckets=dims_buckets,
                frontier_buckets=frontier_buckets,
            )
            for p in spec_parts
        )
        return (
            f"CREATE TABLE IF NOT EXISTS {catalog}.{name} (\n"
            + ",\n".join(cols)
            + f"\n) USING iceberg\nPARTITIONED BY ({spec})"
        )

    @classmethod
    def dims_merge_sql(cls, catalog: str = "crawl") -> str:
        """The MERGE that replaces dim_upsert_delta* on Iceberg: the
        engine computes the same append-only delta, Iceberg enforces
        insert-if-absent transactionally."""
        return (
            f"MERGE INTO {catalog}.dims t\n"
            "USING dims_delta s\n"
            "ON t.kind = s.kind AND t.key = s.key\n"
            "WHEN NOT MATCHED THEN INSERT *"
        )

    @classmethod
    def compact_sql(
        cls,
        name: str,
        catalog: str = "crawl",
        target_file_size_bytes: int = 512 * 1024 * 1024,
    ) -> str:
        """compact_table's Iceberg form (rewrite_data_files), followed
        by snapshot expiry a deployment schedules separately."""
        return (
            f"CALL {catalog}.system.rewrite_data_files(\n"
            f"  table => '{catalog}.{name}',\n"
            "  options => map('target-file-size-bytes', "
            f"'{target_file_size_bytes}'))"
        )

    @classmethod
    def expire_snapshots_sql(
        cls, name: str, catalog: str = "crawl", retain_last: int = 10
    ) -> str:
        return (
            f"CALL {catalog}.system.expire_snapshots(\n"
            f"  table => '{catalog}.{name}', retain_last => {retain_last})"
        )

    @classmethod
    def rebucket_sql(
        cls,
        name: str,
        key: str,
        old_buckets: int,
        new_buckets: int,
        catalog: str = "crawl",
    ) -> list:
        """CrawlStore.rebucket's Iceberg form: partition specs are
        metadata, so changing the bucket count is REPLACE PARTITION
        FIELD (new writes take the new spec immediately) followed by
        rewrite_data_files to migrate the existing files — the same
        two phases the parquet emulation performs as a full bucketed
        rewrite, except Iceberg needs no reader downtime (old files
        stay readable under the old spec until rewritten)."""
        return [
            (
                f"ALTER TABLE {catalog}.{name} REPLACE PARTITION FIELD "
                f"bucket({int(old_buckets)}, {key}) "
                f"WITH bucket({int(new_buckets)}, {key})"
            ),
            cls.compact_sql(name, catalog=catalog),
        ]

    @classmethod
    def rollback_sql(
        cls, name: str, snapshot_id: int, catalog: str = "crawl"
    ) -> str:
        """rollback_uncommitted's Iceberg form: snapshots ARE the
        manifests, so rolling back to the last good snapshot is the
        whole recovery story."""
        return (
            f"CALL {catalog}.system.rollback_to_snapshot("
            f"'{catalog}.{name}', {snapshot_id})"
        )


class ParquetManifestBackend(TableBackend):
    """Superstep-partitioned parquet + JSON manifest commit markers
    (the module docstring's layout). The only working backend in this
    sandbox; semantics mirror Iceberg snapshots."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # --- manifests ------------------------------------------------
    def _manifest_path(self, superstep: int) -> str:
        return os.path.join(self.root, "manifests", f"{superstep}.json")

    def last_committed(self) -> int:
        """Highest committed superstep, or -1 when none."""
        mdir = os.path.join(self.root, "manifests")
        steps = [
            int(f[:-5])
            for f in os.listdir(mdir)
            if f.endswith(".json") and f[:-5].isdigit()
        ]
        return max(steps) if steps else -1

    def read_manifest(self, superstep: int) -> dict:
        with open(self._manifest_path(superstep)) as f:
            return json.load(f)

    # --- writes ---------------------------------------------------
    def write_delta(
        self, name: str, df: DataFrame, superstep: int, partition_by=None
    ) -> None:
        path = os.path.join(self.root, name, f"superstep={superstep}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

    def footer_counts(self, name: str, superstep: int) -> Dict[str, int]:
        """Row counts for a just-written superstep delta straight from
        the parquet footers — metadata reads, NO Spark job. Returns
        counts per partition-directory value (e.g. record_type=page)
        under the superstep dir; key '' holds unpartitioned files'
        rows. The driver-side analogue of Iceberg snapshot summaries."""
        import pyarrow.parquet as pq

        base = os.path.join(self.root, name, f"superstep={superstep}")
        counts: Dict[str, int] = {}
        for dirpath, _dirs, files in os.walk(base):
            rel = os.path.relpath(dirpath, base)
            # key on the FIRST partition level (record_type / kind);
            # deeper levels (the dims/seen hash buckets) aggregate up
            part = ""
            first = rel.split(os.sep)[0]
            if "=" in first:
                part = first.split("=", 1)[1]
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                n = pq.ParquetFile(os.path.join(dirpath, fname)).metadata.num_rows
                counts[part] = counts.get(part, 0) + n
        return counts

    def delta_files(self, superstep: int) -> Dict[str, Dict[str, int]]:
        """Per-partition lineage for a just-written superstep: every
        data file each delta table produced, with its footer row count
        — {table: {relative/path.parquet: rows}}. Driver-side parquet
        metadata reads only (no Spark job), the manifest-file analogue
        of an Iceberg snapshot's data-file list."""
        import pyarrow.parquet as pq

        out: Dict[str, Dict[str, int]] = {}
        for name in DELTA_TABLES + SNAPSHOT_TABLES:
            base = os.path.join(self.root, name, f"superstep={superstep}")
            if not os.path.isdir(base):
                continue
            files: Dict[str, int] = {}
            for dirpath, _dirs, fnames in os.walk(base):
                for fname in fnames:
                    if not fname.endswith(".parquet"):
                        continue
                    full = os.path.join(dirpath, fname)
                    files[os.path.relpath(full, base)] = pq.ParquetFile(
                        full
                    ).metadata.num_rows
            if files:
                out[name] = files
        return out

    def commit(self, superstep: int, counters: dict) -> None:
        """Write the manifest LAST — it is the commit marker. Torn
        superstep directories without a manifest are invisible to
        readers and get overwritten on resume.

        Besides the aggregate counters, the manifest records the
        superstep's per-partition lineage (``files``: every data file
        written, with row counts — see delta_files). It is a lineage
        LOG of what this commit produced, not the live file listing:
        compaction later rewrites old supersteps' data into one
        coalesced superstep without editing history (Iceberg keeps old
        snapshots' manifests the same way)."""
        manifest = {
            "superstep": superstep,
            "counters": counters,
            "files": self.delta_files(superstep),
        }
        tmp = self._manifest_path(superstep) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path(superstep))

    def clear(self) -> None:
        """Wipe all table + manifest state (fresh-run init)."""
        for name in DELTA_TABLES + SNAPSHOT_TABLES + ("manifests",):
            tdir = os.path.join(self.root, name)
            if os.path.isdir(tdir):
                shutil.rmtree(tdir)
        os.makedirs(os.path.join(self.root, "manifests"), exist_ok=True)

    def rollback_uncommitted(self) -> None:
        """Drop superstep dirs newer than the last committed manifest;
        also finish/abort any compaction a crash interrupted."""
        last = self.last_committed()
        for name in DELTA_TABLES + SNAPSHOT_TABLES:
            tdir = os.path.join(self.root, name)
            if not os.path.isdir(tdir):
                continue
            self.recover_compaction(name)
            for entry in os.listdir(tdir):
                if entry.startswith("superstep="):
                    step = int(entry.split("=", 1)[1])
                    if step > last:
                        shutil.rmtree(os.path.join(tdir, entry))

    # --- compaction (rewrite_data_files analogue) -------------------
    def _compaction_dirs(self, name: str):
        tdir = os.path.join(self.root, name)
        return (
            tdir,
            os.path.join(tdir, ".compacting"),
            os.path.join(tdir, ".compacted_ready"),
        )

    def _table_files(self, name: str) -> int:
        tdir = os.path.join(self.root, name)
        n = 0
        for dirpath, _dirs, files in os.walk(tdir):
            if ".compact" in dirpath:
                continue
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    def recover_compaction(self, name: str) -> None:
        """Finish or abort a compaction interrupted by a crash:
        a ``.compacted_ready`` dir is a committed rewrite (its
        _COMPACTION.json names the covered supersteps) — finish the
        swap; a bare ``.compacting`` dir is an incomplete write —
        drop it. Mirrors rollback_uncommitted's marker discipline."""
        tdir, tmp, ready = self._compaction_dirs(name)
        if os.path.isdir(ready):
            marker = os.path.join(ready, "_COMPACTION.json")
            if os.path.exists(marker):
                with open(marker) as f:
                    upto = json.load(f)["upto"]
            else:
                # marker-less ready dir (legacy crash shape): the old
                # superstep dirs covered by the rewrite may already be
                # gone, so the only safe target is the last committed
                # manifest — the rewrite never covers uncommitted steps.
                upto = self.last_committed()
            self._finish_compaction(name, upto)
        elif os.path.isdir(tmp):
            shutil.rmtree(tmp)
        else:
            # a crash between the dest rename and the marker delete
            # leaves a stray _COMPACTION.json inside the final
            # superstep dir; Spark ignores _-prefixed files, but clean
            # it so the invariant "no markers outside .compacted_ready"
            # holds for the next compaction.
            if os.path.isdir(tdir):
                for entry in os.listdir(tdir):
                    if entry.startswith("superstep="):
                        stray = os.path.join(tdir, entry, "_COMPACTION.json")
                        if os.path.exists(stray):
                            os.remove(stray)

    def _finish_compaction(self, name: str, upto: int) -> None:
        # Order matters for crash safety: rename the ready dir into
        # place FIRST (marker still inside — Spark ignores _-prefixed
        # files in parquet dirs), delete the marker LAST. A crash at
        # any point leaves either a marker-bearing .compacted_ready
        # (recover re-runs this) or a committed superstep dir with at
        # worst a stray marker (recover cleans it) — never a
        # marker-less ready dir with the old deltas already deleted.
        tdir, _tmp, ready = self._compaction_dirs(name)
        for entry in os.listdir(tdir):
            if entry.startswith("superstep="):
                step = int(entry.split("=", 1)[1])
                if step <= upto:
                    shutil.rmtree(os.path.join(tdir, entry))
        dest = os.path.join(tdir, f"superstep={upto}")
        os.rename(ready, dest)  # the swap point
        marker = os.path.join(dest, "_COMPACTION.json")
        if os.path.exists(marker):
            os.remove(marker)

    def bucketed_files(self, name: str) -> Dict[int, List[str]]:
        """Committed parquet files grouped by ``bucket=B`` dir value.
        Driver-side listing of the committed superstep dirs (the
        manifest-file analogue of Iceberg's per-bucket data-file list);
        files under uncommitted supersteps are invisible, matching
        read_table."""
        tdir = os.path.join(self.root, name)
        last = self.last_committed()
        out: Dict[int, List[str]] = {}
        if not os.path.isdir(tdir):
            return out
        for entry in sorted(os.listdir(tdir)):
            if not entry.startswith("superstep="):
                continue
            if int(entry.split("=", 1)[1]) > last:
                continue
            base = os.path.join(tdir, entry)
            for dirpath, _dirs, files in os.walk(base):
                marker = os.path.basename(dirpath)
                if not marker.startswith("bucket="):
                    continue
                b = int(marker.split("=", 1)[1])
                for fname in files:
                    if fname.endswith(".parquet"):
                        out.setdefault(b, []).append(
                            os.path.join(dirpath, fname)
                        )
        return out

    def snapshot_bucket_files(
        self, name: str, superstep: int
    ) -> Dict[int, List[str]]:
        """ONE superstep snapshot's parquet files grouped by their
        ``bucket=B`` dir value ({} when that snapshot was written
        flat). Unlike bucketed_files this does not require committed-
        ness — the crawl loop reads the snapshot it just wrote, inside
        the same superstep transaction (a crash before the manifest
        rolls the whole dir back)."""
        base = os.path.join(self.root, name, f"superstep={superstep}")
        out: Dict[int, List[str]] = {}
        if not os.path.isdir(base):
            return out
        for dirpath, _dirs, files in os.walk(base):
            marker = os.path.basename(dirpath)
            if not marker.startswith("bucket="):
                continue
            b = int(marker.split("=", 1)[1])
            for fname in files:
                if fname.endswith(".parquet"):
                    out.setdefault(b, []).append(os.path.join(dirpath, fname))
        return out

    def bucketed_layout_ok(self, name: str) -> bool:
        tdir = os.path.join(self.root, name)
        last = self.last_committed()
        if not os.path.isdir(tdir):
            return True  # empty table: vacuously bucketed
        for entry in os.listdir(tdir):
            if not entry.startswith("superstep="):
                continue
            if int(entry.split("=", 1)[1]) > last:
                continue
            base = os.path.join(tdir, entry)
            for dirpath, _dirs, files in os.walk(base):
                if not any(f.endswith(".parquet") for f in files):
                    continue
                rel = os.path.relpath(dirpath, base)
                if not any(
                    seg.startswith("bucket=") for seg in rel.split(os.sep)
                ):
                    return False
        return True

    def compact_table(
        self, name: str, schema: T.StructType, partition_by=None, augment=None
    ) -> Dict[str, int]:
        """Merge all committed superstep deltas of `name` into one
        rewritten ``superstep=<last>`` directory. A crawl writes one
        delta dir per superstep, so a 10^5-superstep run accumulates
        10^5 directories — the classic small-file problem; this is the
        offline maintenance pass (Iceberg rewrite_data_files) that
        keeps scan planning O(files-after), run between crawls like
        `manage clean`. Crash-safe: the rewritten data lands in a
        ``.compacted_ready`` dir (the commit marker) before any old
        delta is deleted; `recover_compaction` finishes a torn swap."""
        upto = self.last_committed()
        self.recover_compaction(name)
        tdir, tmp, ready = self._compaction_dirs(name)
        if upto < 0 or not os.path.isdir(tdir):
            return {"files_before": 0, "files_after": 0, "upto": upto}
        files_before = self._table_files(name)
        merged = self.read_table(name, schema)
        if augment is not None:
            merged = augment(merged)
        # one output file per partition value (or one total): delta
        # tables are narrow; at deployment scale use Iceberg's
        # target-file-size option instead of coalesce(1)
        writer = merged.coalesce(1).write.mode("overwrite")
        if partition_by:
            writer = merged.repartition(*partition_by).write.mode(
                "overwrite"
            ).partitionBy(*partition_by)
        writer.parquet(tmp)
        with open(os.path.join(tmp, "_COMPACTION.json"), "w") as f:
            json.dump({"upto": upto}, f)
        os.rename(tmp, ready)  # the commit point
        self._finish_compaction(name, upto)
        return {
            "files_before": files_before,
            "files_after": self._table_files(name),
            "upto": upto,
        }

    # --- reads ----------------------------------------------------
    def read_table(self, name: str, schema: T.StructType) -> DataFrame:
        tdir = os.path.join(self.root, name)
        if not os.path.isdir(tdir) or not any(
            e.startswith("superstep=") for e in os.listdir(tdir)
        ):
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema).option("basePath", tdir).parquet(
            tdir + "/superstep=*"
        )
        # only committed supersteps are visible (partition-pruned scan);
        # project to the logical schema — physical partition columns
        # (superstep, the seen table's bucket) stay in the layout
        return df.filter(F.col("superstep") <= self.last_committed()).select(
            *[f.name for f in schema.fields]
        )

    def read_snapshot(
        self, name: str, superstep: int, schema: T.StructType
    ) -> DataFrame:
        path = os.path.join(self.root, name, f"superstep={superstep}")
        return self.spark.read.schema(schema).parquet(path)


class CrawlStore:
    """Superstep-versioned table store with atomic manifest commits.
    All physical I/O goes through a ``TableBackend`` (default: the
    parquet-manifest emulation; an Iceberg deployment swaps the
    backend, not this class). The crawl-record JSON and the logical
    views (pages/errors/redirects out of routed; dim_components/
    dim_links out of dims) live here, above the backend."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        backend: Optional[TableBackend] = None,
        seen_buckets: Optional[int] = None,
        dims_buckets: Optional[int] = None,
    ):
        self.spark = spark
        self.root = root
        self.backend = backend or ParquetManifestBackend(spark, root)
        self._init_meta(seen_buckets, dims_buckets)

    # --- store meta (physical-layout config) -----------------------
    # The bucket counts are LAYOUT, not session config: a probe run
    # with a different count than the files were written with silently
    # mis-buckets. So they are fixed at store creation, persisted in
    # store_meta.json, and validated on every open.
    def _meta_file(self) -> str:
        return os.path.join(self.root, "store_meta.json")

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, self._meta_file())
        self._meta = meta

    def _init_meta(
        self, seen_buckets: Optional[int], dims_buckets: Optional[int]
    ) -> None:
        path = self._meta_file()
        if os.path.exists(path):
            with open(path) as f:
                meta = json.load(f)
            for arg, key in (
                (seen_buckets, "seen_buckets"),
                (dims_buckets, "dims_buckets"),
            ):
                if arg is not None and arg != meta.get(key):
                    raise ValueError(
                        f"{key} mismatch: store at {self.root} was "
                        f"created with {key}={meta.get(key)} (physical "
                        f"layout), got {arg}. Re-bucket with "
                        f"CrawlStore.rebucket(), which rewrites the "
                        f"layout via compaction."
                    )
            self._meta = meta
            return
        if self.backend.last_committed() >= 0:
            # legacy store (committed data, no meta): its layout was
            # written with the module defaults — an explicit differing
            # count would mis-bucket the probe
            for arg, key, default in (
                (seen_buckets, "seen_buckets", SEEN_BUCKETS),
                (dims_buckets, "dims_buckets", DIMS_BUCKETS),
            ):
                if arg is not None and arg != default:
                    raise ValueError(
                        f"store at {self.root} predates store_meta.json "
                        f"and its layout used the default {key}="
                        f"{default}; cannot open with {key}={arg} — "
                        f"open with the default, then rebucket()."
                    )
            seen_buckets, dims_buckets = SEEN_BUCKETS, DIMS_BUCKETS
        self._write_meta(
            {
                "layout_version": 2,
                "seen_buckets": int(seen_buckets or SEEN_BUCKETS),
                "dims_buckets": int(dims_buckets or DIMS_BUCKETS),
            }
        )

    @property
    def seen_buckets(self) -> int:
        return int(self._meta["seen_buckets"])

    @property
    def dims_buckets(self) -> int:
        return int(self._meta["dims_buckets"])

    def bucketed_path_available(self, name: str) -> bool:
        """Whether the storage-partitioned fast path may be used for
        ``name``: False while a rebucket is pending (counts in meta may
        not match files on disk yet) or when any committed file sits
        outside a bucket= dir (legacy flat layout). Callers fall back
        to the scanned anti-join / streamed MERGE — exact either way,
        only the physical strategy differs."""
        pending = self._meta.get("rebucket_pending") or []
        if name in pending:
            return False
        return self.backend.bucketed_layout_ok(name)

    def rebucket(
        self,
        seen_buckets: Optional[int] = None,
        dims_buckets: Optional[int] = None,
    ) -> Dict[str, Dict[str, int]]:
        """Change the physical bucket count(s) — a compaction rewrite.
        Crash-safe ordering: the new counts land in the meta FIRST
        together with a pending flag (which disables the bucketed fast
        paths), then each affected table is rewritten (compact's
        augment recomputes buckets from the new count), then the flag
        clears. A crash at any point leaves a store that is correct,
        merely slower, until rebucket()/compact() is re-run."""
        targets: Dict[str, int] = {}
        if seen_buckets is not None and seen_buckets != self.seen_buckets:
            targets["seen"] = int(seen_buckets)
        if dims_buckets is not None and dims_buckets != self.dims_buckets:
            targets["dims"] = int(dims_buckets)
        if not targets:
            return {}
        meta = dict(self._meta)
        for name, n in targets.items():
            meta[f"{name}_buckets"] = n
        meta["rebucket_pending"] = sorted(
            set(meta.get("rebucket_pending") or []) | set(targets)
        )
        self._write_meta(meta)
        results = self.compact(tables=sorted(targets))
        meta = dict(self._meta)
        meta.pop("rebucket_pending", None)
        self._write_meta(meta)
        return results

    # --- backend pass-throughs ------------------------------------
    def write_delta(
        self, name: str, df: DataFrame, superstep: int, partition_by=None
    ) -> None:
        self.backend.write_delta(name, df, superstep, partition_by)

    def footer_counts(self, name: str, superstep: int) -> Dict[str, int]:
        return self.backend.footer_counts(name, superstep)

    def seen_bucket_files(self) -> Dict[int, List[str]]:
        """The committed seen table's files grouped by hash bucket —
        the input of the storage-partitioned anti-join."""
        return self.backend.bucketed_files("seen")

    def commit(self, superstep: int, counters: dict) -> None:
        self.backend.commit(superstep, counters)

    def last_committed(self) -> int:
        return self.backend.last_committed()

    def read_manifest(self, superstep: int) -> dict:
        return self.backend.read_manifest(superstep)

    def manifests(self) -> List[dict]:
        return [self.read_manifest(k) for k in range(self.last_committed() + 1)]

    def rollback_uncommitted(self) -> None:
        self.backend.rollback_uncommitted()

    def _manifest_path(self, superstep: int) -> str:
        # exposed for crash-simulation tests (delete the marker)
        return self.backend._manifest_path(superstep)

    def clear(self) -> None:
        """Wipe all crawl state (fresh-run initialization): tables +
        manifests (backend), Bloom stripes, and the crawl record."""
        self.backend.clear()
        bloom_dir = os.path.join(self.root, "bloom")
        if os.path.isdir(bloom_dir):
            shutil.rmtree(bloom_dir)
        crawl_json = os.path.join(self.root, "crawl.json")
        if os.path.exists(crawl_json):
            os.remove(crawl_json)

    # --- logical views --------------------------------------------
    def read_all(self, name: str) -> DataFrame:
        """Read a logical table across all committed supersteps. The
        pages/errors/redirects views project out of the unified routed
        table (record_type partition column prunes the scan); the
        dim_components/dim_links views out of the dims table."""
        if name in _ROUTED_VIEWS:
            rtype, schema = _ROUTED_VIEWS[name]
            routed = self.backend.read_table("routed", ROUTED_SCHEMA)
            return routed.filter(F.col("record_type") == rtype).select(
                *[f.name for f in schema.fields]
            )
        if name in _DIM_VIEWS:
            kind, out_col = _DIM_VIEWS[name]
            dims = self.backend.read_table("dims", DIMS_SCHEMA)
            return dims.filter(F.col("kind") == kind).select(
                F.col("key").alias(out_col)
            )
        return self.backend.read_table(name, _DELTA_SCHEMAS[name])

    def read_frontier(self, superstep: int) -> DataFrame:
        return self.backend.read_snapshot("frontier", superstep, FRONTIER_SCHEMA)

    def frontier_bucket_files(self, superstep: int) -> Dict[int, List[str]]:
        """One frontier snapshot's files per host-bucket dir ({} when
        that snapshot is flat) — the storage-partitioned politeness
        selection's work units. Bucket counts are per-snapshot (each
        snapshot is rewritten whole, so a count change between runs
        cannot mix layouts the way the delta tables could)."""
        return self.backend.snapshot_bucket_files("frontier", superstep)

    def compact(self, tables=None) -> Dict[str, Dict[str, int]]:
        """File-count maintenance over the delta tables (one delta dir
        per superstep accumulates into the small-file problem at
        10^5-superstep scale). Offline op — run between crawls, like
        `manage clean`. Returns per-table before/after file counts."""
        results: Dict[str, Dict[str, int]] = {}
        for name in tables or DELTA_TABLES:
            augment = None
            if name == "routed":
                schema, pb = ROUTED_SCHEMA, ["record_type"]
            elif name == "dims":
                # preserve the kind + hash-bucket layout (bucket is
                # derived, so recompute it through the rewrite with the
                # STORE's configured count — this is also how rebucket()
                # and legacy flat-layout repair materialize)
                nb = self.dims_buckets
                schema, pb = _DELTA_SCHEMAS[name], ["kind", "bucket"]
                augment = lambda df, nb=nb: df.withColumn(  # noqa: E731
                    "bucket",
                    F.pmod(F.xxhash64("kind", "key"), F.lit(nb)),
                )
            else:
                # seen: preserve the hash-bucketed layout through the
                # rewrite (bucket is derived, so recompute it)
                nb = self.seen_buckets
                schema, pb = _DELTA_SCHEMAS[name], ["bucket"]
                augment = lambda df, nb=nb: df.withColumn(  # noqa: E731
                    "bucket", F.pmod(F.col("url_hash"), F.lit(nb))
                )
            results[name] = self.backend.compact_table(
                name, schema, partition_by=pb, augment=augment
            )
        return results

    # --- crawl record (models.py:19-52 analogue) -------------------
    def write_crawl_record(self, record: dict) -> None:
        tmp = os.path.join(self.root, "crawl.json.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f, indent=2, sort_keys=True, default=str)
        os.replace(tmp, os.path.join(self.root, "crawl.json"))

    def read_crawl_record(self) -> Optional[dict]:
        path = os.path.join(self.root, "crawl.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)


def load_web_pages(spark: SparkSession, path: str) -> DataFrame:
    """Load a web_pages input table (input_hint shape), defaulting the
    auxiliary response-metadata columns when absent."""
    df = spark.read.parquet(path)
    cols = set(df.columns)
    if "status_code" not in cols:
        df = df.withColumn("status_code", F.lit(200))
    if "location" not in cols:
        df = df.withColumn("location", F.lit(None).cast("string"))
    if "content_type" not in cols:
        df = df.withColumn("content_type", F.lit("text/html"))
    return df
