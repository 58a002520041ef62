"""CDX(J) capture index over the web_pages table — Common Crawl's
native *index* format, the companion to the WARC source
(sources/warc.py). An archive deployment reads WARCs in and publishes
a sorted CDXJ index out; this module is the "out" half.

Public format facts used here (pywb / OpenWayback / Common Crawl
cc-index docs):
* the index key is the SURT (Sort-friendly URI Reordering Transform)
  of the capture URL: lowercased host with dot-components reversed
  and comma-joined, default ports and a leading "www." dropped,
  ")" then the path, then the query with parameters sorted — so a
  lexicographic sort clusters captures by registered domain;
* the secondary key is the 14-digit UTC timestamp (yyyyMMddHHmmss);
* a CDXJ line is "<surt> <ts14> <JSON blob>" with the JSON carrying
  url / mime / status / digest / length;
* the published index is a set of individually sorted shards whose
  key ranges do not overlap (readers binary-search shard-locally).

The reference has no index format at all (its "index" is the Django
DB); this is engine surface the WARC half implies. Everything is
native Column expressions — the SURT transform is regexp + array ops,
no UDF — and the writer's global order comes from repartitionByRange
+ sortWithinPartitions: the planner samples range boundaries once,
each shard sorts locally, and no total-order single-task sort ever
runs (the 100 TB shape: shard count scales with the corpus; Spark's
rangepartitioning is exactly the non-overlapping-shards contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#@]*@)?([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def surt_key(url: Column) -> Column:
    """SURT form of a URL: 'com,example)/path?a=1&b=2' (host
    lowercased + reversed, www. and default ports dropped, query
    params sorted). Pure string/array expressions."""
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 2))
    host = F.regexp_extract(auth, r"^([^:]*)", 1)
    host = F.when(
        host.startswith("www."), F.substring(host, 5, 2_000_000)
    ).otherwise(host)
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    default_port = F.when(scheme == "http", F.lit("80")).when(
        scheme == "https", F.lit("443")
    ).otherwise(F.lit(""))
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(F.regexp_extract(url, _PATH_RE, 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(
            F.lit("?"), F.array_join(F.array_sort(F.split(query, r"&")), "&")
        )
    )
    return F.concat(rev_host, port_part, F.lit(")"), path, query_part)


def cdx_index(pages: DataFrame) -> DataFrame:
    """Capture-index rows from a web_pages-shaped table:
    (surt, ts14, url, mime, status_code, digest, length). digest is
    the md5 of the raw capture bytes (the real index uses sha1-b32;
    md5 is what this sandbox has on both engines — same role). One
    narrow projection; sorting is the writer's job."""
    return pages.select(
        surt_key(F.col("url")).alias("surt"),
        F.date_format(F.col("warc_ts"), "yyyyMMddHHmmss").alias("ts14"),
        "url",
        F.col("content_type").alias("mime"),
        "status_code",
        F.md5(F.col("html")).alias("digest"),
        F.octet_length(F.col("html")).cast("long").alias("length"),
    )


def write_cdxj(index: DataFrame, path: str, shards: int = 8) -> None:
    """Write sorted CDXJ shards: range-partition by (surt, ts14) so
    shard key ranges never overlap, sort within each shard, render
    one text line per capture. Reader contract: concatenating shards
    in partition order yields a globally sorted index."""
    lines = index.select(
        F.concat_ws(
            " ",
            F.col("surt"),
            F.col("ts14"),
            F.to_json(
                F.struct(
                    F.col("url"),
                    F.col("mime"),
                    F.col("status_code").cast("string").alias("status"),
                    F.col("digest"),
                    F.col("length").cast("string").alias("length"),
                )
            ),
        ).alias("value"),
        "surt",
        "ts14",
    )
    (
        lines.repartitionByRange(shards, "surt", "ts14")
        .sortWithinPartitions("surt", "ts14")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Parse CDXJ shards back to the index table (inverse of
    write_cdxj up to column types)."""
    raw = spark.read.text(path)
    surt = F.regexp_extract("value", r"^(\S+) ", 1)
    ts14 = F.regexp_extract("value", r"^\S+ (\d{14}) ", 1)
    blob = F.regexp_extract("value", r"^\S+ \d{14} (.*)$", 1)
    parsed = F.from_json(
        blob,
        "url string, mime string, status string, digest string, length string",
    )
    return raw.select(
        surt.alias("surt"),
        ts14.alias("ts14"),
        parsed.getField("url").alias("url"),
        parsed.getField("mime").alias("mime"),
        parsed.getField("status").cast("int").alias("status_code"),
        parsed.getField("digest").alias("digest"),
        parsed.getField("length").cast("long").alias("length"),
    )


def cdx_merge(published: DataFrame, increment: DataFrame) -> DataFrame:
    """Fold a new crawl increment's index rows into a published
    index — the standard archive maintenance operation (pywb's
    cdx-indexer merge / Common Crawl's per-dump index union). Pure
    relational: unionByName + dropDuplicates on the full capture
    identity (surt, ts14, digest) — a re-crawled capture that
    produced identical bytes at the identical second is one capture,
    anything else is history and is kept. The writer contract is
    unchanged: feed the result to ``write_cdxj`` and
    repartitionByRange re-establishes globally sorted,
    non-overlapping shards — merging never needs a total-order sort
    of the union, only the range writer's boundary sampling.

    Scale shape: one partial-aggregated exchange keyed by the
    capture identity (the dropDuplicates); both inputs stream
    through — no side is collected, broadcast, or assumed small."""
    return published.unionByName(increment).dropDuplicates(
        ["surt", "ts14", "digest"]
    )


def cdx_collapse(index: DataFrame) -> DataFrame:
    """Digest-collapse an index (pywb ``collapse=digest`` / Common
    Crawl dedup semantics): within each surt, in capture-time order,
    keep a row only when its digest differs from the immediately
    previous capture's — a run of unchanged content collapses to its
    first capture, and every content *change* is kept, so the
    collapsed index still reconstructs the page's full version
    history.

    Scale shape: ONE exchange keyed by surt, then lag() inside the
    partition — no Python, no second shuffle; per-surt capture counts
    are revisit-bounded (a crawl revisits a URL a few hundred times a
    year), so no in-partition skew at any corpus size.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("surt").orderBy("ts14")
    prev = F.lag("digest").over(w)
    return (
        index.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("digest")))
        .drop("_prev")
    )


def cdx_change_rate(index: DataFrame, now_epoch: int) -> DataFrame:
    """Per-URL change-frequency estimate + recrawl priority from a
    capture index — the revisit-scheduling half of an incremental
    crawler (the reference crawls once and stops; a deployment that
    keeps its index fresh must decide *which* URLs to refetch first).

    Estimator: Cho & Garcia-Molina 2003 ("Estimating frequency of
    change"), the bias-corrected Poisson MLE over m = n_captures - 1
    revisit intervals of which X = n_changes showed a digest change:

        lambda ~= -ln((m - X + 1/2) / (m + 1/2))   [changes/interval]

    emitted floor-quantized as integer milli-nats (``lambda_milli``)
    — the lm_logloss float protocol: the ln argument is an IEEE-exact
    ratio of small integers, so engines agree to ~1 ulp and a 1e-3
    floor bucket is deterministic in practice. A single capture
    (m = 0) yields lambda 0 — no evidence of change.

    Priority: expected number of missed changes since the last visit,
        lambda * (now - last_epoch) / mean_interval
    computed entirely in bigints (``lambda_milli * staleness * m div
    span``) so the ranking is byte-stable across engines. URLs never
    observed to change rank 0 regardless of staleness.

    Scale shape: ONE exchange keyed by surt — the lag() window and
    the per-surt aggregate share the same partitioning, so Catalyst
    reuses the exchange; per-surt capture counts are revisit-bounded
    (no in-partition skew at any corpus size) and the output is one
    row per URL.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("surt").orderBy("ts14")
    epoch = F.unix_timestamp(F.to_timestamp("ts14", "yyyyMMddHHmmss"))
    lagd = index.select(
        "surt",
        "ts14",
        "url",
        "digest",
        epoch.alias("_ep"),
        F.lag("digest").over(w).alias("_prev"),
    )
    changed = (
        F.col("_prev").isNotNull() & (F.col("_prev") != F.col("digest"))
    ).cast("long")
    per = lagd.groupBy("surt").agg(
        F.count("*").alias("n_captures"),
        F.sum(changed).alias("n_changes"),
        F.min("_ep").alias("first_epoch"),
        F.max("_ep").alias("last_epoch"),
        F.max_by("url", "ts14").alias("url"),
    )
    m = (F.col("n_captures") - F.lit(1)).cast("double")
    x = F.col("n_changes").cast("double")
    lam = F.floor(
        F.lit(-1000.0) * F.log((m - x + F.lit(0.5)) / (m + F.lit(0.5)))
    ).cast("long")
    staged = per.select(
        "surt",
        "url",
        "n_captures",
        "n_changes",
        "first_epoch",
        "last_epoch",
        lam.alias("lambda_milli"),
        (F.lit(int(now_epoch)) - F.col("last_epoch")).alias("_stale"),
        (F.col("last_epoch") - F.col("first_epoch")).alias("_span"),
    )
    priority = F.when(
        F.col("_span") > 0,
        F.expr(
            "lambda_milli * _stale * (n_captures - 1) div _span"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return staged.select(
        "surt",
        "url",
        "n_captures",
        "n_changes",
        "first_epoch",
        "last_epoch",
        "lambda_milli",
        priority.alias("priority"),
    )


def recrawl_topk(rates: DataFrame, k: int) -> DataFrame:
    """Top-``k`` URLs to refetch next by (priority desc, surt asc) —
    the frontier_prioritize shape: orderBy+limit compiles to
    TakeOrderedAndProject (per-task top-k heaps, only k rows per
    partition reach the merge; no global sort ever materializes)."""
    return rates.orderBy(
        F.col("priority").desc(), F.col("surt").asc()
    ).limit(int(k))


def cdx_latest(index: DataFrame) -> DataFrame:
    """Latest capture per surt (the wayback "most recent snapshot"
    query): row_number()==1 over (surt, ts14 desc). Spark folds the
    rank-1 predicate into WindowGroupLimit, which drops non-candidate
    rows BEFORE the exchange (map-side partial top-1) — so the
    shuffle carries one row per (surt, input partition), not the full
    capture history.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("surt").orderBy(F.col("ts14").desc())
    return (
        index.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
