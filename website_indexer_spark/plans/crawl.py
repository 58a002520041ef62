"""The BFS superstep crawl driver (SURVEY.md §3.1 rebuild / §4.3).

One superstep = one DataFrame job wave:

    frontier_k --politeness window--> selected
             --max_pages ordered cutoff--> requested (=> seen delta)
             --lookup join web_pages--> fetched
             --route--> errors / redirects / on-host html
             --extract pandas UDF--> pages delta
             --explode links + canonicalize + policy filter--> new links
             --dedup (delta, deferred, seen)--> enqueued
             --ordered seq assignment--> frontier_{k+1} (+ deferred)
             --checkpoint deltas + manifest--> commit

Reference semantics reproduced (citations into /root/reference/):
* BFS by level, FIFO within level, deterministic total order
  (depth, discovery_seq) — wpull --recursive --level
  (crawler/wpull/crawler.py:29-51)
* request-once (plugin.py:104-106), skip-list (108-110), one-hop
  off-domain (112-119), HEAD conversion (121-126), filename filter
  (129-132), external-site unwrap (134-157), querystring policy
  (159-162), max_pages (88-90)
* response routing (plugin.py:170-281): missing row / NULL html =>
  Error(status_code=0); >=400 => Error; 300-399 => Redirect with
  cross-host locations not followed (236-245); external 200 dropped;
  on-host 200 text/html parsed; no-title page dropped entirely
* crawl lifecycle record (models.py:19-52) + per-superstep lineage
  manifests with counters (the north_rule checkpoint/resume contract)

Scale design: the frontier/seen join shuffles on xxhash64(url)
(uniform), the politeness window partitions by host with optional
deterministic salting for mega-hosts, and every superstep's plan is
cut at the checkpoint (no lineage blowup across iterations).
"""

from __future__ import annotations

import argparse
import time
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from website_indexer_spark.functions.udfs import (
    canonicalize_links_udf,
    extract_udf,
    with_url_parts,
)
from website_indexer_spark.functions.urltools import (
    canonicalize_url,
    hostname_with_port,
    unwrap_external_site,
)
from website_indexer_spark.operators.frontier import (
    URL_HASH,
    anti_join_seen,
    assign_ordered_seq,
    build_bloom,
    politeness_select,
)
from website_indexer_spark.operators.policy import (
    CrawlPolicy,
    accept_url_filter,
    robots_filter,
)
from website_indexer_spark.sources.tables import (
    FRONTIER_SCHEMA,
    CrawlStore,
    build_spark,
    load_web_pages,
)


@dataclass
class CrawlResult:
    supersteps: int
    pages: int
    errors: int
    redirects: int
    requested: int
    store: CrawlStore


def _seed_frontier(spark: SparkSession, seed_url: str, start_host: str) -> DataFrame:
    canon = canonicalize_url(seed_url)
    if canon is None:
        raise ValueError(
            f"seed URL is not a valid absolute http(s) URL: {seed_url!r}"
        )
    canon = unwrap_external_site(canon, start_host)
    row = [(canon, hostname_with_port(canon), 0, 0, canon, start_host, "GET")]
    return spark.createDataFrame(row, FRONTIER_SCHEMA)


def run_crawl(
    spark: SparkSession,
    web_pages: DataFrame,
    seed_url: str,
    out_dir: str,
    *,
    max_pages: int = 0,
    depth_cap: int = 0,
    policy: Optional[CrawlPolicy] = None,
    robots: Optional[DataFrame] = None,
    host_budget: Optional[int] = None,
    salt_buckets: int = 1,
    use_bloom: bool = False,
    bloom_bits: int = 1 << 23,
    resume: bool = False,
    crawl_id: int = 1,
    max_supersteps: int = 1000,
) -> CrawlResult:
    policy = policy or CrawlPolicy(start_url=seed_url, max_pages=max_pages, depth=depth_cap)
    start_host = hostname_with_port(seed_url)
    store = CrawlStore(spark, out_dir)

    # page timestamps are deterministic: the input table's warc_ts
    # (B11 deterministic mode, SURVEY.md §2.B)
    web = web_pages.select(
        "url", "warc_ts", "html", "status_code", "location", "content_type"
    )

    requested_total = 0
    seq_base = 1  # seed took seq 0

    if resume and store.last_committed() >= 0:
        store.rollback_uncommitted()
        last = store.last_committed()
        frontier = store.read_frontier(last)
        for m in store.manifests():
            requested_total += m["counters"]["requested"]
            seq_base = max(seq_base, m["counters"]["seq_base"])
        k = last + 1
    else:
        # a FRESH run must not see a previous crawl's state: stale
        # manifests would scope reads to old supersteps and the old
        # seen set would anti-join the new frontier away
        store.clear()
        frontier = _seed_frontier(spark, seed_url, start_host)
        k = 0
        store.write_crawl_record(
            {
                "crawl_id": crawl_id,
                "status": "Started",
                "config": {
                    "start_url": seed_url,
                    "max_pages": max_pages,
                    "depth": depth_cap,
                },
                "started": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )

    totals = {"pages": 0, "errors": 0, "redirects": 0}
    for m in store.manifests() if resume else []:
        for key in totals:
            totals[key] += m["counters"][key]

    while k < max_supersteps:
        frontier = frontier.persist()
        frontier_count = frontier.count()
        if frontier_count == 0:
            break
        if max_pages and requested_total >= max_pages:
            break

        # --- politeness budget (A11) + mega-host salting -----------
        selected, deferred = politeness_select(frontier, host_budget, salt_buckets)

        # --- max_pages ordered cutoff (A10): reference counts every
        # requested URL in visit order; the cutoff keeps the first
        # `remaining` rows in (depth, discovery_seq) order.
        if max_pages:
            remaining = max_pages - requested_total
            selected = (
                selected.orderBy("depth", "discovery_seq").limit(remaining)
            )

        selected = selected.persist()
        n_selected = selected.count()
        if n_selected == 0:
            frontier.unpersist()
            break
        requested_total += n_selected

        # --- seen delta: every selected URL is now "requested" ------
        seen_delta = selected.select(
            URL_HASH(F.col("url")).alias("url_hash"), "url"
        )

        # --- fetch-simulate: lookup join into web_pages (A13) -------
        fetched = selected.join(web, "url", "left")
        # status: missing row or NULL html with 200 => network error 0
        fetched = fetched.withColumn(
            "eff_status",
            F.when(F.col("status_code").isNull(), F.lit(0))
            .when(
                (F.col("status_code") == 200)
                & F.col("html").isNull()
                & F.col("location").isNull(),
                F.lit(0),
            )
            .otherwise(F.col("status_code")),
        ).persist()

        ts_col = F.coalesce(F.col("warc_ts"), F.current_timestamp())

        # --- route: errors (A14) ------------------------------------
        errors_delta = (
            fetched.filter(
                (F.col("eff_status") == 0) | (F.col("eff_status") >= 400)
            )
            .select(
                F.lit(crawl_id).alias("crawl_id"),
                ts_col.alias("timestamp"),
                "url",
                F.col("eff_status").cast("int").alias("status_code"),
                F.when(F.col("parent_url") != F.col("url"), F.col("parent_url"))
                .alias("referrer"),
            )
        )

        # --- route: redirects ---------------------------------------
        redirects_raw = fetched.filter(
            (F.col("eff_status") >= 300) & (F.col("eff_status") < 400)
        )
        redirects_delta = redirects_raw.select(
            F.lit(crawl_id).alias("crawl_id"),
            ts_col.alias("timestamp"),
            "url",
            F.col("eff_status").cast("int").alias("status_code"),
            F.when(F.col("parent_url") != F.col("url"), F.col("parent_url")).alias(
                "referrer"
            ),
            "location",
        )
        # follow same-host redirect locations (plugin.py:236-245):
        # cross-host locations are recorded but never enqueued. The
        # cross-host drop itself falls out of the one-hop gate (A5)
        # when the redirecting page is off-host, and of the canonical
        # host comparison otherwise. Locations may be relative —
        # resolve them against the redirecting URL with the same
        # canonicalization UDF as page links.
        redirect_follows = (
            redirects_raw.filter(F.col("location").isNotNull())
            .select(
                F.col("url").alias("parent_url"),
                F.col("host").alias("parent_host"),
                F.col("depth"),
                F.col("discovery_seq").alias("parent_seq"),
                F.explode(
                    canonicalize_links_udf(
                        F.col("url"),
                        F.array(F.col("location")),
                        F.lit(start_host),
                    )
                ).alias("url"),
            )
        )
        # "Don't follow redirects that don't point to the start
        # domain" (plugin.py:236-245) — unlike links, off-host
        # redirect locations are never even one-hop probed.
        redirect_follows = (
            with_url_parts(redirect_follows)
            .filter(F.col("host") == start_host)
            .select(
                "parent_url",
                "parent_host",
                "depth",
                "parent_seq",
                F.col("url").alias("raw_url"),
            )
        )

        # --- route: on-host 200 text/html => extract (A16) ----------
        ok200 = fetched.filter(
            (F.col("eff_status") >= 200) & (F.col("eff_status") < 300)
        )
        on_host_html = ok200.filter(
            (F.col("host") == start_host)
            & F.col("content_type").startswith("text/html")
            & F.col("html").isNotNull()
        )
        extracted = on_host_html.withColumn(
            "ex", extract_udf(F.col("html"), F.lit(start_host))
        ).persist()

        pages_delta = (
            extracted.filter(F.col("ex.title").isNotNull())
            .select(
                F.lit(crawl_id).alias("crawl_id"),
                ts_col.alias("timestamp"),
                "url",
                "depth",
                "discovery_seq",
                F.col("ex.title").alias("title"),
                F.col("ex.language").alias("language"),
                F.col("ex.text").alias("text"),
                F.decode(F.col("html"), "UTF-8").alias("html"),
                F.col("ex.links").alias("links"),
                F.col("ex.components").alias("components"),
            )
        )

        # --- harvest new frontier candidates ------------------------
        link_candidates = (
            extracted.filter(F.col("ex.title").isNotNull())
            .select(
                F.col("url").alias("parent_url"),
                F.col("host").alias("parent_host"),
                F.col("depth"),
                F.col("discovery_seq").alias("parent_seq"),
                F.explode(
                    canonicalize_links_udf(
                        F.col("url"), F.col("ex.links"), F.lit(start_host)
                    )
                ).alias("raw_url"),
            )
            .withColumn("depth", F.col("depth") + 1)
        )
        if depth_cap:
            link_candidates = link_candidates.filter(F.col("depth") <= depth_cap)

        candidates = link_candidates.select(
            "parent_url", "parent_host", "depth", "parent_seq", "raw_url"
        ).unionByName(
            redirect_follows.select(
                "parent_url", "parent_host", "depth", "parent_seq", "raw_url"
            )
        )
        candidates = candidates.withColumnRenamed("raw_url", "url")
        candidates = with_url_parts(candidates)

        accepted = accept_url_filter(candidates, start_host, policy)
        accepted = robots_filter(accepted, robots)

        # --- dedup: within delta, vs queued, vs seen (A3) ------------
        w_url = Window.partitionBy("url").orderBy("depth", "parent_seq", "parent_url")
        accepted = (
            accepted.withColumn("_rn", F.row_number().over(w_url))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        accepted = accepted.join(
            deferred.select("url"), "url", "left_anti"
        )
        seen_now = store.read_all("seen").select("url_hash").unionByName(
            seen_delta.select("url_hash")
        )
        bloom = None
        if use_bloom:
            bitmap = build_bloom(seen_now, bloom_bits)
            bloom = (spark, bitmap, bloom_bits)
        accepted = anti_join_seen(accepted, seen_now, bloom)

        # --- deterministic discovery order (§4.2.4) ------------------
        enqueued = assign_ordered_seq(
            accepted.select(
                "url",
                "host",
                "depth",
                "parent_url",
                "parent_host",
                "fetch_method",
                "parent_seq",
            ),
            ["depth", "parent_seq", "url"],
            start=seq_base,
        ).drop("parent_seq")

        next_frontier = deferred.select(*FRONTIER_SCHEMA.fieldNames()).unionByName(
            enqueued.select(*FRONTIER_SCHEMA.fieldNames())
        )

        # --- checkpoint: deltas then manifest (commit marker) --------
        store.write_delta("pages", pages_delta, k)
        store.write_delta("errors", errors_delta, k)
        store.write_delta("redirects", redirects_delta, k)
        store.write_delta("seen", seen_delta, k)
        store.write_delta("frontier", next_frontier, k)

        n_pages = store.spark.read.parquet(
            f"{store.root}/pages/superstep={k}"
        ).count()
        n_errors = store.spark.read.parquet(
            f"{store.root}/errors/superstep={k}"
        ).count()
        n_redirects = store.spark.read.parquet(
            f"{store.root}/redirects/superstep={k}"
        ).count()
        next_count_df = store.spark.read.parquet(
            f"{store.root}/frontier/superstep={k}"
        )
        n_enqueued = next_count_df.count()
        max_seq = next_count_df.agg(F.max("discovery_seq")).first()[0]
        seq_base = max(seq_base, (max_seq or 0) + 1)

        totals["pages"] += n_pages
        totals["errors"] += n_errors
        totals["redirects"] += n_redirects
        store.commit(
            k,
            {
                "requested": n_selected,
                "pages": n_pages,
                "errors": n_errors,
                "redirects": n_redirects,
                "enqueued": n_enqueued,
                "seq_base": seq_base,
                "frontier_in": frontier_count,
            },
        )

        frontier.unpersist()
        selected.unpersist()
        fetched.unpersist()
        extracted.unpersist()
        frontier = store.read_frontier(k)
        k += 1

    record = store.read_crawl_record() or {}
    record.update({"status": "Finished", "supersteps": k})
    store.write_crawl_record(record)
    return CrawlResult(
        supersteps=k,
        pages=totals["pages"],
        errors=totals["errors"],
        redirects=totals["redirects"],
        requested=requested_total,
        store=store,
    )


def main() -> None:  # pragma: no cover - CLI for spark-submit --py-files
    ap = argparse.ArgumentParser(description="BFS superstep crawler")
    ap.add_argument("--web-pages", required=True, help="parquet path of web_pages")
    ap.add_argument("--seed", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-pages", type=int, default=0)
    ap.add_argument("--depth", type=int, default=0)
    ap.add_argument("--host-budget", type=int, default=None)
    ap.add_argument("--salt-buckets", type=int, default=1)
    ap.add_argument("--bloom", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_spark(master=args.master)
    web = load_web_pages(spark, args.web_pages)
    result = run_crawl(
        spark,
        web,
        args.seed,
        args.out,
        max_pages=args.max_pages,
        depth_cap=args.depth,
        host_budget=args.host_budget,
        salt_buckets=args.salt_buckets,
        use_bloom=args.bloom,
        resume=args.resume,
    )
    print(
        f"crawl finished: supersteps={result.supersteps} pages={result.pages} "
        f"errors={result.errors} redirects={result.redirects} "
        f"requested={result.requested}"
    )


if __name__ == "__main__":  # pragma: no cover
    main()
