"""Streaming crawl skin (SURVEY §2.A as a Structured Streaming sink):
a ``foreachBatch`` superstep that replays a frontier STREAM into the
same ``CrawlStore`` the batch driver writes — each micro-batch is one
crawl superstep (seen anti-join → fetch-simulate → extract → route →
delta append + manifest commit), built from the exact plan builders
``plans/crawl.py`` uses, so batch and stream produce byte-identical
page/error/redirect rows.

Where this fits: the batch driver owns BFS ordering (it must — step
k's frontier is derived from step k-1's pages). The streaming skin is
the *continuous-ingest* deployment shape: frontier waves arrive from
outside (a link-discovery service, a re-crawl scheduler, a replayed
frontier log) and the engine keeps crawling without a driver loop.

Consistency story, identical to batch resume:
* cross-batch dedup state IS the store's committed seen table (plus
  its Bloom/bucketed layouts) — no separate streaming state store to
  drift out of sync;
* exactly-once per superstep: deltas land under ``superstep=K`` first,
  the manifest commit is last. A batch that crashes mid-write leaves
  no manifest; on restart Structured Streaming replays the batch,
  ``rollback_uncommitted`` drops the torn delta, and the rewrite is
  idempotent. Re-delivered (at-least-once) frontier rows are swallowed
  by the seen anti-join.

Re-enqueue of harvested links is intentionally NOT wired back into the
stream source here (a self-feeding file-source loop is a demo trick,
not a deployment pattern); ``emit_discovered`` exposes the accepted
candidate harvest so an external queue can close the loop.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from website_indexer_spark.functions.urltools import hostname_with_port
from website_indexer_spark.operators.frontier import URL_HASH, anti_join_seen
from website_indexer_spark.operators.policy import CrawlPolicy
from website_indexer_spark.plans.crawl import (
    fetch_sim_join,
    harvest_candidates,
    route_and_extract,
    routed_projection,
    with_effective_status,
)
from website_indexer_spark.sources.tables import SEEN_BUCKETS, CrawlStore


def crawl_stream_step(
    web: DataFrame,
    out_dir: str,
    start_url: str,
    *,
    depth_cap: int = 0,
    policy: Optional[CrawlPolicy] = None,
    robots: Optional[DataFrame] = None,
    crawl_id: int = 1,
    emit_discovered: Optional[Callable[[DataFrame, int], None]] = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function. ``web`` is the fetch-sim
    lookup table (or swap a ``real_fetch`` wrapper at the fetched=
    line, same as the batch driver). ``emit_discovered(accepted_df,
    superstep)`` receives each batch's accepted, seen-deduped candidate
    harvest for external re-enqueue."""
    pol = policy or CrawlPolicy(start_url=start_url, depth=depth_cap)
    start_host = hostname_with_port(start_url)
    lookup = web.select(
        "url", "warc_ts", "html", "status_code", "location", "content_type"
    )

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        store = CrawlStore(spark, out_dir)
        store.rollback_uncommitted()  # replayed batch: drop torn delta
        k = store.last_committed() + 1

        seen = store.read_all("seen").select("url_hash")
        wave = anti_join_seen(batch_df, seen)
        # within-batch dedup: first observer in BFS order wins
        w = Window.partitionBy("url").orderBy("depth", "discovery_seq")
        wave = (
            wave.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .persist()
        )
        try:
            n = wave.count()
            if n == 0:
                return
            seen_delta = wave.select(
                URL_HASH(F.col("url")).alias("url_hash"), "url"
            )
            fetched, _ = fetch_sim_join(lookup, wave, n)
            fetched = with_effective_status(fetched)
            extracted = route_and_extract(fetched, start_host).persist()
            try:
                store.write_delta(
                    "routed",
                    routed_projection(extracted, crawl_id),
                    k,
                    partition_by=["record_type"],
                )
                store.write_delta(
                    "seen",
                    seen_delta.withColumn(
                        "bucket", F.pmod(F.col("url_hash"), F.lit(SEEN_BUCKETS))
                    ).coalesce(1),
                    k,
                    partition_by=["bucket"],
                )
                if emit_discovered is not None:
                    accepted = harvest_candidates(
                        extracted, start_host, pol, robots, depth_cap
                    )
                    accepted = anti_join_seen(
                        accepted, seen.unionByName(seen_delta.select("url_hash"))
                    )
                    emit_discovered(accepted, k)
                counts = store.footer_counts("routed", k)
                store.commit(
                    k,
                    {
                        "requested": n,
                        "pages": counts.get("page", 0),
                        "errors": counts.get("error", 0),
                        "redirects": counts.get("redirect", 0),
                        "stream_batch_id": batch_id,
                    },
                )
            finally:
                extracted.unpersist()
        finally:
            wave.unpersist()

    return step


def run_crawl_stream(
    frontier_stream: DataFrame,
    web: DataFrame,
    out_dir: str,
    start_url: str,
    checkpoint_dir: str,
    **step_kwargs,
):
    """Wire the step as a foreachBatch sink with availableNow
    semantics (drain everything queued, then stop). Returns the
    terminated StreamingQuery."""
    q = (
        frontier_stream.writeStream.foreachBatch(
            crawl_stream_step(web, out_dir, start_url, **step_kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


__all__ = ["crawl_stream_step", "run_crawl_stream"]
