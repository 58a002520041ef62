"""Two-level scaling evidence for the round-4 web-pipeline operators
(doc_pack, lm_logloss, host_filter) on a fat corpus.

At sf0.1 (5k docs) these finish in fixed-cost time, so — like the
token-stream operators (BENCH/BASELINE.md 'Round-4 late additions') —
they are measured on a 20x-replicated 100k-doc corpus: documents x
range(REPL), doc_id re-keyed to stay unique, written once to /tmp so
both parallelism levels read identical parquet. Methodology matches
the round's record: same session, warm run then min-of-2, busy-worker
probes bracketing the window.

Usage: python tools/scaling_newops.py [low high] [repl]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scaling_run import cpu_ceiling  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_fat_corpus(repl: int) -> str:
    out = f"/tmp/wi_fat_docs_x{repl}"
    # _emb is the last artifact written — its marker means all six
    # corpora (docs/_web/_pages/_edges/_anchors/_emb) are complete
    if os.path.exists(out + "_emb/_SUCCESS"):
        return out
    from pyspark.sql import functions as F

    from website_indexer_spark.sources.tables import build_spark

    spark = build_spark(app_name="fat-gen", master="local[8]",
                        shuffle_partitions=8)
    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    fat = (
        docs.crossJoin(F.broadcast(spark.range(repl).select(F.col("id").alias("_r"))))
        .withColumn("doc_id", F.col("doc_id") * repl + F.col("_r"))
        .drop("_r")
    )
    fat.repartition(8).write.mode("overwrite").parquet(out)
    # materialized derived corpora for the round-4 second-batch ops:
    # both parallelism levels must read identical parquet, and the
    # derivation must not be part of the measured operator
    from website_indexer_spark.sources.synth import (
        pages_from_documents,
        weblines_from_documents,
    )

    fat2 = spark.read.parquet(out)
    weblines_from_documents(fat2).repartition(8).write.mode(
        "overwrite"
    ).parquet(out + "_web")
    pages_from_documents(fat2).repartition(8).write.mode(
        "overwrite"
    ).parquet(out + "_pages")
    # batch-IV derived corpora: the synthetic link graph (edges) and
    # the (dst, anchor) pairs the anchor-text aggregation consumes —
    # materialized so the narrow derivations are not part of the
    # measured operators (same rule as _web/_pages above)
    from website_indexer_spark.functions.textstats import tokens as _toks
    from website_indexer_spark.sources.synth import links_from_documents

    n_docs = fat2.count()
    edges = links_from_documents(fat2, n_docs)
    edges.repartition(8).write.mode("overwrite").parquet(out + "_edges")
    toked = fat2.select(
        F.col("doc_id").alias("dst"), _toks(F.col("text")).alias("_t")
    )
    linked = (
        spark.read.parquet(out + "_edges")
        .join(toked, "dst")
        .select(
            "dst",
            F.array_join(
                F.slice(
                    F.col("_t"), (F.col("src") % 3).cast("int") + 1, 2
                ),
                " ",
            ).alias("anchor"),
        )
    )
    linked.repartition(8).write.mode("overwrite").parquet(out + "_anchors")
    # fat embeddings for semdedup: same replicate-and-rekey shape
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    fat_emb = (
        emb.crossJoin(
            F.broadcast(spark.range(repl).select(F.col("id").alias("_r")))
        )
        .withColumn("vec_id", F.col("vec_id") * repl + F.col("_r"))
        .drop("_r")
    )
    fat_emb.repartition(8).write.mode("overwrite").parquet(out + "_emb")
    spark.stop()
    return out


def augment_fat_corpus(fat_dir: str) -> None:
    """Batch-V derived corpora (round-4 late additions): the
    damage-injected docs for encoding_filter and the 4-snapshot CDX
    capture index for recrawl_schedule — materialized like _web/_pages
    so derivations are not part of the measured operators."""
    if os.path.exists(fat_dir + "_edgesfat/_SUCCESS"):
        return
    if os.path.exists(fat_dir + "_capsidx/_SUCCESS"):
        # only the edge replica is missing — build it alone
        from pyspark.sql import functions as F

        from website_indexer_spark.sources.tables import build_spark

        spark = build_spark(app_name="fat-aug", master="local[8]",
                            shuffle_partitions=8)
        e = spark.read.parquet(fat_dir + "_edges")
        (
            e.crossJoin(
                F.broadcast(
                    spark.range(50).select(F.col("id").alias("_r"))
                )
            )
            .drop("_r")
            .repartition(8)
            .write.mode("overwrite")
            .parquet(fat_dir + "_edgesfat")
        )
        spark.stop()
        return
    from website_indexer_spark.sources.cdx import cdx_index
    from website_indexer_spark.sources.synth import (
        captures_from_documents,
        damaged_from_documents,
    )
    from website_indexer_spark.sources.tables import build_spark

    spark = build_spark(app_name="fat-aug", master="local[8]",
                        shuffle_partitions=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    fat = spark.read.parquet(fat_dir)
    damaged_from_documents(fat).repartition(8).write.mode(
        "overwrite"
    ).parquet(fat_dir + "_damaged")
    cdx_index(captures_from_documents(fat)).repartition(8).write.mode(
        "overwrite"
    ).parquet(fat_dir + "_capsidx")
    # 50x-replicated edge list (~10M rows) for the host-graph ops:
    # the base _edges corpus (~200k rows) finishes in fixed-cost time
    # at any core count, so host contraction/rank must be measured on
    # an edge volume that actually exercises the joins
    from pyspark.sql import functions as F

    e = spark.read.parquet(fat_dir + "_edges")
    (
        e.crossJoin(
            F.broadcast(spark.range(50).select(F.col("id").alias("_r")))
        )
        .drop("_r")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(fat_dir + "_edgesfat")
    )
    spark.stop()


def run_level(cpus: int, fat_dir: str) -> dict:
    """One Spark session at local[cpus]; returns {op: best_seconds}."""
    from pyspark.sql import functions as F

    from website_indexer_spark.operators.dedup import dedup_against_snapshot
    from website_indexer_spark.operators.lmscore import unigram_logloss
    from website_indexer_spark.operators.packing import pack_documents
    from website_indexer_spark.operators.webquality import host_quality_filter
    from website_indexer_spark.sources.tables import build_spark

    # 32 shuffle partitions at BOTH levels (symmetric config, same as
    # the shipped bench default): with only cpus-matched partitions a
    # 4-core stage is exactly 2 waves and any straggler idles cores —
    # a task-quantization artifact, not a scaling property
    # 8g driver heap: the graph-sketch ops cache both edge
    # orientations and ANF's flood joins E x R rows per round —
    # the default heap OOMs at the 10M-edge replica
    spark = build_spark(app_name=f"scale-{cpus}", master=f"local[{cpus}]",
                        shuffle_partitions=32,
                        extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(fat_dir)
    ops = {
        # n_buckets=32, not the sandbox-default 8: buckets are the
        # packing's unit of parallelism and a deployment sizes them
        # far above core count (packing.py docstring) — at 8 buckets
        # on 4 cores the window stage is 2 task waves and the
        # measurement reads task quantization, not the operator
        "doc_pack": lambda: pack_documents(docs, n_buckets=32),
        "lm_logloss": lambda: unigram_logloss(docs),
        "host_filter": lambda: host_quality_filter(docs),
        # same %3 split as the driver gate: 1/3 snapshot, 2/3 increment
        "incremental_dedup": lambda: dedup_against_snapshot(
            docs.where(F.col("doc_id") % 3 != 0),
            docs.where(F.col("doc_id") % 3 == 0),
        ),
    }
    # round-4 second batch: C4 cleaning / paragraph dedup over the
    # materialized web-shaped corpus, URL gauntlet / CDX index over
    # the materialized pages corpus
    from website_indexer_spark.functions.urlstats import url_quality_filter
    from website_indexer_spark.functions.webclean import c4_clean
    from website_indexer_spark.operators.dedup import dedup_paragraphs
    from website_indexer_spark.sources.cdx import cdx_index

    web = spark.read.parquet(fat_dir + "_web")
    pages = spark.read.parquet(fat_dir + "_pages")
    ops.update(
        {
            "c4_clean": lambda: c4_clean(web),
            "paragraph_dedup": lambda: dedup_paragraphs(web),
            "url_filter": lambda: url_quality_filter(pages),
            "cdx_index": lambda: cdx_index(pages),
        }
    )
    # batch IV: the post-SemDeDup operator wave. Inputs are the
    # materialized derived corpora (edges / anchors / embeddings) so
    # each measurement is the operator, not its derivation.
    from website_indexer_spark.functions import gopherquality as gq
    from website_indexer_spark.functions.textnorm import (
        with_compression_ratio,
        with_dedup_key,
    )
    from website_indexer_spark.operators import linkgraph, similarity
    from website_indexer_spark.operators.anchortext import anchor_text_agg
    from website_indexer_spark.plans.catalog import (
        GOPHER_GATE_STOPWORDS,
        GOPHER_GATE_THRESHOLDS,
    )

    edges = spark.read.parquet(fat_dir + "_edges")
    anchors = spark.read.parquet(fat_dir + "_anchors")
    emb = spark.read.parquet(fat_dir + "_emb")
    nodes = docs.select("doc_id")
    ops.update(
        {
            "gopher_filter": lambda: gq.gopher_quality_filter(
                docs,
                stopwords=GOPHER_GATE_STOPWORDS,
                **GOPHER_GATE_THRESHOLDS,
            ).select("doc_id", "source"),
            "dedup_normalized": lambda: with_dedup_key(docs)
            .groupBy("dedup_key")
            .agg(
                F.min("doc_id").alias("keeper_id"),
                F.count("*").alias("n_docs"),
            ),
            "compression_ratio": lambda: with_compression_ratio(
                docs.select("doc_id", "text")
            ).select("doc_id", "compression_ratio"),
            "anchor_text": lambda: anchor_text_agg(
                anchors, target_col="dst", anchor_col="anchor"
            ),
            # 5 rounds, the gate's setting; edge list already on disk
            "pagerank": lambda: linkgraph.pagerank_exact(
                nodes, edges, rounds=5, node_col="doc_id"
            ),
            # k sized ~sqrt(N) per the semdedup docstring so cells
            # stay under max_cluster without forced sub-splits
            "semdedup": lambda: similarity.semdedup(
                emb, n_centroids=64, threshold=0.92
            ),
        }
    )
    # batch V (round-4 late additions): DSIR scoring over the raw fat
    # corpus, decode-damage gauntlet over the damage-injected twin,
    # change-rate estimation over the materialized capture index
    from website_indexer_spark.functions.encoding import encoding_filter
    from website_indexer_spark.operators.dsir import dsir_logratio
    from website_indexer_spark.sources.cdx import cdx_change_rate
    from website_indexer_spark.sources.synth import DOC_PAGES_EPOCH

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    damaged = spark.read.parquet(fat_dir + "_damaged")
    capsidx = spark.read.parquet(fat_dir + "_capsidx")
    ops.update(
        {
            "dsir_logratio": lambda: dsir_logratio(
                docs, F.col("source").isin("src0", "src1")
            ),
            "encoding_filter": lambda: encoding_filter(damaged),
            "recrawl_schedule": lambda: cdx_change_rate(
                capsidx, DOC_PAGES_EPOCH + 10_000_000
            ),
        }
    )
    from website_indexer_spark.operators.quantiles import ccnet_buckets

    ops.update({"ccnet_buckets": lambda: ccnet_buckets(docs)})
    # graph-sketch ops over the fat replica edge list
    from website_indexer_spark.operators.anf import (
        anf_neighborhood_stats,
    )
    from website_indexer_spark.operators.linkgraph import hits_exact

    nodes_df = docs.select("doc_id")
    ops.update(
        {
            # 10x replica (~2M edges), not the 50x one: ANF's flood
            # joins E x R rows per round (R=16), so 10M edges is
            # 160M-row rounds — local[1] grinds for tens of minutes
            # and the measurement is all one level's patience
            "anf_sketch": lambda: anf_neighborhood_stats(
                nodes_df,
                spark.read.parquet(fat_dir + "_edges10"),
                rounds=3,
                node_col="doc_id",
            ),
            "hits": lambda: hits_exact(
                nodes_df,
                spark.read.parquet(fat_dir + "_edges10"),
                rounds=3,
                node_col="doc_id",
            ),
        }
    )
    # host-level PageRank: contraction + weighted rounds over the
    # materialized edge list and the docs-derived host map
    from website_indexer_spark.operators.linkgraph import (
        contract_to_hosts,
        pagerank_exact,
    )

    # ~5 pages/host (doc_id % 19997), not the gate's 140-host map: a
    # 140-node contracted graph makes the 5 rank rounds pure
    # scheduling latency (0.40 nominal measured) — real host graphs
    # are node-rich, and the contraction + weighted rounds must be
    # measured carrying data, not fixed cost
    hostmap = docs.select(
        "doc_id",
        F.concat(
            F.lit("h"),
            (F.col("doc_id") % 19_997).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
    )
    ops.update(
        {
            # the data-sized leg alone (two mapping joins + weight
            # fold) — separates contraction scaling from the rank
            # rounds' per-round fixed cost; _edgesfat is the
            # 50x-replicated (~10M-row) edge list
            "host_contract": lambda: contract_to_hosts(
                spark.read.parquet(fat_dir + "_edgesfat"),
                hostmap,
                node_col="doc_id",
            ),
            "host_pagerank": lambda: pagerank_exact(
                hostmap.select("host").distinct(),
                contract_to_hosts(
                    spark.read.parquet(fat_dir + "_edgesfat"),
                    hostmap,
                    node_col="doc_id",
                ),
                rounds=5,
                node_col="host",
                weight_col="weight",
            ),
        }
    )
    only = os.environ.get("SCALE_OPS")
    if only:
        keep = set(only.split(","))
        ops = {k: v for k, v in ops.items() if k in keep}
    best: dict = {}
    for name, mk in ops.items():
        # noop write, NOT count(): count() lets ColumnPruning drop the
        # window/token-count expressions entirely (doc_pack collapses
        # to a bare scan), so every output column must be consumed
        mk().write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(2):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        best[name] = round(min(times), 2)
    spark.stop()
    return best


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 2 else 1
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    repl = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    fat = build_fat_corpus(repl)
    augment_fat_corpus(fat)
    print(f"corpus: {fat}")
    p0 = cpu_ceiling(low, high)
    print(f"probe(before) {low}->{high}: {p0:.2f}x", flush=True)
    lo = run_level(low, fat)
    hi = run_level(high, fat)
    p1 = cpu_ceiling(low, high)
    print(f"probe(after)  {low}->{high}: {p1:.2f}x", flush=True)
    ceiling = min(max(p0, p1), high / low)
    print(f"| query | local[{low}] | local[{high}] | speedup | nominal eff "
          f"| probe-normalized |")
    print("|---|---|---|---|---|---|")
    for name in lo:
        sp = lo[name] / hi[name]
        print(f"| {name} | {lo[name]} | {hi[name]} | {sp:.2f}x "
              f"| {sp / (high / low):.2f} | {sp / ceiling:.2f} |")


if __name__ == "__main__":
    main()
