"""Link-graph operators over an edge table (src, dst): degrees and an
integer-exact PageRank — the web-graph half of a crawl pipeline (the
reference stores raw hrefs in its Link dimension,
/root/reference/crawler/models.py:91-95, but computes nothing over
them; host/page rank and degree statistics are what a deployment
derives from that table for crawl prioritization and spam scoring).

PageRank here uses EXACT integer arithmetic end to end: ranks are
bigint micro-units (``scale`` = 1e12 by default), each out-edge
contribution is ``rank * 85 div (100 * out_deg)`` (integer division),
and the damping base is ``15 * scale div (100 * n)``. Integer sums
are order-independent, so the result is bit-identical on any engine,
any partitioning, any summation order — which is what lets the
driver gate hash-match a DuckDB mirror (the float formulation would
differ in final ulps per engine). The cost of exactness: each
division floors, so total mass decays by < 1 unit per node per
iteration (and dangling-node mass is dropped, the standard
simplification) — irrelevant for ranking, which is the operator's
job.

Scale shape per iteration: one equi join keyed by src (rank lookup),
one partial-aggregated exchange keyed by dst (contribution sum —
mega-in-degree hubs collapse in map-side combine), one left join
back onto the node list. No iteration ever materializes more than
(edges + nodes) rows; `checkpoint_every` truncates plan lineage for
long runs (clusters.py precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**12


def degree_stats(edges: DataFrame) -> DataFrame:
    """(node, out_deg, in_deg) over every node that appears on either
    side. Two partial-aggregated exchanges + one outer merge."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank_int(
    edges: DataFrame,
    n_iters: int = 3,
    scale: int = DEFAULT_SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
    checkpoint_every: int = 0,
) -> DataFrame:
    """(node, rank_int) after `n_iters` synchronous PageRank steps.

    rank_0 = scale div n for every node;
    rank_{t+1}(v) = (damp_den-damp_num)*scale div (damp_den*n)
                    + sum over in-edges (u,v) of
                      rank_t(u)*damp_num div (damp_den*out_deg(u)).

    All divisions are integer (see module docstring). Runs ONE eager
    job up front (the node count — the same documented driver-sized
    scalar mixture_sample and stratified_quota take); everything
    else is lazy until the caller acts."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0).cast("long").alias("rank_int")
        )
    base = (damp_den - damp_num) * scale // (damp_den * n)
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    ranks = nodes.select(
        "node", F.lit(scale // n).cast("long").alias("rank_int")
    )
    for i in range(n_iters):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(rank_int * {damp_num}) div ({damp_den} * out_deg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("rank_int"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks
