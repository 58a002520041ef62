"""Link-graph analytics over crawled pages: integer-exact PageRank
plus degree statistics.

The crawl half of this engine materializes a links dimension
(reference: the viewer's crawler_link table, viewer/models.py — pairs
of (page, href)); a web-scale deployment's next question is always
"which hosts/pages matter" — frontier prioritization, seed weighting,
spam demotion. PageRank is the canonical answer and the canonical
iterative-dataflow stress test for a Spark engine.

Integer-exact protocol (the catalog-wide determinism rule): float
PageRank sums doubles in engine-dependent order, so two engines
disagree in the last ulp and a value hash can never gate it. This
implementation keeps every intermediate in BIGINT micro-units of the
N-scaled score R_i = N * 10^6 * pr_i:

    R0_i  = 1_000_000
    R'_i  = 150_000 + (85 * SUM_j(R_j DIV outdeg_j)) DIV 100

(d = 0.85 as the 85/100 rational; (1-d)/N scaled by N*10^6 is the
constant 150_000; DIV is integer division). Every operation is exact
bigint arithmetic — any engine reproduces the bits, so the DuckDB
oracle hash-matches after any number of rounds. Score mass bleeds by
the DIV remainders and dangling nodes (documented classic "simple"
PageRank: dangling mass is dropped, not redistributed) — fine for
ranking, which is PageRank's job.

Scale shape (the part that must survive 10^10 edges):
* edges are the big, static side: joined BY KEY (src) every round.
  The caller-supplied frame is repartitioned on src ONCE and cached;
  Spark's InMemoryRelation preserves that outputPartitioning, so
  each round's join re-exchanges ONLY the rank table (one row per
  node, orders of magnitude smaller than the edge list).
* contributions partial-aggregate on dst before the exchange
  (map-side combine absorbs a mega-page's in-link fan-in; AQE's
  skew handling covers the residual).
* ranks are node-sized; at 10^10 nodes the per-round exchange is the
  irreducible cost — the same one-exchange-per-round shape GraphX /
  Pregel settle on.
* the driver never sees a row: no collect anywhere; convergence is
  fixed-round (callers wanting a tolerance can diff successive
  rounds with an AGG, still distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_INIT_MICRO = 1_000_000
PR_TELEPORT_MICRO = 150_000  # (1 - 0.85) * 10^6
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100


def degree_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, out_degree, in_degree) — one tagged union + one
    partial-aggregated exchange keyed by node."""
    out_half = edges.select(
        F.col(src_col).alias("node"),
        F.lit(1).cast("long").alias("o"),
        F.lit(0).cast("long").alias("i"),
    )
    in_half = edges.select(
        F.col(dst_col).alias("node"),
        F.lit(0).cast("long").alias("o"),
        F.lit(1).cast("long").alias("i"),
    )
    return (
        out_half.unionAll(in_half)
        .groupBy("node")
        .agg(
            F.sum("o").alias("out_degree"),
            F.sum("i").alias("in_degree"),
        )
    )


def contract_to_hosts(
    edges: DataFrame,
    node_hosts: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    host_col: str = "host",
) -> DataFrame:
    """Collapse a page-level edge list to the weighted host-level
    graph — the Common Crawl host/domain-ranking shape (their
    published domain ranks run centrality over exactly this
    contraction). ``node_hosts`` maps node -> host (node-sized, so
    both mapping joins are key-partitioned equi-joins, never
    broadcast-assumed); intra-host edges are dropped (self-ranking
    noise), parallel page links fold into an integer ``weight`` via a
    partial (map-side) aggregate — at web fan-out the host-pair
    count is orders below the page-edge count, so the exchange
    carries the contracted graph, not the raw one.

    Returns (src_host, dst_host, weight:bigint) under the original
    src/dst column names."""
    s_map = node_hosts.select(
        F.col(node_col).alias(src_col), F.col(host_col).alias("_sh")
    )
    d_map = node_hosts.select(
        F.col(node_col).alias(dst_col), F.col(host_col).alias("_dh")
    )
    return (
        edges.join(s_map, src_col)
        .join(d_map, dst_col)
        .where(F.col("_sh") != F.col("_dh"))
        .groupBy("_sh", "_dh")
        .agg(F.count("*").alias("weight"))
        .select(
            F.col("_sh").alias(src_col),
            F.col("_dh").alias(dst_col),
            "weight",
        )
    )


def pagerank_exact(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 5,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    partitions: int = 0,
    checkpoint_every: int = 8,
    weight_col: str | None = None,
) -> DataFrame:
    """Integer-exact fixed-round PageRank (module docstring for the
    protocol). ``nodes`` is one row per node (dangling nodes receive
    the teleport constant); ``edges`` keeps multiplicity (a page
    linking twice contributes twice — parallel edges are real links).

    Returns (node_col, pr_micro: bigint). Runs ``rounds`` joins; each
    round exchanges only rank-sized rows because the edge list is
    repartitioned on src once and cached here. Every
    ``checkpoint_every`` rounds the rank frame is localCheckpointed
    (clusters.py precedent) so plan lineage — and with it Catalyst
    analysis time — stays bounded for long runs; the values are
    exact integers, so truncation can never change the result.
    """
    n_parts = partitions or edges.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    # weighted form (host-graph contraction): out-degree becomes the
    # summed out-weight and each edge contributes
    # weight * (pr div out_weight) — still pure bigint arithmetic, and
    # weight=1 everywhere reduces to the unweighted protocol exactly
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    deg = edges.groupBy(src_col).agg(F.sum(w).alias("_deg"))
    edged = (
        edges.join(deg, src_col)
        .select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            w.alias("_w"),
            F.col("_deg"),
        )
        .repartition(int(n_parts), F.col("_src"))
        .persist()
    )
    ranks = nodes.select(
        F.col(node_col).alias("_node"),
        F.lit(PR_INIT_MICRO).cast("long").alias("_pr"),
    )
    for i in range(rounds):
        contrib = (
            edged.join(ranks, edged["_src"] == ranks["_node"])
            .select(
                F.col("_dst"),
                F.expr("_w * (_pr div _deg)").alias("_c"),
            )
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.select(F.col(node_col).alias("_node"))
            .join(contrib, F.col("_node") == F.col("_dst"), "left")
            .select(
                "_node",
                (
                    F.lit(PR_TELEPORT_MICRO)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(_in, 0L)) div {PR_DAMP_DEN}"
                    )
                ).alias("_pr"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (
            i + 1
        ) < rounds:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        F.col("_node").alias(node_col), F.col("_pr").alias("pr_micro")
    )


HITS_INIT_MICRO = 1_000_000


def hits_exact(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    partitions: int = 0,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999): hub and authority scores
    over the same link graph PageRank ranks — a page is a good HUB if
    it links to good authorities, a good AUTHORITY if good hubs link
    to it. The classic mutual-reinforcement pair:

        a'_j = SUM over edges i->j of h_i       (authority update)
        h'_i = SUM over edges i->j of a'_j      (hub update)

    with a normalization after each half-step. Float HITS normalizes
    by the L2 norm — engine-dependent in the last ulp, ungateable.
    The integer protocol here rescales so the MAX score returns to
    the micro unit:

        x_i <- x_raw_i div greatest(max(x_raw) div 1_000_000, 1)

    div-first (never multiply-first) so no intermediate exceeds
    max(x_raw) — overflow-free for any graph whose raw sums fit a
    bigint, which the per-round rescale itself guarantees (raw sums
    are bounded by in_degree * 1e6 per round). max() of bigints is
    engine-exact, so every round — and therefore the whole fixed
    point — hashes identically on any engine. Scores are relative
    (max = 1e6) which is all HITS ranking semantics promise.

    Scale shape: the edge list is cached TWICE, pre-partitioned on
    src (for the authority step's h-lookup) and on dst (for the hub
    step's a-lookup) — 2x edge storage buys zero edge-sized
    exchanges per round; only node-sized score frames and 1-row max
    aggregates move. The same trade GraphX makes with its
    routing-table replication. Dangling/unreferenced nodes keep
    score 0 via the closing LEFT joins.
    """
    n_parts = int(
        partitions
        or edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    e_by_src = (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
        .repartition(n_parts, F.col("_src"))
        .persist()
    )
    e_by_dst = e_by_src.repartition(n_parts, F.col("_dst")).persist()
    hubs = nodes.select(
        F.col(node_col).alias("_node"),
        F.lit(HITS_INIT_MICRO).cast("long").alias("_h"),
    )

    def _rescale(df: DataFrame, col: str) -> DataFrame:
        # lazily checkpoint the raw scores FIRST: the max aggregate
        # and the rescaled output both consume this frame, and each
        # round's authorities feed BOTH the hub update and the final
        # join — without the cut, every rescale doubles the plan tree
        # and an r-round run recomputes round 1 ~4^r times (measured:
        # 287 s -> seconds on a 2M-edge graph). Values are exact
        # integers, so the checkpoint can never change the result.
        df = df.localCheckpoint(eager=False)
        mx = df.agg(
            F.coalesce(F.max(col), F.lit(0)).alias("_mx")
        )
        return (
            df.crossJoin(F.broadcast(mx))
            .select(
                "_node",
                F.expr(
                    f"{col} div greatest(_mx div {HITS_INIT_MICRO}, 1L)"
                ).alias(col),
            )
        )

    auths = None
    for i in range(rounds):
        a_raw = (
            e_by_src.join(hubs, e_by_src["_src"] == hubs["_node"])
            .select(F.col("_dst"), F.col("_h"))
            .groupBy("_dst")
            .agg(F.sum("_h").alias("_a"))
        )
        auths = _rescale(
            nodes.select(F.col(node_col).alias("_node"))
            .join(a_raw, F.col("_node") == F.col("_dst"), "left")
            .select(
                "_node", F.coalesce("_a", F.lit(0).cast("long")).alias("_a")
            ),
            "_a",
        )
        h_raw = (
            e_by_dst.join(auths, e_by_dst["_dst"] == auths["_node"])
            .select(F.col("_src"), F.col("_a"))
            .groupBy("_src")
            .agg(F.sum("_a").alias("_h"))
        )
        hubs = _rescale(
            nodes.select(F.col(node_col).alias("_node"))
            .join(h_raw, F.col("_node") == F.col("_src"), "left")
            .select(
                "_node", F.coalesce("_h", F.lit(0).cast("long")).alias("_h")
            ),
            "_h",
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (
            i + 1
        ) < rounds:
            hubs = hubs.localCheckpoint(eager=True)
            auths = auths.localCheckpoint(eager=True)
    return (
        hubs.join(
            auths.select(
                F.col("_node").alias("_n2"), F.col("_a")
            ),
            hubs["_node"] == F.col("_n2"),
        )
        .select(
            F.col("_node").alias(node_col),
            F.col("_h").alias("hub_micro"),
            F.col("_a").alias("auth_micro"),
        )
    )
