"""ANF / HyperBall-style neighborhood sketches over the link graph —
approximate neighborhood sizes and harmonic centrality at web scale.

Exact all-pairs distances on a 10^10-edge graph are out of the
question; the published answer (ANF, Palmer et al. KDD 2002; HyperBall,
Boldi & Vigna 2013 — what Common Crawl's published harmonic-centrality
domain ranks use) is a mergeable cardinality sketch per node, flooded
along edges for t rounds: after round t, node v's sketch estimates
|B_t(v)| = the number of nodes within distance <= t, and the
per-round deltas give the neighborhood function and every
distance-based centrality.

This implementation uses the ORIGINAL Flajolet-Martin PCSA bitmaps
(ANF's choice) rather than HyperLogLog registers, for one decisive
engine reason: FM sketches merge by **bitwise OR**, which Spark AND
DuckDB both have as a native partial-aggregable aggregate
(``bit_or``) — so the whole t-round flood is pure integer dataflow,
deterministic to the bit, and therefore HASH-GATEABLE exactly like
the rest of the catalog (HLL needs a per-register MAX over 6-bit
fields — expressible, but FM's OR *is* the union, with map-side
combine for free).

Protocol (all engine-exact):
* R registers per node; register r seeds
  ``bits = 1 << rho(h(node, r))`` where h is the md5 32-bit prefix
  (the repo's cross-engine hash protocol) and rho = trailing zeros
  (h = 0 -> rho 32). bit 62 caps the shift.
* round: ``bits'(v, r) = bits(v, r) OR bit_or over out-edges v->w
  of bits(w, r)`` — one unionAll + one (node, reg)-keyed
  partial-aggregated exchange; after t rounds register r of v holds
  the OR of the seeds of every node within distance t.
* sufficient statistic: ``lzb`` = index of the lowest UNSET bit
  (``bit_count((( ~bits) & (bits + 1)) - 1)``); the gate emits the
  integer ``s = SUM over r of lzb_r`` per (node, round) — FM's
  estimate is the monotone function 2^(s/R)/phi of s, so gating s
  gates the sketch; the float only appears in the ungated
  convenience estimate.

Scale shape: state is (node, reg) — N*R rows, R a small constant;
each round costs ONE exchange of that state (bit_or partial-agg
collapses map-side, a mega-hub's fan-in dies before the wire) plus
the edge join against the dst-partitioned cached edge list — the
same per-round cost envelope as pagerank_exact, multiplied by R.
No all-pairs anything, no floats in the loop.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANF_REGISTERS = 16
ANF_PHI = 0.77351  # FM85 bias correction


def _seed_rho(node: F.Column, reg: F.Column) -> F.Column:
    """rho(md5-32(node:reg)) — trailing-zero geometric seed index."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(node.cast("string"), F.lit(":"), reg.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    # rho = trailing zeros; h & -h isolates the lowest set bit and
    # bit_count of (that - 1) counts the zeros below it; h=0 -> 32
    return F.when(h == 0, F.lit(32)).otherwise(
        F.bit_count((h.bitwiseAND(-h)) - 1)
    )


def _lzb(bits: F.Column) -> F.Column:
    """Index of the lowest UNSET bit — FM's sufficient statistic."""
    inv = F.bitwise_not(bits)
    low = inv.bitwiseAND(bits + F.lit(1))
    return F.bit_count(low - F.lit(1))


def anf_neighborhood_stats(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    registers: int = ANF_REGISTERS,
    partitions: int = 0,
    checkpoint_rounds: bool = True,
) -> DataFrame:
    """(node, round, s) for round = 1..rounds, where s = the integer
    sum over registers of the lowest-unset-bit index after flooding
    the FM sketches ``round`` steps along OUT-edges. s is monotone
    non-decreasing in round and engine-exact; |B_round(node)| is
    estimated by ``2^(s/R) / phi`` (see harmonic_centrality)."""
    n_parts = int(
        partitions
        or edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    regs = F.explode(
        F.sequence(F.lit(0), F.lit(int(registers) - 1))
    ).alias("reg")
    state = (
        nodes.select(F.col(node_col).alias("_node"), regs)
        .select(
            "_node",
            "reg",
            _seed_rho(F.col("_node"), F.col("reg")).alias("_rho"),
        )
        # Python's shiftleft() binding takes only a literal shift;
        # the SQL function accepts a column
        .select(
            "_node",
            "reg",
            F.expr(
                "shiftleft(1L, cast(least(_rho, 62) as int))"
            ).alias("bits"),
        )
    )
    e = (
        edges.select(
            F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
        )
        .repartition(n_parts, F.col("_dst"))
        .persist()
    )
    out = None
    for t in range(1, int(rounds) + 1):
        nbr = e.join(
            state, e["_dst"] == state["_node"]
        ).select(F.col("_src").alias("_node"), "reg", "bits")
        state = (
            state.unionAll(nbr)
            .groupBy("_node", "reg")
            .agg(F.bit_or("bits").alias("bits"))
        )
        if checkpoint_rounds:
            # bounds plan lineage (the pagerank/CC lesson); False is
            # for plan-shape tests that need the flood visible
            state = state.localCheckpoint(eager=False)
        level = state.groupBy("_node").agg(
            F.sum(_lzb(F.col("bits"))).cast("long").alias("s")
        ).select(
            F.col("_node").alias(node_col),
            F.lit(t).cast("int").alias("round"),
            "s",
        )
        out = level if out is None else out.unionAll(level)
    return out


def harmonic_centrality(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    registers: int = ANF_REGISTERS,
) -> DataFrame:
    """(node, harmonic) — HyperBall's estimator over the FM flood:
    H(v) ~= SUM over t of (|B_t| - |B_{t-1}|) / t, with |B_t| from
    the sketch and |B_0| = 1. Floats appear ONLY here (pow is
    libm-territory), so this is the rows-only convenience form; the
    gated artifact is anf_neighborhood_stats' integer s."""
    stats = anf_neighborhood_stats(
        nodes, edges, rounds, node_col, src_col, dst_col, registers
    )
    wide = stats.groupBy(node_col).pivot(
        "round", list(range(1, int(rounds) + 1))
    ).agg(F.first("s"))
    ball = lambda t: (  # noqa: E731
        F.pow(F.lit(2.0), F.col(str(t)) / F.lit(float(registers)))
        / F.lit(ANF_PHI)
    )
    prev = F.lit(1.0)
    acc = F.lit(0.0)
    for t in range(1, int(rounds) + 1):
        cur = F.greatest(ball(t), prev)
        acc = acc + (cur - prev) / F.lit(float(t))
        prev = cur
    return wide.select(F.col(node_col), acc.alias("harmonic"))


__all__ = [
    "ANF_PHI",
    "ANF_REGISTERS",
    "anf_neighborhood_stats",
    "harmonic_centrality",
]
