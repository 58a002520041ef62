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


HARMONIC_KEY_SCALE_BITS = 27
HARMONIC_Q_CAP = 62


def harmonic_key_constants(registers: int = ANF_REGISTERS) -> list:
    """K_r = round(2^(r/R) * 2^27) for r = 0..R-1 — the pinned integer
    constant table of the harmonic-rank protocol. Both engines (the
    Spark query and the DuckDB oracle) inline THESE integers, so the
    rank key is pure int arithmetic everywhere and hash-gateable."""
    return [
        round(2 ** (r / registers) * (1 << HARMONIC_KEY_SCALE_BITS))
        for r in range(int(registers))
    ]


def harmonic_weights(rounds: int) -> list:
    """Integer per-round weights c_t with H + 1 = (1/L) * sum_t c_t *
    B_t: telescoping sum_t (B_t - B_{t-1})/t over B_0 = 1 gives
    weight 1/(t(t+1)) for t < T and 1/T for t = T; multiplying by
    L = lcm(1..T) clears every denominator (t and t+1 are coprime and
    both <= T... t+1 <= T for t < T). The monotone-fix max() in the
    float estimator never binds because s is monotone in round (bits
    only accrue under OR) and B_1 >= 1/phi > 1 = B_0."""
    L = math.lcm(*range(1, int(rounds) + 1))
    return [
        L // (t * (t + 1)) if t < rounds else L // t
        for t in range(1, int(rounds) + 1)
    ]


def harmonic_key_expr(
    rounds: int, registers: int = ANF_REGISTERS, dialect: str = "spark"
) -> str:
    """The harmonic-rank integer key as a SQL expression over columns
    ``s1..s{rounds}`` — ONE generator emits both engines' dialects, so
    the protocol constants (weights, K table, q cap/split) cannot
    drift between the Spark query and the DuckDB oracle.

    Per round:  c_t * K[s_t mod R] * 2^min(q,31) * 2^(min(q,62)-31)+
    with q = s_t div R — the shift split keeps every factor inside a
    bigint; the products run in decimal(38,0) (Spark) / HUGEINT
    (DuckDB), both exact 128-bit integer arithmetic."""
    ks = harmonic_key_constants(registers)
    R = int(registers)
    terms = []
    for t, c in zip(range(1, int(rounds) + 1), harmonic_weights(rounds)):
        s = f"s{t}"
        if dialect == "spark":
            karr = ", ".join(str(int(k)) + "L" for k in ks)
            kpick = f"element_at(array({karr}), CAST({s} % {R} AS INT) + 1)"
            q = f"least({s} DIV {R}, {HARMONIC_Q_CAP})"
            big = "DECIMAL(38,0)"
            shift = "shiftleft(1L, CAST({n} AS INT))"
        else:
            whens = " ".join(
                f"WHEN {r} THEN {int(k)}" for r, k in enumerate(ks)
            )
            kpick = f"(CASE CAST({s} % {R} AS INT) {whens} END)"
            q = f"least({s} // {R}, {HARMONIC_Q_CAP})"
            big = "HUGEINT"
            shift = "(CAST(1 AS BIGINT) << CAST({n} AS INT))"
        lo = shift.format(n=f"least({q}, 31)")
        hi = shift.format(n=f"greatest({q} - 31, 0)")
        terms.append(
            f"CAST({int(c)} * {kpick} AS {big})"
            f" * CAST({lo} AS {big}) * CAST({hi} AS {big})"
        )
    return " + ".join(terms)


def harmonic_rank(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    registers: int = ANF_REGISTERS,
) -> DataFrame:
    """(node, harmonic_rank) — the EXACT-integer rank order of the
    HyperBall harmonic-centrality estimate, hash-gateable where the
    float estimate is rows-only.

    Protocol: phi and the constant -1 and 1/L factors are monotone
    (order-preserving), so ranking by H(v) == ranking by the integer
    key  X(v) = sum_t c_t * 2^(s_t div R) * K_{s_t mod R}  with c_t =
    harmonic_weights (clears the telescoping denominators) and K_r =
    round(2^(r/R) * 2^27) (harmonic_key_constants — the fixed-point
    table of the fractional power both engines inline). Every term is
    integer; products run in decimal(38,0) (the 2^q factor split into
    two <=2^31 shifts keeps each factor in a bigint, q capped at 62 —
    unreachable until a neighborhood holds ~2^62*phi nodes). Ties —
    identical sketches — break by node id, so the rank is total and
    deterministic. Key resolution 2^-27 relative; distinct sketch
    triples closer than that are indistinguishable to the float
    estimator too (double has 2^-52 on the SAME fixed-point terms).

    The ranking itself is the scalable ordered enumeration
    (frontier.assign_ordered_seq): range-partition by key, count per
    partition, offset-number — a distributed TeraSort-shaped rank,
    never a single-partition window. Rank 1 = most central."""
    from website_indexer_spark.operators.frontier import assign_ordered_seq

    stats = anf_neighborhood_stats(
        nodes, edges, rounds, node_col, src_col, dst_col, registers
    )
    wide = (
        stats.groupBy(node_col)
        .pivot("round", list(range(1, int(rounds) + 1)))
        .agg(F.first("s"))
        .select(
            F.col(node_col),
            *[F.col(str(t)).alias(f"s{t}") for t in range(1, int(rounds) + 1)],
        )
    )
    key = F.expr(harmonic_key_expr(rounds, registers, dialect="spark"))
    keyed = wide.select(
        F.col(node_col), key.alias("_key")
    ).withColumn("_negkey", -F.col("_key"))
    registry: list = []
    ranked = assign_ordered_seq(
        keyed,
        ["_negkey", node_col],
        start=1,
        out_col="harmonic_rank",
        persist_registry=registry,
    ).select(F.col(node_col), F.col("harmonic_rank"))
    return ranked


__all__ = [
    "ANF_PHI",
    "ANF_REGISTERS",
    "HARMONIC_KEY_SCALE_BITS",
    "HARMONIC_Q_CAP",
    "anf_neighborhood_stats",
    "harmonic_centrality",
    "harmonic_key_constants",
    "harmonic_key_expr",
    "harmonic_rank",
    "harmonic_weights",
]
