"""ANF/HyperBall neighborhood sketches (operators/anf.py): the FM
bitmap flood vs a plain-Python replica, monotonicity, estimate
sanity, and the per-round one-exchange plan shape."""

from __future__ import annotations

import hashlib

from website_indexer_spark.operators.anf import (
    ANF_REGISTERS,
    anf_neighborhood_stats,
    harmonic_centrality,
)

EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
NODES = list(range(6))  # 5 is isolated


def _seed(node, reg):
    h = int(
        hashlib.md5(f"{node}:{reg}".encode()).hexdigest()[:8], 16
    )
    if h == 0:
        rho = 32
    else:
        rho = ((h & -h) - 1).bit_count()
    return 1 << min(rho, 62)


def _py_anf(nodes, edges, rounds, regs=ANF_REGISTERS):
    state = {
        (n, r): _seed(n, r) for n in nodes for r in range(regs)
    }
    out = {}
    for t in range(1, rounds + 1):
        new = dict(state)
        for s, d in edges:
            for r in range(regs):
                new[(s, r)] |= state[(d, r)]
        state = new
        for n in nodes:
            tot = 0
            for r in range(regs):
                b = state[(n, r)]
                low = (~b) & (b + 1)
                tot += (low - 1).bit_count()
            out[(n, t)] = tot
    return out


def _graph(spark):
    nodes = spark.createDataFrame([(n,) for n in NODES], ["node"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    return nodes, edges


def test_anf_matches_python_oracle(spark):
    nodes, edges = _graph(spark)
    want = _py_anf(NODES, EDGES, 3)
    got = {
        (r["node"], r["round"]): r["s"]
        for r in anf_neighborhood_stats(nodes, edges, rounds=3).collect()
    }
    assert got == want


def test_s_monotone_in_round(spark):
    nodes, edges = _graph(spark)
    got = {
        (r["node"], r["round"]): r["s"]
        for r in anf_neighborhood_stats(nodes, edges, rounds=3).collect()
    }
    for n in NODES:
        assert got[(n, 1)] <= got[(n, 2)] <= got[(n, 3)]


def test_isolated_node_never_grows(spark):
    nodes, edges = _graph(spark)
    got = {
        (r["node"], r["round"]): r["s"]
        for r in anf_neighborhood_stats(nodes, edges, rounds=3).collect()
    }
    assert got[(5, 1)] == got[(5, 2)] == got[(5, 3)]


def test_harmonic_orders_hub_over_sink(spark):
    """Node 0 reaches everything in <=3 hops; node 4 reaches nothing.
    The estimate is noisy at R=16 but the extremes must order."""
    nodes, edges = _graph(spark)
    hc = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(nodes, edges, rounds=3).collect()
    }
    assert hc[0] == max(hc.values())
    assert hc[0] > hc[4]


def test_plan_bit_or_partial_no_cartesian(spark):
    """With checkpointing off the flood is visible: the sketch union
    must be a partial-aggregated native bit_or (map-side combine for
    mega-hub fan-in), never cartesian, never Python."""
    nodes, edges = _graph(spark)
    out = anf_neighborhood_stats(
        nodes, edges, rounds=2, checkpoint_rounds=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_bit_or" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
