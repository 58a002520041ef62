"""Link-graph operators (operators/linkgraph.py): integer-exact
PageRank vs a pure-Python oracle, structural sanity, and the
rank-sized-exchange-only plan property."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.operators.linkgraph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_INIT_MICRO,
    PR_TELEPORT_MICRO,
    degree_stats,
    pagerank_exact,
)

# (src, dst) — node 0 is a hub, node 4 is dangling, 5 is isolated
EDGES = [
    (0, 1), (0, 2), (0, 3),
    (1, 0), (2, 0), (3, 0),
    (1, 2), (2, 3),
    (3, 4),  # 4 receives but never emits (dangling)
]
NODES = [0, 1, 2, 3, 4, 5]


def _py_pagerank(nodes, edges, rounds):
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {n: PR_INIT_MICRO for n in nodes}
    for _ in range(rounds):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += pr[s] // deg[s]
        pr = {
            n: PR_TELEPORT_MICRO + (PR_DAMP_NUM * inc[n]) // PR_DAMP_DEN
            for n in nodes
        }
    return pr


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame([(n,) for n in NODES], ["node"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    return nodes, edges


def test_pagerank_matches_python_oracle(spark, graph):
    nodes, edges = graph
    for rounds in (1, 3, 5):
        got = {
            r["node"]: r["pr_micro"]
            for r in pagerank_exact(nodes, edges, rounds=rounds).collect()
        }
        assert got == _py_pagerank(NODES, EDGES, rounds), rounds


def test_isolated_node_gets_teleport_constant(spark, graph):
    nodes, edges = graph
    got = {
        r["node"]: r["pr_micro"]
        for r in pagerank_exact(nodes, edges, rounds=4).collect()
    }
    assert got[5] == PR_TELEPORT_MICRO  # no in-links at all
    # dangling node 4 still receives rank but contributes none
    assert got[4] > PR_TELEPORT_MICRO


def test_star_center_ranks_highest(spark):
    # leaves 1..6 all link to 0; 0 links to 1
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 7)] + [(0, 1)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(n,) for n in range(7)], ["node"])
    got = {
        r["node"]: r["pr_micro"]
        for r in pagerank_exact(nodes, edges, rounds=5).collect()
    }
    assert got[0] == max(got.values())
    assert got[1] > got[2]  # 1 gets 0's whole vote
    assert len({got[i] for i in range(2, 7)}) == 1  # symmetric leaves


def test_parallel_edges_count_twice(spark):
    nodes = spark.createDataFrame([(n,) for n in range(3)], ["node"])
    single = spark.createDataFrame([(0, 1), (0, 2)], ["src", "dst"])
    doubled = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2)], ["src", "dst"]
    )
    pr_single = {
        r["node"]: r["pr_micro"]
        for r in pagerank_exact(nodes, single, rounds=2).collect()
    }
    pr_double = {
        r["node"]: r["pr_micro"]
        for r in pagerank_exact(nodes, doubled, rounds=2).collect()
    }
    assert pr_double[1] > pr_single[1]
    assert pr_double[2] < pr_single[2]


def test_degree_stats(spark, graph):
    _, edges = graph
    got = {
        r["node"]: (r["out_degree"], r["in_degree"])
        for r in degree_stats(edges).collect()
    }
    out_exp, in_exp = {}, {}
    for s, d in EDGES:
        out_exp[s] = out_exp.get(s, 0) + 1
        in_exp[d] = in_exp.get(d, 0) + 1
    for n, (o, i) in got.items():
        assert o == out_exp.get(n, 0)
        assert i == in_exp.get(n, 0)


def test_only_rank_sized_rows_shuffle_per_round(spark, graph):
    """The 10^10-edge property: the cached edge list is exchanged
    ONCE (the REPARTITION_BY_NUM cache build); every round reuses its
    partitioning, so the per-round exchanges carry only rank-sized
    (_node / _dst) rows. Broadcast disabled to expose the big-edge
    shape."""
    nodes, edges = graph
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        rounds = 3
        df = pagerank_exact(nodes, edges, rounds=rounds)
        p = df._jdf.queryExecution().executedPlan().toString()
        # no round forces a re-exchange of the edge side
        assert not re.findall(
            r"Exchange hashpartitioning\(_src[^\n]*ENSURE_REQUIREMENTS", p
        ), p
        assert len(re.findall(r"Exchange hashpartitioning\(_dst", p)) == rounds
        assert "CartesianProduct" not in p
        assert "partial" in p.lower()  # map-side combine on in-link fan-in
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_pagerank_deterministic_across_runs(spark, graph):
    nodes, edges = graph
    a = sorted(map(tuple, pagerank_exact(nodes, edges, rounds=3).collect()))
    b = sorted(map(tuple, pagerank_exact(nodes, edges, rounds=3).collect()))
    assert a == b


# --------------------------------------------------------------------
# Host contraction + weighted PageRank
# --------------------------------------------------------------------

HOSTS = [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "c"), (5, "c")]


def _py_weighted_pagerank(nodes, wedges, rounds):
    deg = {}
    for s, _, w in wedges:
        deg[s] = deg.get(s, 0) + w
    pr = {n: PR_INIT_MICRO for n in nodes}
    for _ in range(rounds):
        inc = {n: 0 for n in nodes}
        for s, d, w in wedges:
            inc[d] += w * (pr[s] // deg[s])
        pr = {
            n: PR_TELEPORT_MICRO + (PR_DAMP_NUM * inc[n]) // PR_DAMP_DEN
            for n in nodes
        }
    return pr


def _py_contract(edges, hosts):
    hmap = dict(hosts)
    agg = {}
    for s, d in edges:
        hs, hd = hmap[s], hmap[d]
        if hs != hd:
            agg[(hs, hd)] = agg.get((hs, hd), 0) + 1
    return agg


def test_contract_to_hosts(spark, graph):
    from website_indexer_spark.operators.linkgraph import (
        contract_to_hosts,
    )

    _, edges = graph
    node_hosts = spark.createDataFrame(HOSTS, ["node", "host"])
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in contract_to_hosts(edges, node_hosts).collect()
    }
    assert got == _py_contract(EDGES, HOSTS)
    # intra-host edges (0->1, 2->3) never appear
    assert all(s != d for (s, d) in got)


def test_weighted_pagerank_matches_python_oracle(spark, graph):
    from website_indexer_spark.operators.linkgraph import (
        contract_to_hosts,
    )

    _, edges = graph
    node_hosts = spark.createDataFrame(HOSTS, ["node", "host"])
    hedges = contract_to_hosts(edges, node_hosts)
    hnodes = node_hosts.select("host").distinct()
    want = _py_weighted_pagerank(
        ["a", "b", "c"],
        [(s, d, w) for (s, d), w in _py_contract(EDGES, HOSTS).items()],
        rounds=3,
    )
    got = {
        r["host"]: r["pr_micro"]
        for r in pagerank_exact(
            hnodes, hedges, rounds=3, node_col="host",
            weight_col="weight",
        ).collect()
    }
    assert got == want


def test_weight_one_reduces_to_unweighted(spark, graph):
    nodes, edges = graph
    w1 = edges.withColumn("weight", F.lit(1).cast("long"))
    plain = {
        r["node"]: r["pr_micro"]
        for r in pagerank_exact(nodes, edges, rounds=4).collect()
    }
    weighted = {
        r["node"]: r["pr_micro"]
        for r in pagerank_exact(
            nodes, w1, rounds=4, weight_col="weight"
        ).collect()
    }
    assert plain == weighted


# --------------------------------------------------------------------
# HITS
# --------------------------------------------------------------------


def _py_hits(nodes, edges, rounds):
    M = 1_000_000
    h = {n: M for n in nodes}
    a = {}
    for _ in range(rounds):
        raw_a = {n: 0 for n in nodes}
        for s, d in edges:
            raw_a[d] += h[s]
        mx = max(raw_a.values(), default=0)
        a = {n: v // max(mx // M, 1) for n, v in raw_a.items()}
        raw_h = {n: 0 for n in nodes}
        for s, d in edges:
            raw_h[s] += a[d]
        mx = max(raw_h.values(), default=0)
        h = {n: v // max(mx // M, 1) for n, v in raw_h.items()}
    return h, a


def test_hits_matches_python_oracle(spark, graph):
    from website_indexer_spark.operators.linkgraph import hits_exact

    nodes, edges = graph
    for rounds in (1, 3):
        want_h, want_a = _py_hits(NODES, EDGES, rounds)
        got = {
            r["node"]: (r["hub_micro"], r["auth_micro"])
            for r in hits_exact(nodes, edges, rounds=rounds).collect()
        }
        assert got == {
            n: (want_h[n], want_a[n]) for n in NODES
        }, rounds


def test_hits_isolated_and_dangling(spark, graph):
    from website_indexer_spark.operators.linkgraph import hits_exact

    nodes, edges = graph
    got = {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in hits_exact(nodes, edges, rounds=2).collect()
    }
    # isolated node 5: zero both ways; dangling node 4: zero hub,
    # nonzero authority (3 links to it)
    assert got[5] == (0, 0)
    assert got[4][0] == 0 and got[4][1] > 0


def test_hits_plan_no_cartesian(spark, graph):
    from website_indexer_spark.operators.linkgraph import hits_exact

    nodes, edges = graph
    out = hits_exact(nodes, edges, rounds=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
