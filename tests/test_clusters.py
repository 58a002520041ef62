"""Connected-components dedup clustering: the Spark large-star /
small-star contraction must agree with a plain union-find oracle on
every graph shape that stresses it (chains = many rounds, stars =
high degree, singletons = no edges)."""

import random

import pytest
from pyspark.sql import functions as F

from website_indexer_spark.operators.clusters import (
    assign_clusters,
    cluster_stats,
    connected_components,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node id in the component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = connected_components(df)
    return {r["node"]: r["component"] for r in got.collect()}


def test_two_components_and_isolated(spark):
    edges = [(1, 2), (2, 3), (5, 6)]
    got = _spark_components(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_long_chain_converges(spark):
    # a 40-node path graph: diameter 40 would defeat naive
    # label-propagation within a couple rounds; star contraction
    # converges in O(log^2 n)
    edges = [(i, i + 1) for i in range(40)]
    got = _spark_components(spark, edges)
    assert got == {i: 0 for i in range(41)}


def test_high_degree_star_with_bridge(spark):
    # hub 100 with 50 spokes, bridged to a second hub
    edges = [(100, 200 + i) for i in range(50)] + [(200, 300), (300, 100)]
    got = _spark_components(spark, edges)
    assert set(got.values()) == {100}
    assert len(got) == 52  # {100} ∪ {200..249} ∪ {300}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(n, edges)
    got = _spark_components(spark, edges)
    # spark result covers only nodes that appear in an edge
    touched = {a for a, _ in edges} | {b for _, b in edges}
    assert got == {x: want[x] for x in touched}


def test_assign_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in assign_clusters(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_cluster_stats(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 1), (1, 2)], ["doc_a", "doc_b"])
    stats = {
        r["cluster_id"]: (r["n_docs"], r["keep_id"])
        for r in cluster_stats(assign_clusters(docs, pairs)).collect()
    }
    assert stats[0] == (3, 0)
    assert all(v == (1, k) for k, v in stats.items() if k != 0)


def test_empty_pairs(spark):
    docs = spark.createDataFrame([(i,) for i in range(4)], ["doc_id"])
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in assign_clusters(docs, pairs).collect()
    }
    assert got == {i: i for i in range(4)}


def test_connected_components_raises_on_non_convergence(spark):
    """Exiting via max_rounds without a fixed point must fail loudly
    (ADVICE r2): a path graph needs several star-contraction rounds,
    so max_rounds=1 cannot converge."""
    import pytest
    from website_indexer_spark.operators.clusters import connected_components

    path_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path_edges, max_rounds=1).collect()
    # and an empty edge list converges trivially (no raise, no rows)
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty, max_rounds=1).count() == 0


def test_host_components_on_hand_graph(spark):
    """Host-graph CC composition (catalog q_host_components shape):
    contract page edges to hosts, run CC on stable host ids, map
    back — two islands + a singleton."""
    from pyspark.sql import functions as F

    from website_indexer_spark.operators.clusters import assign_clusters
    from website_indexer_spark.operators.linkgraph import (
        contract_to_hosts,
    )

    hosts = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "c"), (4, "c"), (5, "d"),
         (6, "e")],
        ["doc_id", "host"],
    )
    # pages: a<->b linked, c<->d linked, e isolated
    edges = spark.createDataFrame(
        [(0, 2), (2, 1), (3, 5), (5, 4)], ["src", "dst"]
    )
    hid = hosts.groupBy("host").agg(F.min("doc_id").alias("hid"))
    hedges = contract_to_hosts(edges, hosts, node_col="doc_id")
    pair_ids = (
        hedges.join(hid.select(F.col("host").alias("src"),
                               F.col("hid").alias("doc_a")), "src")
        .join(hid.select(F.col("host").alias("dst"),
                         F.col("hid").alias("doc_b")), "dst")
        .select("doc_a", "doc_b")
    )
    comp = assign_clusters(
        hid.select(F.col("hid").alias("doc_id")), pair_ids
    )
    got = {
        r["host"]: r["cluster_id"]
        for r in hid.join(
            comp.withColumnRenamed("doc_id", "hid"), "hid"
        ).collect()
    }
    assert got == {"a": 0, "b": 0, "c": 3, "d": 3, "e": 6}
