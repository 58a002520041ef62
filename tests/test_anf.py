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


def test_harmonic_rank_matches_float_order_and_python_key(spark):
    """harmonic_rank (r4 verdict item 6): the exact-integer rank must
    (a) totally order all nodes, (b) agree with the float estimator's
    order wherever the floats are distinguishable, and (c) equal a
    plain-Python evaluation of the same pinned key protocol."""
    from website_indexer_spark.operators.anf import (
        harmonic_key_constants,
        harmonic_rank,
        harmonic_weights,
    )

    nodes, edges = _graph(spark)
    got = {
        r["node"]: r["harmonic_rank"]
        for r in harmonic_rank(nodes, edges, rounds=3).collect()
    }
    assert sorted(got.values()) == list(range(1, len(NODES) + 1))

    # python replica of the key protocol over the python ANF oracle
    s = _py_anf(NODES, EDGES, 3)
    ks = harmonic_key_constants(ANF_REGISTERS)
    cs = harmonic_weights(3)
    def key(n):
        tot = 0
        for t in range(1, 4):
            st = s[(n, t)]
            q = min(st // ANF_REGISTERS, 62)
            tot += cs[t - 1] * ks[st % ANF_REGISTERS] * (1 << q)
        return tot
    order = sorted(NODES, key=lambda n: (-key(n), n))
    want = {n: i + 1 for i, n in enumerate(order)}
    assert got == want

    # float-order agreement (floats distinguishable on this graph)
    hc = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(nodes, edges, rounds=3).collect()
    }
    forder = sorted(NODES, key=lambda n: (-hc[n], n))
    assert [order.index(n) for n in forder] == list(range(len(NODES)))


def test_harmonic_key_expr_dialects_share_constants():
    """Both dialect strings inline the same pinned K table and
    weights — the generator is the single source of truth."""
    from website_indexer_spark.operators.anf import (
        harmonic_key_constants,
        harmonic_key_expr,
        harmonic_weights,
    )

    sp = harmonic_key_expr(3, dialect="spark")
    dd = harmonic_key_expr(3, dialect="duckdb")
    for k in harmonic_key_constants():
        assert str(k) in sp and str(k) in dd
    for c in harmonic_weights(3):
        assert f"CAST({c} * " in sp and f"CAST({c} * " in dd
    assert "DECIMAL(38,0)" in sp and "HUGEINT" in dd


def test_harmonic_key_expr_extreme_values_duckdb_vs_python():
    """The key protocol's cap/shift-split arithmetic checked at
    EXTREME sketch statistics the gate corpus never reaches (s up to
    the 16*63 ceiling, q past both the 31-bit split and the 62 cap):
    the DuckDB dialect evaluated on raw (s1,s2,s3) rows must equal
    the plain-Python integer formula exactly."""
    import random

    import duckdb

    from website_indexer_spark.operators.anf import (
        ANF_REGISTERS,
        HARMONIC_Q_CAP,
        harmonic_key_constants,
        harmonic_key_expr,
        harmonic_weights,
    )

    rng = random.Random(7)
    rows = [(0, 0, 0), (1008, 1008, 1008), (992, 16, 512)] + [
        (rng.randint(0, 1008), rng.randint(0, 1008), rng.randint(0, 1008))
        for _ in range(200)
    ]
    ks = harmonic_key_constants()
    cs = harmonic_weights(3)

    def pykey(s1, s2, s3):
        tot = 0
        for c, s in zip(cs, (s1, s2, s3)):
            q = min(s // ANF_REGISTERS, HARMONIC_Q_CAP)
            tot += c * ks[s % ANF_REGISTERS] * (1 << q)
        return tot

    con = duckdb.connect()
    con.execute("CREATE TABLE t(s1 BIGINT, s2 BIGINT, s3 BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    expr = harmonic_key_expr(3, dialect="duckdb")
    got = con.execute(f"SELECT s1, s2, s3, {expr} AS k FROM t").fetchall()
    for s1, s2, s3, k in got:
        assert int(k) == pykey(s1, s2, s3), (s1, s2, s3)


def test_harmonic_key_expr_extreme_values_spark_vs_python(spark):
    """Same extreme-statistic sweep through the SPARK dialect: the
    decimal(38,0) product path must agree with the Python integers
    (a silent decimal overflow would surface as NULL here)."""
    import random

    from website_indexer_spark.operators.anf import (
        ANF_REGISTERS,
        HARMONIC_Q_CAP,
        harmonic_key_constants,
        harmonic_key_expr,
        harmonic_weights,
    )

    rng = random.Random(11)
    rows = [(0, 0, 0), (1008, 1008, 1008)] + [
        (rng.randint(0, 1008), rng.randint(0, 1008), rng.randint(0, 1008))
        for _ in range(60)
    ]
    ks = harmonic_key_constants()
    cs = harmonic_weights(3)

    def pykey(s1, s2, s3):
        tot = 0
        for c, s in zip(cs, (s1, s2, s3)):
            q = min(s // ANF_REGISTERS, HARMONIC_Q_CAP)
            tot += c * ks[s % ANF_REGISTERS] * (1 << q)
        return tot

    df = spark.createDataFrame(rows, ["s1", "s2", "s3"])
    expr = harmonic_key_expr(3, dialect="spark")
    out = df.selectExpr("s1", "s2", "s3", f"({expr}) AS k").collect()
    for r in out:
        assert r["k"] is not None, (r["s1"], r["s2"], r["s3"])
        assert int(r["k"]) == pykey(r["s1"], r["s2"], r["s3"])
