"""Similarity-search operator tests with numpy oracles."""

import numpy as np
import pytest

from website_indexer_spark.operators import similarity as sim

DIM = 16
N = 60
N_QUERIES = 4


def _make_vectors():
    rng = np.random.default_rng(3)
    # 4 well-separated cluster centers + jitter
    centers = rng.standard_normal((4, DIM)) * 5
    vecs = []
    for i in range(N):
        c = centers[i % 4]
        vecs.append(c + rng.standard_normal(DIM) * 0.3)
    return np.array(vecs)


VECS = _make_vectors()


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [(i, VECS[i].astype(float).tolist()) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def queries_df(spark):
    rows = [(i, VECS[i].astype(float).tolist()) for i in range(N_QUERIES)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cos_matrix():
    normed = VECS / np.linalg.norm(VECS, axis=1, keepdims=True)
    return normed @ normed.T


def _oracle_topk(k):
    cos = _cos_matrix()
    out = {}
    for q in range(N_QUERIES):
        order = sorted(
            (i for i in range(N) if i != q), key=lambda i: (-cos[q, i], i)
        )
        out[q] = order[:k]
    return out


def test_brute_force_topk(spark, corpus_df, queries_df):
    k = 5
    got = sim.brute_force_topk(corpus_df, queries_df, k).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cosine"]))
    oracle = _oracle_topk(k)
    cos = _cos_matrix()
    for q in range(N_QUERIES):
        ids = [i for i, _ in sorted(by_query[q], key=lambda t: (-t[1], t[0]))]
        assert ids == oracle[q]
        for nid, c in by_query[q]:
            assert c == pytest.approx(cos[q, nid])


def test_lsh_topk_recall(spark, corpus_df, queries_df):
    k = 5
    got = sim.lsh_topk(corpus_df, queries_df, k, dim=DIM, n_planes=16, bands=8)
    by_query = {}
    for r in got.collect():
        by_query.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    oracle = _oracle_topk(k)
    # clustered data + 8 bands of 2 bits: same-cluster vectors nearly
    # always collide; demand >=60% recall overall
    hits = sum(len(by_query.get(q, set()) & set(oracle[q])) for q in range(N_QUERIES))
    assert hits >= 0.6 * k * N_QUERIES


def test_ivf_topk_recall(spark, corpus_df, queries_df):
    """The k-means quantizer must put each planted cluster in its own
    cell(s): ≥0.8 recall@5 on the 4-cluster corpus (VERDICT r1 #6
    tightened this from 0.6 when the lowest-id quantizer went)."""
    k = 5
    got = sim.ivf_topk(corpus_df, queries_df, k, n_centroids=8, nprobe=4)
    by_query = {}
    for r in got.collect():
        by_query.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    oracle = _oracle_topk(k)
    hits = sum(len(by_query.get(q, set()) & set(oracle[q])) for q in range(N_QUERIES))
    assert hits >= 0.8 * k * N_QUERIES


def test_kmeans_centroids_follow_clusters(spark, corpus_df):
    """Every planted cluster center must be near some centroid, and
    the same seed must reproduce the same centroids (determinism)."""
    c1 = sim.kmeans_centroids(corpus_df, 8, iters=3, seed=7)
    c2 = sim.kmeans_centroids(corpus_df, 8, iters=3, seed=7)
    assert np.allclose(c1, c2)

    centers = VECS.reshape(-1, 4, DIM).mean(axis=0)  # true cluster means
    cn = c1 / np.linalg.norm(c1, axis=1, keepdims=True)
    for c in centers:
        cos = cn @ (c / np.linalg.norm(c))
        assert cos.max() > 0.95  # a centroid sits on this cluster


def test_cosine_dup_pairs_exact(spark):
    rng = np.random.default_rng(9)
    base = rng.standard_normal(DIM)
    rows = [
        (0, base.tolist()),
        (1, (base * 2.0).tolist()),          # cos = 1
        (2, (base + rng.standard_normal(DIM) * 0.01).tolist()),  # ~1
        (3, rng.standard_normal(DIM).tolist()),  # unrelated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["a"], r["b"])
        for r in sim.cosine_dup_pairs(df, 0.99, DIM, exact=True).collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_cosine_dup_pairs_lsh_finds_planted(spark):
    rng = np.random.default_rng(9)
    base = rng.standard_normal(DIM)
    rows = [(i, rng.standard_normal(DIM).tolist()) for i in range(20)]
    rows += [(100, base.tolist()), (101, (base + 0.001).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["a"], r["b"])
        for r in sim.cosine_dup_pairs(df, 0.999, DIM, bands=8, n_planes=16).collect()
    }
    assert (100, 101) in got


def test_cosine_dup_pairs_lsh_skew_split(spark):
    """Force the oversized-bucket sub-split: near-identical vectors all
    land in the same (band, code) buckets, so with max_bucket below the
    corpus size every bucket must be pre-split by the reserve
    hyperplane bits — and the planted twin pairs must still surface
    (identical vectors agree on every reserve bit, so the split can
    never separate an exact-duplicate pair)."""
    rng = np.random.default_rng(21)
    base = rng.standard_normal(DIM)
    # 30 jittered copies of one direction → every (band, code) bucket
    # holds ~all 30 rows; plus two exact-twin pairs
    rows = [(i, (base + rng.standard_normal(DIM) * 0.2).tolist()) for i in range(30)]
    rows += [(100, base.tolist()), (101, base.tolist())]
    rows += [(200, (base * 3.0).tolist()), (201, (base * 3.0).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sim.cosine_dup_pairs(
        df, 0.9999, DIM, bands=8, n_planes=16, max_bucket=8
    ).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    assert (100, 101) in pairs and (200, 201) in pairs
    # output contract: a < b, no duplicate pairs, cosine >= threshold
    assert all(r["a"] < r["b"] and r["cosine"] >= 0.9999 for r in got)
    assert len(pairs) == len(got)


# --------------------------------------------------------------------
# SemDeDup
# --------------------------------------------------------------------


def _greedy_leaders(group_vids, tau):
    """Replicate the within-cell greedy rule on the numpy vectors."""
    unit = VECS / np.linalg.norm(VECS, axis=1, keepdims=True)
    kept = {}
    leaders = []
    for vid in sorted(group_vids):
        if leaders and float((unit[leaders] @ unit[vid]).max()) >= tau:
            kept[vid] = False
        else:
            kept[vid] = True
            leaders.append(vid)
    return kept


def test_semdedup_matches_greedy_oracle(spark, corpus_df):
    tau = 0.9
    out = sim.semdedup(
        corpus_df, n_centroids=4, threshold=tau, max_cluster=10_000
    ).collect()
    assert len(out) == N
    by_cell: dict = {}
    for r in out:
        by_cell.setdefault(r["centroid"], {})[r["vid"]] = r["kept"]
    for cell, members in by_cell.items():
        assert members == _greedy_leaders(list(members), tau)
    # clusters are tight (jitter 0.3 around well-separated centers):
    # most of each cell must collapse onto a few leaders
    n_kept = sum(r["kept"] for r in out)
    assert 4 <= n_kept < N // 2


def test_semdedup_exact_duplicates_keep_min_id(spark):
    rows = [(i, VECS[i % 10].astype(float).tolist()) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vid"]: r["kept"] for r in sim.semdedup(
        df, n_centroids=3, threshold=0.999999
    ).collect()}
    # each vector appears at ids i, i+10, i+20: only the smallest
    # surviving copy per identical triple is kept
    for i in range(10):
        copies = [i, i + 10, i + 20]
        kept = [c for c in copies if out[c]]
        assert kept == [i]


def test_semdedup_deterministic_and_split_guard(spark, corpus_df):
    a = sorted(map(tuple, sim.semdedup(
        corpus_df, n_centroids=4, threshold=0.9
    ).collect()))
    b = sorted(map(tuple, sim.semdedup(
        corpus_df, n_centroids=4, threshold=0.9
    ).collect()))
    assert a == b
    # forced sub-split still covers every vector exactly once and
    # can only keep MORE (cross-sub pairs are missed, never extra
    # drops)
    split = sim.semdedup(
        corpus_df, n_centroids=4, threshold=0.9, max_cluster=8
    ).collect()
    assert len(split) == N and len({r["vid"] for r in split}) == N
    kept_full = {r["vid"] for r in sim.semdedup(
        corpus_df, n_centroids=4, threshold=0.9
    ).collect() if r["kept"]}
    kept_split = {r["vid"] for r in split if r["kept"]}
    assert kept_full <= kept_split


def test_semdedup_plan(spark, corpus_df):
    plan = (
        sim.semdedup(corpus_df, n_centroids=4, threshold=0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan or "applyInPandas" in plan.lower()
