"""Graph + clustering op tests: pagerank fixed-point math on tiny
hand-checkable graphs, kmeans determinism / convergence semantics."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from reffy_ray.ops.graph import pagerank
from reffy_ray.ops.similarity import kmeans


def _ranks(edges, n, iters=3, damping=0.85):
    """Driver-side reference: same leak-variant recurrence with the
    same 12-dp per-iteration snap."""
    r = np.full(n, 1.0 / n)
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        outdeg[s] += 1
    base = (1.0 - damping) / n
    for _ in range(iters):
        c = np.zeros(n)
        for s, d in edges:
            c[d] += r[s] / outdeg[s]
        r = np.round(base + damping * c, 12)
    return np.floor(r * 1e9 + 0.5).astype("int64")


def test_pagerank_matches_dense_reference(ray_session):
    # 6-node graph with a sink-only node (5) and a hub (0)
    edges = [(1, 0), (2, 0), (3, 0), (0, 1), (1, 2), (4, 5), (4, 0)]
    ds = rd.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    ).repartition(3)
    got = (
        pagerank(ds, n_nodes=6, iters=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = _ranks(edges, 6)
    assert got["node"].tolist() == list(range(6))
    assert got["rank_e9"].tolist() == want.tolist()


def test_pagerank_uniform_cycle_stays_uniform(ray_session):
    # ring: every node has outdeg 1 and indeg 1 -> uniform fixed point
    n = 8
    edges = [(i, (i + 1) % n) for i in range(n)]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = pagerank(ds, n_nodes=n, iters=4).to_pandas()
    assert got["rank_e9"].nunique() == 1
    assert got["rank_e9"].iloc[0] == 125_000_000  # 1/8 * 1e9


def test_kmeans_separates_obvious_clusters(ray_session):
    # two tight blobs far apart; k=2 seeds land one in each blob
    rng = np.random.default_rng(7)
    a = rng.normal(0.0, 0.05, (20, 4))
    b = rng.normal(10.0, 0.05, (20, 4))
    vecs = np.vstack([a[:1], b[:1], a[1:], b[1:]])  # ids 0,1 seed both
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(40, dtype="int64"),
                "embedding": [v.astype("float32") for v in vecs],
            }
        )
    ).repartition(4)
    got = kmeans(ds, k=2, iters=3).to_pandas().set_index("vec_id")["cluster"]
    blob_a = [0] + list(range(2, 21))
    blob_b = [1] + list(range(21, 40))
    assert got.loc[blob_a].nunique() == 1
    assert got.loc[blob_b].nunique() == 1
    assert got.loc[0] != got.loc[1]


def test_kmeans_is_block_layout_invariant(ray_session):
    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 1, (60, 8)).astype("float32")
    df = pd.DataFrame(
        {"vec_id": np.arange(60, dtype="int64"), "embedding": list(vecs)}
    )
    one = kmeans(rd.from_pandas(df), k=4, iters=2).to_pandas()
    many = kmeans(rd.from_pandas(df).repartition(7), k=4, iters=2).to_pandas()
    merged = one.merge(many, on="vec_id", suffixes=("_1", "_n"))
    assert (merged["cluster_1"] == merged["cluster_n"]).all()


def test_kmeans_raises_on_emptied_cluster(ray_session):
    # 3 identical points, k=2: every point assigns to cluster 0, so the
    # update pass must fail loud rather than silently dropping cluster 1
    df = pd.DataFrame(
        {
            "vec_id": np.arange(3, dtype="int64"),
            "embedding": [np.ones(4, dtype="float32")] * 3,
        }
    )
    with pytest.raises(ValueError, match="emptied"):
        kmeans(rd.from_pandas(df), k=2, iters=2).to_pandas()
