"""Graph + clustering op tests: pagerank fixed-point math on tiny
hand-checkable graphs, kmeans determinism / convergence semantics."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from reffy_ray.ops.graph import pagerank, triangles
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


def test_pagerank_tiers_agree(ray_session):
    # broadcast (dense driver state) and join (fully distributed)
    # tiers run identical math — same output bit-for-bit
    edges = [(1, 0), (2, 0), (3, 0), (0, 1), (1, 2), (4, 5), (4, 0)]
    ds = rd.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    ).repartition(3)
    b = pagerank(ds, n_nodes=6, iters=3, mode="broadcast").to_pandas()
    j = pagerank(ds, n_nodes=6, iters=3, mode="join").to_pandas()
    merged = b.merge(j, on="node", suffixes=("_b", "_j"))
    assert len(merged) == 6
    assert (merged["rank_e9_b"] == merged["rank_e9_j"]).all()


def test_pagerank_uniform_cycle_stays_uniform(ray_session):
    # ring: every node has outdeg 1 and indeg 1 -> uniform fixed point
    n = 8
    edges = [(i, (i + 1) % n) for i in range(n)]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = pagerank(ds, n_nodes=n, iters=4).to_pandas()
    assert got["rank_e9"].nunique() == 1
    assert got["rank_e9"].iloc[0] == 125_000_000  # 1/8 * 1e9


def test_triangles_counts_k4(ray_session):
    # K4 has 4 triangles; every node sits in 3 of them
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    ds = rd.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    ).repartition(3)
    got = triangles(ds).to_pandas().sort_values("node")
    assert got["node"].tolist() == [0, 1, 2, 3]
    assert got["triangles"].tolist() == [3, 3, 3, 3]


def test_triangles_dedups_and_canonicalizes(ray_session):
    # reversed duplicates, parallel edges, and a self-loop must not
    # inflate the count; the dangling edge (3,4) adds no triangle
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2), (3, 4)]
    ds = rd.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    got = triangles(ds).to_pandas().sort_values("node")
    assert got["node"].tolist() == [0, 1, 2]
    assert got["triangles"].tolist() == [1, 1, 1]


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


def _path_edges(n):
    # 0-1-2-...-(n-1) plus a detour 0-(n-1) long-cut to test min-hop
    return rd.from_pandas(
        pd.DataFrame(
            {
                "a": list(range(n - 1)),
                "b": list(range(1, n)),
            }
        )
    )


def test_bfs_hops_min_distance_on_path(ray_session):
    from reffy_ray.ops.graph import bfs_hops

    got = (
        bfs_hops(_path_edges(10), [0], max_hops=3)
        .to_pandas()
        .set_index("node")["dist"]
    )
    assert got.to_dict() == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_hops_multi_source_takes_nearest_seed(ray_session):
    from reffy_ray.ops.graph import bfs_hops

    got = (
        bfs_hops(_path_edges(11), [0, 10], max_hops=2)
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    assert got == {0: 0, 1: 1, 2: 2, 10: 0, 9: 1, 8: 2}


def test_bfs_hops_tiers_agree(ray_session):
    from reffy_ray.ops.graph import bfs_hops

    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "a": [0, 1, 2, 3, 4, 5, 0, 7],
                "b": [1, 2, 3, 4, 5, 6, 6, 8],
            }
        )
    ).repartition(3)
    b = (
        bfs_hops(edges, [0], max_hops=3, mode="broadcast")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    j = (
        bfs_hops(edges, [0], max_hops=3, mode="join")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert b.equals(j)
    # 7-8 component unreached; 6 reached in 1 hop via the 0-6 edge
    assert b.set_index("node")["dist"].to_dict() == {
        0: 0, 1: 1, 2: 2, 3: 3, 6: 1, 5: 2, 4: 3,
    }


def test_kcore_peels_to_fixpoint(ray_session):
    """Star + triangle-clique: the star center has high degree but its
    leaves peel first, collapsing the center too; only the 4-clique
    survives k=3 — degree alone (a single filter pass) would keep the
    center, so this pins the iterative cascade."""
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.graph import kcore

    # clique on 0-3; star center 10 with leaves 11-15 plus an edge to 0
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    star = [(10, x) for x in range(11, 16)] + [(0, 10)]
    df = pd.DataFrame(clique + star, columns=["a", "b"])
    for mode in ("broadcast", "join"):
        out = (
            kcore(rd.from_pandas(df).repartition(3), k=3, mode=mode)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert out["node"].tolist() == [0, 1, 2, 3], mode
        assert out["deg"].tolist() == [3, 3, 3, 3], mode


# --- HITS -----------------------------------------------------------


def _hits_ref(edge_list, n, iters=2):
    """Driver-side dense reference with the same snap/norm math."""
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        raw = np.zeros(n)
        for s, d in edge_list:
            raw[d] += h[s]
        nrm = np.sqrt((raw * raw).sum()) or 1.0
        a = np.round(raw / nrm, 12)
        raw = np.zeros(n)
        for s, d in edge_list:
            raw[s] += a[d]
        nrm = np.sqrt((raw * raw).sum()) or 1.0
        h = np.round(raw / nrm, 12)
    return (
        np.floor(h * 1e9 + 0.5).astype("int64"),
        np.floor(a * 1e9 + 0.5).astype("int64"),
    )


def _star_edges():
    # node 0 is the authority everyone points at; 4 also points at 1
    return [(1, 0), (2, 0), (3, 0), (4, 0), (4, 1)]


def test_hits_matches_dense_reference(ray_session):
    from reffy_ray.ops.graph import hits

    el = _star_edges()
    edges = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
    got = (
        hits(edges, n_nodes=5, iters=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    eh, ea = _hits_ref(el, 5)
    assert list(got["hub_e9"]) == list(eh)
    assert list(got["auth_e9"]) == list(ea)
    # node 0 is the top authority and a zero hub
    assert got["auth_e9"].idxmax() == 0
    assert got.loc[0, "hub_e9"] == 0


def test_hits_tiers_agree(ray_session):
    from reffy_ray.ops.graph import hits

    el = _star_edges() + [(0, 2), (2, 3)]
    edges = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
    b = (
        hits(edges, n_nodes=5, iters=2, mode="broadcast")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    edges2 = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
    j = (
        hits(edges2, n_nodes=5, iters=2, mode="join")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(b, j)


# --- random_walks ---------------------------------------------------


def test_random_walks_tiers_agree_and_deterministic(ray_session):
    from reffy_ray.ops.graph import random_walks

    el = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 0)]
    edges = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
    b = (
        random_walks(edges, n_nodes=4, walk_len=3, mode="broadcast")
        .to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    )
    edges2 = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
    j = (
        random_walks(edges2, n_nodes=4, walk_len=3, mode="join")
        .to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(b, j)
    # step 0 is the start node; every hop follows a real edge
    adj = {}
    for s, d in el:
        adj.setdefault(s, set()).add(d)
    for w in range(4):
        walk = b[b.walk_id == w].sort_values("step")["node"].tolist()
        assert walk[0] == w
        for a_, b_ in zip(walk, walk[1:]):
            assert b_ in adj[a_]
    # determinism: a second run is identical
    edges3 = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
    again = (
        random_walks(edges3, n_nodes=4, walk_len=3, mode="broadcast")
        .to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(b, again)


def test_random_walks_dead_end_stays(ray_session):
    from reffy_ray.ops.graph import random_walks

    el = [(0, 1)]  # node 1 is a dead end; 2 is isolated
    for mode in ("broadcast", "join"):
        edges = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
        out = (
            random_walks(edges, n_nodes=3, walk_len=2, mode=mode)
            .to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
        )
        w0 = out[out.walk_id == 0]["node"].tolist()
        assert w0 == [0, 1, 1], mode  # walks to 1, then stays
        w2 = out[out.walk_id == 2]["node"].tolist()
        assert w2 == [2, 2, 2], mode  # isolated node never moves


def test_walk_skipgrams_counts_hand_checked(ray_session):
    from reffy_ray.ops.graph import walk_skipgrams

    walks = rd.from_pandas(pd.DataFrame(
        {"walk_id": [0, 0, 0, 1, 1],
         "step": [0, 1, 2, 0, 1],
         "node": [5, 6, 5, 6, 5]}
    ))
    out = (
        walk_skipgrams(walks, window=2).to_pandas()
        .sort_values(["node_a", "node_b"]).reset_index(drop=True)
    )
    # walk 0 (5,6,5): d1 -> (5,6),(6,5); d2 -> (5,5). walk 1 (6,5): (6,5)
    got = {(r.node_a, r.node_b): r.n_pairs for r in out.itertuples()}
    assert got == {(5, 6): 1, (6, 5): 2, (5, 5): 1}


def test_walk_skipgrams_uses_true_step_distance(ray_session):
    # a filtered walk table with a step gap: (0,5) -> (3,9) must NOT
    # pair as distance 1 (review-pass regression)
    from reffy_ray.ops.graph import walk_skipgrams

    walks = rd.from_pandas(pd.DataFrame(
        {"walk_id": [0, 0], "step": [0, 3], "node": [5, 9]}
    ))
    out = walk_skipgrams(walks, window=2).to_pandas()
    assert len(out) == 0


# --- biased_walks (second-order node2vec) ---------------------------


def _py_biased_walks(el, n, walk_len, p, q, salt="walk", scale=1000):
    """Pure-Python replay of the documented rule, independent of the
    engine code paths (only the shared key helper is reused)."""
    from reffy_ray.ops.graph import (
        _biased_weights, _walk_choice_keys, _walk_salt32,
    )
    import numpy as np

    adj = {}
    eset = set()
    for s, d in el:
        if 0 <= s < n and 0 <= d < n:
            adj.setdefault(s, set()).add(d)
            eset.add((s, d))
    salt32 = _walk_salt32(salt + "#r")
    w_ret, w_in, w_out = _biased_weights(p, q, scale)
    rows = []
    for w in range(n):
        cur, prev = w, w
        rows.append((w, 0, cur))
        for t in range(walk_len):
            nbrs = sorted(adj.get(cur, ()))
            if not nbrs:
                prev = cur
                rows.append((w, t + 1, cur))
                continue
            if t == 0:
                wts = [1] * len(nbrs)
            else:
                wts = [
                    w_ret if d == prev
                    else (w_in if (prev, d) in eset else w_out)
                    for d in nbrs
                ]
            total = sum(wts)
            r = int(_walk_choice_keys(salt32, np.uint64(w), t, 0)) % total
            cum, chosen = 0, nbrs[-1]
            for d, wt in zip(nbrs, wts):
                cum += wt
                if cum > r:
                    chosen = d
                    break
            prev, cur = cur, chosen
            rows.append((w, t + 1, cur))
    return pd.DataFrame(rows, columns=["walk_id", "step", "node"])


def test_biased_walks_tiers_match_python_replay(ray_session):
    from reffy_ray.ops.graph import biased_walks

    el = [(0, 1), (0, 2), (1, 0), (1, 2), (1, 3), (2, 0), (2, 3),
          (3, 1), (3, 0), (2, 9), (7, 1)]  # two out-of-range-ish rows
    want = (
        _py_biased_walks(el, 4, 3, p=2.0, q=0.5)
        .sort_values(["walk_id", "step"]).reset_index(drop=True)
    )
    for mode in ("broadcast", "join"):
        edges = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
        got = (
            biased_walks(edges, n_nodes=4, walk_len=3, p=2.0, q=0.5,
                         mode=mode)
            .to_pandas().sort_values(["walk_id", "step"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want), mode


def test_biased_walks_p_q_bias_direction(ray_session):
    """On a hub graph, tiny p (return-loving) walks bounce home;
    huge p + tiny q (exploring) walks do not return immediately."""
    from reffy_ray.ops.graph import biased_walks

    # star: hub 0 <-> leaves 1..6; leaves only connect to the hub
    el = [(0, i) for i in range(1, 7)] + [(i, 0) for i in range(1, 7)]

    def ret_rate(p, q):
        edges = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
        walks = (
            biased_walks(edges, n_nodes=7, walk_len=4, p=p, q=q,
                         mode="broadcast")
            .to_pandas().sort_values(["walk_id", "step"])
        )
        # fraction of 2-step windows that return to where they began
        back = 0
        tot = 0
        for w, g in walks.groupby("walk_id"):
            ns = g["node"].tolist()
            for a, b, c in zip(ns, ns[1:], ns[2:]):
                if a != b:
                    tot += 1
                    back += (a == c)
        return back / max(tot, 1)

    assert ret_rate(0.01, 1.0) > ret_rate(100.0, 1.0)


def test_biased_walks_dead_end_stays(ray_session):
    from reffy_ray.ops.graph import biased_walks

    el = [(0, 1)]
    for mode in ("broadcast", "join"):
        edges = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
        out = (
            biased_walks(edges, n_nodes=3, walk_len=2, p=0.5, q=2.0,
                         mode=mode)
            .to_pandas().sort_values(["walk_id", "step"])
            .reset_index(drop=True)
        )
        assert out[out.walk_id == 0]["node"].tolist() == [0, 1, 1], mode
        assert out[out.walk_id == 2]["node"].tolist() == [2, 2, 2], mode
