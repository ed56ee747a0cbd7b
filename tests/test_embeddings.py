"""PPMI + randomized-SVD node embeddings (ops/embeddings.py) — the
Levy & Goldberg SGNS-equivalent factorization over walk pair counts,
built as distributed linear algebra (hash-defined Ω, TSQR,
Rayleigh–Ritz)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from reffy_ray.ops.embeddings import ppmi_svd_embeddings


def _two_cluster_pairs(k=6, intra=20, inter=1):
    """Two k-cliques with heavy intra-cluster co-occurrence and one
    weak bridge: embeddings must place same-cluster nodes closer."""
    rows = []
    for base in (0, k):
        for i in range(k):
            for j in range(k):
                if i != j:
                    rows.append((base + i, base + j, intra))
    rows.append((0, k, inter))
    rows.append((k, 0, inter))
    return pd.DataFrame(rows, columns=["node_a", "node_b", "n_pairs"])


def test_embeddings_cluster_structure(ray_session):
    k = 6
    pairs = rd.from_pandas(_two_cluster_pairs(k))
    out = ppmi_svd_embeddings(pairs, n_nodes=2 * k, dim=4, iters=2)
    tbl = out.to_pandas()
    m = np.zeros((2 * k, 4))
    for _, r in tbl.iterrows():
        m[int(r["node"])] = np.asarray(r["embedding"], np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    mn = m / np.maximum(norms, 1e-12)
    cos = mn @ mn.T
    intra = np.mean([cos[i, j] for i in range(k) for j in range(k)
                     if i != j])
    inter = np.mean([cos[i, j + k] for i in range(k) for j in range(k)])
    assert intra > inter + 0.5, (intra, inter)


def test_embeddings_shape_zero_rows_and_determinism(ray_session):
    pairs = rd.from_pandas(_two_cluster_pairs(4))
    out1 = ppmi_svd_embeddings(pairs, n_nodes=10, dim=3, iters=1).to_pandas()
    assert len(out1) == 10
    assert all(len(e) == 3 for e in out1["embedding"])
    # node 8, 9 never co-occur → zero vector
    z = out1.set_index("node")["embedding"]
    assert np.allclose(np.asarray(z[8], np.float64), 0.0)
    assert np.allclose(np.asarray(z[9], np.float64), 0.0)
    # same inputs → same embeddings up to float summation noise
    pairs2 = rd.from_pandas(_two_cluster_pairs(4))
    out2 = ppmi_svd_embeddings(pairs2, n_nodes=10, dim=3, iters=1).to_pandas()
    m1 = np.stack(out1.sort_values("node")["embedding"].map(np.asarray))
    m2 = np.stack(out2.sort_values("node")["embedding"].map(np.asarray))
    # eigenvector sign is arbitrary per column — compare |cos| rowwise
    for a, b in zip(m1, m2):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 1e-9 and nb > 1e-9:
            assert abs(float(a @ b) / (na * nb)) > 0.999


def test_embeddings_broadcast_guard(ray_session):
    pairs = rd.from_pandas(_two_cluster_pairs(3))
    with pytest.raises(ValueError, match="broadcast tier"):
        ppmi_svd_embeddings(pairs, n_nodes=30_000_000, dim=4)


def test_embeddings_feed_ann(ray_session):
    """The output schema plugs straight into the ANN brute tier."""
    from reffy_ray.ops.similarity import brute_force_topk

    k = 5
    pairs = rd.from_pandas(_two_cluster_pairs(k))
    out = ppmi_svd_embeddings(pairs, n_nodes=2 * k, dim=4, iters=2)

    def rename(b):
        import pyarrow as pa

        return pa.table(
            {"vec_id": b.column("node"),
             "embedding": b.column("embedding").cast(
                 pa.list_(pa.float32()))}
        )

    ds = out.map_batches(rename, batch_format="pyarrow")
    tbl = ds.to_pandas()
    q = np.asarray(tbl[tbl.vec_id == 0]["embedding"].iloc[0],
                   np.float64)[None, :]
    top = brute_force_topk(
        rd.from_pandas(tbl), q, k=4
    ).to_pandas()
    # node 0's nearest neighbors live in its own cluster
    assert set(top["vec_id"].astype(int)) <= set(range(k))
