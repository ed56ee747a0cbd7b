"""Graph/node embeddings from walk co-occurrence, Ray-Data-first.

``ppmi_svd_embeddings`` factorizes the PPMI matrix of the skip-gram
pair corpus (walk_skipgrams / biased_walks output) — the classical
result that SGNS/word2vec implicitly factorizes shifted PPMI (Levy &
Goldberg, "Neural Word Embedding as Implicit Matrix Factorization",
NeurIPS 2014) — so node2vec-style embeddings fall out of pure
distributed linear algebra, deterministic up to float summation
order, with no parameter server and no SGD:

1. PPMI triples: one pass over the pair table with the row/col/total
   counts broadcast as dense arrays (node-indexed, the pagerank
   broadcast-tier memory contract: fine to ~20M nodes, beyond that
   the counts become a bucketed join like everything else).
2. Randomized subspace iteration (Halko/Martinsson/Tropp 2011):
   ``Y = A @ Ω`` where Ω is HASH-DEFINED — Ω[j] is regenerated from
   ``splitmix``-style integer mixing of (j, seed) inside every task,
   so the n×d test matrix is never materialized anywhere, not even
   once. Each triple batch emits per-row partial d-vectors
   (np.add.at), a ``groupby(node)`` sums them: A@Ω with the matrix
   streaming and only (n × d) row tables ever existing.
3. TSQR orthonormalization: per-block QR → stack the tiny d×d R
   factors driver-side → second QR → broadcast inv(R); Q = Y·inv(R)
   block-wise. The tall matrix never gathers.
4. Rayleigh–Ritz: B = Qᵀ A Q accumulated as d×d per-batch partials
   (driver sums a handful of 16×16 matrices), eigendecompose B
   driver-side, embeddings = Q @ V · sqrt(|λ|).

Output: ``(node, embedding: list<float>)`` — feeds straight into the
ANN / semantic-dedup operators (ops/similarity.py) as the embedding
column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .graph import _WALK_MASK, _WALK_M, _WALK_S16


def _hash_gaussianish(cols: np.ndarray, dim: int, seed: int) -> np.ndarray:
    """Deterministic Ω rows for column ids: (len(cols), dim) float64 in
    [-1, 1), regenerated identically in every task from integer
    mixing — no broadcast, no RNG state."""
    c = cols.astype(np.uint64)[:, None]
    j = np.arange(dim, dtype=np.uint64)[None, :]
    x = (c * np.uint64(2654435761) + j * np.uint64(40503)
         + np.uint64(seed) * np.uint64(2246822519)) & _WALK_MASK
    x ^= x >> _WALK_S16
    x = (x * _WALK_M) & _WALK_MASK
    x ^= x >> _WALK_S16
    x = (x * _WALK_M) & _WALK_MASK
    x ^= x >> _WALK_S16
    return (x.astype(np.float64) / 2147483648.0) - 1.0


def ppmi_svd_embeddings(
    pairs: rd.Dataset,
    n_nodes: int,
    dim: int = 16,
    iters: int = 2,
    shift: float = 1.0,
    a_col: str = "node_a",
    b_col: str = "node_b",
    w_col: str = "n_pairs",
    broadcast_max_nodes: int = 20_000_000,
) -> rd.Dataset:
    """→ Dataset(node, embedding: list<float32>) for nodes 0..n-1.

    ``pairs`` is a (node_a, node_b, n_pairs) co-occurrence table
    (walk_skipgrams output). The matrix is symmetrized (A + Aᵀ) so
    the Rayleigh–Ritz step is exact. Nodes that never co-occur get
    the zero vector.
    """
    if n_nodes > broadcast_max_nodes:
        raise ValueError(
            f"n_nodes={n_nodes} exceeds the broadcast tier's "
            f"{broadcast_max_nodes}: the count vectors and Q row table "
            "must move to the bucketed-join tier (not implemented — "
            "see module docstring)"
        )

    pairs = pairs.materialize()

    def _in_range(a: np.ndarray, bb: np.ndarray) -> np.ndarray:
        # same input contract as the walk/pagerank ops: out-of-range
        # node ids are dropped up front, never wrapped (np.add.at with
        # a negative id would silently corrupt the tail of the count
        # vector — review finding)
        return (a >= 0) & (a < n_nodes) & (bb >= 0) & (bb < n_nodes)

    # --- pass 0: marginal counts, broadcast once -------------------------
    row_cnt = np.zeros(n_nodes, np.float64)
    total = 0.0
    for b in pairs.iter_batches(batch_format="pandas"):
        a = b[a_col].to_numpy().astype(np.int64)
        bb = b[b_col].to_numpy().astype(np.int64)
        w = b[w_col].to_numpy().astype(np.float64)
        ok = _in_range(a, bb)
        a, bb, w = a[ok], bb[ok], w[ok]
        # symmetrized marginals (row == col marginal by symmetry)
        np.add.at(row_cnt, a, w)
        np.add.at(row_cnt, bb, w)
        total += 2.0 * float(w.sum())
    cnt_ref = ray.put(row_cnt)

    def ppmi_triples(b: pd.DataFrame) -> pd.DataFrame:
        cnt = ray.get(cnt_ref)
        a = b[a_col].to_numpy().astype(np.int64)
        bb = b[b_col].to_numpy().astype(np.int64)
        w = b[w_col].to_numpy().astype(np.float64)
        ok = _in_range(a, bb)
        a, bb, w = a[ok], bb[ok], w[ok]
        with np.errstate(divide="ignore"):
            val = np.log((w * total) / (cnt[a] * cnt[bb])) - np.log(shift)
        val = np.maximum(val, 0.0)
        keep = val > 0
        # symmetrize: emit both (a,b) and (b,a)
        return pd.DataFrame(
            {
                "row": np.concatenate([a[keep], bb[keep]]),
                "col": np.concatenate([bb[keep], a[keep]]),
                "val": np.concatenate([val[keep], val[keep]]),
            }
        )

    triples = pairs.map_batches(
        ppmi_triples, batch_format="pandas"
    ).materialize()

    def matmul_partials(q_ref=None, seed: int = 0):
        """A @ X where X is either hash-defined Ω (q_ref None) or a
        broadcast (n × d) dense matrix."""

        def inner(b: pd.DataFrame) -> pd.DataFrame:
            rows = b["row"].to_numpy().astype(np.int64)
            cols = b["col"].to_numpy().astype(np.int64)
            vals = b["val"].to_numpy()
            x = (
                _hash_gaussianish(cols, dim, seed)
                if q_ref is None
                else ray.get(q_ref)[cols]
            )
            contrib = vals[:, None] * x
            uniq, inv = np.unique(rows, return_inverse=True)
            acc = np.zeros((len(uniq), dim), np.float64)
            np.add.at(acc, inv, contrib)
            out = pd.DataFrame(acc, columns=[f"y{k}" for k in range(dim)])
            out.insert(0, "node", uniq)
            return out

        return inner

    from ray.data.aggregate import Sum

    ycols = [f"y{k}" for k in range(dim)]

    def fold_rows(ds: rd.Dataset) -> rd.Dataset:
        return ds.groupby("node").aggregate(
            *[Sum(c, alias_name=c) for c in ycols]
        )

    # --- subspace iteration ---------------------------------------------
    # Y is ALWAYS a distributed (node, y0..y{d-1}) table; the only
    # dense driver-side objects are d×d.
    y = fold_rows(
        triples.map_batches(matmul_partials(None, seed=7),
                            batch_format="pandas")
    ).materialize()

    def to_dense(ds: rd.Dataset) -> np.ndarray:
        # broadcast-tier gather of the (n × d) row table (the SAME
        # memory contract as pagerank's broadcast rank vector)
        m = np.zeros((n_nodes, dim), np.float64)
        for b in ds.iter_batches(batch_format="pandas"):
            m[b["node"].to_numpy().astype(np.int64)] = b[ycols].to_numpy()
        return m

    def tsqr_orthonormalize(ds: rd.Dataset) -> np.ndarray:
        """Distributed TSQR: per-block R factors, tiny driver QR,
        return the (n × d) Q via broadcast inv(R)."""
        rs = []
        for b in ds.iter_batches(batch_format="pandas"):
            _q, r = np.linalg.qr(b[ycols].to_numpy())
            rs.append(r)
        _q, r_total = np.linalg.qr(np.vstack(rs) if rs
                                   else np.zeros((dim, dim)))
        # guard rank deficiency: pseudo-inverse keeps zero directions 0
        rinv = np.linalg.pinv(r_total)
        q = to_dense(ds) @ rinv
        return q

    q = tsqr_orthonormalize(y)
    for it in range(iters):
        q_ref = ray.put(q)
        y = fold_rows(
            triples.map_batches(matmul_partials(q_ref),
                                batch_format="pandas")
        ).materialize()
        q = tsqr_orthonormalize(y)

    # --- Rayleigh–Ritz ----------------------------------------------------
    q_ref = ray.put(q)
    aq = fold_rows(
        triples.map_batches(matmul_partials(q_ref), batch_format="pandas")
    )
    b_small = np.zeros((dim, dim), np.float64)
    for b in aq.iter_batches(batch_format="pandas"):
        nodes = b["node"].to_numpy().astype(np.int64)
        b_small += q[nodes].T @ b[ycols].to_numpy()
    evals, evecs = np.linalg.eigh((b_small + b_small.T) / 2.0)
    order = np.argsort(-np.abs(evals))
    scale = np.sqrt(np.abs(evals[order]))
    basis_ref = ray.put(q @ (evecs[:, order] * scale[None, :]))

    def emit(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        emb = ray.get(basis_ref)
        nodes = batch.column("id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        flat = np.ascontiguousarray(emb[nodes], dtype=np.float32).ravel()
        # zero-copy fixed-size-list assembly — no per-row Python
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.float32()), dim
        )
        return pa.table(
            {"node": pa.array(nodes, pa.int64()), "embedding": arr}
        )

    return rd.range(n_nodes).map_batches(emit, batch_format="pyarrow")
