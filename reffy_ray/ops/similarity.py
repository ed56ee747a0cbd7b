"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (``ray.put`` once, read per actor), partial
top-k per batch, tiny final merge. Scale path: IVF-style coarse
quantizer (trained driver-side on a sample) restricting the scan to
the nearest partitions.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


class _CosineScorer:
    """Holds the normalized query matrix from the object store.

    Run as plain *tasks* via ``scorer_fn`` (per-worker-process cache):
    the broadcast matrix is one zero-copy ``ray.get`` per worker, and a
    task pool avoids the pool-churn stall of consecutive actor-pool
    queries while scaling elastically."""

    def __init__(self, queries_ref, k: int):
        q = np.asarray(ray.get(queries_ref), dtype=np.float64)
        self.q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        normed = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sims = normed @ self.q.T  # (batch, nq)
        out_q, out_id, out_sim = [], [], []
        ids = batch["vec_id"].to_numpy()
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            k = min(self.k, len(col))
            # partial top-k inside the batch — only k rows leave the task
            idx = np.argpartition(-col, k - 1)[:k]
            out_q.extend([qi] * k)
            out_id.extend(ids[idx])
            # full precision through selection/ranking; rounding happens
            # only at final emission (oracle orders by full-precision
            # cosine — pre-round ties would reorder the top-k)
            out_sim.extend(col[idx])
        return pd.DataFrame({"query_id": out_q, "vec_id": out_id, "cosine": out_sim})


_SCORERS: dict[tuple, _CosineScorer] = {}


def scorer_fn(queries_ref, k: int, cls=None):
    """Task closure over (queries_ref, k) with a per-worker cache —
    the object-store matrix is fetched once per worker process."""
    cls = cls or _CosineScorer

    def score(batch):
        key = (cls.__name__, queries_ref.hex(), k)
        s = _SCORERS.get(key)
        if s is None:
            s = cls(queries_ref, k)
            _SCORERS[key] = s
        return s(batch)

    return score


def brute_force_topk(
    ds: rd.Dataset, queries: np.ndarray, k: int = 10
) -> pa.Table:
    """Exact cosine top-k for each query row; returns a small Arrow
    table (query_id, vec_id, cosine, rank). Per-batch partial top-k →
    driver-side heap merge of ≤ k·num_batches candidate rows."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        scorer_fn(qref, k), batch_format="pandas"
    )
    best: dict[int, list] = {}
    for batch in partials.iter_batches(batch_size=8192, batch_format="pandas"):
        for qi, vid, sim in zip(batch["query_id"], batch["vec_id"], batch["cosine"]):
            heap = best.setdefault(int(qi), [])
            item = (float(sim), -int(vid))  # tie-break: lower vec_id wins
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    rows = []
    for qi in sorted(best):
        ranked = sorted(best[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (sim, neg_id) in enumerate(ranked):
            rows.append(
                {"query_id": qi, "vec_id": -neg_id, "cosine": round(sim, 6), "rank": rank}
            )
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# IVF-bucketed scale path
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    ds: rd.Dataset, n_centroids: int = 16, sample_rows: int = 2048, iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Tiny k-means trained driver-side on a sample (the coarse
    quantizer is small state broadcast to every task)."""
    sample = ds.limit(sample_rows).to_pandas()
    x = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_topk(
    ds: rd.Dataset, queries: np.ndarray, centroids: np.ndarray,
    k: int = 10, nprobe: int = 4,
) -> pa.Table:
    """IVF scan: rows whose nearest centroid is within the queries'
    ``nprobe`` shortlist are scored; everything else is skipped at the
    batch level (vectorized mask) — the 100TB path where the full
    matmul is too expensive."""
    q = np.asarray(queries, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    probe = set(
        int(c)
        for qi in range(qn.shape[0])
        for c in np.argsort(-(qn[qi] @ centroids.T))[:nprobe]
    )
    cref = ray.put(centroids)
    probe_ref = ray.put(sorted(probe))

    class Filtered(_CosineScorer):
        def __init__(self, queries_ref, k):
            super().__init__(queries_ref, k)
            self.cent = ray.get(cref)
            self.probe = np.asarray(ray.get(probe_ref))

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            normed = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
            assign = (normed @ self.cent.T).argmax(axis=1)
            mask = np.isin(assign, self.probe)
            if not mask.any():
                return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
            return super().__call__(batch[mask])

    qref = ray.put(qn)
    partials = ds.map_batches(
        scorer_fn(qref, k, cls=Filtered), batch_format="pandas"
    )
    import heapq as hq

    best: dict[int, list] = {}
    for batch in partials.iter_batches(batch_size=8192, batch_format="pandas"):
        for qi, vid, sim in zip(batch["query_id"], batch["vec_id"], batch["cosine"]):
            heap = best.setdefault(int(qi), [])
            item = (float(sim), -int(vid))
            if len(heap) < k:
                hq.heappush(heap, item)
            elif item > heap[0]:
                hq.heapreplace(heap, item)
    rows = []
    for qi in sorted(best):
        ranked = sorted(best[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (sim, neg_id) in enumerate(ranked):
            rows.append(
                {"query_id": qi, "vec_id": -neg_id, "cosine": round(sim, 6), "rank": rank}
            )
    return pa.Table.from_pylist(rows)
