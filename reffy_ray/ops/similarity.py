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
#
# Two tiers:
#  * ``ivf_topk`` — index-free: assignments recomputed per batch, rows
#    outside the probe shortlist masked out. Saves matmul FLOPs but
#    still *reads* every block — fine for one-off queries.
#  * ``IVFIndex`` — real inverted lists: the corpus is written once as
#    centroid-partitioned Parquet; each query then reads ONLY the
#    ``nprobe`` probed partitions (hive-partition pruning at the read,
#    nothing else leaves storage). This is the 100 TB path: build cost
#    is one pass + one partitioned write, query cost is
#    nprobe/n_centroids of the corpus.
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


# ---------------------------------------------------------------------------
# Inverted-list IVF index (persisted, partition-pruned probes)
# ---------------------------------------------------------------------------


class IVFIndex:
    """Persisted IVF index: centroid-partitioned Parquet + a small
    centroid matrix.

    ``build`` assigns every vector to its nearest coarse centroid in
    one ``map_batches`` pass (centroids broadcast via ``ray.put``) and
    writes hive-partitioned Parquet (``centroid=<c>/``, one directory
    per inverted list — also the resumable-output layout: a failed
    build can skip finished partitions). ``topk`` computes the probe
    shortlist driver-side from the tiny centroid matrix, then
    ``read_parquet(filter=centroid ∈ probes)`` prunes every
    non-probed partition at the read — at scale only
    nprobe/n_centroids of the corpus leaves storage.
    """

    def __init__(self, index_dir: str, centroids: np.ndarray):
        self.index_dir = index_dir
        self.centroids = np.asarray(centroids, dtype=np.float64)

    # -- build ------------------------------------------------------------

    @classmethod
    def build(
        cls,
        ds: rd.Dataset,
        index_dir: str,
        n_centroids: int = 16,
        sample_rows: int = 2048,
        iters: int = 10,
        seed: int = 7,
    ) -> "IVFIndex":
        import os

        cent = train_ivf_centroids(
            ds, n_centroids=n_centroids, sample_rows=sample_rows,
            iters=iters, seed=seed,
        )
        cref = ray.put(cent)

        def assign(batch: pd.DataFrame) -> pd.DataFrame:
            c = _ivf_worker_centroids(cref)
            emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            normed = emb / np.maximum(
                np.linalg.norm(emb, axis=1, keepdims=True), 1e-12
            )
            batch = batch.copy()
            batch["centroid"] = (normed @ c.T).argmax(axis=1).astype(np.int64)
            return batch

        os.makedirs(index_dir, exist_ok=True)
        ds.map_batches(assign, batch_format="pandas").write_parquet(
            index_dir, partition_cols=["centroid"]
        )
        np.save(os.path.join(index_dir, "centroids.npy"), cent)
        return cls(index_dir, cent)

    @classmethod
    def load(cls, index_dir: str) -> "IVFIndex":
        import os

        cent = np.load(os.path.join(index_dir, "centroids.npy"))
        return cls(index_dir, cent)

    # -- query ------------------------------------------------------------

    def probe_set(self, queries: np.ndarray, nprobe: int) -> list[int]:
        q = np.asarray(queries, dtype=np.float64)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        return sorted(
            {
                int(c)
                for qi in range(qn.shape[0])
                for c in np.argsort(-(qn[qi] @ self.centroids.T))[:nprobe]
            }
        )

    def probed_dataset(self, queries: np.ndarray, nprobe: int) -> rd.Dataset:
        """The pruned read: only the probed inverted-list directories
        are passed to ``read_parquet`` — non-probed partitions are
        never opened (explicit path-level pruning; version-proof where
        hive-filter pushdown binds against the file schema)."""
        import glob
        import os

        probes = self.probe_set(queries, nprobe)
        files = [
            f
            for c in probes
            for f in sorted(
                glob.glob(
                    os.path.join(self.index_dir, f"centroid={c}", "*.parquet")
                )
            )
        ]
        if not files:
            return rd.from_items([])
        return rd.read_parquet(files)

    def topk(self, queries: np.ndarray, k: int = 10, nprobe: int = 4) -> pa.Table:
        """Top-k over the probed partitions only. With
        ``nprobe >= n_centroids`` this is exactly ``brute_force_topk``
        (every partition probed ⇒ exhaustive scan)."""
        nprobe = min(nprobe, len(self.centroids))
        pruned = self.probed_dataset(queries, nprobe)
        return brute_force_topk(pruned, queries, k=k)


_IVF_WORKER_CENTROIDS: dict[str, np.ndarray] = {}


def _ivf_worker_centroids(cref) -> np.ndarray:
    key = cref.hex()
    c = _IVF_WORKER_CENTROIDS.get(key)
    if c is None:
        c = np.asarray(ray.get(cref), dtype=np.float64)
        _IVF_WORKER_CENTROIDS[key] = c
    return c


def knn_join(ds: rd.Dataset, k: int = 1, max_rows: int = 100_000) -> pa.Table:
    """Exact k-nearest-neighbor self-join: for every vector, its k
    nearest OTHER vectors by cosine (ties by ascending vec_id).

    Exact self-join is inherently O(n²) — this implementation is the
    verification tier for corpora up to ~10⁵ vectors: the full matrix
    is broadcast ONCE via ``ray.put`` (hit per worker process, not per
    batch) and every streamed batch scores against it with one matmul,
    keeping a per-batch partial top-k. At 100 TB scale use the IVF
    inverted-list index (``IVFIndex``) or ``embedding_near_dups``
    (hyperplane-LSH bucketing) instead — the ``max_rows`` guard makes
    that switch explicit rather than letting a quadratic job sail.
    """
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"knn_join is the exact O(n²) tier ({n} rows > {max_rows}); "
            "use IVFIndex / embedding_near_dups at this scale"
        )
    ref = ds.to_pandas().sort_values("vec_id")
    ids = ref["vec_id"].to_numpy()
    mat = np.stack(ref["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ids_ref = ray.put(ids)
    mat_ref = ray.put(mat)

    _cache: dict = {}

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        key = mat_ref.hex()
        got = _cache.get(key)
        if got is None:
            got = (ray.get(ids_ref), ray.get(mat_ref))
            _cache[key] = got
        ref_ids, ref_mat = got
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sims = emb @ ref_mat.T  # (batch, n)
        bids = batch["vec_id"].to_numpy()
        # exclude self-matches
        self_pos = np.searchsorted(ref_ids, bids)
        rows = np.arange(len(bids))
        hit = (self_pos < len(ref_ids)) & (ref_ids[np.minimum(self_pos, len(ref_ids) - 1)] == bids)
        sims[rows[hit], self_pos[hit]] = -np.inf
        kk = min(k, sims.shape[1] - 1)
        # deterministic top-k: sort by (-sim, ref_id)
        order = np.lexsort((np.broadcast_to(ref_ids, sims.shape), -sims), axis=1)[:, :kk]
        out_sim = np.take_along_axis(sims, order, axis=1)
        return pd.DataFrame(
            {
                "vec_id": np.repeat(bids, kk),
                "neighbor_id": ref_ids[order].ravel(),
                "rank": np.tile(np.arange(kk), len(bids)),
                "cosine": out_sim.ravel(),
            }
        )

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    out = out.sort_values(["vec_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["vec_id", "neighbor_id", "rank"]], preserve_index=False
    )


def group_centroids(
    ds: rd.Dataset,
    key_col: str = "label",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> rd.Dataset:
    """Per-group embedding centroid (class prototypes / IVF seed
    centroids): mean vector per ``key_col``, emitted long-form as
    (key, dim, centroid) so the result is flat-hashable.

    Combiner pattern: each batch reduces to one (key, sum-vector,
    count) row per key it sees, so the ``groupby(key)`` merge moves
    #keys × #blocks tiny rows — never the corpus. Rounded to
    ``ndigits`` at emission only (summation-order float drift is
    ~1e-15 relative; the 1e-6 grid buries it for the DuckDB oracle).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in batch.groupby(key_col, sort=False):
            mat = np.stack(grp[vec_col].to_numpy()).astype(np.float64)
            rows.append({key_col: key, "vsum": mat.sum(axis=0), "n": len(grp)})
        if not rows:
            # keep the schema on empty blocks (a filtered-out batch
            # would otherwise emit a column-less frame and break the
            # downstream groupby)
            return batch.iloc[:0][[key_col]].assign(
                vsum=pd.Series([], dtype=object), n=pd.Series([], dtype="int64")
            )
        return pd.DataFrame(rows)

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        s = np.stack(group["vsum"].to_numpy()).sum(axis=0)
        c = s / int(group["n"].sum())
        return pd.DataFrame(
            {
                key_col: group[key_col].iloc[0],
                "dim": np.arange(len(c), dtype=np.int64),
                "centroid": np.round(c, ndigits),
            }
        )

    return partials.groupby(key_col).map_groups(merge, batch_format="pandas")


def quantize_embeddings(ds: rd.Dataset) -> rd.Dataset:
    """Symmetric per-vector int8 quantization for embedding storage:
    q = floor(v · 127 / max|v|) per dimension plus an integer scale
    (floor(max|v| · 1e6) ppm) for reconstruction — 4× smaller at rest
    than float32, the standard storage tier under an IVF/LSH index at
    corpus scale. Pure map, fully vectorized; all math in float64 so a
    SQL oracle reproduces the exact same floors; emission is int8 +
    int64 only."""

    def quant(batch: pa.Table) -> pa.Table:
        lst = batch.column("embedding").combine_chunks()
        if isinstance(lst, pa.ChunkedArray):  # zero-chunk edge
            lst = pa.concat_arrays(lst.chunks or [pa.array([], pa.list_(pa.float32()))])
        vals = lst.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        flat = np.abs(vals)
        offsets = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        starts, lens = offsets[:-1], np.diff(offsets)
        # per-vector max|v| without a Python loop (reduceat skips
        # zero-length rows, patched to 0 after)
        # reduceat over non-empty rows' starts: zero-length rows occupy
        # no flat range, so consecutive non-empty starts are exact
        # segment boundaries
        s = np.zeros(len(lens), np.float64)
        nz = lens > 0
        if nz.any():
            s[nz] = np.maximum.reduceat(flat, starts[nz])
        rep = np.repeat(np.maximum(s, 1e-300), lens)
        q = np.floor(vals * 127.0 / rep).astype(np.int8)
        q[np.repeat(s == 0, lens)] = 0
        qvec = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(q, pa.int8())
        )
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "scale_ppm": pa.array(
                    np.floor(s * 1_000_000).astype(np.int64), pa.int64()
                ),
                "qvec": qvec,
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


def kmeans(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    snap: int = 6,
) -> rd.Dataset:
    """Distributed Lloyd k-means with DETERMINISTIC, engine-exact
    semantics: seeds are the ``k`` vectors with the smallest ids;
    each pass assigns every vector to the nearest centroid (euclidean,
    ties → lowest cluster id); recomputed centroids are snapped to
    ``snap`` decimals so float summation order never leaks into the
    next assignment. ``iters`` assignment passes total — the returned
    ``(id, cluster)`` labels come from the last one. Unlike
    :func:`train_ivf_centroids` (driver-side sampled quantizer
    training), every pass here streams the FULL corpus.

    Scale shape: centroids are tiny state broadcast via ``ray.put``;
    each pass is a stateless ``map_batches`` emitting k×(sum, count)
    partials (combiner), so one pass moves k·num_blocks rows — never
    the corpus. Distances are computed exactly like a per-element
    sequential double sum (dims < numpy's pairwise threshold), so
    assignments match a SQL engine bit-for-bit; raises if a cluster
    empties (the SQL analogue silently drops it — fail loud instead).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")

    def seed_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nsmallest(k, id_col)

    seeds = (
        ds.map_batches(seed_partial, batch_format="pandas")
        .to_pandas()
        .nsmallest(k, id_col)
        .sort_values(id_col)
    )
    cent = np.stack(seeds[vec_col].to_numpy()).astype(np.float64)

    def assign_of(x: np.ndarray, c: np.ndarray) -> np.ndarray:
        d = x[:, None, :] - c[None, :, :]
        # dim < 128 → np.sum over the last axis is a sequential double
        # sum, bit-identical to a SQL engine's list_distance loop
        dist = np.sqrt((d * d).sum(axis=2))
        return dist.argmin(axis=1)  # first (lowest) cluster wins ties

    for _ in range(iters - 1):
        cref = ray.put(cent)

        def partial_sums(batch: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            x = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            a = assign_of(x, c)
            rows = []
            for ci in np.unique(a):
                m = a == ci
                rows.append(
                    {
                        "cluster": int(ci),
                        "n": int(m.sum()),
                        "s": x[m].sum(axis=0).tolist(),
                    }
                )
            return pd.DataFrame(rows)

        parts = ds.map_batches(
            partial_sums, batch_format="pandas"
        ).to_pandas()
        new = cent.copy()
        for ci in range(k):
            sub = parts[parts["cluster"] == ci]
            if not len(sub):
                raise ValueError(f"k-means cluster {ci} emptied")
            total = np.sum(np.stack(sub["s"].to_numpy()), axis=0)
            new[ci] = np.round(total / int(sub["n"].sum()), snap)
        cent = new

    cref = ray.put(cent)

    def label(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        x = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                id_col: batch[id_col].astype("int64"),
                "cluster": assign_of(x, c).astype("int64"),
            }
        )

    return ds.map_batches(label, batch_format="pandas")


def rrf_fuse(
    a: "rd.Dataset",
    b: "rd.Dataset",
    id_col: str,
    score_col: str,
    k: int = 60,
    scale: int = 10**12,
) -> "rd.Dataset":
    """Reciprocal-rank fusion of two ranked retrieval lists
    (Cormack et al.: fused(d) = Σ 1/(k + rank_i(d))). Ranks are dense
    1-based positions in (score DESC, id ASC) order; each
    contribution is the exact integer ``scale // (k + rank)`` so the
    fused score is engine-independent int64 arithmetic, and an id
    missing from one list contributes 0 (its rank reports -1).

    Scale shape: each list is ranked with the distributed prefix-count
    primitive (:func:`reffy_ray.ops.sampling.global_rank` — one sort +
    #blocks census, no driver rows), the two ranked sides are tagged
    and UNIONed, and ONE ``groupby(id)`` sum/max merges them — no
    join, one shuffle of 2 rows per id."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    from reffy_ray.ops.sampling import global_rank

    def prep(ds: "rd.Dataset") -> "rd.Dataset":
        def neg(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "_id": t.column(id_col).cast(pa.int64()),
                    "_ns": pc.negate(
                        t.column(score_col).cast(pa.float64())
                    ),
                }
            )

        return ds.select_columns([id_col, score_col]).map_batches(
            neg, batch_format="pyarrow"
        )

    def tagged(ds: "rd.Dataset", which: int) -> "rd.Dataset":
        ranked, _ = global_rank(prep(ds), keys=["_ns", "_id"])

        def out(t: pa.Table) -> pa.Table:
            rank = pc.add(t.column("rank_idx").cast(pa.int64()), 1)
            contrib = pc.divide(
                pa.scalar(scale, pa.int64()), pc.add(rank, k)
            )
            neg1 = pa.array([-1] * len(t), pa.int64())
            return pa.table(
                {
                    id_col: t.column("_id"),
                    "contrib": contrib,
                    "rank_a": rank if which == 0 else neg1,
                    "rank_b": rank if which == 1 else neg1,
                }
            )

        return ranked.map_batches(out, batch_format="pyarrow")

    both = tagged(a, 0).union(tagged(b, 1))
    return both.groupby(id_col).aggregate(
        Sum("contrib", alias_name="fused"),
        Max("rank_a", alias_name="rank_a"),
        Max("rank_b", alias_name="rank_b"),
    )
