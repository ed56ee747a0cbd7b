"""Deduplication operators (exact + near-dup families).

Scale pattern (ray_guide / SURVEY.md §2.7): hash computed vectorized in
``map_batches``; the only shuffle is a ``groupby`` on the hash/bucket
key; candidate verification stays per-group. Nothing materializes the
corpus on the driver.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _md5_col(batch: pa.Table, col: str = "text") -> pa.Table:
    """Content hash per row (md5 to match DuckDB's md5())."""
    vals = batch.column(col).to_pylist()
    h = [hashlib.md5((v or "").encode("utf-8")).hexdigest() for v in vals]
    return batch.append_column("content_md5", pa.array(h, pa.string()))


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Exact dedup: hash-partition on content hash, keep min(id) per
    group (deterministic winner regardless of execution order)."""
    hashed = ds.map_batches(lambda b: _md5_col(b, text_col), batch_format="pyarrow")

    def first(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        return g.head(1)[[id_col, "content_md5"]]

    return hashed.groupby("content_md5").map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_WORD = re.compile(r"\w+")


def _shingles(text: str, k: int = 3) -> set[bytes]:
    toks = _WORD.findall((text or "").lower())
    if len(toks) < k:
        return {(" ".join(toks)).encode()} if toks else set()
    return {" ".join(toks[i : i + k]).encode() for i in range(len(toks) - k + 1)}


class MinHasher:
    """num_perm MinHash signatures; permutation params built once per
    actor (a*x+b mod p universal hashing over md5-derived base hashes)."""

    def __init__(self, num_perm: int = 64, seed: int = 7, k: int = 3):
        rng = np.random.default_rng(seed)
        self.p = (1 << 61) - 1
        self.a = rng.integers(1, self.p, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, self.p, size=num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = np.array(
            [int.from_bytes(hashlib.md5(s).digest()[:8], "little") for s in sh],
            dtype=np.uint64,
        )
        # (a * x + b) mod p per permutation, vectorized over shingles
        x = base.astype(object)[None, :]
        vals = (self.a.astype(object)[:, None] * x + self.b.astype(object)[:, None]) % self.p
        return np.array([int(min(row)) for row in vals], dtype=np.uint64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch["text"]]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "minhash": [s.tobytes() for s in sigs],
            }
        )


def minhash_lsh_pairs(
    ds: rd.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    k: int = 3,
) -> rd.Dataset:
    """Near-dup candidate pairs via banded LSH, verified by signature
    Jaccard. Stages: minhash (actor pool) → explode (band_id,
    band_hash) rows → groupby band bucket → pairs → per-pair verify.
    The shuffle key is the banded hash (SURVEY.md §2.7 pattern)."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "k": k},
        batch_format="pandas",
        concurrency=(1, 4),
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash, out_sig = [], [], [], []
        for doc_id, blob in zip(batch["doc_id"], batch["minhash"]):
            sig = np.frombuffer(blob, dtype=np.uint64)
            for b in range(bands):
                band = sig[b * rows_per_band : (b + 1) * rows_per_band]
                out_doc.append(doc_id)
                out_band.append(b)
                out_hash.append(hashlib.md5(band.tobytes()).hexdigest())
                out_sig.append(blob)
        return pd.DataFrame(
            {"doc_id": out_doc, "band": out_band, "band_hash": out_hash, "minhash": out_sig}
        )

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        g = group.sort_values("doc_id").drop_duplicates("doc_id")
        ids = list(g["doc_id"])
        sigs_ = [np.frombuffer(x, dtype=np.uint64) for x in g["minhash"]]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = float((sigs_[i] == sigs_[j]).mean())
                if est >= jaccard_threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    j_out.append(est)
        return pd.DataFrame({"a": a_out, "b": b_out, "est_jaccard": j_out})

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    # candidate pairs may repeat across bands → dedup on (a, b)
    def dedup_pair(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return pairs.groupby(["a", "b"]).map_groups(dedup_pair, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word features (deterministic md5 feature
    hashes); Hamming-near rows are near-dups."""

    def __init__(self):
        self.word = _WORD

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in self.word.findall((text or "").lower()):
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8)
            ).astype(np.int64)
            acc += bits * 2 - 1
        out = int("".join("1" if v > 0 else "0" for v in acc), 2)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "simhash": [
                    np.int64(np.uint64(self.simhash(t)) >> np.uint64(1)).item()
                    for t in batch["text"]
                ],
            }
        )


def simhash_table(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 4))


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact, for candidate pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / max(1, (len(sa) + len(sb) - inter))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds: rd.Dataset, threshold: float = 0.95, bucket_dims: int = 4
) -> rd.Dataset:
    """Near-dup pairs by embedding cosine: LSH-style sign-bucket on the
    first ``bucket_dims`` dimensions co-locates candidates, pairwise
    cosine verified per bucket (numpy matmul). Avoids the O(n²)
    all-pairs shuffle; exact within buckets."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(batch["embedding"].to_numpy())
        signs = (emb[:, :bucket_dims] > 0).astype(np.int64)
        bucket = (signs * (2 ** np.arange(bucket_dims))).sum(axis=1)
        batch = batch.copy()
        batch["bucket"] = bucket
        return batch

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        g = group.sort_values("vec_id")
        emb = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        normed = emb / np.maximum(norms, 1e-12)
        sim = normed @ normed.T
        ids = g["vec_id"].to_numpy()
        iu = np.triu_indices(len(ids), k=1)
        mask = sim[iu] >= threshold
        return pd.DataFrame(
            {
                "a": ids[iu[0][mask]],
                "b": ids[iu[1][mask]],
                "cosine": np.round(sim[iu][mask], 6),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
