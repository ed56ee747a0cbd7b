"""Corpus-curation sampling operators for training-data pipelines.

Three operators a 100 TB curation run needs between dedup and
tokenization:

* ``hash_split`` — deterministic train/val/test assignment from an
  id hash. No shuffle at all (pure ``map_batches``); the assignment is
  reproducible across runs, cluster sizes and row order, which is what
  makes downstream eval sets stable while the corpus is re-crawled.
* ``source_cap`` — per-source quota sampling (cap documents per
  domain/source so one hot site cannot dominate the mix). Deterministic
  priority = id hash, so the kept set is stable. Scale shape:
  per-batch partial top-``cap`` per source first (each task emits at
  most ``cap`` rows per source it sees), then one ``groupby(source)``
  merge over partials — the merge group for a source is bounded by
  ``cap × n_blocks_containing_it``, never the source's full row count.
* ``near_dup_clusters`` — connected components over the MinHash-LSH
  candidate pairs (``ops/dedup.minhash_lsh_pairs``), representative =
  min doc id per component; ``near_dedup`` filters the corpus to
  cluster representatives + singletons. Pair generation is the
  distributed part (bucketed LSH, no all-pairs); the component closure
  runs driver-side over the *pair list only* — pairs scale with the
  duplicate rate, not the corpus, and only (a, b) id columns leave the
  cluster. Partitioning assumption: the pair list fits on the driver
  (true up to ~10⁸ duplicate pairs); past that, swap the closure for
  iterative min-label propagation over a pairs Dataset.

Hash convention (shared with ops/dedup, SQL-mirrorable):
``H(x) = big-endian uint64 of md5(x)[:8]`` ⇔
``('0x' || substr(md5(x), 1, 16))::UBIGINT`` in DuckDB.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


# ---------------------------------------------------------------------------
# hash_split
# ---------------------------------------------------------------------------

DEFAULT_SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def hash_split(
    ds: rd.Dataset,
    splits=DEFAULT_SPLITS,
    id_col: str = "doc_id",
    salt: str = "split-42",
    buckets: int = 10_000,
) -> rd.Dataset:
    """(id, split) assignment: bucket = H(str(id) + '|' + salt) mod
    ``buckets``; split boundaries at the cumulative weights. Pure map —
    no shuffle, content never read."""
    bounds = []
    acc = 0.0
    for name, w in splits:
        acc += w
        bounds.append((name, int(round(acc * buckets))))
    bounds[-1] = (bounds[-1][0], buckets)  # close the last interval exactly

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out = []
        for i in ids:
            b = _h64(f"{i}|{salt}") % buckets
            for name, hi in bounds:
                if b < hi:
                    out.append(name)
                    break
        return pa.table(
            {id_col: batch.column(id_col), "split": pa.array(out, pa.string())}
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# source_cap
# ---------------------------------------------------------------------------


def source_cap(
    ds: rd.Dataset,
    cap: int,
    key_col: str = "source",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Keep at most ``cap`` rows per ``key_col``, chosen by the
    deterministic priority (H(str(id)), id) ascending. Partial top-cap
    inside each batch, then a small per-source merge (see module
    docstring for why this bounds the shuffle group)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["_pri"] = [_h64(str(i)) for i in b[id_col]]
        # numpy uint64 sorts unsigned; python ints from _h64 are exact
        return (
            b.sort_values(["_pri", id_col])
            .groupby(key_col, sort=False, as_index=False)
            .head(cap)[[id_col, key_col, "_pri"]]
        )

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["_pri", id_col]).head(cap)[[id_col, key_col]]

    return partials.groupby(key_col).map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# near-dup clustering
# ---------------------------------------------------------------------------


def near_dup_clusters(
    ds: rd.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    k: int = 3,
) -> pa.Table:
    """Connected components over MinHash-LSH candidate pairs.

    Returns a small Arrow table (doc_id, cluster_rep) covering every
    document that appears in at least one near-dup pair; the
    representative is the component's minimum doc id. Union-find runs
    driver-side on the collected pair ids (pairs ≪ corpus)."""
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        ds, num_perm=num_perm, bands=bands,
        jaccard_threshold=jaccard_threshold, k=k,
    ).select_columns(["a", "b"])

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(x, y):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by min id keeps the representative deterministic
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo

    for batch in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(batch.column("a").to_pylist(), batch.column("b").to_pylist()):
            union(a, b)

    nodes = sorted(parent)
    reps = [find(n) for n in nodes]
    id_type = pa.array(nodes).type if nodes else pa.int64()
    return pa.table(
        {
            "doc_id": pa.array(nodes, id_type),
            "cluster_rep": pa.array(reps, id_type),
        }
    )


def near_dedup(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    **cluster_kwargs,
) -> rd.Dataset:
    """Filter the corpus to near-dup cluster representatives plus all
    singletons (documents in no pair). The non-representative id set is
    broadcast (``ray.put`` once, read per worker) — it scales with the
    duplicate count, not the corpus."""
    import ray

    clusters = near_dup_clusters(ds, **cluster_kwargs)
    drop = {
        d
        for d, r in zip(
            clusters.column("doc_id").to_pylist(),
            clusters.column("cluster_rep").to_pylist(),
        )
        if d != r
    }
    drop_ref = ray.put(drop)

    _cache: dict = {}

    def keep(batch: pa.Table) -> pa.Table:
        key = drop_ref.hex()
        d = _cache.get(key)
        if d is None:
            d = ray.get(drop_ref)
            _cache[key] = d
        mask = pa.array([i not in d for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def top_k_per_group(
    ds: rd.Dataset,
    k: int,
    key_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Keep the ``k`` highest-``order_col`` rows per ``key_col`` (ties
    broken by ascending id — fully deterministic). Same two-level shape
    as ``source_cap``: partial top-k inside each batch bounds what the
    per-key shuffle group can receive to k rows per input block, so a
    hot key never concentrates more than k·num_blocks rows in one task.
    """
    cols = [id_col, key_col, order_col]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values([order_col, id_col], ascending=[False, True])
            .groupby(key_col, sort=False, as_index=False)
            .head(k)[cols]
        )

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            [order_col, id_col], ascending=[False, True]
        ).head(k)[cols]

    return partials.groupby(key_col).map_groups(merge, batch_format="pandas")


def temperature_mix(
    ds: rd.Dataset,
    alpha: float = 0.5,
    keep_frac: float = 0.5,
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-42",
) -> rd.Dataset:
    """Temperature-based source rebalancing (the multilingual /
    multi-corpus mixing rule: sample source *s* proportional to
    ``count_s ** alpha``), materialized as a deterministic static
    subsample: per-source keep rate ``min(1, K·w_s / (W·c_s))`` with
    ``w_s = c_s**alpha``, ``W = Σw``, ``K = floor(total·keep_frac)``,
    and row selection by the shared id-hash convention
    (``H(id|salt) % 1e6 < rate_ppm``) — stable across runs, cluster
    sizes and row order.

    For ``alpha = 0.5`` every quantity is exact integer math
    (``isqrt``; valid for counts < 2^52 where IEEE ``floor(sqrt(c))``
    agrees), so the DuckDB oracle hash-matches exactly. Other alphas
    take the float path (documented as not oracle-exact).

    Scale shape: one tiny ``groupby(key_col).count()`` (cardinality =
    #sources), rates broadcast in the task closure, then a stateless
    streaming filter — no corpus shuffle.
    """
    import math

    counts = {
        r[key_col]: r["count()"] for r in ds.groupby(key_col).count().take_all()
    }
    total = sum(counts.values())
    k_budget = int(total * keep_frac)
    if alpha == 0.5:
        weights = {s: math.isqrt(c) for s, c in counts.items()}
    else:
        weights = {s: c**alpha for s, c in counts.items()}
    w_sum = sum(weights.values())
    rate_ppm = {
        s: min(1_000_000, (k_budget * weights[s] // w_sum if alpha == 0.5
                           else int(k_budget * weights[s] / w_sum)) * 1_000_000 // c)
        for s, c in counts.items()
    }

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        srcs = batch.column(key_col).to_pylist()
        mask = pa.array(
            [
                _h64(f"{i}|{salt}") % 1_000_000 < rate_ppm[s]
                for i, s in zip(ids, srcs)
            ]
        )
        return batch.select([id_col, key_col]).filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
