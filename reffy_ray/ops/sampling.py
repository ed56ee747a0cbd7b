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
* ``near_dup_clusters`` — connected components over MinHash-LSH star
  edges (``ops/dedup.minhash_lsh_star_edges``, linear in paired docs),
  representative = min doc id per component; ``near_dedup`` filters
  the corpus to cluster representatives + singletons. The closure is
  :func:`connected_components` — distributed min-label rounds; the
  driver holds at most a per-node label vector (broadcast tier) or
  nothing (join tier), never the pair list.

Hash convention (shared with ops/dedup, SQL-mirrorable):
``H(x) = big-endian uint64 of md5(x)[:8]`` ⇔
``('0x' || substr(md5(x), 1, 16))::UBIGINT`` in DuckDB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
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


def stratified_sample(
    ds: rd.Dataset,
    fracs: dict,
    default_frac: float = 0.0,
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat-42",
    buckets: int = 10_000,
) -> rd.Dataset:
    """Deterministic per-stratum downsampling: a row in stratum
    ``key_col=v`` is kept iff H(str(id) + '|' + salt) mod ``buckets``
    < round(fracs.get(v, default_frac) · buckets).

    The standard rebalance step of a curation pipeline (e.g. keep 100%
    of low-resource languages, 10% of English). Same hash scheme as
    ``hash_split`` so the two compose: a doc's sampling decision never
    depends on which split it landed in, and repeated runs are
    idempotent. Pure map — no shuffle, content never read; fractions
    are snapped to integer bucket thresholds so the emission is exactly
    reproducible in SQL (no float comparison anywhere)."""
    thresholds = {k: int(round(f * buckets)) for k, f in fracs.items()}
    default_threshold = int(round(default_frac * buckets))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = batch.column(key_col).to_pylist()
        mask = [
            _h64(f"{i}|{salt}") % buckets
            < thresholds.get(k, default_threshold)
            for i, k in zip(ids, keys)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample(
    ds: rd.Dataset,
    weight_col: str,
    denom: int,
    id_col: str = "doc_id",
    salt: str = "wsample-42",
) -> rd.Dataset:
    """Weighted Bernoulli (Poisson) sampling: each row is kept
    independently with probability ``min(weight / denom, 1)`` — the
    importance-sampling step of a curation pipeline (keep long / rare /
    high-quality documents proportionally more often). Decision rule is
    integer-only: keep iff ``H(str(id) + '|' + salt) mod denom <
    weight``, same hash kernel as :func:`hash_split`, so runs are
    idempotent, exactly SQL-restatable, and compose with the other
    hash-keyed samplers (independent salts ⇒ independent decisions).
    Pure map — no shuffle; weights must be integers (scale floats to a
    fixed grid first).
    """
    if denom <= 0:
        raise ValueError("denom must be a positive integer")

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        w = batch.column(weight_col).to_pylist()
        mask = [
            _h64(f"{i}|{salt}") % denom < wi for i, wi in zip(ids, w)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


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


def connected_components(
    edges: rd.Dataset,
    max_rounds: int = 50,
    broadcast_limit: int = 2_000_000,
) -> rd.Dataset:
    """Distributed connected components over an (a, b) edge Dataset —
    min-label propagation (the CCF shape: Kardes et al. 2014); the
    driver only ever holds per-node LABELS, never edges or pairs.

    Each round symmetrizes the association list, reduces per node to
    (node → min associate) and re-emits (associate → min) propagation
    edges; converged when no round discovers a smaller label. Round
    count is O(log(component diameter)) — with star edges from
    :func:`reffy_ray.ops.dedup.minhash_lsh_star_edges` diameters are
    tiny and 2-4 rounds suffice. Returns (doc_id, cluster_rep) for every
    node on an edge, representative = component min.

    Two tiers for the per-node min reduce, both fully vectorized (no
    ``map_groups``: per-node Python dispatch is a per-GROUP interpreter
    call and DataFrame allocation, billions of them at web scale):

    * ≤ ``broadcast_limit`` labelled nodes (the near-dup use: nodes =
      docs in at least one candidate pair, far smaller than the
      corpus): per-block (u, min v) numpy partials are merged into one
      sorted label vector on the driver and ``ray.put`` broadcast —
      each round is one stateless pass, ZERO shuffles.
    * larger graphs: ``groupby(u).min`` aggregate +
      :func:`reffy_ray.util.bucket_join` pairing — two key-collocating
      shuffles of pure kernels per round, nothing driver-side.
    """

    def sym(b: pa.Table) -> pa.Table:
        u = pa.concat_arrays(
            [b.column("a").combine_chunks(), b.column("b").combine_chunks()]
        )
        v = pa.concat_arrays(
            [b.column("b").combine_chunks(), b.column("a").combine_chunks()]
        )
        return pa.table({"u": u, "v": v})

    def propagate(b: pa.Table) -> pa.Table:
        # vectorized CCF emission over (u, v, m) rows, m = min over u's
        # neighborhood: groups whose min is not smaller than u emit
        # nothing; otherwise refresh the (u -> m) association (new=0)
        # and point every other neighbor at m (new=1). Emitting per
        # edge row instead of per distinct neighbor only produces
        # duplicate pairs, which local_dedup's min(new) collapses —
        # the min-reduce and the zero/nonzero convergence counter are
        # unaffected by multiplicity.
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        m = b.column("m").to_numpy(zero_copy_only=False)
        assoc = m < u
        prop = assoc & (v != m)
        a_out = np.concatenate([u[assoc], v[prop]])
        b_out = np.concatenate([m[assoc], m[prop]])
        new = np.concatenate(
            [
                np.zeros(int(assoc.sum()), np.int64),
                np.ones(int(prop.sum()), np.int64),
            ]
        )
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "new": pa.array(new, pa.int64()),
            }
        )

    def local_dedup(b: pa.Table) -> pa.Table:
        # block-local dedup keeps duplicate propagation edges from
        # compounding across rounds (exact dedup is not needed for
        # correctness — the min reduce ignores multiplicity); min(new)
        # so a pair that already exists as a new=0 association isn't
        # counted as progress
        t = b.group_by(["a", "b"]).aggregate([("new", "min")])
        return t.rename_columns(["a", "b", "new"])

    def contract_local(b: pa.Table) -> pa.Table:
        # round 0: block-local union-find contraction — collapses any
        # path that lives inside one block to a star in a single pass,
        # so the global rounds only bridge ACROSS blocks and converge
        # in O(log #blocks) even on long chains. In-memory work over
        # one block only (the standard local-contraction prologue of
        # distributed CC); emits (node → block-local root) star edges.
        a = b.column("a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = b.column("b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        parent: dict = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for x, y in zip(a, c):
            rx, ry = find(int(x)), find(int(y))
            if rx != ry:
                if ry < rx:
                    rx, ry = ry, rx
                parent[ry] = rx
        nodes = sorted(set(a.tolist()) | set(c.tolist()))
        return pa.table(
            {
                "a": pa.array(nodes, pa.int64()),
                "b": pa.array([find(n) for n in nodes], pa.int64()),
            }
        )

    cur = (
        edges.select_columns(["a", "b"])
        .map_batches(contract_local, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    if cur.count() == 0:
        return rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "cluster_rep": pa.array([], pa.int64())}
            )
        )
    from reffy_ray.util import bucket_join

    def block_mins(b: pa.Table) -> pa.Table:
        # per-block (u, min v) partial — numpy segment reduce
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        ku, inv = np.unique(u, return_inverse=True)
        mv = np.full(len(ku), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mv, inv, v)
        return pa.table(
            {"u": pa.array(ku, pa.int64()), "m": pa.array(mv, pa.int64())}
        )

    # tier choice: cur rows ≈ one association per node, so its count
    # bounds the label-vector size the broadcast tier would hold
    use_broadcast = cur.count() <= broadcast_limit

    for _ in range(max_rounds):
        symmed = cur.map_batches(sym, batch_format="pyarrow")
        if use_broadcast:
            parts = symmed.map_batches(block_mins, batch_format="pyarrow")
            mu_parts, mm_parts = [], []
            # iter_batches is the repo's empty-block-safe small-side
            # collection idiom (upstream empty pandas blocks skip
            # map_batches and crash to_arrow_refs' conversion)
            for blk in parts.iter_batches(
                batch_size=1 << 16, batch_format="pyarrow"
            ):
                if blk.num_rows:
                    mu_parts.append(blk.column("u").to_numpy(zero_copy_only=False))
                    mm_parts.append(blk.column("m").to_numpy(zero_copy_only=False))
            mu = np.concatenate(mu_parts) if mu_parts else np.array([], np.int64)
            mm = np.concatenate(mm_parts) if mm_parts else np.array([], np.int64)
            keys, inv = np.unique(mu, return_inverse=True)
            vals = np.full(len(keys), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(vals, inv, mm)
            label_ref = ray.put((keys, vals))

            def attach(b: pa.Table, _ref=label_ref) -> pa.Table:
                k, val = ray.get(_ref)  # zero-copy shared-memory numpy
                u = b.column("u").to_numpy(zero_copy_only=False)
                m = val[np.searchsorted(k, u)]
                return b.append_column("m", pa.array(m, pa.int64()))

            paired = symmed.map_batches(attach, batch_format="pyarrow")
        else:
            mins = (
                symmed.groupby("u")
                .min("v")
                .map_batches(
                    lambda b: b.rename_columns(["u", "m"]),
                    batch_format="pyarrow",
                )
            )
            paired = bucket_join(symmed, mins, on="u")
        nxt = (
            paired.map_batches(propagate, batch_format="pyarrow")
            .map_batches(local_dedup, batch_format="pyarrow")
            .materialize()
        )
        new_count = (nxt.sum("new") or 0) if nxt.count() else 0
        cur = nxt.drop_columns(["new"])
        if not new_count:
            break

    # converged rows are (node → root) for every non-root node; add the
    # roots themselves, then one exact vectorized min per node
    def roots(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column("b"), "b": b.column("b")})

    labels = cur.union(cur.map_batches(roots, batch_format="pyarrow"))
    out = labels.groupby("a").min("b")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["doc_id", "cluster_rep"])

    return out.map_batches(rename, batch_format="pyarrow")


def near_dup_cluster_labels(
    ds: rd.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    k: int = 3,
) -> rd.Dataset:
    """(doc_id, cluster_rep) Dataset for every document in at least one
    MinHash-LSH near-dup pair; representative = component min doc id.

    Scale shape: edges come from
    :func:`reffy_ray.ops.dedup.minhash_lsh_star_edges` — linear in
    paired docs even when a template is duplicated a million times
    (same connected components as the all-pairs graph) — and the
    closure is :func:`connected_components` groupby rounds. Nothing is
    collected on the driver."""
    from .dedup import minhash_lsh_star_edges

    edges = minhash_lsh_star_edges(
        ds, num_perm=num_perm, bands=bands,
        jaccard_threshold=jaccard_threshold, k=k,
    ).select_columns(["a", "b"])
    return connected_components(edges)


def near_dup_clusters(
    ds: rd.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    k: int = 3,
) -> pa.Table:
    """Small-result wrapper over :func:`near_dup_cluster_labels`: the
    collected (doc_id, cluster_rep) Arrow table, sorted by doc_id. The
    label table is O(#cluster members) — the only driver-side
    materialization in the family; use ``near_dup_cluster_labels`` to
    keep it distributed."""
    labels = near_dup_cluster_labels(
        ds, num_perm=num_perm, bands=bands,
        jaccard_threshold=jaccard_threshold, k=k,
    )
    tbl = pa.Table.from_pandas(
        labels.sort("doc_id").to_pandas(), preserve_index=False
    )
    if tbl.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "cluster_rep": pa.array([], pa.int64())}
        )
    return tbl


def near_dedup(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    broadcast_limit: int = 1_000_000,
    **cluster_kwargs,
) -> rd.Dataset:
    """Filter the corpus to near-dup cluster representatives plus all
    singletons (documents in no pair).

    The label table stays a Dataset. When the non-representative set is
    genuinely small (≤ ``broadcast_limit`` rows) it is broadcast
    (``ray.put`` once, read per worker) — the cheap path that avoids
    shuffling the corpus. Past the limit it switches to Ray Data's
    hash-partitioned ``left_outer`` join against the label table plus a
    streaming filter (keep when unlabeled or representative), which
    scales with the corpus instead of assuming the duplicate set fits
    in worker heap (the shared ``filter_by_drop_ids`` helper)."""
    from reffy_ray.util import filter_by_drop_ids

    labels = near_dup_cluster_labels(ds, **cluster_kwargs).materialize()
    drops = labels.filter(expr="doc_id != cluster_rep").select_columns(
        ["doc_id"]
    )
    if id_col != "doc_id":
        drops = drops.rename_columns([id_col])
    return filter_by_drop_ids(ds, drops.materialize(), id_col, broadcast_limit)


def token_budget_sample(
    ds: rd.Dataset,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    salt: str = "budget-42",
    buckets: int = 10_000,
) -> rd.Dataset:
    """Select documents in deterministic hash order until a global
    token budget is met: a doc is kept iff the running token sum over
    the ordering (H(id) mod buckets, id) — INCLUDING the doc itself —
    is ≤ ``budget``. The standard "give me exactly ~N tokens of this
    corpus" step of training-data assembly, reproducible across runs
    because the order is content-independent hashing, not arrival
    order.

    Distributed prefix-sum shape: one key-collocating sort, a per-block
    (first_key, block_total) census (#blocks rows to the driver — the
    only driver exchange), cumulative offsets broadcast back, then a
    streaming per-block cumsum + threshold. Input must carry a token
    count column (compose with ``ops.text.token_count`` /
    ``quality_score``); all arithmetic is integer."""

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        bkt = [_h64(f"{i}|{salt}") % buckets for i in ids]
        return batch.append_column("_bkt", pa.array(bkt, pa.int64()))

    srt = ds.map_batches(key, batch_format="pyarrow").sort(
        ["_bkt", id_col]
    ).materialize()

    def block_total(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"bkt": pd.Series([], dtype="int64"),
                 "fid": pd.Series([], dtype="object"),
                 "tot": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"bkt": [int(b["_bkt"].iloc[0])], "fid": [b[id_col].iloc[0]],
             "tot": [int(b[tokens_col].sum())]}
        )

    # batch_size=None → one batch per materialized block, so pass 2
    # sees the same first keys
    census = sorted(
        (
            (int(r["bkt"]), r["fid"], int(r["tot"]))
            for r in srt.map_batches(
                block_total, batch_format="pandas", batch_size=None
            ).take_all()
        ),
    )
    offsets: dict = {}
    acc = 0
    for bkt, fid, tot in census:
        offsets[(bkt, fid)] = acc
        acc += tot
    import ray as _ray

    off_ref = _ray.put(offsets)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b.drop(columns=["_bkt"], errors="ignore")
        off = _ray.get(off_ref)[(int(b["_bkt"].iloc[0]), b[id_col].iloc[0])]
        run = off + b[tokens_col].cumsum()
        return b[run <= budget].drop(columns=["_bkt"])

    return srt.map_batches(keep, batch_format="pandas", batch_size=None)


def near_dedup_best(
    ds: rd.Dataset,
    quality: rd.Dataset,
    quality_col: str = "alpha_ppm",
    id_col: str = "doc_id",
    broadcast_limit: int = 1_000_000,
    **cluster_kwargs,
) -> rd.Dataset:
    """Near-dedup keeping the HIGHEST-QUALITY member of each cluster
    (ties by ascending id) instead of the min-id representative —
    the form curation pipelines actually want: of N boilerplate
    near-copies, keep the one scoring best on the quality signal.

    Shape: cluster labels from :func:`near_dup_cluster_labels`
    (O(paired docs) rows), hash-joined to the ``quality`` table on
    ``id_col``, one groupby per cluster emitting the NON-winners as a
    drop list, then the shared ``filter_by_drop_ids`` corpus filter
    (broadcast when small, hash anti-join past ``broadcast_limit``).
    Singletons (docs in no pair) are always kept. The corpus itself is
    never materialized."""
    from reffy_ray.util import filter_by_drop_ids, join_ready, safe_num_blocks

    labels = join_ready(
        near_dup_cluster_labels(ds, **cluster_kwargs)
    )
    n_labels = labels.count()
    if n_labels == 0:
        return ds
    member_q = labels.join(
        join_ready(quality.select_columns([id_col, quality_col])),
        join_type="inner",
        num_partitions=safe_num_blocks(labels),
        on=("doc_id",),
        right_on=(id_col,),
    ).materialize()
    if member_q.count() != n_labels:
        # an inner join would silently keep near-dups whose quality row
        # is missing (they'd land in no cluster group and never be
        # dropped) — refuse instead of quietly violating the contract
        raise ValueError(
            f"near_dedup_best: quality table covers {member_q.count()} of "
            f"{n_labels} cluster members; score every corpus doc "
            f"(compute quality over ds itself) before deduplicating"
        )

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([quality_col, "doc_id"], ascending=[False, True])
        return g.iloc[1:][["doc_id"]]

    drops = member_q.groupby("cluster_rep").map_groups(
        losers, batch_format="pandas"
    )
    if id_col != "doc_id":
        drops = drops.rename_columns([id_col])
    return filter_by_drop_ids(ds, drops.materialize(), id_col, broadcast_limit)


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


def interleave_sources(
    ds: rd.Dataset,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Deterministic round-robin interleave of a multi-source corpus —
    the training-data *ordering* step: emit one document per source in
    turn (source order ties broken alphabetically) so no single source
    forms long contiguous runs in the token stream. Output columns:
    ``mix_rank`` (0-based position within the row's source, by id) and
    ``mix_pos`` (0-based global position in the interleaved order,
    i.e. sorted by (mix_rank, source)). Both int64, fully determined
    by the data — reproducible across runs, block layouts and cluster
    sizes.

    Scale shape: two key-collocating sorts, each followed by the same
    distributed prefix-count census ``token_budget_sample`` uses — a
    per-block (first-key, count) table (#blocks rows, the only driver
    exchange), cumulative offsets broadcast back via ``ray.put``, then
    a streaming per-block ``arange``. No per-row driver work; requires
    ``id_col`` unique within ``source_col``."""
    import ray as _ray

    srt = (
        ds.select_columns([id_col, source_col])
        .sort([source_col, id_col])
        .materialize()
    )

    def census(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"src": pd.Series([], dtype="object"),
                 "fid": pd.Series([], dtype="object"),
                 "cnt": pd.Series([], dtype="int64")}
            )
        g = b.groupby(source_col, sort=True)[id_col]
        first = g.min()
        return pd.DataFrame(
            {"src": first.index, "fid": first.values, "cnt": g.size().values}
        )

    # batch_size=None → one batch per materialized block, so the assign
    # pass below sees the same (source, first-id) segment keys
    rows = sorted(
        (r["src"], r["fid"], int(r["cnt"]))
        for r in srt.map_batches(
            census, batch_format="pandas", batch_size=None
        ).take_all()
    )
    offsets: dict = {}
    acc, cur = 0, None
    for src, fid, cnt in rows:
        if src != cur:
            cur, acc = src, 0
        offsets[(src, fid)] = acc
        acc += cnt
    off_ref = _ray.put(offsets)

    def assign_rank(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            b = b.copy()
            b["mix_rank"] = pd.Series([], dtype="int64")
            return b
        off = _ray.get(off_ref)
        parts = []
        for src, g in b.groupby(source_col, sort=True):
            g = g.copy()
            g["mix_rank"] = off[(src, g[id_col].iloc[0])] + np.arange(
                len(g), dtype=np.int64
            )
            parts.append(g)
        return pd.concat(parts)

    ranked = srt.map_batches(assign_rank, batch_format="pandas", batch_size=None)
    # global position in the interleaved order: a plain global rank
    # over the (mix_rank, source) key — (rank, source) is unique
    pos, _ = global_rank(ranked, ("mix_rank", source_col), out_col="mix_pos")
    return pos


def global_rank(
    ds: rd.Dataset, keys, out_col: str = "rank_idx"
) -> tuple[rd.Dataset, int]:
    """0-based global dense row index in ``keys`` order (the key tuple
    must be unique per row — it identifies each sorted block's first
    row). Returns (dataset + ``out_col``, total row count).

    The distributed prefix-count primitive behind
    ``token_budget_sample`` / ``interleave_sources`` / ``rank_buckets``:
    one key-collocating sort, a per-block (first-key, count) census
    (#blocks rows — the only driver exchange), cumulative offsets
    broadcast back via ``ray.put``, then a streaming per-block
    ``arange``. No per-row driver work."""
    import ray as _ray

    keys = list(keys)
    srt = ds.sort(keys).materialize()

    def census(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            cols = {f"k{i}": pd.Series([], dtype="object") for i in range(len(keys))}
            cols["cnt"] = pd.Series([], dtype="int64")
            return pd.DataFrame(cols)
        cols = {f"k{i}": [b[k].iloc[0]] for i, k in enumerate(keys)}
        cols["cnt"] = [len(b)]
        return pd.DataFrame(cols)

    # batch_size=None → one batch per materialized block, so the assign
    # pass sees the same first-key tuples
    rows = sorted(
        (tuple(r[f"k{i}"] for i in range(len(keys))), int(r["cnt"]))
        for r in srt.map_batches(
            census, batch_format="pandas", batch_size=None
        ).take_all()
    )
    offsets: dict = {}
    acc = 0
    for key, cnt in rows:
        offsets[key] = acc
        acc += cnt
    total = acc
    off_ref = _ray.put(offsets)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if not len(b):
            b[out_col] = pd.Series([], dtype="int64")
            return b
        base = _ray.get(off_ref)[tuple(b[k].iloc[0] for k in keys)]
        b[out_col] = base + np.arange(len(b), dtype=np.int64)
        return b

    return srt.map_batches(assign, batch_format="pandas", batch_size=None), total


def rank_buckets(
    ds: rd.Dataset,
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    buckets: int = 10,
) -> rd.Dataset:
    """Equal-frequency bucketing by EXACT global rank: each row gets its
    0-based dense rank in (value, id) order plus
    ``bucket = rank·buckets // n`` — the curation step that stratifies a
    corpus into e.g. length deciles for per-decile sampling/inspection
    without approximating the quantile boundaries. All-integer output
    (rank_idx, bucket); ties broken by id so results are reproducible
    across runs and block layouts.

    Scale shape: the one-sort prefix-count census of ``global_rank`` —
    no full materialization on the driver, no approximate sketch."""
    ranked, total = global_rank(
        ds.select_columns([id_col, value_col]), (value_col, id_col)
    )

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = (
            b["rank_idx"].to_numpy(dtype=np.int64, copy=False) * buckets
        ) // max(total, 1)
        return b

    return ranked.map_batches(bucketize, batch_format="pandas")


def priority_sample(
    ds: rd.Dataset,
    k: int = 256,
    id_col: str = "doc_id",
    salt: str = "prio-42",
) -> pa.Table:
    """Deterministic uniform sample of exactly ``k`` rows with NO
    global sort and no shuffle: priority = md5-uint64 of the salted id,
    keep the k smallest priorities (bottom-k sampling — the fixed-size
    cousin of :func:`hash_split`). Each block emits its own bottom-k
    (id, priority) partials, the driver merges k × #blocks tiny rows —
    the same census shape as :func:`reffy_ray.ops.stats.kmv_distinct`,
    and at 100 TB the merge input is a few MB while a naive
    ``ORDER BY hash LIMIT k`` would be an all-to-all sort.

    Deterministic across runs, cluster sizes and row order; re-crawling
    the corpus leaves the sample stable except where sampled ids
    themselves appeared/disappeared. Returns ``(id, prio:int64)`` with
    ``prio = H >> 1`` (kept in-range for signed SQL engines; ordering
    ties under the shift are broken by the full hash internally and by
    id in the emission, so the kept SET is exact either way).
    """

    def bottom(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        pr = np.fromiter(
            (_h64(f"{salt}:{i}") for i in ids), dtype=np.uint64, count=len(ids)
        )
        order = np.argsort(pr, kind="stable")[:k]
        return pa.table(
            {
                id_col: pa.array([ids[j] for j in order]),
                "_h": pa.array(pr[order], pa.uint64()),
            }
        )

    rows = ds.map_batches(bottom, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (int(r["_h"]), r[id_col]))
    kept = rows[:k]
    return pa.table(
        {
            id_col: pa.array([r[id_col] for r in kept]),
            "prio": pa.array([int(r["_h"]) >> 1 for r in kept], pa.int64()),
        }
    )


def ab_test_summary(
    events: rd.Dataset,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    salt: str = "ab-42",
    buckets: int = 10_000,
    arms=(("A", 0.5), ("B", 0.5)),
    scale: int = 1_000_000,
):
    """A/B experiment rollup: users are assigned to arms by the same
    deterministic md5 bucket scheme as :func:`hash_split` (so the
    assignment is restatable in SQL), a user converts when they have
    ≥1 ``convert_type`` event, and each arm reports exact integer
    ``(n_users, converters, conv_ppm = converters·scale // n_users)``.

    Scale shape: per-block partials collapse events to (user,
    converted-indicator) rows → ONE ``groupby(user)`` Max resolves
    each user once → per-block per-arm combiner sums → a tiny
    ``groupby(arm)``. The user dimension only ever crosses the wire
    once, as one row per distinct user per block.
    """
    import pyarrow as pa
    from ray.data.aggregate import Max, Sum

    bounds = []
    acc = 0.0
    for name, w in arms:
        acc += w
        bounds.append((name, int(round(acc * buckets))))
    bounds[-1] = (bounds[-1][0], buckets)

    def user_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "u": b[user_col].astype("int64"),
                "conv": (b[type_col] == convert_type).astype("int64"),
            }
        )
        return out.groupby("u", as_index=False, sort=False).max()

    per_user = (
        events.select_columns([user_col, type_col])
        .map_batches(user_partial, batch_format="pandas")
        .groupby("u")
        .aggregate(Max("conv", alias_name="conv"))
    )

    def arm_partial(b: pd.DataFrame) -> pd.DataFrame:
        names = []
        for u in b["u"]:
            bkt = _h64(f"{int(u)}|{salt}") % buckets
            for name, hi in bounds:
                if bkt < hi:
                    names.append(name)
                    break
        out = pd.DataFrame(
            {"arm": names, "n": 1, "conv": b["conv"].astype("int64")}
        )
        g = out.groupby("arm", as_index=False, sort=False).sum()
        g["n"] = g["n"].astype("int64")
        return g

    agg = (
        per_user.map_batches(arm_partial, batch_format="pandas")
        .groupby("arm")
        .aggregate(
            Sum("n", alias_name="n_users"),
            Sum("conv", alias_name="converters"),
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        n = t.column("n_users").cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = (
            t.column("converters")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "arm": t.column("arm").cast(pa.string()),
                "n_users": pa.array(n, pa.int64()),
                "converters": pa.array(c, pa.int64()),
                "conv_ppm": pa.array(c * scale // n, pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")
