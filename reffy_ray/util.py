"""Small shared runtime helpers."""

from __future__ import annotations


def pool_size(frac: float = 1.0, minimum: int = 2, cap: int | None = None) -> int:
    """Fixed actor-pool size derived from the session's CPUs.

    Autoscaling ``concurrency=(min, max)`` pools idle at their minimum
    under Ray's conservative scale-up (measured in round 1 — see
    BASELINE.md perf journal), so stateful stages use a fixed pool
    sized from ``ray.cluster_resources()`` instead: most-of-the-node
    for hot stages (frac=1.0), a slice for light ones.
    """
    import ray

    cpus = 4
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 4))
    n = max(minimum, int(cpus * frac) - 1)
    return min(n, cap) if cap else n


def safe_num_blocks(ds, floor: int = 16) -> int:
    """Partition count for hash joins: the dataset's block count when
    known, else (lazy Dataset — ``num_blocks`` raises) the session CPU
    count. Join ``num_partitions`` must never depend on materializing
    the corpus just to count blocks."""
    try:
        return max(floor, ds.num_blocks())
    except NotImplementedError:
        return max(floor, pool_size(1.0) + 1)


def join_ready(small_ds):
    """Rebuild a (materialized) dataset's blocks before using it as a
    hash-join side. Ray's groupby/aggregate emits ZERO-COLUMN empty
    pandas blocks for empty partitions; ``map_batches`` skips empty
    blocks so they cannot be sanitized downstream, and a join partition
    whose builder receives only such a block crashes with
    ``ArrowInvalid: No match for key field`` (join.py builds the
    partition table from whatever shards arrived). ``repartition``
    redistributes rows into uniformly-schemaed blocks, dropping the
    degenerate empties."""
    try:
        n = max(1, small_ds.num_blocks())
    except NotImplementedError:
        n = max(1, pool_size(1.0) + 1)
    return small_ds.repartition(n).materialize()


def bucket_join(
    left,
    right,
    on,
    num_buckets: int = 64,
    how: str = "inner",
):
    """Low-fixed-cost distributed inner hash join: both sides are
    tagged and null-padded to a shared schema, unioned, hash-bucketed
    on the key, and merged per bucket with ONE vectorized
    ``pandas.merge`` per bucket group — the union+groupby pattern this
    repo already uses for ER text attach and table_diff, centralized.

    Ray's native ``Dataset.join`` spins up two aggregator actor pools
    with ~10 s of fixed setup per join on this host (BASELINE.md
    PageRank note); for the mid-size joins inside multi-stage queries
    that fixed cost dominates. The shuffle geometry here is identical
    (one all-to-all on the key hash), so the 100 TB shape is unchanged
    — key-collocated buckets, no broadcast, no driver rows.

    Non-key columns must be disjoint between the two sides (raises
    otherwise — callers rename going in, as pandas-suffix surprises
    are worse than an explicit error). ``how`` supports ``inner``
    only; use Ray's native join for outer semantics.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    if how != "inner":
        raise ValueError("bucket_join implements inner joins only")
    on = [on] if isinstance(on, str) else list(on)
    lcols = left.schema().names
    rcols = right.schema().names
    loff = [c for c in lcols if c not in on]
    roff = [c for c in rcols if c not in on]
    clash = set(loff) & set(roff)
    if clash:
        raise ValueError(f"bucket_join: non-key columns collide: {sorted(clash)}")
    for k in on:
        if k not in lcols or k not in rcols:
            raise ValueError(f"bucket_join: key {k!r} missing from a side")
    all_cols = on + loff + roff
    col_type = {}
    for sch in (left.schema(), right.schema()):
        try:
            for name, typ in zip(sch.names, sch.types):
                if isinstance(typ, pa.DataType):
                    col_type[name] = typ
        except Exception:
            pass

    def pad(side_flag: int, have: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in have:
                    arrays.append(b.column(c))
                else:
                    t = col_type.get(c)
                    arrays.append(
                        pa.nulls(n, type=t) if t is not None else pa.nulls(n)
                    )
            names.append("_side")
            arrays.append(pa.array(np.full(n, side_flag, dtype=np.int8)))
            # key-hash bucket: vectorized pandas hash_array — stable
            # across worker processes (builtin hash() is per-process
            # salted for str and would scatter one key over buckets)
            from pandas.util import hash_array

            h = np.zeros(n, dtype=np.uint64)
            for k in on:
                col = b.column(k)
                if pa.types.is_integer(col.type):
                    v = col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
                else:
                    v = hash_array(
                        np.asarray(col.to_pylist(), dtype=object),
                        categorize=False,
                    )
                h = h * np.uint64(1099511628211) + v
            names.append("_bkt")
            arrays.append(pa.array((h % np.uint64(num_buckets)).astype(np.int64)))
            return pa.table(dict(zip(names, arrays)))

        return fn

    tagged = left.map_batches(pad(0, lcols), batch_format="pyarrow").union(
        right.map_batches(pad(1, rcols), batch_format="pyarrow")
    )

    # the union's null-padded columns force pandas int columns to
    # float64 (NaN); own-side values are never null, so cast back
    int_cols = {
        c for c, t in col_type.items() if pa.types.is_integer(t)
    }

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0][on + loff].copy()
        r = g[g["_side"] == 1][on + roff].copy()
        for df in (l, r):
            for c in df.columns:
                if c in int_cols and df[c].dtype != "int64":
                    df[c] = df[c].astype("int64")
        # merging empty TYPED slices keeps dtypes stable across groups
        return l.merge(r, on=on, how="inner")[all_cols]

    return tagged.groupby("_bkt").map_groups(per_bucket, batch_format="pandas")


def filter_by_drop_ids(ds, drops, id_col: str, broadcast_limit: int = 1_000_000):
    """Shared corpus filter for the dedup/curation family: drop every
    ``ds`` row whose ``id_col`` appears in the (materialized, small-ish)
    ``drops`` Dataset.

    ≤ ``broadcast_limit`` drop rows: collected once, ``ray.put``
    broadcast, stateless per-batch filter (no shuffle). Past the limit:
    dedup the drop keys with one aggregate and hash-join
    (``join_ready`` on the right side — Ray aggregates emit
    zero-column empty blocks that crash join partitions otherwise).
    Centralizing this keeps the join_ready fix applied everywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    n_drop = drops.count()
    if n_drop == 0:
        return ds

    if n_drop > broadcast_limit:
        from ray.data.aggregate import Count

        drop_keys = join_ready(
            drops.groupby(id_col).aggregate(Count(alias_name="_n"))
        )
        joined = ds.join(
            drop_keys,
            join_type="left_outer",
            num_partitions=safe_num_blocks(ds),
            on=(id_col,),
            right_on=(id_col,),
        )

        def keep_joined(b: pa.Table) -> pa.Table:
            mask = pc.is_null(b.column("_n"))
            return b.filter(mask).drop_columns(["_n"])

        return joined.map_batches(keep_joined, batch_format="pyarrow")

    drop_set = set(drops.to_pandas()[id_col])
    drop_ref = ray.put(drop_set)
    _cache: dict = {}

    def keep(batch: pa.Table) -> pa.Table:
        key = drop_ref.hex()
        d = _cache.get(key)
        if d is None:
            d = ray.get(drop_ref)
            _cache[key] = d
        mask = pa.array(
            [i not in d for i in batch.column(id_col).to_pylist()]
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
