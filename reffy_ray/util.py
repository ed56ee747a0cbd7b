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
