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
