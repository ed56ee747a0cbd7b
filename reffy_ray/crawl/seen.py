"""Sharded URL-seen set: cuckoo-filter actors.

The reference deduplicates fetches implicitly via its per-crawl
`refresh:'once'` HTTP cache (reference: src/lib/fetch.js:41-43). Here
the seen set is explicit (north_rule): N shard actors, each owning a
CuckooFilter for the slice ``url_shard(canon_url, N) == shard_id``.

This is a genuinely shared mutable index — the one place the Dataset
API can't express the semantics — so it drops to raw ``@ray.remote``
actors. All calls are batch-level (one RPC per (batch, shard), never
per URL).
"""

from __future__ import annotations

import ray

from ..state.cuckoo import CuckooFilter
from ..urlnorm import fnv1a64_batch


# num_cpus=0: coordination actor — tiny hash-set bookkeeping per call.
# Reserving CPU here starves the fetch/parse pools on small clusters
# (the shards scale with the cluster via num_shards, not CPU slices).
@ray.remote(num_cpus=0)
class TallyActor:
    """Tiny shared counter (robots exclusions, etc.); fire-and-forget
    increments from map_batches tasks, read once at checkpoint time."""

    def __init__(self):
        self.counts: dict[str, int] = {}

    def add(self, key: str, n: int) -> None:
        self.counts[key] = self.counts.get(key, 0) + n

    def get(self) -> dict:
        return dict(self.counts)


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set."""

    def __init__(self, shard_id: int, capacity: int = 1 << 18, exact_backup: bool = True):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity=capacity, exact_backup=exact_backup, seed=shard_id)
        self.added = 0
        self.rejected = 0

    def filter_new(self, urls: list[str]) -> list[bool]:
        """For each canon URL: True if newly added (first sighting)."""
        out = []
        for u in urls:
            is_new = self.filter.add_if_absent(u)
            if is_new:
                self.added += 1
            else:
                self.rejected += 1
            out.append(is_new)
        return out

    def contains_batch(self, urls: list[str]) -> list[bool]:
        return [self.filter.contains(u) for u in urls]

    def stats(self) -> dict:
        return {"shard": self.shard_id, "added": self.added, "rejected": self.rejected}

    def snapshot(self) -> bytes:
        return self.filter.to_bytes()

    def restore(self, blob: bytes) -> None:
        self.filter = CuckooFilter.from_bytes(blob)


class SeenSet:
    """Driver-side handle: spreads batch membership tests across shards."""

    def __init__(self, num_shards: int = 16, capacity_per_shard: int = 1 << 18,
                 exact_backup: bool = True):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(i, capacity_per_shard, exact_backup)
            for i in range(num_shards)
        ]

    def shard_of(self, urls: list[str]) -> list[int]:
        from ..urlnorm import mix64

        return [int(mix64(int(h)) % self.num_shards) for h in fnv1a64_batch(urls)]

    def filter_new(self, urls: list[str]) -> list[bool]:
        """One RPC per shard touched by this batch, results re-zipped."""
        if not urls:
            return []
        shard_ids = self.shard_of(urls)
        per_shard: dict[int, list[int]] = {}
        for idx, sid in enumerate(shard_ids):
            per_shard.setdefault(sid, []).append(idx)
        refs = {
            sid: self.shards[sid].filter_new.remote([urls[i] for i in idxs])
            for sid, idxs in per_shard.items()
        }
        out = [False] * len(urls)
        for sid, idxs in per_shard.items():
            for i, val in zip(idxs, ray.get(refs[sid])):
                out[i] = val
        return out

    def snapshots(self) -> list[bytes]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, blobs: list[bytes]) -> None:
        assert len(blobs) == self.num_shards
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])
