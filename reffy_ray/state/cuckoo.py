"""Cuckoo filter for the URL-seen set (north_rule requirement).

The reference achieves at-most-one-fetch-per-URL-per-crawl implicitly
via its `refresh:'once'` HTTP file cache (src/lib/fetch.js:41-43); the
target makes the seen set explicit and sharded. Each shard holds one
CuckooFilter plus (optionally) an exact fingerprint→count backup so
test-scale runs are provably false-positive free (SURVEY.md §2.5 note).

Standard partial-key cuckoo hashing (Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNLL 2014): 4-slot buckets, 16-bit
fingerprints, alternate bucket = bucket XOR hash(fingerprint).
Serializable to bytes for per-partition checkpoint snapshots.
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500


def _fnv(s: bytes) -> int:
    h = 14695981039346656037
    for b in s:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


class CuckooFilter:
    """Cuckoo filter over strings with an exact-backup option."""

    def __init__(self, capacity: int = 1 << 16, exact_backup: bool = True, seed: int = 0):
        # power-of-two bucket count sized for ~95% load at `capacity` items
        nbuckets = 1
        while nbuckets * _SLOTS * 0.95 < capacity:
            nbuckets <<= 1
        self.nbuckets = nbuckets
        self.table = np.zeros((nbuckets, _SLOTS), dtype=np.uint16)
        self.count = 0
        self.seed = seed
        self.exact: set[str] | None = set() if exact_backup else None

    # -- hashing -----------------------------------------------------------
    def _fingerprint_and_bucket(self, item: str) -> tuple[int, int]:
        h = _fnv(item.encode("utf-8") + self.seed.to_bytes(2, "little"))
        fp = (h >> 48) & 0xFFFF
        if fp == 0:
            fp = 1  # 0 marks an empty slot
        b1 = (h & 0xFFFFFFFF) % self.nbuckets
        return fp, b1

    def _alt_bucket(self, bucket: int, fp: int) -> int:
        return (bucket ^ (_fnv(fp.to_bytes(2, "little")) & 0xFFFFFFFF)) % self.nbuckets

    # -- ops ---------------------------------------------------------------
    def contains(self, item: str) -> bool:
        if self.exact is not None:
            return item in self.exact
        fp, b1 = self._fingerprint_and_bucket(item)
        if fp in self.table[b1]:
            return True
        b2 = self._alt_bucket(b1, fp)
        return fp in self.table[b2]

    def add(self, item: str) -> bool:
        """Insert; returns False if the filter is full (caller must grow)."""
        fp, b1 = self._fingerprint_and_bucket(item)
        if self.exact is not None:
            self.exact.add(item)
        for b in (b1, self._alt_bucket(b1, fp)):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # kick loop
        rng = np.random.default_rng(fp ^ b1 ^ self.seed)  # deterministic eviction
        b = b1
        for _ in range(_MAX_KICKS):
            slot = int(rng.integers(_SLOTS))
            fp, self.table[b][slot] = int(self.table[b][slot]), fp
            b = self._alt_bucket(b, fp)
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        return False

    def add_if_absent(self, item: str) -> bool:
        """Returns True iff the item was newly added (the frontier-dedup op)."""
        if self.contains(item):
            return False
        if not self.add(item):
            raise MemoryError("cuckoo filter full; resize shard")
        return True

    # -- checkpoint --------------------------------------------------------
    def to_bytes(self) -> bytes:
        # exact-mode flag is serialized explicitly: an EMPTY exact set
        # must round-trip as exact mode, not silently become
        # approximate-only on restore
        exact_flag = 1 if self.exact is not None else 0
        header = np.array(
            [self.nbuckets, self.count, self.seed, exact_flag], dtype=np.int64
        ).tobytes()
        body = self.table.tobytes()
        exact_blob = (
            "\x00".join(sorted(self.exact)).encode("utf-8")
            if self.exact is not None
            else b""
        )
        return (
            len(header).to_bytes(4, "little")
            + header
            + len(body).to_bytes(8, "little")
            + body
            + exact_blob
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        hlen = int.from_bytes(blob[:4], "little")
        header = np.frombuffer(blob[4 : 4 + hlen], dtype=np.int64)
        off = 4 + hlen
        blen = int.from_bytes(blob[off : off + 8], "little")
        off += 8
        table = np.frombuffer(blob[off : off + blen], dtype=np.uint16).copy()
        off += blen
        self = cls.__new__(cls)
        self.nbuckets = int(header[0])
        self.count = int(header[1])
        self.seed = int(header[2])
        self.table = table.reshape(self.nbuckets, _SLOTS)
        exact_flag = int(header[3]) if len(header) > 3 else None
        rest = blob[off:]
        if exact_flag == 1:
            self.exact = (
                set(rest.decode("utf-8").split("\x00")) if rest else set()
            )
        elif exact_flag == 0:
            self.exact = None
        else:  # legacy blob without the flag
            self.exact = set(rest.decode("utf-8").split("\x00")) if rest else None
        return self
