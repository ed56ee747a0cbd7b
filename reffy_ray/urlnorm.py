"""URL canonicalization, origin coarsening and host sharding.

Semantics derived from the reference:
- canonicalize_url: src/postprocessing/annotate-links.js:6-17
- coarse_origin:    src/lib/throttled-queue.js:18-37
Both are pure scalar functions; `canonicalize_batch` vectorizes over a
pyarrow string array for hot-path use inside map_batches.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa

_RE_W3C_SUBPAGE = re.compile(r"(w3\.org/TR/(?:[^/]+/)+)[^/]+\.[^/]+$")
_RE_W3C_NOSLASH = re.compile(r"(w3\.org/TR/[^/]+)$")
_RE_GH_NOSLASH = re.compile(r"(w3c\.github\.io/[^/]+)$")
_RE_WHATWG_SUB = re.compile(r"(spec\.whatwg\.org/).*")


def canonicalize_url(url: str) -> str:
    """Canonical form of a spec URL (annotate-links.js:6-17).

    http→https, strip fragment, strip index/Overview/cover.html, map
    whatwg / w3c TR subpages to the main document, enforce trailing
    slash on w3.org/TR and w3c.github.io spec roots.
    """
    if not url:
        return ""
    u = url
    if u.startswith("http:"):
        u = "https:" + u[5:]
    u = u.split("#", 1)[0]
    u = u.replace("index.html", "").replace("Overview.html", "").replace("cover.html", "")
    u = _RE_WHATWG_SUB.sub(r"\1", u)
    u = _RE_W3C_SUBPAGE.sub(r"\1", u)
    u = _RE_W3C_NOSLASH.sub(r"\1/", u)
    u = _RE_GH_NOSLASH.sub(r"\1/", u)
    return u


def host_of(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


def coarse_origin(url: str) -> str:
    """Loose origin identifying the serving infrastructure
    (throttled-queue.js:18-37): *.whatwg.org → whatwg.org,
    *.github.io → github.io, csswg/houdini/fxtf → csswg.org.
    """
    if not url:
        return ""
    host = host_of(url)
    if host.endswith(".whatwg.org") or host == "whatwg.org":
        return "https://whatwg.org"
    if host.endswith(".github.io") or host == "github.io":
        return "https://github.io"
    if (
        host.endswith(".csswg.org")
        or host == "csswg.org"
        or host.endswith(".css-houdini.org")
        or host.endswith(".fxtf.org")
    ):
        return "https://csswg.org"
    scheme = urlsplit(url).scheme or "https"
    return f"{scheme}://{host}"


# Politeness sleep intervals per coarse origin, milliseconds
# (specs-crawler.js:460-472).
SLEEP_INTERVALS_MS = {
    "https://csswg.org": 2000,
    "https://www.w3.org": 1000,
}
DEFAULT_SLEEP_MS = 100


def sleep_interval_ms(origin: str) -> int:
    return SLEEP_INTERVALS_MS.get(origin, DEFAULT_SLEEP_MS)


# ---------------------------------------------------------------------------
# Hashing / sharding — stable across processes (no PYTHONHASHSEED reliance)
# ---------------------------------------------------------------------------

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a64(s: str) -> int:
    """Stable 64-bit FNV-1a hash of a string."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def fnv1a64_batch(arr) -> np.ndarray:
    """Vectorized-ish FNV-1a over a pyarrow/np array of strings.

    Python loop per string but O(1) pyarrow conversion; strings are
    short (URLs) so this is cheap relative to the shuffle it keys.
    """
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        items = arr.to_pylist()
    else:
        items = list(arr)
    out = np.empty(len(items), dtype=np.uint64)
    for i, s in enumerate(items):
        h = 14695981039346656037
        for b in (s or "").encode("utf-8"):
            h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def mix64(h: int) -> int:
    """xor-fold + multiply avalanche. FNV-1a's low bits correlate for
    short strings sharing a suffix (every canon URL ends '/'), which
    once skewed 99% of a crawl's URLs onto one seen shard — always mix
    before taking a modulus."""
    h &= 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    return h


def host_shard(url: str, num_shards: int, salt: int = 0) -> int:
    """Politeness shard: hash of coarse origin (+ optional hot-host salt)."""
    return (mix64(fnv1a64(coarse_origin(url))) + salt) % num_shards


def url_shard(canon_url: str, num_shards: int) -> int:
    """Seen-set shard: hash of the canonical URL."""
    return mix64(fnv1a64(canon_url)) % num_shards
