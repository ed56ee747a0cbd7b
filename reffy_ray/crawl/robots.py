"""robots.txt gate (north_star requirement).

The synthetic corpus has no real robots.txt endpoints, so rules are a
deterministic function of the host (every host disallows ``/private/``
and ``/wip/`` paths) plus any caller-supplied overrides. The rule
table is tiny → broadcast once with ``ray.put`` and consulted inside
map_batches; never a shuffle.

Real-world swap-in: replace ``rules_for_host`` with a fetch of
``{scheme}://{host}/robots.txt`` parsed by ``urllib.robotparser``,
cached per host inside the fetch actors.
"""

from __future__ import annotations

from urllib.parse import urlsplit

DEFAULT_DISALLOW = ("/private/", "/wip/")


def rules_for_host(host: str, overrides: dict[str, list[str]] | None = None) -> list[str]:
    if overrides and host in overrides:
        return overrides[host]
    return list(DEFAULT_DISALLOW)


def allowed(url: str, overrides: dict[str, list[str]] | None = None) -> bool:
    parts = urlsplit(url)
    path = parts.path or "/"
    for prefix in rules_for_host(parts.netloc.lower(), overrides):
        if path.startswith(prefix) or prefix in path:
            return False
    return True


def allowed_batch(urls: list[str], overrides: dict[str, list[str]] | None = None) -> list[bool]:
    return [allowed(u, overrides) for u in urls]
