"""Spec-level post-processing: annotate links with target shortname.

Reference: src/postprocessing/annotate-links.js:25-39 — looks the
canonicalized page URL up in the spec list (release/nightly URLs,
series current spec, multipage page lists).

Ray mapping (J2, SURVEY.md §2.4): the spec list is small → build one
url→shortname dict on the driver, ``ray.put`` it once, look it up
inside ``map_batches``. No shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

from ..urlnorm import canonicalize_url


def build_spec_url_index(seeds: pa.Table) -> dict[str, str]:
    """canonical URL → shortname for every known spec URL."""
    idx: dict[str, str] = {}
    cols = seeds.to_pydict()
    for i in range(seeds.num_rows):
        short = cols["shortname"][i]
        for u in (
            [cols.get("release_url", [None] * seeds.num_rows)[i]]
            + [cols.get("nightly_url", [None] * seeds.num_rows)[i]]
            + [cols.get("url", [None] * seeds.num_rows)[i]]
            + list(cols.get("pages", [[]] * seeds.num_rows)[i] or [])
        ):
            if u:
                idx.setdefault(canonicalize_url(u), short)
    return idx


_IDX_CACHE: dict[str, dict] = {}


def annotate_links(links: rd.Dataset, seeds: pa.Table) -> rd.Dataset:
    """Adds ``spec_shortname`` (nullable) to a links extract Dataset.

    Plain tasks with a per-worker cached broadcast dict (one zero-copy
    ``ray.get`` per worker process) — no actor pool to churn."""
    idx_ref = ray.put(build_spec_url_index(seeds))

    def annotate(batch: pa.Table) -> pa.Table:
        idx = _IDX_CACHE.get(idx_ref.hex())
        if idx is None:
            idx = ray.get(idx_ref)
            _IDX_CACHE.clear()
            _IDX_CACHE[idx_ref.hex()] = idx
        urls = batch.column("page_url").to_pylist()
        short = [idx.get(canonicalize_url(u or "")) for u in urls]
        return batch.append_column(
            "spec_shortname", pa.array(short, pa.string())
        )

    return links.map_batches(annotate, batch_format="pyarrow")
