"""Spec-level dfn patching (last-resort duplicate-dfn fixes).

Reimplements the reference's patch-dfns post-processor
(src/postprocessing/patch-dfns.js:13-51): for a small hardcoded set of
specs (matched on the crawled URL) drop or privatize definitions that
are known to collide across specs.  Runs as a lazy ``map_batches``
stage over the dfns extract — the URL match is a vectorized Arrow
substring scan and almost every batch takes the unchanged fast path,
so the stage is effectively free on a corpus where the patched specs
are a handful of documents.

Rules (same if/else-if precedence as the reference — a spec matches at
most one rule):

1. URL contains ``/deviceorientation/`` or ``/TR/orientation-event/``
   → drop dfns whose ``linking_text`` or ``for`` lists contain
   ``PermissionState`` (patch-dfns.js:23-28).
2. URL contains ``/portals/`` → drop dfns whose first linking text is
   ``MessageEventSource`` (patch-dfns.js:31-34).
3. URL contains ``/TR/WebCryptoAPI/``, ``/TR/pub-manifest/`` or
   ``/TR/audiobooks/`` → mark every dfn ``access='private'``
   (patch-dfns.js:41-46).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_ORIENTATION = ("/deviceorientation/", "/TR/orientation-event/")
_PORTALS = ("/portals/",)
_PRIVATIZE = ("/TR/WebCryptoAPI/", "/TR/pub-manifest/", "/TR/audiobooks/")


def _url_mask(urls: pa.ChunkedArray | pa.Array, patterns: tuple[str, ...]):
    mask = None
    for p in patterns:
        m = pc.match_substring(urls, p)
        mask = m if mask is None else pc.or_(mask, m)
    return pc.fill_null(mask, False)


def patch_dfns_batch(batch: pa.Table, url_col: str = "href") -> pa.Table:
    """Patch one dfns batch.  ``url_col`` must carry the crawled page
    URL (the extract's ``href`` is page-URL + fragment, so substring
    matching against it is exactly the reference's
    ``spec.crawled.includes(...)``)."""
    if batch.num_rows == 0:
        return batch
    urls = batch.column(url_col)
    orient = _url_mask(urls, _ORIENTATION)
    portals = _url_mask(urls, _PORTALS)
    priv = _url_mask(urls, _PRIVATIZE)
    # else-if precedence: first matching rule wins per row
    portals = pc.and_(portals, pc.invert(orient))
    priv = pc.and_(priv, pc.invert(pc.or_(orient, portals)))

    # fast path: no row belongs to a patched spec — return zero-copy
    if not (pc.any(orient).as_py() or pc.any(portals).as_py()
            or pc.any(priv).as_py()):
        return batch

    keep = [True] * batch.num_rows
    lt_col = batch.column("linking_text").to_pylist()
    for_col = (batch.column("for").to_pylist()
               if "for" in batch.column_names else [[]] * batch.num_rows)
    for i in range(batch.num_rows):
        if orient[i].as_py():
            lts = lt_col[i] or []
            fors = for_col[i] or []
            if "PermissionState" in lts or "PermissionState" in fors:
                keep[i] = False
        elif portals[i].as_py():
            lts = lt_col[i] or []
            if lts and lts[0] == "MessageEventSource":
                keep[i] = False

    if "access" in batch.column_names and pc.any(priv).as_py():
        idx = batch.schema.get_field_index("access")
        access = pc.if_else(
            priv, pa.scalar("private", pa.string()),
            pc.cast(batch.column("access"), pa.string()),
        )
        batch = batch.set_column(idx, "access", access)
    if not all(keep):
        batch = batch.filter(pa.array(keep, pa.bool_()))
    return batch


def patch_dfns(dfns: rd.Dataset, url_col: str = "href") -> rd.Dataset:
    """Lazy patched view of a dfns extract Dataset."""
    return dfns.map_batches(
        lambda b: patch_dfns_batch(b, url_col=url_col),
        batch_format="pyarrow",
    )
