"""Host-level link-graph statistics over the links extraction.

The crawl-analysis companion to the links extract (reference:
src/browserlib/extract-links.mjs emits the raw per-page link map;
consumers aggregate it themselves): per target host, how many links
point there, from how many distinct source documents, and how many are
auto-generated anchors. This is the fan-in profile a frontier
scheduler uses to budget per-host politeness and spot hub hosts.

Scale shape: partial aggregation inside ``map_batches`` (pyarrow
``Table.group_by`` over (host, doc) within each batch) collapses the
link stream to at most #hosts x #docs-per-batch rows, then ONE Ray
``groupby`` shuffle over (host, doc) pairs and a second tiny one over
hosts. Nothing driver-side; host extraction is a vectorized Arrow
regex, not a per-row loop.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/]+)"


def host_link_stats(links: rd.Dataset) -> rd.Dataset:
    """``(doc_id, page_url, auto)`` link rows → per-host fan-in stats
    ``(host, n_links, n_docs, n_auto)``, all counts int64."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.string()),
                    "links": pa.array([], pa.int64()),
                    "autos": pa.array([], pa.int64()),
                }
            )
        host = pc.struct_field(
            pc.extract_regex(b.column("page_url"), _HOST_RE), "host"
        )
        t = pa.table(
            {
                "host": host,
                "doc_id": b.column("doc_id"),
                "auto": pc.cast(b.column("auto"), pa.int64()),
            }
        )
        g = t.group_by(["host", "doc_id"]).aggregate(
            [("auto", "count"), ("auto", "sum")]
        )
        return pa.table(
            {
                "host": g.column("host"),
                "doc_id": g.column("doc_id"),
                "links": pc.cast(g.column("auto_count"), pa.int64()),
                "autos": pc.cast(g.column("auto_sum"), pa.int64()),
            }
        )

    per_doc = (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby(["host", "doc_id"])
        .sum(["links", "autos"])
    )

    def collapse(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "n_links": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_auto": pa.array([], pa.int64()),
                }
            )
        import pyarrow.compute as pc

        g = b.group_by("host").aggregate(
            [("sum(links)", "sum"), ("doc_id", "count"), ("sum(autos)", "sum")]
        )
        return pa.table(
            {
                "host": g.column("host"),
                "n_links": pc.cast(g.column("sum(links)_sum"), pa.int64()),
                "n_docs": pc.cast(g.column("doc_id_count"), pa.int64()),
                "n_auto": pc.cast(g.column("sum(autos)_sum"), pa.int64()),
            }
        )

    # per_doc rows are unique on (host, doc_id); a second partial over
    # them is exact for n_docs, and the final host groupby folds the
    # (few) per-block partials
    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": b.column("host"),
                "n_links": pc.cast(b.column("sum(n_links)"), pa.int64()),
                "n_docs": pc.cast(b.column("sum(n_docs)"), pa.int64()),
                "n_auto": pc.cast(b.column("sum(n_auto)"), pa.int64()),
            }
        )

    return (
        per_doc.map_batches(collapse, batch_format="pyarrow")
        .groupby("host")
        .sum(["n_links", "n_docs", "n_auto"])
        .map_batches(rename, batch_format="pyarrow")
    )
