"""Crawl-level post-processing: back-references (links × dfns).

Reference: src/postprocessing/backrefs.js:22-111 — for every dfn,
collect the specs whose links reference its href, excluding
self-references; multipage HTML/ES hrefs are aliased to their
single-page form (backrefs.js:160-212).

Ray mapping (J3, SURVEY.md §2.4 — "the genuinely wide shuffle"):
both sides can be huge at crawl scale, so this is an explicit
bucketed hash join — add ``bucket = mix64(href) % B`` to both sides,
``groupby('bucket')`` each bucket's rows together, pandas-merge inside
``map_groups``, then a second groupby to collect referrers per term.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..urlnorm import fnv1a64, mix64

_RE_MULTIPAGE = re.compile(r"/multipage/[^#]+#")

_MULTIPAGE_PREFIXES = (
    "https://html.spec.whatwg.org/multipage/",
    "https://tc39.es/ecma262/multipage/",
)


def single_page_form(href: str) -> str | None:
    """multipage → single-page alias (backrefs.js:163-171,203-211)."""
    if href.startswith(_MULTIPAGE_PREFIXES):
        return _RE_MULTIPAGE.sub("/#", href)
    return None


def _bucket_of(href: str, num_buckets: int) -> int:
    return mix64(fnv1a64(href)) % num_buckets


def backrefs(
    links: rd.Dataset, dfns: rd.Dataset, num_buckets: int = 32
) -> rd.Dataset:
    """→ Dataset(defining_doc, href, id, type, access, referenced_by:list).

    ``links``: extracts_links shape (doc_id, page_url, auto, anchors).
    ``dfns``: extracts_dfns shape (doc_id, id, href, type, access, ...).
    """

    def explode_links(batch: pa.Table) -> pa.Table:
        out_doc, out_href, out_bucket = [], [], []
        for doc_id, page, anchors in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("page_url").to_pylist(),
            batch.column("anchors").to_pylist(),
        ):
            for frag in anchors or []:
                href = f"{page}#{frag}"
                # normalize the link to the single-page alias form so it
                # matches however the dfn side indexed it
                alias = single_page_form(href)
                for form in ([href] if alias is None else [href, alias]):
                    out_doc.append(doc_id)
                    out_href.append(form)
                    out_bucket.append(_bucket_of(form, num_buckets))
        return pa.table(
            {
                "referrer": pa.array(out_doc, pa.string()),
                "href": pa.array(out_href, pa.string()),
                "bucket": pa.array(out_bucket, pa.int64()),
                "side": pa.array(["link"] * len(out_doc), pa.string()),
                "id": pa.array([None] * len(out_doc), pa.string()),
                "type": pa.array([None] * len(out_doc), pa.string()),
                "access": pa.array([None] * len(out_doc), pa.string()),
                "canon_href": pa.array(out_href, pa.string()),
            }
        )

    def explode_dfns(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("referrer", "href", "bucket", "side", "id",
                               "type", "access", "canon_href")}
        for doc_id, dfn_id, href, typ, access in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("id").to_pylist(),
            batch.column("href").to_pylist(),
            batch.column("type").to_pylist(),
            batch.column("access").to_pylist(),
        ):
            alias = single_page_form(href or "")
            # index dfn under both forms (indexDfnHref, backrefs.js:163-171)
            for form in ([href] if alias is None else [href, alias]):
                out["referrer"].append(doc_id)
                out["href"].append(form)
                out["bucket"].append(_bucket_of(form, num_buckets))
                out["side"].append("dfn")
                out["id"].append(dfn_id)
                out["type"].append(typ)
                out["access"].append(access)
                out["canon_href"].append(href)  # canonical dfn href
        return pa.table({k: pa.array(v, pa.int64() if k == "bucket" else pa.string())
                         for k, v in out.items()})

    both = links.map_batches(explode_links, batch_format="pyarrow").union(
        dfns.map_batches(explode_dfns, batch_format="pyarrow")
    )

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        d = group[group["side"] == "dfn"]
        l = group[group["side"] == "link"]
        if d.empty or l.empty:
            return pd.DataFrame(
                {"defining_doc": [], "href": [], "id": [], "type": [],
                 "access": [], "referrer": []}
            )
        merged = l[["referrer", "href"]].merge(
            d[["referrer", "href", "canon_href", "id", "type", "access"]].rename(
                columns={"referrer": "defining_doc"}
            ),
            on="href",
        )
        # anti self-join (backrefs.js:74-77)
        merged = merged[merged["referrer"] != merged["defining_doc"]]
        out = merged[["defining_doc", "canon_href", "id", "type", "access",
                      "referrer"]].rename(columns={"canon_href": "href"})
        return out.drop_duplicates()

    joined = both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")

    def collect(group: pd.DataFrame) -> pd.DataFrame:
        g = group.iloc[0]
        return pd.DataFrame(
            {
                "defining_doc": [g["defining_doc"]],
                "href": [g["href"]],
                "id": [g["id"]],
                "type": [g["type"]],
                "access": [g["access"]],
                "referenced_by": [sorted(set(group["referrer"]))],
            }
        )

    return joined.groupby(["defining_doc", "href"]).map_groups(
        collect, batch_format="pandas"
    )
