"""Crawl-level post-processing: back-references (links × dfns).

Reference: src/postprocessing/backrefs.js:22-111 — for every dfn,
collect the specs whose links reference its href, excluding
self-references; multipage HTML/ES hrefs are aliased to their
single-page form (backrefs.js:160-212).

Ray mapping (J3, SURVEY.md §2.4 — "the genuinely wide shuffle"):
both sides can be huge at crawl scale, so this is an explicit
bucketed hash join — add ``bucket = hash(href) % B`` to both sides
(one vectorized siphash pass), ``groupby('bucket')`` each bucket's
rows together, pandas-merge inside ``map_groups``, then a
``groupby(defining_doc)`` (spec-sized groups, not per-dfn) whose body
collects referrers per term with one in-group pandas groupby.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data as rd

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


def backrefs(
    links: rd.Dataset, dfns: rd.Dataset, num_buckets: int = 32
) -> rd.Dataset:
    """→ Dataset(defining_doc, href, id, type, access, referenced_by:list).

    ``links``: extracts_links shape (doc_id, page_url, auto, anchors).
    ``dfns``: extracts_dfns shape (doc_id, id, href, type, access, ...).
    """

    import pyarrow.compute as pc

    def _is_multipage(hrefs: pa.Array) -> pa.Array:
        m = pc.starts_with(hrefs, _MULTIPAGE_PREFIXES[0])
        for pref in _MULTIPAGE_PREFIXES[1:]:
            m = pc.or_(m, pc.starts_with(hrefs, pref))
        return m

    def _alias_of(hrefs: pa.Array) -> pa.Array:
        # vectorized single_page_form: same regex, Arrow RE2 kernel
        return pc.replace_substring_regex(
            hrefs, _RE_MULTIPAGE.pattern, "/#"
        )

    def _bucket_arr(hrefs: pa.Array) -> pa.Array:
        # internal-only bucketing: any deterministic hash works as
        # long as both sides agree — pandas' siphash (fixed default
        # key) is one vectorized pass vs the old per-row fnv1a64
        h = pd.util.hash_array(
            hrefs.to_numpy(zero_copy_only=False), categorize=False
        )
        return pa.array((h % num_buckets).astype("int64"), pa.int64())

    def _rows(referrer, href, side, ids, types, access, canon) -> pa.Table:
        n = len(href)
        return pa.table(
            {
                "referrer": referrer.cast(pa.string()),
                "href": href,
                "bucket": _bucket_arr(href),
                "side": pa.array([side] * n, pa.string()),
                "id": ids if ids is not None
                else pa.nulls(n, pa.string()),
                "type": types if types is not None
                else pa.nulls(n, pa.string()),
                "access": access if access is not None
                else pa.nulls(n, pa.string()),
                "canon_href": canon,
            }
        )

    def explode_links(batch: pa.Table) -> pa.Table:
        # anchors flatten + page#frag join + multipage aliasing, all
        # Arrow kernels — no per-row Python (round-4 verdict #7)
        anchors = pc.list_flatten(batch.column("anchors"))
        parents = pc.list_parent_indices(batch.column("anchors"))
        pages = pc.take(batch.column("page_url"), parents)
        docs = pc.take(batch.column("doc_id"), parents)
        hrefs = pc.binary_join_element_wise(
            pages.cast(pa.string()), anchors.cast(pa.string()), "#"
        )
        base = _rows(docs, hrefs, "link", None, None, None, hrefs)
        is_mp = _is_multipage(hrefs)
        if pc.any(is_mp).as_py():
            mp_docs = pc.filter(docs, is_mp)
            mp_alias = _alias_of(pc.filter(hrefs, is_mp))
            base = pa.concat_tables(
                [base,
                 _rows(mp_docs, mp_alias, "link", None, None, None,
                       mp_alias)]
            )
        return base

    def explode_dfns(batch: pa.Table) -> pa.Table:
        hrefs = pc.fill_null(batch.column("href").cast(pa.string()), "")
        docs = batch.column("doc_id")
        ids = batch.column("id").cast(pa.string())
        types = batch.column("type").cast(pa.string())
        access = batch.column("access").cast(pa.string())
        # index dfn under both forms (indexDfnHref, backrefs.js:163-171);
        # canon_href stays the original href on alias rows
        base = _rows(docs, hrefs, "dfn", ids, types, access, hrefs)
        is_mp = _is_multipage(hrefs)
        if pc.any(is_mp).as_py():
            f = lambda a: pc.filter(a, is_mp)  # noqa: E731
            base = pa.concat_tables(
                [base,
                 _rows(f(docs), _alias_of(f(hrefs)), "dfn", f(ids),
                       f(types), f(access), f(hrefs))]
            )
        return base

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
        # one Ray group per SPEC (not per dfn — thousands of tiny
        # groups cost more in task boundaries than the work inside);
        # the per-href collect is a single in-group pandas groupby
        g = group.sort_values("referrer", kind="stable").drop_duplicates(
            ["href", "referrer"]
        )
        out = g.groupby("href", as_index=False, sort=False).agg(
            id=("id", "first"),
            type=("type", "first"),
            access=("access", "first"),
            referenced_by=("referrer", list),
        )
        out.insert(0, "defining_doc", group["defining_doc"].iloc[0])
        return out[["defining_doc", "href", "id", "type", "access",
                    "referenced_by"]]

    return joined.groupby("defining_doc").map_groups(
        collect, batch_format="pandas"
    )
