"""Crawl-level post-processing: merged CSS definitions.

Reference: src/postprocessing/cssmerge.js:98-377 — consolidates CSS
features across specs: per-feature dedup, base definition chosen from
the highest series version among full specs (cssmerge.js:230-241),
syntax union via "| newValues" (cssmerge.js:276-283), canonical sort
(cssmerge.js:367-373).

Ray mapping (A4, SURVEY.md §2.5): ``groupby(category, name)`` with a
merge body, then ``sort``.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import ray.data as rd


def merge_css(css: rd.Dataset, seeds: pa.Table | None = None) -> pa.Table:
    """css: extracts_css shape (doc_id, category, name, payload_json)
    [+ optional series_version column] → merged table sorted by
    (category, name)."""
    version_by_doc: dict[str, str] = {}
    if seeds is not None:
        version_by_doc = dict(
            zip(
                seeds.column("shortname").to_pylist(),
                seeds.column("series_version").to_pylist(),
            )
        )

    def merge_feature(group: pd.DataFrame) -> pd.DataFrame:
        # base definition: highest series version (cssmerge.js:230-241);
        # ties broken by doc_id for determinism
        def version_key(doc_id: str):
            v = version_by_doc.get(doc_id, "0")
            try:
                return tuple(int(x) for x in str(v).split("."))
            except ValueError:
                return (0,)

        g = group.copy()
        g["_vkey"] = g["doc_id"].map(version_key)
        g = g.sort_values(["_vkey", "doc_id"], ascending=[False, True])
        base = json.loads(g.iloc[0]["payload_json"])
        # syntax union via "| newValues" (cssmerge.js:276-283)
        new_values = []
        for _, row in g.iloc[1:].iterrows():
            p = json.loads(row["payload_json"])
            nv = p.get("newValues")
            if nv and nv not in new_values:
                new_values.append(nv)
        if new_values and base.get("value"):
            base["value"] = " | ".join([base["value"]] + new_values)
        defined_in = sorted(set(g["doc_id"]))
        return pd.DataFrame(
            {
                "category": [g.iloc[0]["category"]],
                "name": [g.iloc[0]["name"]],
                "payload_json": [json.dumps(base, sort_keys=True, ensure_ascii=False)],
                "defined_in": [defined_in],
            }
        )

    merged = css.groupby(["category", "name"]).map_groups(
        merge_feature, batch_format="pandas"
    )
    out = merged.sort(["category", "name"]).to_pandas()
    return pa.Table.from_pandas(out, preserve_index=False)
