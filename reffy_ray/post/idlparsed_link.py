"""Spec-level post-processing: link parsed IDL names to their dfns (J6).

Reference: src/postprocessing/idlparsed.js:16-112 — for each IDL
definition (and member), find the spec's dfn whose (type, for,
linkingText) matches and attach its href. The join is local to one
document: zip the ``idlparsed`` and ``dfns`` extracts of the same doc_id
(SURVEY.md §2.4 J6 — "local join inside one row"), realized as a
doc_id-bucketed groupby over the union of both sides.
"""

from __future__ import annotations

import json
import re

import pandas as pd
import pyarrow as pa
import ray.data as rd

# idl.type → dfn type (idlparsed.js:47-53; composed types use the base)
_MEMBER_RE = {
    "attribute": re.compile(
        r"(?:readonly\s+)?attribute\s+[^;]+?(\w+)\s*;", re.S
    ),
}


def _dfn_type_for(idl_type: str) -> str:
    return idl_type.split(" ")[0]


def link_idlparsed_to_dfns(
    idlparsed: rd.Dataset, dfns: rd.Dataset
) -> rd.Dataset:
    """→ Dataset(doc_id, idl_name, kind, member, dfn_href).

    Definition-level links for every idlName plus member-level links
    for attributes/operations the lightweight parser can name; match
    semantics follow getHref (idlparsed.js:16-112): candidate dfns
    filtered by dfn type (+ `for` = enclosing name for members), then
    matched on linkingText.
    """

    def tag_idl(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "side": pa.array(["idl"] * batch.num_rows, pa.string()),
                "payload": batch.column("idlparsed").cast(pa.large_string()),
            }
        )

    def tag_dfns(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        payloads = [
            json.dumps(
                {
                    "href": r.get("href"),
                    "lt": r.get("linking_text") or [],
                    "type": r.get("type"),
                    "for": r.get("for") or [],
                },
                ensure_ascii=False,
            )
            for r in rows
        ]
        return pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
                "side": pa.array(["dfn"] * len(rows), pa.string()),
                "payload": pa.array(payloads, pa.large_string()),
            }
        )

    both = idlparsed.map_batches(tag_idl, batch_format="pyarrow").union(
        dfns.map_batches(tag_dfns, batch_format="pyarrow")
    )

    def per_doc(group: pd.DataFrame) -> pd.DataFrame:
        doc_id = group["doc_id"].iloc[0]
        reports = [json.loads(p) for p in group[group["side"] == "idl"]["payload"]]
        doc_dfns = [json.loads(p) for p in group[group["side"] == "dfn"]["payload"]]
        out = {"doc_id": [], "idl_name": [], "kind": [], "member": [], "dfn_href": []}

        def find_href(dfn_type: str, name: str, dfn_for: str | None) -> str | None:
            cands = [
                d for d in doc_dfns
                if d["type"] == dfn_type
                and (dfn_for is None or dfn_for in d["for"])
                and name in d["lt"]
            ]
            # ambiguous → no link (idlparsed.js:104-107)
            return cands[0]["href"] if len(cands) == 1 else None

        for report in reports:
            for name, desc in (report.get("idlNames") or {}).items():
                idl_type = desc.get("type", "interface")
                href = find_href(_dfn_type_for(idl_type), name, None)
                if href:
                    out["doc_id"].append(doc_id)
                    out["idl_name"].append(name)
                    out["kind"].append(idl_type)
                    out["member"].append(None)
                    out["dfn_href"].append(href)
                # member-level: attributes from the fragment text
                frag = desc.get("fragment", "")
                for m in _MEMBER_RE["attribute"].finditer(frag):
                    member = m.group(1)
                    mhref = find_href("attribute", member, name)
                    if mhref:
                        out["doc_id"].append(doc_id)
                        out["idl_name"].append(name)
                        out["kind"].append("attribute")
                        out["member"].append(member)
                        out["dfn_href"].append(mhref)
        return pd.DataFrame(out)

    return both.groupby("doc_id").map_groups(per_doc, batch_format="pandas")
