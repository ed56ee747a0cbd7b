"""Crawl-level post-processing: idlnames index.

Reference: src/postprocessing/idlnames.js:176-370 — groups all parsed
IDL by name; on duplicate definitions the first spec in crawl order
wins ("first apparence is the main one", idlnames.js:208-215);
partials/includes become "extended" entries; dependency expansion with
a cycle guard (idlnames.js:254-276).

Ray mapping (A3 + J7, SURVEY.md §2.5): explode idlparsed reports to
(name, doc_id, kind, seed_rank) rows → ``groupby(name)`` with
min-by-seed_rank tie-break (deterministic regardless of execution
order — SURVEY.md §7.4 hard part 1). The dependency graph expansion
runs driver-side on the collected (small) name table.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import ray.data as rd


def explode_idlparsed(batch: pa.Table) -> pa.Table:
    """(doc_id, idlparsed, seed_rank) → (name, doc_id, kind, deps, seed_rank)."""
    out = {"name": [], "doc_id": [], "kind": [], "deps": [], "seed_rank": []}
    ranks = (
        batch.column("seed_rank").to_pylist()
        if "seed_rank" in batch.column_names
        else [0] * batch.num_rows
    )
    for doc_id, report_json, rank in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("idlparsed").to_pylist(),
        ranks,
    ):
        if not report_json:
            continue
        report = json.loads(report_json)
        deps = report.get("dependencies", {})
        for name in report.get("idlNames", {}):
            out["name"].append(name)
            out["doc_id"].append(doc_id)
            out["kind"].append("defines")
            out["deps"].append(sorted(set(deps.get(name, []))))
            out["seed_rank"].append(rank)
        for name in report.get("idlExtendedNames", {}):
            out["name"].append(name)
            out["doc_id"].append(doc_id)
            out["kind"].append("extends")
            out["deps"].append(sorted(set(deps.get(name, []))))
            out["seed_rank"].append(rank)
    return pa.table(
        {
            "name": pa.array(out["name"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "kind": pa.array(out["kind"], pa.string()),
            "deps": pa.array(out["deps"], pa.list_(pa.string())),
            "seed_rank": pa.array(out["seed_rank"], pa.int64()),
        }
    )


def idlnames(idlparsed_ds: rd.Dataset) -> pa.Table:
    """→ Arrow table (name, defined_in, extended_in:list, deps:list,
    all_deps:list) — ~1500 names for a full crawl, so the final graph
    expansion happens on the collected table (SURVEY.md §7.4 item 4).
    """
    exploded = idlparsed_ds.map_batches(explode_idlparsed, batch_format="pyarrow")

    def per_name(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["seed_rank", "doc_id"])
        defs = g[g["kind"] == "defines"]
        exts = g[g["kind"] == "extends"]
        defined_in = defs["doc_id"].iloc[0] if len(defs) else None
        deps: list[str] = []
        for lst in g["deps"]:
            for d in lst:
                if d not in deps:
                    deps.append(d)
        return pd.DataFrame(
            {
                "name": [g["name"].iloc[0]],
                "defined_in": [defined_in],
                "extended_in": [sorted(set(exts["doc_id"]))],
                "deps": [sorted(deps)],
            }
        )

    small = exploded.groupby("name").map_groups(per_name, batch_format="pandas")
    tbl = pa.Table.from_pandas(small.to_pandas(), preserve_index=False)

    # driver-side transitive dependency expansion with cycle guard
    # (idlnames.js:254-276)
    deps_map = {
        n: list(d) for n, d in zip(
            tbl.column("name").to_pylist(), tbl.column("deps").to_pylist()
        )
    }

    def expand(name: str, seen: set[str]) -> set[str]:
        out: set[str] = set()
        for dep in deps_map.get(name, []):
            if dep in seen:
                continue  # cycle guard
            seen.add(dep)
            out.add(dep)
            out |= expand(dep, seen)
        return out

    all_deps = [
        sorted(expand(n, {n})) for n in tbl.column("name").to_pylist()
    ]
    return tbl.append_column("all_deps", pa.array(all_deps, pa.list_(pa.string())))
