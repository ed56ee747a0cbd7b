"""Crawl-level post-processing: events consolidation.

Reference: src/postprocessing/events.js — mixin target expansion
(J4, events.js:93-109), extension-event folding (extendEvent,
events.js:202-225), "babbling" same-href merge (events.js:235-253),
final multi-key sort (events.js:81-88).

Ray mapping (A5, SURVEY.md §2.5): mixin map is small → broadcast;
folding groups by event href/type via groupby; final ``sort``.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_MIXIN_CACHE: dict[str, dict] = {}


def build_mixin_map(idlparsed_ds: rd.Dataset) -> dict[str, list[str]]:
    """mixin name → list of including interfaces (events.js:15-37)."""
    mixins: dict[str, list[str]] = {}
    for batch in idlparsed_ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for report_json in batch.column("idlparsed").to_pylist():
            if not report_json:
                continue
            report = json.loads(report_json)
            for name, exts in (report.get("idlExtendedNames") or {}).items():
                for ext in exts:
                    if ext.get("type") == "includes":
                        mixins.setdefault(ext["includes"], []).append(name)
    return mixins


def build_inheritance_map(idlparsed_ds: rd.Dataset) -> dict[str, str | None]:
    """interface → parent interface, from the idlparsed reports
    (the consolidated IDL view events.js:15-26 collects)."""
    inh: dict[str, str | None] = {}
    for batch in idlparsed_ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for report_json in batch.column("idlparsed").to_pylist():
            if not report_json:
                continue
            report = json.loads(report_json)
            for name, desc in (report.get("idlNames") or {}).items():
                if desc.get("type") == "interface":
                    inh.setdefault(name, desc.get("inheritance"))
    return inh


def consolidate_events(
    events: rd.Dataset, idlparsed_ds: rd.Dataset | None = None
) -> pa.Table:
    """→ consolidated, sorted events table."""
    mixins = build_mixin_map(idlparsed_ds) if idlparsed_ds is not None else {}
    inheritance = (
        build_inheritance_map(idlparsed_ds) if idlparsed_ds is not None else {}
    )
    mixins_ref = ray.put(mixins)

    def expand_mixins(batch: pd.DataFrame) -> pd.DataFrame:
        # plain tasks + per-worker broadcast cache (one zero-copy
        # ray.get per worker process) — no actor pool to churn/starve
        mx = _MIXIN_CACHE.get(mixins_ref.hex())
        if mx is None:
            mx = ray.get(mixins_ref)
            _MIXIN_CACHE.clear()
            _MIXIN_CACHE[mixins_ref.hex()] = mx

        def expand(targets):
            if targets is None or (isinstance(targets, float) and pd.isna(targets)):
                return targets
            out, has_mixin = [], False
            for t in targets:
                if t in mx:
                    has_mixin = True
                    out.extend(mx[t])
                else:
                    out.append(t)
            return out if (out and has_mixin) else targets

        batch = batch.copy()
        batch["targets"] = batch["targets"].map(expand)
        return batch

    expanded = events.map_batches(expand_mixins, batch_format="pandas")

    # fold extension events into the original they extend: extensions
    # carry the ORIGINAL's href (their type cell links to the defining
    # spec), so grouping by event type and matching on href folds them
    # across specs (extendEvent, events.js:202-225)
    def fold(group: pd.DataFrame) -> pd.DataFrame:
        originals = group[~group["is_extension"].fillna(False)].copy()
        extensions = group[group["is_extension"].fillna(False)]
        if originals.empty:
            return group  # nothing to fold into: keep extensions
        leftover = []
        for _, ext in extensions.iterrows():
            match = originals.index[originals["href"] == ext["href"]]
            if len(match) == 0:
                leftover.append(ext)  # could not extend → keep (events.js:56-60)
                continue
            i = match[0]
            tgt = set(originals.at[i, "targets"] or []) | set(ext["targets"] or [])
            originals.at[i, "targets"] = sorted(tgt) if tgt else None
            for col in ("bubbles", "cancelable", "interface"):
                if pd.isna(originals.at[i, col]) and not pd.isna(ext[col]):
                    originals.at[i, col] = ext[col]
        out = originals
        if leftover:
            out = pd.concat([originals, pd.DataFrame(leftover)], ignore_index=True)
        return out.reset_index(drop=True)

    folded = expanded.groupby("type").map_groups(fold, batch_format="pandas")

    out = folded.sort(["type", "interface", "href"]).to_pandas()

    # bubbling per target over the interface trees (J5,
    # events.js:112-144): non-root tree targets default bubbles=false;
    # per-target detail (incl. bubblingPath when bubbling) recorded in
    # a targets_detail JSON column, target list pruned of interfaces
    # covered by an ancestor/deeper-bubbling entry (events.js:157-199)
    from ..functions.interface_trees import get_interface_tree_info, inherits_from

    details = []
    for i, row in out.iterrows():
        targets = row.get("targets")
        if targets is None or (isinstance(targets, float) and pd.isna(targets)):
            details.append(None)
            continue
        bubbles = row.get("bubbles")
        updated, tree_targets = [], []
        for iface in targets:
            info = get_interface_tree_info(iface, inheritance)
            if info is None or info["depth"] == 0:
                updated.append({"target": iface})
            else:
                tree_targets.append((iface, info["bubblingPath"]))
        if (bubbles is None or pd.isna(bubbles)) and tree_targets:
            bubbles = False
            out.at[i, "bubbles"] = False
        for iface, path in tree_targets:
            entry = {"target": iface, "bubbles": bool(bubbles)}
            if bubbles:
                entry["bubblingPath"] = path
            updated.append(entry)
        # cleanTargetInterfaces: drop targets covered by an ancestor with
        # the same bubbling behaviour
        kept = [
            e for e in updated
            if not any(
                o is not e
                and o.get("bubbles") == e.get("bubbles")
                and inherits_from(e["target"], o["target"], inheritance)
                for o in updated
            )
        ]
        details.append(json.dumps(kept, ensure_ascii=False))
        out.at[i, "targets"] = sorted(e["target"] for e in kept)
    out["targets_detail"] = details
    return pa.Table.from_pandas(out, preserve_index=False)
