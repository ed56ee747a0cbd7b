"""Crawl-level post-processing: consolidated CSS definitions.

Faithful port of the reference contract
(reference: src/postprocessing/cssmerge.js:1-421, line refs below):
per-spec categorization with scoped functions/types copied to the root
level (with a ``for`` key), nested at-rules flattened, per-category
dedup choosing the latest series level as the base definition,
newValues/extension merging with ``extended`` provenance, legacy-alias
syntax resolution, scope merging, `value`→`syntax` renaming, unwrapped
type names and the canonical sort.

Ray mapping (A4, SURVEY.md §2.5): phase 1 (categorize one spec's css
extract) is spec-local → ``map_batches``; phase 2 (cross-spec dedup,
extension merge, alias/scope resolution) needs every feature of a
category → ``groupby(category).map_groups``, ordered by crawl rank
inside the group (the reference iterates results in crawl order).
"""

from __future__ import annotations

import json
import re

import pandas as pd
import pyarrow as pa
import ray.data as rd

CATEGORIES = ("atrules", "functions", "properties", "selectors", "types")
EXTRACT_CATEGORIES = ("atrules", "properties", "selectors", "values")


def _copy_scoped_to_root(feature: dict, categorized: dict) -> None:
    """copyScopedValuesToRootLevel (cssmerge.js:68-98)."""
    if feature.get("values"):
        values = [
            {"for": feature["name"], **v}
            for v in feature["values"]
            if v.get("type") in ("function", "type")
        ]
        categorized["functions"].extend(
            v for v in values if v["type"] == "function"
        )
        categorized["types"].extend(v for v in values if v["type"] == "type")
        for value in values:
            _copy_scoped_to_root(value, categorized)
    if feature.get("descriptors") is not None:
        atrules = [
            {"descriptors": [], **v}
            for v in feature["descriptors"]
            if v.get("type") == "at-rule"
        ]
        categorized["atrules"].extend(atrules)
        feature["descriptors"] = [
            d for d in feature["descriptors"] if d.get("type") != "at-rule"
        ]
        for descriptor in feature["descriptors"]:
            _copy_scoped_to_root(descriptor, categorized)


def categorize_spec(css: dict, spec: dict) -> dict:
    """Phase 1 (cssmerge.js:117-140): one spec's css extract →
    categorized features decorated with the spec metadata."""
    categorized = {c: [] for c in CATEGORIES}
    data = {c: [json.loads(json.dumps(f)) for f in css.get(c) or []]
            for c in EXTRACT_CATEGORIES}
    for category in EXTRACT_CATEGORIES:
        for feature in data[category]:
            feature["spec"] = spec
            for value in feature.get("values") or []:
                value["spec"] = spec
    categorized["atrules"].extend(data["atrules"])
    categorized["properties"].extend(data["properties"])
    categorized["selectors"].extend(data["selectors"])
    categorized["functions"].extend(
        v for v in data["values"] if v.get("type") == "function"
    )
    categorized["types"].extend(
        v for v in data["values"] if v.get("type") == "type"
    )
    for category in EXTRACT_CATEGORIES:
        for feature in data[category]:
            _copy_scoped_to_root(feature, categorized)
    return categorized


def _feature_id(feature: dict) -> str:
    """getFeatureId (cssmerge.js:385-393)."""
    fid = feature.get("name") or ""
    if feature.get("for"):
        f = feature["for"]
        fid += " for " + (",".join(f) if isinstance(f, list) else f)
    return fid


def _unwrap_name(name: str) -> str:
    m = re.match(r"^<([^>]+)>$", name or "")
    return m.group(1) if m else name


def consolidate_category(category: str, features: list[dict]) -> list[dict]:
    """Phase 2 (cssmerge.js:142-377) for one category; ``features``
    must be in crawl order."""
    feature_dfns: dict[str, list[dict]] = {}
    order: list[str] = []
    for feature in features:
        feature.pop("type", None)
        feature.pop("values", None)
        if feature.get("value"):
            feature["syntax"] = feature.pop("value")
        else:
            feature.pop("value", None)
        for descriptor in feature.get("descriptors") or []:
            descriptor.pop("values", None)
            if descriptor.get("value"):
                descriptor["syntax"] = descriptor.pop("value")
            else:
                descriptor.pop("value", None)
        feature["name"] = _unwrap_name(feature.get("name"))
        fid = _feature_id(feature)
        if fid not in feature_dfns:
            feature_dfns[fid] = []
            order.append(fid)
        feature_dfns[fid].append(feature)

    def version(dfn: dict):
        return (dfn.get("spec") or {}).get("seriesVersion") or ""

    def series(dfn: dict):
        return ((dfn.get("spec") or {}).get("series") or {}).get("shortname")

    # base definition per feature (cssmerge.js:211-240)
    for fid in list(order):
        dfns = feature_dfns[fid]
        actual = [d for d in dfns if d.get("href") and d.get("syntax")]
        if not actual:
            actual = [d for d in dfns if d.get("href") and not d.get("newValues")]
        if not actual:
            del feature_dfns[fid]
            order.remove(fid)
            continue
        best = actual[0]
        for d in actual[1:]:
            if series(best) != series(d):
                best = d
            elif version(best) < version(d):
                best = d
        best["extended"] = []
        feature_dfns[fid] = [best] + [d for d in dfns if d not in actual]

    def has_newer_dfn(dfn: dict, dfns: list[dict]) -> bool:
        return any(
            d is not dfn
            and d.get("newValues") == dfn.get("newValues")
            and version(d) > version(dfn)
            for d in dfns
        )

    def has_newer_descriptor_dfn(desc: dict, dfn: dict, dfns: list[dict]) -> bool:
        return any(
            d is not dfn
            and any(
                dd.get("name") == desc.get("name")
                for dd in d.get("descriptors") or []
            )
            and version(d) > version(dfn)
            for d in dfns
        )

    # extension merge (cssmerge.js:250-300)
    for fid in order:
        dfns = feature_dfns[fid]
        base = dfns[0]
        if base.get("descriptors") is not None:
            base["descriptors"] = [
                desc
                for desc in base["descriptors"]
                if not has_newer_descriptor_dfn(desc, base, dfns)
            ]
        for dfn in dfns[1:]:
            if base.get("syntax") and dfn.get("newValues"):
                if has_newer_dfn(dfn, dfns):
                    continue
                base["syntax"] += " | " + dfn["newValues"]
                base["extended"].append(
                    dfn.get("href")
                    or (dfn.get("spec") or {}).get("crawled")
                    or (dfn.get("spec") or {}).get("url")
                )
            elif dfn.get("syntax"):
                base["syntax"] = dfn["syntax"]
                base["extended"] = [
                    (dfn.get("spec") or {}).get("crawled")
                    or (dfn.get("spec") or {}).get("url")
                ]
            if base.get("descriptors") is not None and dfn.get("descriptors"):
                base["descriptors"].extend(
                    desc
                    for desc in dfn["descriptors"]
                    if not has_newer_descriptor_dfn(desc, dfn, dfns)
                )

    # keep base definitions; drop scoped dups of unscoped ones
    # (cssmerge.js:303-324)
    result = [feature_dfns[fid][0] for fid in order]
    kept = []
    for feature in result:
        if feature.get("for"):
            unscoped = next(
                (
                    f
                    for f in result
                    if f.get("name") == feature.get("name") and not f.get("for")
                ),
                None,
            )
            if unscoped is not None and not (
                feature.get("syntax")
                and feature.get("syntax") != unscoped.get("syntax")
            ):
                continue
        kept.append(feature)
    result = kept
    for feature in result:
        feature.pop("spec", None)

    # legacy aliases (cssmerge.js:326-337)
    for feature in result:
        if feature.get("legacyAliasOf") and not feature.get("syntax"):
            target = next(
                (
                    f
                    for f in result
                    if f.get("name") == feature["legacyAliasOf"]
                    and not f.get("for")
                ),
                None,
            )
            if target is None:
                raise ValueError(
                    f"{feature['name']} is a legacy alias of unknown "
                    f"{feature['legacyAliasOf']}"
                )
            feature["syntax"] = target.get("syntax")

    # scope merging: `for` becomes a sorted list, same-href features
    # merge their scopes (cssmerge.js:339-364)
    merged: list[dict] = []
    by_href: dict[object, dict] = {}
    for feature in result:
        # NB the reference matches on strict href equality, so features
        # without an href all share the `undefined` key — mirrored
        href = feature.get("href")
        first = by_href.get(href)
        if first is None:
            by_href[href] = feature
            if feature.get("for"):
                feature["for"] = [feature["for"]]
            merged.append(feature)
            continue
        if not first.get("for") or not feature.get("for"):
            raise ValueError(
                f"Feature {feature.get('name')} defined both as unscoped and "
                f"scoped within the same dfn, see {href}"
            )
        first["for"].append(feature["for"])
        first["for"].sort()
    result = merged

    # canonical sort (cssmerge.js:366-373)
    for feature in result:
        if feature.get("descriptors") is not None:
            feature["descriptors"].sort(key=lambda d: d.get("name") or "")
    result.sort(key=_feature_id)
    return result


def consolidate_css(results: list[dict]) -> dict:
    """cssmerge.js run() over crawl results (driver-side reference
    semantics; the Ray wrapper below distributes the two phases)."""
    categorized = {c: [] for c in CATEGORIES}
    for spec in results:
        if not spec.get("css"):
            continue
        per_spec = categorize_spec(spec["css"], _spec_meta(spec))
        for c in CATEGORIES:
            categorized[c].extend(per_spec[c])
    return {
        c: consolidate_category(c, categorized[c]) for c in CATEGORIES
    }


def _spec_meta(spec: dict) -> dict:
    return {
        "shortname": spec.get("shortname"),
        "series": spec.get("series") or {},
        "seriesVersion": spec.get("seriesVersion"),
        "crawled": spec.get("crawled"),
        "url": spec.get("url"),
    }


def merge_css(specs: rd.Dataset) -> pa.Table:
    """Distributed wrapper: rows (doc_id, crawl_rank, css_json,
    shortname, series_shortname, series_version, crawled, url) →
    consolidated table (category, name, payload_json).

    Phase 1 runs spec-local in map_batches; phase 2 shuffles once on
    category and consolidates each group in crawl order."""

    def phase1(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"category": [], "crawl_rank": [], "feature_json": []}
        for _, row in batch.iterrows():
            css = json.loads(row["css_json"]) if row["css_json"] else None
            if not css:
                continue
            spec = {
                "shortname": row.get("shortname"),
                "series": {"shortname": row.get("series_shortname")},
                "seriesVersion": row.get("series_version"),
                "crawled": row.get("crawled"),
                "url": row.get("url"),
            }
            per_spec = categorize_spec(css, spec)
            for c in CATEGORIES:
                for feature in per_spec[c]:
                    out["category"].append(c)
                    out["crawl_rank"].append(int(row["crawl_rank"]))
                    out["feature_json"].append(
                        json.dumps(feature, ensure_ascii=False)
                    )
        return pd.DataFrame(out)

    def phase2(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("crawl_rank", kind="stable")
        category = g.iloc[0]["category"]
        features = [json.loads(f) for f in g["feature_json"]]
        consolidated = consolidate_category(category, features)
        return pd.DataFrame(
            {
                "category": category,
                "name": [f.get("name") or "" for f in consolidated],
                "payload_json": [
                    json.dumps(f, sort_keys=True, ensure_ascii=False)
                    for f in consolidated
                ],
            }
        )

    merged = (
        specs.map_batches(phase1, batch_format="pandas")
        .groupby("category")
        .map_groups(phase2, batch_format="pandas")
    )
    out = merged.sort(["category", "name"]).to_pandas()
    return pa.Table.from_pandas(out, preserve_index=False)
