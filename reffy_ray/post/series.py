"""Per-series extract reduction (extractsPerSeries modules: idl, css).

Reference: src/lib/specs-crawler.js:487-559 keeps only the latest full
level of each series that has the extract, deleting fork/outdated
extracts; the level predicate is isLatestLevelThatPasses
(src/lib/util.js:731-775).

Ray mapping (A2, SURVEY.md §2.5): the decision runs on the small seeds
table driver-side, producing a keep-set that filters the (possibly
huge) extract Dataset inside ``map_batches`` — a broadcast semi-join,
no shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd


def is_latest_level_that_passes(spec: dict, specs: list[dict], predicate) -> bool:
    """Port of util.js:731-775 over seed dicts with keys shortname,
    series_shortname, series_composition, series_version,
    series_current (current spec of the series), series_previous,
    series_next."""
    if not predicate(spec):
        return False
    by_short = {s["shortname"]: s for s in specs}
    if spec.get("series_composition") == "delta":
        cur = spec
        while cur.get("series_previous") and cur["shortname"] != cur.get("series_current"):
            cur = by_short.get(cur["series_previous"])
            if not cur:
                break
            if cur.get("series_composition") == "full" and predicate(cur):
                return False
        return True

    nxt = spec
    while nxt.get("series_next"):
        nxt = by_short.get(nxt["series_next"])
        if not nxt:
            break
        if nxt.get("series_composition") == "full" and predicate(nxt):
            return False

    cur = spec
    while cur:
        if cur["shortname"] == cur.get("series_current"):
            return True
        if not cur.get("series_previous"):
            return False
        cur = by_short.get(cur["series_previous"])
    return False


def _version_key(v) -> tuple:
    try:
        return tuple(int(x) for x in str(v or "0").split("."))
    except ValueError:
        return (0,)


def _seed_dicts(seeds: pa.Table) -> list[dict]:
    """Seed rows as dicts. When the table carries no explicit series
    chain (series_current/previous/next columns), derive it: the levels
    of a series ordered by series_version, current = the highest full
    level — without this every spec defaulted to being its own series'
    current and the reduction never reduced anything."""
    cols = seeds.to_pydict()
    out = [
        {k: cols[k][i] for k in cols} for i in range(seeds.num_rows)
    ]
    if "series_current" not in cols:
        by_series: dict[str, list[dict]] = {}
        for d in out:
            key = d.get("series_shortname") or d["shortname"]
            by_series.setdefault(key, []).append(d)
        for members in by_series.values():
            members.sort(key=lambda d: _version_key(d.get("series_version")))
            fulls = [m for m in members if m.get("series_composition") == "full"]
            current = (fulls[-1] if fulls else members[-1])["shortname"]
            for j, m in enumerate(members):
                m.setdefault("series_current", current)
                m.setdefault(
                    "series_previous",
                    members[j - 1]["shortname"] if j > 0 else None,
                )
                m.setdefault(
                    "series_next",
                    members[j + 1]["shortname"] if j + 1 < len(members) else None,
                )
    return out


def reduce_extracts_per_series(
    extract: rd.Dataset, seeds: pa.Table, docs_with_extract: set[str]
) -> rd.Dataset:
    """Filter an extractsPerSeries module's Dataset down to the latest
    full level per series (specs-crawler.js:519-559)."""
    specs = _seed_dicts(seeds)
    pred = lambda s: s["shortname"] in docs_with_extract
    keep = {
        s["shortname"]
        for s in specs
        if s.get("series_composition") != "fork"
        and is_latest_level_that_passes(s, specs, pred)
    }
    keep_ref = ray.put(keep)

    def filt(batch: pa.Table) -> pa.Table:
        keep_set = ray.get(keep_ref)
        mask = [d in keep_set for d in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(mask))

    return extract.map_batches(filt, batch_format="pyarrow")
