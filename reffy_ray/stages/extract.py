"""Extraction stages: span table → per-module extract tables.

Each ``extract_<module>`` function is a stateless ``map_batches``
callable (``batch_format='pyarrow'``): one Arrow batch of ``documents``
rows in (doc_id, spans, url), one Arrow batch of the module's extract
table out. They reproduce the reference's browserlib extractors
(reference: src/browserlib/extract-*.mjs) over the pre-parsed span
sequence instead of a live DOM. Per-document work never shuffles —
in-document grouping (links per page URL, cddl per module, algorithm
step trees) happens inside the batch, mirroring the doc-local nature
of the browser-context extractors (SURVEY.md §2.2).
"""

from __future__ import annotations

import json
import re
from collections import OrderedDict
from typing import Iterator

import pyarrow as pa

from .. import schemas

# ---------------------------------------------------------------------------
# span iteration helper
# ---------------------------------------------------------------------------


def decode_docs(batch: pa.Table) -> list[tuple[str, str, list[dict]]]:
    """Decode a documents batch once: [(doc_id, base_url, spans)] with
    spans sorted by offset. The spans→Python conversion dominates
    extractor cost, so multi-module passes decode once via
    ``extract_all`` instead of once per module."""
    doc_ids = batch.column("doc_id").to_pylist()
    urls = (
        batch.column("url").to_pylist()
        if "url" in batch.column_names
        else ["" for _ in doc_ids]
    )
    spans_col = batch.column("spans").to_pylist()
    return [
        (doc_id, url or "", sorted(spans or [], key=lambda s: s["offset"]))
        for doc_id, url, spans in zip(doc_ids, urls, spans_col)
    ]


def _iter_docs(batch) -> Iterator[tuple[str, str, list[dict]]]:
    """Yield (doc_id, base_url, spans) per row; accepts an Arrow batch
    or an already-decoded list from ``decode_docs``."""
    if isinstance(batch, list):
        yield from batch
        return
    yield from decode_docs(batch)


class _PageTracker:
    """Tracks the current page URL across `meta page=` spans
    (multi-page merge analog, src/lib/util.js:555-594)."""

    def __init__(self, base_url: str):
        self.page = base_url

    def feed(self, span: dict) -> None:
        if span["kind"] == "meta" and span["text"].startswith("page="):
            self.page = span["text"][5:]

    def href(self, frag: str) -> str:
        return f"{self.page}#{_encode_frag(frag)}" if frag else self.page


def _encode_frag(frag: str) -> str:
    """encodeURIComponent over the fragment (get-absolute-url.mjs:14:
    ``url.hash = '#' + encodeURIComponent(fragment)``) — unreserved set
    A-Za-z0-9 ``-_.!~*'()``, UTF-8 percent-encoding otherwise."""
    from urllib.parse import quote

    return quote(frag, safe="!'()*-._~")


def _table(schema: pa.Schema, rows: list[dict]) -> pa.Table:
    if not rows:
        return schema.empty_table()
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    return pa.table(
        {name: pa.array(vals, schema.field(name).type) for name, vals in cols.items()}
    )


# ---------------------------------------------------------------------------
# M1 title / M2-M4 meta
# ---------------------------------------------------------------------------


def extract_title(batch: pa.Table) -> pa.Table:
    """First title span, 'No Title' default (get-title.mjs:4-15)."""
    rows = []
    for doc_id, _url, spans in _iter_docs(batch):
        title = next((s["text"] for s in spans if s["kind"] == "title"), "No Title")
        rows.append({"doc_id": doc_id, "title": title})
    return _table(schemas.EXTRACTS_TITLE, rows)


def extract_meta(batch: pa.Table) -> pa.Table:
    """generator / revision / date metadata (get-generator.mjs:14-26,
    get-revision.mjs:1-12, get-lastmodified-date.mjs:1-14)."""
    rows = []
    for doc_id, _url, spans in _iter_docs(batch):
        vals = {"generator": None, "revision": None, "date": None}
        for s in spans:
            if s["kind"] != "meta":
                continue
            for key in vals:
                pre = key + "="
                if s["text"].startswith(pre) and vals[key] is None:
                    vals[key] = s["text"][len(pre):]
        rows.append({"doc_id": doc_id, **vals})
    return _table(schemas.EXTRACTS_META, rows)


# ---------------------------------------------------------------------------
# M6 headings
# ---------------------------------------------------------------------------


def extract_headings(batch: pa.Table) -> pa.Table:
    """Heading list (extract-headings.mjs:6-76); href resolved against
    the page the heading appears on."""
    rows = []
    for doc_id, url, spans in _iter_docs(batch):
        pt = _PageTracker(url)
        for s in spans:
            pt.feed(s)
            if s["kind"] != "heading":
                continue
            h = json.loads(s["text"])
            if not h.get("id"):
                continue
            rows.append(
                {
                    "doc_id": doc_id,
                    "id": h["id"],
                    "href": pt.href(h["id"]),
                    "level": h.get("level"),
                    "title": h.get("title", ""),
                    "number": h.get("number") or None,
                    "alternate_ids": h.get("alt_ids"),
                }
            )
    return _table(schemas.EXTRACTS_HEADINGS, rows)


# ---------------------------------------------------------------------------
# M5 ids
# ---------------------------------------------------------------------------

_ID_EXCLUDE_PREFIXES = ("respec-", "dfn-panel-")


def extract_ids(batch: pa.Table) -> pa.Table:
    """All anchorable ids as absolute URLs (extract-ids.mjs:6-28);
    filters respec-/dfn-panel- generated ids; in-doc first-wins dedup."""
    rows = []
    for doc_id, url, spans in _iter_docs(batch):
        pt = _PageTracker(url)
        seen: set[str] = set()
        for s in spans:
            pt.feed(s)
            if s["kind"] != "anchor":
                continue
            anchor = s["text"]
            if not anchor or anchor.startswith(_ID_EXCLUDE_PREFIXES):
                continue
            href = pt.href(anchor)
            if href in seen:
                continue
            seen.add(href)
            rows.append({"doc_id": doc_id, "href": href})
    return _table(schemas.EXTRACTS_IDS, rows)


# ---------------------------------------------------------------------------
# M7 links
# ---------------------------------------------------------------------------


def extract_links(batch: pa.Table) -> pa.Table:
    """Outbound links grouped page-URL → sorted anchor set, split
    autolinks vs rawlinks (extract-links.mjs:14-45). Doc-local groupby,
    no shuffle."""
    rows = []
    for doc_id, url, spans in _iter_docs(batch):
        groups: "OrderedDict[tuple[str, bool], set]" = OrderedDict()
        for s in spans:
            if s["kind"] != "link":
                continue
            l = json.loads(s["text"])
            if l.get("in_head") or l.get("in_dfn_panel"):
                continue
            href = l["href"]
            page, _, frag = href.partition("#")
            key = (page, bool(l.get("auto")))
            groups.setdefault(key, set())
            if frag:
                groups[key].add(frag)
        for (page, auto), anchors in groups.items():
            rows.append(
                {
                    "doc_id": doc_id,
                    "page_url": page,
                    "auto": auto,
                    "anchors": sorted(anchors),
                }
            )
    return _table(schemas.EXTRACTS_LINKS, rows)


# ---------------------------------------------------------------------------
# M8 refs
# ---------------------------------------------------------------------------


def extract_refs(batch: pa.Table) -> pa.Table:
    """Normative/informative references (extract-references.mjs main
    flow — the generator-keyed selectors and heading/sibling walks run
    at parse time in stages/refsdfn.py and land in one refs-data span;
    this stage explodes it into rows)."""
    rows = []
    for doc_id, _url, spans in _iter_docs(batch):
        data = next((s["text"] for s in spans if s["kind"] == "refs-data"), None)
        if not data:
            continue
        struct = json.loads(data)
        for section in ("normative", "informative"):
            for r in struct.get(section) or []:
                rows.append(
                    {
                        "doc_id": doc_id,
                        "name": r.get("name"),
                        "url": r.get("url"),
                        "normative": section == "normative",
                    }
                )
    return _table(schemas.EXTRACTS_REFS, rows)


# ---------------------------------------------------------------------------
# M11 dfns
# ---------------------------------------------------------------------------


def extract_dfns(batch: pa.Table) -> pa.Table:
    """Term definitions per the Bikeshed dfn contract
    (extract-dfns.mjs:178-299). First-wins in-doc dedup on (id)
    (isNotAlreadyExported, extract-dfns.mjs:122-134); heading resolved
    via the in-doc id→heading map (map-ids-to-headings.mjs analog)."""
    rows = []
    for doc_id, url, spans in _iter_docs(batch):
        # pass 1: id → heading struct + doc title
        pt = _PageTracker(url)
        headings: dict[str, dict] = {}
        # fallback heading title is document.title — empty when the doc
        # has no <title> (extract-dfns.mjs:275-278)
        title = ""
        saw_title = False
        for s in spans:
            pt.feed(s)
            if s["kind"] == "title" and not saw_title:
                title = s["text"]
                saw_title = True
            elif s["kind"] == "heading":
                h = json.loads(s["text"])
                if h.get("id"):
                    headings[h["id"]] = {
                        "id": h["id"],
                        "href": pt.href(h["id"]),
                        "title": h.get("title", ""),
                        "number": h.get("number") or None,
                        "alternate_ids": h.get("alt_ids"),
                    }
        pt = _PageTracker(url)
        seen_ids: set[str] = set()
        exported: set[tuple] = set()
        doc_rows: list[dict] = []
        dev_links: list[dict] = []
        for s in spans:
            pt.feed(s)
            if s["kind"] == "dev-link":
                l = json.loads(s["text"])
                heading = headings.get(l.get("heading_id") or "")
                if heading is None:
                    heading = {"id": None, "href": pt.page, "title": title,
                               "number": None}
                dev_links.append(
                    {
                        "type": "dev",
                        "id": l["id"],
                        "name": l["name"],
                        "href": pt.href(l["id"]),
                        "target": l.get("target") or "",
                        "heading": heading,
                    }
                )
                continue
            if s["kind"] != "dfn":
                continue
            d = json.loads(s["text"])
            if d["id"] in seen_ids:
                continue
            seen_ids.add(d["id"])
            # isNotAlreadyExported (extract-dfns.mjs:122-134): a later
            # PUBLIC dfn with the same (type, linkingText, for) as an
            # earlier public one is a duplicate export — first wins
            if d.get("access") == "public":
                exp_key = (
                    d.get("type", "dfn"),
                    tuple(sorted(d.get("lt", []))),
                    tuple(sorted(d.get("for", []))),
                )
                if exp_key in exported:
                    continue
                exported.add(exp_key)
            heading = headings.get(d.get("heading_id") or "")
            if heading is None:
                heading = {"id": None, "href": pt.page, "title": title, "number": None}
            doc_rows.append(
                {
                    "doc_id": doc_id,
                    "id": d["id"],
                    "href": pt.href(d["id"]),
                    "linking_text": d.get("lt", []),
                    "local_linking_text": d.get("local_lt", []),
                    "type": d.get("type", "dfn"),
                    "for": d.get("for", []),
                    "access": d.get("access", "private"),
                    "informative": bool(d.get("informative")),
                    "heading": heading,
                    "defined_in": d.get("defined_in", "prose"),
                    "html_prose": d.get("html_prose"),
                    "_links": [],
                }
            )
        # attach dev links to the dfn they reference
        # (extract-dfns.mjs:387-414; unmatched dev anchors are dropped)
        by_href = {r["href"]: r for r in doc_rows}
        for link in dev_links:
            target = link.pop("target")
            dfn = by_href.get(target)
            if dfn is not None:
                dfn["_links"].append(link)
        for r in doc_rows:
            r["links"] = json.dumps(r.pop("_links"), ensure_ascii=False)
        rows.extend(doc_rows)
    return _table(schemas.EXTRACTS_DFNS, rows)


# ---------------------------------------------------------------------------
# M9 idl
# ---------------------------------------------------------------------------


def extract_idl(batch: pa.Table) -> pa.Table:
    """Raw WebIDL dump: concat idl-block spans in document order with
    dedup of identical blocks (extract-webidl.mjs:13-90); whitespace
    already canonicalized at parse time (trim-spaces.mjs:14-36)."""
    rows = []
    for doc_id, _url, spans in _iter_docs(batch):
        blocks: list[str] = []
        seen: set[str] = set()
        for s in spans:
            if s["kind"] != "idl-block":
                continue
            b = s["text"]
            if b and b not in seen:
                seen.add(b)
                blocks.append(b)
        if blocks:
            rows.append({"doc_id": doc_id, "idl": "\n\n".join(blocks)})
    return _table(schemas.EXTRACTS_IDL, rows)


# ---------------------------------------------------------------------------
# M10 css
# ---------------------------------------------------------------------------

_CSS_LABEL_MAP = {
    "name": "name",
    "value": "value",
    "initial": "initial",
    "applies to": "appliesTo",
    "inherited": "inherited",
    "percentages": "percentages",
    "computed value": "computedValue",
    "canonical order": "canonicalOrder",
    "animation type": "animationType",
    "animatable": "animatable",
    "media": "media",
    "new values": "newValues",
    "for": "for",
    "legacy name alias": "legacyAliasOf",
}


def _css_prop_key(label: str) -> str:
    """dfn label → property key (extract-cssdfn.mjs:375-384)."""
    l = label.strip().rstrip(":").lower()
    if l in _CSS_LABEL_MAP:
        return _CSS_LABEL_MAP[l]
    parts = l.split()
    return parts[0] + "".join(p.capitalize() for p in parts[1:])


_RE_PROD = re.compile(r"^\s*<?([a-zA-Z][\w-]*)>?\s*=\s*(.+)$", re.S)


def extract_css(batch: pa.Table) -> pa.Table:
    """CSS definitions (extract-cssdfn.mjs main flow): the whole-document
    assembly runs at parse time (stages/cssdfn.py — it needs DOM context
    the span stream doesn't carry) and lands in one ``css-data`` span;
    this stage explodes it into one Arrow row per definition with the
    full record as payload_json."""
    rows = []
    for doc_id, _url, spans in _iter_docs(batch):
        data = next((s["text"] for s in spans if s["kind"] == "css-data"), None)
        if not data:
            continue
        struct = json.loads(data)
        for category in ("properties", "atrules", "selectors", "values", "warnings"):
            for item in struct.get(category) or []:
                rows.append(
                    {
                        "doc_id": doc_id,
                        "category": category,
                        "name": item.get("name") or "",
                        "payload_json": json.dumps(
                            item, sort_keys=True, ensure_ascii=False
                        ),
                    }
                )
    return _table(schemas.EXTRACTS_CSS, rows)


# ---------------------------------------------------------------------------
# M13 events
# ---------------------------------------------------------------------------

_RE_FIRE_EVENT = re.compile(
    r"fir(?:e|ing)\s+an?\s+event\s+named\s+\"?([\w.-]+)\"?", re.I
)
_RE_ONHANDLER = re.compile(r"attribute\s+EventHandler\s+on(\w+)\s*;")
# one match per interface WITH its body, so handlers attach to the
# declaring interface only (IDL bodies have no nested braces)
_RE_IFACE_BODY = re.compile(
    r"(?:\[[^\]]*\]\s*)?(?:partial\s+)?interface\s+(?:mixin\s+)?(\w+)[^{]*\{([^}]*)\}"
)


def extract_events(batch: pa.Table) -> pa.Table:
    """Event inventory (extract-events.mjs main flow — summary/def/
    event-definition tables, fire-an-event phrasing, IDL handlers,
    event dfns; runs at parse time in stages/eventsdfn.py and lands in
    one events-data span that this stage explodes into rows)."""
    rows = []
    for doc_id, _url, spans in _iter_docs(batch):
        data = next(
            (s["text"] for s in spans if s["kind"] == "events-data"), None
        )
        if not data:
            continue
        for e in json.loads(data):
            src = e.get("src") or {}
            rows.append(
                {
                    "doc_id": doc_id,
                    "type": e.get("type"),
                    "interface": e.get("interface"),
                    "bubbles": e.get("bubbles"),
                    "cancelable": e.get("cancelable"),
                    "targets": e.get("targets"),
                    "href": e.get("href"),
                    "src_format": src.get("format"),
                    "src_href": src.get("href"),
                    "is_extension": bool(e.get("isExtension")),
                }
            )
    return _table(schemas.EXTRACTS_EVENTS, rows)



# ---------------------------------------------------------------------------
# M12 elements
# ---------------------------------------------------------------------------


def extract_elements(batch: pa.Table) -> pa.Table:
    """Markup element → IDL interface mapping, three dialects with the
    reference's priority order (extract-elements.mjs): HTML dl.element
    first, else SVG element-summary / definition-table, else the dfn
    contract (dfn[data-dfn-type=element]; every MathML Core element
    uses MathMLElement, other specs match an interface dfn named
    html<name>element)."""
    rows = []
    for doc_id, url, spans in _iter_docs(batch):
        pt = _PageTracker(url)
        shortname = None
        html_defs: list[dict] = []
        svg_defs: list[dict] = []
        element_dfns: list[dict] = []   # dfn spans typed 'element'
        iface_dfns: list[tuple[str, str]] = []  # (lt0, text) of interface dfns
        for s in spans:
            pt.feed(s)
            if s["kind"] == "meta" and s["text"].startswith("shortname="):
                shortname = s["text"][len("shortname="):]
            elif s["kind"] == "element-def":
                e = json.loads(s["text"])
                e["href"] = pt.href(e["id"]) if e.get("id") else pt.page
                if e.get("dialect", "html") == "html":
                    html_defs.append(e)
                else:
                    svg_defs.append(e)
            elif s["kind"] == "iface-name":
                iface_dfns.append((s["text"].lower(), s["text"]))
            elif s["kind"] == "dfn":
                d = json.loads(s["text"])
                if d.get("type") == "element":
                    element_dfns.append(
                        {
                            "name": (d.get("lt") or [""])[0],
                            "href": pt.href(d["id"]),
                        }
                    )
                elif d.get("type") == "interface":
                    lt0 = (d.get("lt") or [""])[0]
                    iface_dfns.append((lt0.lower(), lt0))
        if html_defs:
            chosen = html_defs
        elif svg_defs:
            chosen = svg_defs
        else:
            chosen = []
            for d in element_dfns:
                if shortname == "mathml-core":
                    iface = "MathMLElement"
                else:
                    matches = [
                        text for low, text in iface_dfns
                        if low == f"html{d['name']}element".lower()
                    ]
                    iface = matches[0] if len(matches) == 1 else None
                chosen.append({**d, "interface": iface})
        seen: set[str] = set()
        for e in chosen:
            if not e.get("name") or e["name"] in seen:
                continue
            seen.add(e["name"])
            rows.append(
                {
                    "doc_id": doc_id,
                    "name": e["name"],
                    "href": e["href"],
                    "interface": e.get("interface"),
                }
            )
    return _table(schemas.EXTRACTS_ELEMENTS, rows)


# ---------------------------------------------------------------------------
# M14 algorithms
# ---------------------------------------------------------------------------


def extract_algorithms(batch: pa.Table) -> pa.Table:
    """Normative algorithm trees (extract-algorithms.mjs main flow —
    runs at parse time in stages/algodfn.py and lands in one algos-data
    span; this stage explodes it into rows with name/href/rationale
    columns and the rest of the record as steps_json)."""
    rows = []
    for doc_id, _url, spans in _iter_docs(batch):
        data = next(
            (s["text"] for s in spans if s["kind"] == "algos-data"), None
        )
        if not data:
            continue
        for a in json.loads(data):
            rest = {
                k: v for k, v in a.items()
                if k not in ("name", "href", "rationale")
            }
            rows.append(
                {
                    "doc_id": doc_id,
                    "name": a.get("name"),
                    "href": a.get("href"),
                    "rationale": a.get("rationale"),
                    "steps_json": json.dumps(rest, ensure_ascii=False),
                }
            )
    return _table(schemas.EXTRACTS_ALGORITHMS, rows)



# ---------------------------------------------------------------------------
# M15 cddl
# ---------------------------------------------------------------------------


def extract_cddl(batch: pa.Table) -> pa.Table:
    """CDDL module dumps + synthesized 'all' module
    (extract-cddl.mjs:30-125)."""
    rows = []
    for doc_id, _url, spans in _iter_docs(batch):
        blocks: list[tuple[str, list[str]]] = []
        for s in spans:
            if s["kind"] != "cddl-block":
                continue
            c = json.loads(s["text"])
            if c["cddl"]:
                blocks.append((c["cddl"], c.get("modules") or []))
        # module registry first ("all" never creates a module)
        modules: "OrderedDict[str, list[str]]" = OrderedDict()
        for _cddl, names in blocks:
            for name in names:
                if name != "all":
                    modules.setdefault(name, [])
        merged: list[str] = []
        for cddl, names in blocks:
            merged.append(cddl)
            # no module ⇒ the CDDL is defined for all modules
            for name in names or list(modules):
                if name != "all":
                    modules.setdefault(name, []).append(cddl)
        if merged:
            rows.append(
                {
                    "doc_id": doc_id,
                    "module": "all" if modules else "",
                    "cddl": "\n\n".join(merged),
                }
            )
            for m, mblocks in modules.items():
                rows.append(
                    {"doc_id": doc_id, "module": m, "cddl": "\n\n".join(mblocks)}
                )
    return _table(schemas.EXTRACTS_CDDL, rows)


def extract_all(batch: pa.Table, modules: dict | None = None) -> dict[str, pa.Table]:
    """Run every (or the given) extractor over one batch with a single
    spans decode — the multi-module path the crawl/bench pipelines use
    (13 separate decodes cost ~3× the extraction logic itself)."""
    docs = decode_docs(batch)
    mods = modules or EXTRACTORS
    return {name: fn(docs) for name, fn in mods.items()}


EXTRACTORS = {
    "title": extract_title,
    "meta": extract_meta,
    "headings": extract_headings,
    "ids": extract_ids,
    "links": extract_links,
    "refs": extract_refs,
    "dfns": extract_dfns,
    "idl": extract_idl,
    "css": extract_css,
    "events": extract_events,
    "elements": extract_elements,
    "algorithms": extract_algorithms,
    "cddl": extract_cddl,
}
