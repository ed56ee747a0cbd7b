"""Arrow schemas for every logical table of the engine.

The primary input table (``documents``) follows the interleaved
text+media span shape mandated by BASELINE.json ``input_hint``:

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Span ``kind`` vocabulary and per-kind ``text`` payload conventions are
documented in FIXTURES.md §1 and mirror the reference extractors
(reference: /root/reference/src/browserlib/*.mjs).

Extract tables mirror the reference's per-module extract files
(reference: src/lib/specs-crawler.js:190-337 writes one JSON per
(module, spec); here each module is one Arrow table).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Core span table (input_hint)
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Extended documents table as produced by the crawl (adds provenance
# columns used by downstream stages; the two leading columns are the
# input_hint contract).
DOCUMENTS_FULL = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("url", pa.string()),          # crawled URL (nightly)
        ("seed_url", pa.string()),     # canonical seed URL
        ("seed_rank", pa.int64()),     # crawl-order priority (reffy.js:164-167)
        ("crawl_depth", pa.int32()),
    ]
)

# ---------------------------------------------------------------------------
# Seeds (browser-specs analog; specs-crawler.js:352-389)
# ---------------------------------------------------------------------------

SEEDS = pa.schema(
    [
        ("url", pa.string()),
        ("shortname", pa.string()),
        ("series_shortname", pa.string()),
        ("series_composition", pa.string()),  # full | delta | fork
        ("series_version", pa.string()),
        ("nightly_url", pa.string()),
        ("release_url", pa.string()),
        ("pages", pa.list_(pa.string())),
        ("standing", pa.string()),            # good | discontinued
        ("seed_rank", pa.int64()),
    ]
)

# ---------------------------------------------------------------------------
# Crawl-state tables (FIXTURES.md §3)
# ---------------------------------------------------------------------------

FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("seed_rank", pa.int64()),
        ("depth", pa.int32()),
        ("state", pa.string()),  # pending | fetched | deferred | error
    ]
)

SEEN = pa.schema(
    [
        ("shard", pa.int32()),
        ("fingerprints", pa.binary()),
    ]
)

COUNTERS = pa.schema(
    [
        ("partition", pa.int32()),
        ("fetched", pa.int64()),
        ("deduped", pa.int64()),
        ("deferred_politeness", pa.int64()),
        ("errors", pa.int64()),
        ("checkpoint_path", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Extract tables (FIXTURES.md §4; shapes mirror schemas/files/extracts/*)
# ---------------------------------------------------------------------------

EXTRACTS_TITLE = pa.schema([("doc_id", pa.string()), ("title", pa.string())])

EXTRACTS_META = pa.schema(
    [
        ("doc_id", pa.string()),
        ("generator", pa.string()),
        ("revision", pa.string()),
        ("date", pa.string()),
    ]
)

EXTRACTS_HEADINGS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("id", pa.string()),
        ("href", pa.string()),
        ("level", pa.int32()),
        ("title", pa.string()),
        ("number", pa.string()),
        ("alternate_ids", pa.list_(pa.string())),
    ]
)

EXTRACTS_IDS = pa.schema([("doc_id", pa.string()), ("href", pa.string())])

EXTRACTS_LINKS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page_url", pa.string()),
        ("auto", pa.bool_()),
        ("anchors", pa.list_(pa.string())),
    ]
)

EXTRACTS_REFS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("name", pa.string()),
        ("url", pa.string()),
        ("normative", pa.bool_()),
    ]
)

HEADING_STRUCT = pa.struct(
    [
        ("id", pa.string()),
        ("href", pa.string()),
        ("title", pa.string()),
        ("number", pa.string()),
        # earlier id candidates demoted by the canonical pick
        # (map-ids-to-headings.mjs alternateIds)
        ("alternate_ids", pa.list_(pa.string())),
    ]
)

EXTRACTS_DFNS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("id", pa.string()),
        ("href", pa.string()),
        ("linking_text", pa.list_(pa.string())),
        ("local_linking_text", pa.list_(pa.string())),
        ("type", pa.string()),
        ("for", pa.list_(pa.string())),
        ("access", pa.string()),
        ("informative", pa.bool_()),
        ("heading", HEADING_STRUCT),
        ("defined_in", pa.string()),
        ("html_prose", pa.string()),
        # dev links from "for web developers" sections, JSON-encoded
        # (extract-dfns.mjs links property)
        ("links", pa.large_string()),
    ]
)

EXTRACTS_IDL = pa.schema([("doc_id", pa.string()), ("idl", pa.large_string())])

EXTRACTS_CSS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("category", pa.string()),  # properties|atrules|selectors|values
        ("name", pa.string()),
        ("payload_json", pa.large_string()),
    ]
)

EXTRACTS_EVENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("type", pa.string()),
        ("interface", pa.string()),
        ("bubbles", pa.bool_()),
        ("cancelable", pa.bool_()),
        ("targets", pa.list_(pa.string())),
        ("href", pa.string()),
        ("src_format", pa.string()),
        ("src_href", pa.string()),
        ("is_extension", pa.bool_()),
    ]
)

EXTRACTS_ELEMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("name", pa.string()),
        ("href", pa.string()),
        ("interface", pa.string()),
    ]
)

EXTRACTS_ALGORITHMS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("name", pa.string()),
        ("href", pa.string()),
        ("rationale", pa.string()),
        ("steps_json", pa.large_string()),
    ]
)

EXTRACTS_CDDL = pa.schema(
    [
        ("doc_id", pa.string()),
        ("module", pa.string()),
        ("cddl", pa.large_string()),
    ]
)

EXTRACT_SCHEMAS: dict[str, pa.Schema] = {
    "title": EXTRACTS_TITLE,
    "meta": EXTRACTS_META,
    "headings": EXTRACTS_HEADINGS,
    "ids": EXTRACTS_IDS,
    "links": EXTRACTS_LINKS,
    "refs": EXTRACTS_REFS,
    "dfns": EXTRACTS_DFNS,
    "idl": EXTRACTS_IDL,
    "css": EXTRACTS_CSS,
    "events": EXTRACTS_EVENTS,
    "elements": EXTRACTS_ELEMENTS,
    "algorithms": EXTRACTS_ALGORITHMS,
    "cddl": EXTRACTS_CDDL,
}


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
