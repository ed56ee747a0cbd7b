"""The reference's own extract-dfns test table, end to end.

Parses the ``tests`` array out of ``/root/reference/test/extract-dfns.js``
at collection time (same read-don't-copy policy as test_cssgrammar) and
runs every case through our span parser + dfns extractor, requiring the
same rows the reference's Puppeteer harness asserts (deepEqual against
baseDfn + per-case changes, href = about:blank#id)."""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa
import pytest

from reffy_ray.schemas import SPAN_STRUCT
from reffy_ray.stages.extract import extract_dfns
from reffy_ray.stages.parse import spans_from_html

REF = "/root/reference/test/extract-dfns.js"
URL = "about:blank"

# reference key → our column
KEYMAP = {
    "linkingText": "linking_text",
    "localLinkingText": "local_linking_text",
    "definedIn": "defined_in",
    "htmlProse": "html_prose",
}

BASE_DFN = {
    "id": "foo",
    "linking_text": ["Foo"],
    "local_linking_text": [],
    "type": "dfn",
    "for": [],
    "access": "private",
    "informative": False,
    "defined_in": "prose",
    "heading": {"href": "about:blank", "title": ""},
    "links": [],
}


def _js_table(src: str, name: str):
    """Evaluate a JS array/object literal as Python data."""
    blocks: list[str] = []

    def stash(m):
        blocks.append(m.group(1))
        return f"__BLOCK_{len(blocks) - 1}__"

    s = re.sub(r"`([^`]*)`", stash, src, flags=re.S)
    s = re.sub(r"^\s*//.*$", "", s, flags=re.M)
    s = re.sub(r"([{,\[]\s*)([A-Za-z_]\w*)\s*:", r'\1"\2":', s)
    s = re.sub(r"\btrue\b", "True", s)
    s = re.sub(r"\bfalse\b", "False", s)
    s = re.sub(r"\bnull\b", "None", s)
    s = re.sub(r"__BLOCK_(\d+)__", lambda m: json.dumps(blocks[int(m.group(1))]), s)
    return eval(s, {"__builtins__": {}}, {})  # noqa: S307 - trusted local file


def _load():
    if not os.path.isfile(REF):
        return [], {}
    src = open(REF).read()
    start = src.index("const tests = [")
    body = src[start + len("const tests = "):]
    arr = body[: body.index("\n];") + 2]
    cases = _js_table(arr, "tests")
    bases = {}
    for var, spec in (("baseHtml", "html"), ("baseSVG2", "SVG2"),
                      ("baseWebGL1", "webgl1")):
        m = re.search(rf"const {var} = `([^`]*)`;", src, flags=re.S)
        if m:
            bases[spec] = m.group(1)
    return cases, bases


CASES, BASES = _load()


def _expected_row(change: dict) -> dict:
    row = dict(BASE_DFN)
    row["href"] = URL + "#" + change.get("id", BASE_DFN["id"])
    for k, v in change.items():
        row[KEYMAP.get(k, k)] = v
    return row


_NESTED_KEYMAP = {"alternateIds": "alternate_ids"}


def _norm(v):
    """Drop absent/None struct fields so 'key missing' (reference JS)
    and 'field is null' (our Arrow structs) compare equal; rename
    camelCase reference keys at any depth."""
    if isinstance(v, dict):
        return {
            _NESTED_KEYMAP.get(k, k): _norm(x)
            for k, x in v.items()
            if x is not None
        }
    if isinstance(v, list):
        return [_norm(x) for x in v]
    return v


def _ours(html: str, spec: str | None):
    spans = spans_from_html(html, URL, shortname=spec)
    batch = pa.table(
        {
            "doc_id": pa.array(["d"]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array([URL]),
        }
    )
    rows = []
    for r in extract_dfns(batch).to_pylist():
        r.pop("doc_id", None)
        r["links"] = json.loads(r["links"]) if r.get("links") else []
        if r.get("html_prose") is None:
            r.pop("html_prose", None)
        rows.append(_norm(r))
    return rows


@pytest.mark.skipif(not CASES, reason="reference test table unavailable")
@pytest.mark.parametrize(
    "case", CASES, ids=[re.sub(r"\W+", "-", c["title"])[:70] for c in CASES]
)
def test_reference_dfns_case(case):
    spec = case.get("spec")
    html = BASES.get(spec, "") + case["html"]
    got = _ours(html, spec)
    expected = [_norm(_expected_row(ch)) for ch in case["changesToBaseDfn"]]
    assert got == expected, (
        f"{case['title']}\n got: {json.dumps(got, indent=1)}\n "
        f"want: {json.dumps(expected, indent=1)}"
    )
