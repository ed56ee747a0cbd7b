"""The reference's own extractor test tables (headings, ids, links,
refs, webidl, cddl, elements, events), end to end.

Each table is parsed out of the reference's test file at collection
time (read-don't-copy, same policy as test_cssgrammar) and driven
through our span parser + the matching extractor; adapters reshape our
Arrow rows into the structure the reference's harness deepEquals."""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pytest

from _jstable import load_js_tests, norm
from reffy_ray.schemas import SPAN_STRUCT
from reffy_ray.stages import extract as ex
from reffy_ray.stages.parse import spans_from_html

URL = "about:blank"
REF = "/root/reference/test"


def _batch(html: str, spec: str | None = None) -> pa.Table:
    spans = spans_from_html(html, URL, shortname=spec)
    return pa.table(
        {
            "doc_id": pa.array(["d"]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array([URL]),
        }
    )


def _ids(cases):
    return [re.sub(r"\W+", "-", c["title"])[:70] for c in cases]


# ---------------------------------------------------------------------------
# headings (test/extract-headings.js)
# ---------------------------------------------------------------------------

HEADING_CASES = load_js_tests(f"{REF}/extract-headings.js", var="testHeadings")


@pytest.mark.skipif(not HEADING_CASES, reason="reference tables unavailable")
@pytest.mark.parametrize("case", HEADING_CASES, ids=_ids(HEADING_CASES))
def test_reference_headings(case):
    rows = ex.extract_headings(_batch(case["html"])).to_pylist()
    got = []
    for r in rows:
        r.pop("doc_id")
        r["alternateIds"] = r.pop("alternate_ids")
        got.append(norm(r))
    assert got == [norm(r) for r in (case["res"] or [])], case["title"]


# ---------------------------------------------------------------------------
# ids (test/extract-ids.js)
# ---------------------------------------------------------------------------

ID_CASES = load_js_tests(f"{REF}/extract-ids.js", var="testIds")


@pytest.mark.skipif(not ID_CASES, reason="reference tables unavailable")
@pytest.mark.parametrize("case", ID_CASES, ids=_ids(ID_CASES))
def test_reference_ids(case):
    rows = ex.extract_ids(_batch(case["html"])).to_pylist()
    assert [r["href"] for r in rows] == case["res"], case["title"]


# ---------------------------------------------------------------------------
# links (test/extract-links.js)
# ---------------------------------------------------------------------------

LINK_CASES = load_js_tests(f"{REF}/extract-links.js", var="testLinks")


@pytest.mark.skipif(not LINK_CASES, reason="reference tables unavailable")
@pytest.mark.parametrize("case", LINK_CASES, ids=_ids(LINK_CASES))
def test_reference_links(case):
    rows = ex.extract_links(_batch(case["html"])).to_pylist()
    got = {"autolinks": {}, "rawlinks": {}}
    for r in rows:
        bucket = got["autolinks" if r["auto"] else "rawlinks"]
        bucket[r["page_url"]] = (
            {"anchors": r["anchors"]} if r["anchors"] else {}
        )
    assert got == case["res"], case["title"]


# ---------------------------------------------------------------------------
# references (test/extract-references.js)
# ---------------------------------------------------------------------------

REF_CASES = load_js_tests(f"{REF}/extract-references.js", var="testRefs")


@pytest.mark.skipif(not REF_CASES, reason="reference tables unavailable")
@pytest.mark.parametrize("case", REF_CASES, ids=_ids(REF_CASES))
def test_reference_refs(case):
    rows = ex.extract_refs(_batch(case["html"])).to_pylist()
    got = {"normative": [], "informative": []}
    for r in rows:
        got["normative" if r["normative"] else "informative"].append(
            {"name": r["name"], "url": r["url"]}
        )
    res = case["res"] or {}
    want = {
        "normative": [norm(x) for x in res.get("normative", [])],
        "informative": [norm(x) for x in res.get("informative", [])],
    }
    assert {k: [norm(x) for x in v] for k, v in got.items()} == want, case["title"]


# ---------------------------------------------------------------------------
# webidl (test/extract-webidl.js)
# ---------------------------------------------------------------------------

IDL_CASES = load_js_tests(f"{REF}/extract-webidl.js", var="testIds")


@pytest.mark.skipif(not IDL_CASES, reason="reference tables unavailable")
@pytest.mark.parametrize("case", IDL_CASES, ids=_ids(IDL_CASES))
def test_reference_webidl(case):
    rows = ex.extract_idl(_batch(case["html"])).to_pylist()
    got = rows[0]["idl"] if rows else ""
    assert got == case["res"], case["title"]


# ---------------------------------------------------------------------------
# cddl (test/extract-cddl.js)
# ---------------------------------------------------------------------------

CDDL_CASES = load_js_tests(f"{REF}/extract-cddl.js")


@pytest.mark.skipif(not CDDL_CASES, reason="reference tables unavailable")
@pytest.mark.parametrize("case", CDDL_CASES, ids=_ids(CDDL_CASES))
def test_reference_cddl(case):
    rows = ex.extract_cddl(_batch(case["html"])).to_pylist()
    res = case["res"]
    if isinstance(res, str):
        # no named modules: single entry named "" (extract-cddl.mjs:82)
        assert len(rows) == 1, rows
        assert rows[0]["module"] == ""
        assert rows[0]["cddl"] == res, case["title"]
    else:
        got = [{"name": r["module"], "cddl": r["cddl"]} for r in rows]
        assert got == res, case["title"]


# ---------------------------------------------------------------------------
# elements (test/extract-elements.js)
# ---------------------------------------------------------------------------

ELEMENT_CASES = load_js_tests(f"{REF}/extract-elements.js")


@pytest.mark.skipif(not ELEMENT_CASES, reason="reference tables unavailable")
@pytest.mark.parametrize("case", ELEMENT_CASES, ids=_ids(ELEMENT_CASES))
def test_reference_elements(case):
    rows = ex.extract_elements(_batch(case["html"], case.get("spec"))).to_pylist()
    got = [norm({k: v for k, v in r.items() if k != "doc_id"}) for r in rows]
    assert got == [norm(r) for r in (case["res"] or [])], case["title"]


# ---------------------------------------------------------------------------
# events (test/extract-events.js)
# ---------------------------------------------------------------------------

_DEFAULT_IDL = """<pre class=idl>interface Example {
  attribute EventHandler onsuccess;
  attribute EventHandler onerror;
};</pre>"""


def _default_results(format, opts=None):
    success_iface = (opts or {}).get("successIface", "SuccessEvent")
    return [
        {
            "type": "success", "interface": success_iface, "cancelable": True,
            "targets": ["Example"], "bubbles": True,
            "href": "about:blank#success",
            "src": {"format": format, "href": "about:blank#success"},
        },
        {
            "type": "error", "interface": "ErrorEvent", "cancelable": False,
            "targets": ["Example"], "bubbles": False,
            "href": "about:blank#error",
            "src": {"format": format, "href": "about:blank#error"},
        },
    ]


EVENT_CASES = load_js_tests(
    f"{REF}/extract-events.js",
    namespace={"defaultResults": _default_results},
    substitutions={"defaultIdl": _DEFAULT_IDL},
)


@pytest.mark.skipif(not EVENT_CASES, reason="reference tables unavailable")
@pytest.mark.parametrize("case", EVENT_CASES, ids=_ids(EVENT_CASES))
def test_reference_events(case):
    rows = ex.extract_events(_batch(case["html"], case.get("spec"))).to_pylist()
    got = []
    for r in rows:
        entry = {
            "type": r["type"],
            "interface": r["interface"],
            "cancelable": r["cancelable"],
            "targets": r["targets"],
            "bubbles": r["bubbles"],
            "href": r["href"],
            "src": {"format": r["src_format"], "href": r.get("src_href") or r["href"]},
        }
        if r.get("is_extension"):
            entry["isExtension"] = True
        got.append(norm(entry))
    want = [norm(r) for r in case["res"]]
    assert got == want, case["title"]


# ---------------------------------------------------------------------------
# algorithms (test/extract-algorithms.js)
# ---------------------------------------------------------------------------

ALGO_CASES = load_js_tests(f"{REF}/extract-algorithms.js")


@pytest.mark.skipif(not ALGO_CASES, reason="reference tables unavailable")
@pytest.mark.parametrize("case", ALGO_CASES, ids=_ids(ALGO_CASES))
def test_reference_algorithms(case):
    rows = ex.extract_algorithms(_batch(case["html"], case.get("spec"))).to_pylist()
    got = []
    for r in rows:
        entry = {k: v for k, v in r.items() if k not in ("doc_id", "steps_json")}
        entry.update(json.loads(r["steps_json"]))
        got.append(norm(entry))
    assert got == [norm(r) for r in case["algorithms"]], case["title"]
