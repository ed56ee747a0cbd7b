"""The reference's extract-css test table, end to end (test/extract-css.js
parsed at collection time; each case's HTML runs through our span parser +
css extractor and the named category's payload list must deepEqual)."""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pytest

from _jstable import load_js_tests, norm
from reffy_ray.schemas import SPAN_STRUCT
from reffy_ray.stages.extract import extract_css
from reffy_ray.stages.parse import spans_from_html

URL = "about:blank"
CASES = load_js_tests("/root/reference/test/extract-css.js")


def _ours(html: str) -> dict[str, list[dict]]:
    spans = spans_from_html(html, URL)
    batch = pa.table(
        {
            "doc_id": pa.array(["d"]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array([URL]),
        }
    )
    out: dict[str, list[dict]] = {}
    for r in extract_css(batch).to_pylist():
        out.setdefault(r["category"], []).append(json.loads(r["payload_json"]))
    return out


def _prep_html(html: str) -> str:
    # the reference harness moves the <aside> into [data-insert=aside]
    # with JS before extracting (Bikeshed info-panel quirk); replicate
    # textually
    if "data-insert=aside" in html:
        m = re.search(r"<aside.*?</aside>", html, flags=re.S)
        if m:
            aside = m.group(0)
            html = html.replace(aside, "", 1)
            html = re.sub(
                r"(<[^>]*data-insert=aside[^>]*>)", r"\1" + aside.replace("\\", "\\\\"),
                html, count=1,
            )
    return html


@pytest.mark.skipif(not CASES, reason="reference test table unavailable")
@pytest.mark.parametrize(
    "case", CASES, ids=[re.sub(r"\W+", "-", c["title"])[:70] for c in CASES]
)
def test_reference_css_case(case):
    cat = case.get("propertyName") or "properties"
    expected = case.get("css") or []
    got = _ours(_prep_html(case["html"])).get(cat, [])
    assert norm(got) == norm(expected), (
        f"{case['title']}\n got: {json.dumps(norm(got), indent=1)}\n "
        f"want: {json.dumps(norm(expected), indent=1)}"
    )
