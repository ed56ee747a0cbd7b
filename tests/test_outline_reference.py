"""The reference's create-outline test table, end to end
(test/create-outline.js parsed at collection time; each case's HTML
runs through our HTML5 outline port and the serialized outline plus
the #charlie section lookup must match)."""

from __future__ import annotations

import re

import pytest

from _jstable import load_js_tests
from reffy_ray.stages.htmldom import parse_html
from reffy_ray.stages.outline import create_outline

CASES = load_js_tests("/root/reference/test/create-outline.js", var="testOutlines")


def _heading_text(heading) -> str:
    if heading == "__implied" or heading is None:
        return "(implied)"
    if heading.tag == "hgroup":
        # innerText renders each block-level sub-heading on its own line
        lines = [
            " ".join(c.text().split())
            for c in heading.element_children()
            if c.text().strip()
        ]
        return "\n".join(lines) or "(implied)"
    txt = " ".join(heading.text().split())
    return txt if txt else "(implied)"


def _to_string(outline, level=0) -> str:
    return "".join(
        f"{level} - {_heading_text(s['heading'])}\n"
        + _to_string(s["subSections"], level + 1)
        for s in outline or []
    )


@pytest.mark.skipif(not CASES, reason="reference tables unavailable")
@pytest.mark.parametrize(
    "case", CASES, ids=[re.sub(r"\W+", "-", c["title"])[:70] for c in CASES]
)
def test_reference_outline(case):
    # the reference harness loads the html into a Puppeteer page, which
    # always supplies a <body> sectioning root
    html = case["html"]
    if "<body" not in html:
        html = f"<body>{html}</body>"
    root = parse_html(html)
    body = next((b for b in root.iter() if b.tag == "body"), root)
    outline, node_to_section = create_outline(body)
    assert _to_string(outline).strip() == case["res"].strip(), case["title"]

    charlie = next((el for el in root.iter() if el.id == "charlie"), None)
    if charlie is not None:
        section = node_to_section.get(id(charlie))
        heading = _heading_text(section["heading"]) if section else None
    else:
        heading = None
    assert heading == case["whereischarlie"], case["title"]
