"""The reference's markdown-report tests (test/markdown-report.js),
mirrored against our report generator using the reference's own
crawl-test.json fixture (read at test time, not copied)."""

from __future__ import annotations

import json
import os

import pytest

from reffy_ray.post.report import generate_spec_report

FIXTURE = "/root/reference/test/crawl-test.json"


def _load_spec():
    if not os.path.isfile(FIXTURE):
        return None
    return json.load(open(FIXTURE))[0]


def _extracts_of(spec: dict) -> dict:
    """Convert the reference's per-spec crawl result into our
    module → rows extract mapping."""
    ex: dict = {}
    if spec.get("title"):
        ex["title"] = [{"title": spec["title"]}]
    if spec.get("headings"):
        ex["headings"] = spec["headings"]
    if spec.get("ids"):
        ex["ids"] = [{"href": h} for h in spec["ids"]]
    links = spec.get("links") or {}
    rows = []
    for auto, key in ((False, "rawlinks"), (True, "autolinks")):
        for url, entry in (links.get(key) or {}).items():
            rows.append(
                {"page_url": url, "auto": auto,
                 "anchors": (entry or {}).get("anchors") or []}
            )
    if rows:
        ex["links"] = rows
    dfn_rows = []
    for d in spec.get("dfns") or []:
        dfn_rows.append(
            {
                "id": d.get("id"), "href": d.get("href"),
                "linking_text": d.get("linkingText"),
                "type": d.get("type"), "for": d.get("for"),
                "access": d.get("access"),
            }
        )
    if dfn_rows:
        ex["dfns"] = dfn_rows
    css = spec.get("css") or {}
    css_rows = []
    for category in ("properties", "atrules", "selectors", "values", "warnings"):
        for item in css.get(category) or []:
            css_rows.append(
                {"category": category, "name": item.get("name"),
                 "payload_json": json.dumps(item)}
            )
    if css_rows:
        ex["css"] = css_rows
    if spec.get("idl"):
        ex["idl"] = [{"idl": spec["idl"]}]
    return ex


SPEC = _load_spec()

pytestmark = pytest.mark.skipif(SPEC is None, reason="reference fixture unavailable")


def test_produces_a_suitable_summary():
    assert generate_spec_report(SPEC, _extracts_of(SPEC)) == """Crawl summary:
- Title: WOFF2
- Canonical URL: [https://www.w3.org/TR/WOFF2/](https://www.w3.org/TR/WOFF2/)
- Crawled URL: [https://w3c.github.io/woff/woff2/](https://w3c.github.io/woff/woff2/)
- Spec defines:
  - Headings: 1 found
  - IDs: 2 found
  - Links: 1 rawlinks
  - Terms: 1 private
- No Algorithms, CDDL, CSS, Events, References, Web IDL definitions found"""


def test_produces_css_details():
    spec = dict(SPEC)
    spec["css"] = {
        "atrules": [{
            "name": "@charset",
            "href": "https://drafts.csswg.org/css-syntax-3/#at-ruledef-charset",
        }],
        "properties": [{
            "name": "block-step-size",
            "href": "https://drafts.csswg.org/css-rhythm-1/#propdef-block-step-size",
            "value": "none | <length [0,∞]>",
            "initial": "none",
        }],
        "selectors": [{
            "name": ":host",
            "href": "https://drafts.csswg.org/css-scoping-1/#selectordef-host",
        }],
    }
    assert generate_spec_report(spec, _extracts_of(spec)) == """Crawl summary:
- Title: WOFF2
- Canonical URL: [https://www.w3.org/TR/WOFF2/](https://www.w3.org/TR/WOFF2/)
- Crawled URL: [https://w3c.github.io/woff/woff2/](https://w3c.github.io/woff/woff2/)
- Spec defines:
  - CSS: 1 property, 1 at-rule, 1 selector
  - Headings: 1 found
  - IDs: 2 found
  - Links: 1 rawlinks
  - Terms: 1 private
- No Algorithms, CDDL, Events, References, Web IDL definitions found

<details>
<summary>1 CSS property</summary>

- [`block-step-size`](https://drafts.csswg.org/css-rhythm-1/#propdef-block-step-size) ([xref search](https://respec.org/xref/?term=block-step-size&types=css-at-rule%2Ccss-descriptor%2Ccss-function%2Ccss-property%2Ccss-selector%2Ccss-type%2Ccss-value))
</details>
<details>
<summary>1 CSS at-rule</summary>

- [`@charset`](https://drafts.csswg.org/css-syntax-3/#at-ruledef-charset) ([xref search](https://respec.org/xref/?term=%40charset&types=css-at-rule%2Ccss-descriptor%2Ccss-function%2Ccss-property%2Ccss-selector%2Ccss-type%2Ccss-value))
</details>
<details>
<summary>1 CSS selector</summary>

- [`:host`](https://drafts.csswg.org/css-scoping-1/#selectordef-host) ([xref search](https://respec.org/xref/?term=%3Ahost&types=css-at-rule%2Ccss-descriptor%2Ccss-function%2Ccss-property%2Ccss-selector%2Ccss-type%2Ccss-value))
</details>"""


def test_produces_dfns_details():
    spec = dict(SPEC)
    dfn1 = dict(SPEC["dfns"][0], access="public")
    dfn2 = dict(dfn1, type="attribute")
    dfn2["for"] = ["Bar"]
    spec["dfns"] = [dfn1, dfn2]
    assert generate_spec_report(spec, _extracts_of(spec)) == """Crawl summary:
- Title: WOFF2
- Canonical URL: [https://www.w3.org/TR/WOFF2/](https://www.w3.org/TR/WOFF2/)
- Crawled URL: [https://w3c.github.io/woff/woff2/](https://w3c.github.io/woff/woff2/)
- Spec defines:
  - Headings: 1 found
  - IDs: 2 found
  - Links: 1 rawlinks
  - Terms: 1 explicitly exported, 1 exported by default
- No Algorithms, CDDL, CSS, Events, References, Web IDL definitions found

<details>
<summary>1 explicitly exported term</summary>

- [Foo](https://w3c.github.io/woff/woff2/#foo), type dfn ([xref search](https://respec.org/xref/?term=Foo))
</details>"""


def test_produces_idl_details():
    spec = dict(SPEC)
    spec["idl"] = """
[SecureContext, Exposed=Window]
interface Presentation {
};

partial interface Presentation {
  attribute PresentationRequest? defaultRequest;
};

partial interface Presentation {
  readonly attribute PresentationReceiver? receiver;
};

dictionary PresentationConnectionAvailableEventInit : EventInit {
  required PresentationConnection connection;
};

enum PresentationConnectionState { "connecting", "connected", "closed", "terminated" };
  """
    assert generate_spec_report(spec, _extracts_of(spec)) == """Crawl summary:
- Title: WOFF2
- Canonical URL: [https://www.w3.org/TR/WOFF2/](https://www.w3.org/TR/WOFF2/)
- Crawled URL: [https://w3c.github.io/woff/woff2/](https://w3c.github.io/woff/woff2/)
- Spec defines:
  - Headings: 1 found
  - IDs: 2 found
  - Links: 1 rawlinks
  - Terms: 1 private
  - Web IDL: 3 names (or partials)
- No Algorithms, CDDL, CSS, Events, References definitions found

<details>
<summary>3 Web IDL names</summary>

- interface `Presentation` ([xref search](https://respec.org/xref/?term=Presentation&types=_IDL_))
- dictionary `PresentationConnectionAvailableEventInit` ([xref search](https://respec.org/xref/?term=PresentationConnectionAvailableEventInit&types=_IDL_))
- enum `PresentationConnectionState` ([xref search](https://respec.org/xref/?term=PresentationConnectionState&types=_IDL_))
</details>"""
