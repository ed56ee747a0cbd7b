"""Extractor unit tests over the fixture span corpus.

Golden expectations mirror the reference's end-to-end golden file
(test/crawl-test.json) and the inline fixtures of test/extract-*.js,
re-expressed as extract-table rows (SURVEY.md §5 target test plan).
Pure-function tests — no Ray session needed (extractors are the same
callables passed to map_batches).
"""

import json

import pyarrow as pa
import pytest

from reffy_ray.schemas import SPAN_STRUCT
from reffy_ray.sources.corpus import fixture_html
from reffy_ray.stages import extract as ex
from reffy_ray.stages.parse import spans_from_html


def doc_batch(doc_id: str, url: str, pages=None) -> pa.Table:
    spans = spans_from_html(fixture_html(url), url, pages=pages)
    return pa.table(
        {
            "doc_id": pa.array([doc_id]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array([url]),
        }
    )


@pytest.fixture(scope="module")
def woff2():
    url = "https://w3c.github.io/woff/woff2/"
    page = "https://w3c.github.io/woff/woff2/page.html"
    return doc_batch("WOFF2", url, pages=[(page, fixture_html(page))])


@pytest.fixture(scope="module")
def audio():
    return doc_batch("audio-output", "https://w3c.github.io/mediacapture-output/")


@pytest.fixture(scope="module")
def accel():
    return doc_batch("accelerometer", "https://w3c.github.io/accelerometer/")


@pytest.fixture(scope="module")
def cssbg():
    return doc_batch("css-backgrounds-3", "https://drafts.csswg.org/css-backgrounds-3/")


@pytest.fixture(scope="module")
def events_spec():
    return doc_batch("example-events", "https://w3c.github.io/example-events/")


# -- woff2 golden rows (test/crawl-test.json first entry) -------------------


def test_woff2_title(woff2):
    assert ex.extract_title(woff2).to_pylist() == [{"doc_id": "WOFF2", "title": "WOFF2"}]


def test_woff2_ids(woff2):
    assert [r["href"] for r in ex.extract_ids(woff2).to_pylist()] == [
        "https://w3c.github.io/woff/woff2/#foo",
        "https://w3c.github.io/woff/woff2/page.html#bar",
    ]


def test_woff2_headings(woff2):
    assert ex.extract_headings(woff2).to_pylist() == [
        {
            "doc_id": "WOFF2",
            "id": "bar",
            "href": "https://w3c.github.io/woff/woff2/page.html#bar",
            "level": 2,
            "title": "Heading in subpage",
            "number": None,
            "alternate_ids": None,
        }
    ]


def test_woff2_links(woff2):
    rows = ex.extract_links(woff2).to_pylist()
    assert rows == [
        {
            "doc_id": "WOFF2",
            "page_url": "https://www.w3.org/TR/bar/",
            "auto": False,
            "anchors": ["baz"],
        }
    ]


def test_woff2_dfns(woff2):
    rows = ex.extract_dfns(woff2).to_pylist()
    assert len(rows) == 1
    d = rows[0]
    assert d["id"] == "foo"
    assert d["href"] == "https://w3c.github.io/woff/woff2/#foo"
    assert d["linking_text"] == ["Foo"]
    assert d["type"] == "dfn"
    assert d["access"] == "private"
    assert d["informative"] is False
    assert d["defined_in"] == "prose"
    # doc-level heading fallback (crawl-test.json: heading = doc title)
    assert d["heading"]["href"] == "https://w3c.github.io/woff/woff2/"
    assert d["heading"]["title"] == "WOFF2"


# -- audio-output golden rows (respec spec) ---------------------------------


def test_audio_title_default(audio):
    assert ex.extract_title(audio).to_pylist()[0]["title"] == "No Title"


def test_audio_generator(audio):
    assert ex.extract_meta(audio).to_pylist()[0]["generator"] == "respec"


def test_audio_idl(audio):
    rows = ex.extract_idl(audio).to_pylist()
    assert rows == [
        {
            "doc_id": "audio-output",
            "idl": "[Exposed=Window] interface Foo { attribute DOMString bar; };",
        }
    ]


def test_audio_autolinks(audio):
    rows = ex.extract_links(audio).to_pylist()
    auto = [r for r in rows if r["auto"]]
    assert auto == [
        {
            "doc_id": "audio-output",
            "page_url": "https://webidl.spec.whatwg.org/",
            "auto": True,
            "anchors": ["Exposed", "idl-DOMString"],
        }
    ]


def test_audio_refs(audio):
    rows = ex.extract_refs(audio).to_pylist()
    assert rows == [
        {
            "doc_id": "audio-output",
            "name": "webidl",
            "url": "https://webidl.spec.whatwg.org/",
            "normative": False,
        }
    ]


# -- accelerometer golden rows ----------------------------------------------


def test_accel_revision(accel):
    assert (
        ex.extract_meta(accel).to_pylist()[0]["revision"]
        == "c0917d216986f88bdd43c72c0b13352c71f283aa"
    )


def test_accel_normative_refs(accel):
    rows = ex.extract_refs(accel).to_pylist()
    assert rows == [
        {
            "doc_id": "accelerometer",
            "name": "FOO",
            "url": "https://www.w3.org/TR/Foo",
            "normative": True,
        }
    ]


# -- css golden rows (test/extract-css.js:10-50) ----------------------------


def test_css_propdef(cssbg):
    rows = ex.extract_css(cssbg).to_pylist()
    props = [r for r in rows if r["category"] == "properties"]
    assert len(props) == 1
    p = json.loads(props[0]["payload_json"])
    assert p["name"] == "background-color"
    assert p["value"] == "<color>"
    assert p["initial"] == "transparent"
    assert p["appliesTo"] == "all elements"
    assert p["inherited"] == "no"
    assert p["percentages"] == "N/A"
    assert p["computedValue"] == "computed color"
    assert p["animationType"] == "by computed value"
    assert (
        p["href"]
        == "https://drafts.csswg.org/css-backgrounds-3/#propdef-background-color"
    )


def test_css_production_rule(cssbg):
    # a production rule with no dfn anywhere is a "Missing definition"
    # warning in the reference model (extract-cssdfn.mjs:186-196), not a
    # values entry
    rows = ex.extract_css(cssbg).to_pylist()
    warns = [r for r in rows if r["category"] == "warnings"]
    assert len(warns) == 1
    v = json.loads(warns[0]["payload_json"])
    assert v["msg"] == "Missing definition"
    assert v["name"] == "<position>"
    assert v["value"] == "[ left | center | right ]"


def test_css_heading_number(cssbg):
    rows = ex.extract_headings(cssbg).to_pylist()
    h = [r for r in rows if r["id"] == "background-color"][0]
    assert h["number"] == "2.1"
    assert h["title"] == "Background color"


# -- events + algorithms golden rows (test/extract-events.js:42-52,
#    test/extract-algorithms.js:11-24) --------------------------------------


def test_events_summary_table(events_spec):
    rows = ex.extract_events(events_spec).to_pylist()
    by_type = {r["type"]: r for r in rows}
    assert set(by_type) == {"success", "error"}
    s = by_type["success"]
    assert s["interface"] == "SuccessEvent"
    assert s["bubbles"] is True
    assert s["cancelable"] is True
    assert s["targets"] == ["Example"]
    assert s["href"] == "https://w3c.github.io/example-events/#success"
    e = by_type["error"]
    assert e["interface"] == "ErrorEvent"
    assert e["bubbles"] is False
    assert e["targets"] == ["Example"]


def test_algorithms(events_spec):
    rows = ex.extract_algorithms(events_spec).to_pylist()
    assert len(rows) == 1
    a = rows[0]
    assert a["name"] == "my algo"
    assert a["href"] == "https://w3c.github.io/example-events/#algo-id"
    assert a["rationale"] == ".algorithm"
    steps = json.loads(a["steps_json"])
    assert steps["html"] == "To do nothing, run these steps:"
    assert steps["steps"] == [{"html": "<p>Nothing.</p>"}]


# -- span invariants --------------------------------------------------------


def test_span_offsets_strictly_increasing(woff2, audio, cssbg, events_spec):
    for batch in (woff2, audio, cssbg, events_spec):
        for spans in batch.column("spans").to_pylist():
            offsets = [s["offset"] for s in spans]
            assert offsets == sorted(offsets)
            assert len(set(offsets)) == len(offsets)


def test_empty_doc():
    empty = pa.table(
        {
            "doc_id": pa.array(["empty"]),
            "spans": pa.array([[]], pa.list_(SPAN_STRUCT)),
            "url": pa.array(["https://example.org/"]),
        }
    )
    for name, fn in ex.EXTRACTORS.items():
        out = fn(empty)
        if name in ("title", "meta"):
            assert out.num_rows == 1
        else:
            assert out.num_rows == 0


# -- switch algorithms (test/extract-algorithms.js:78-110) -------------------


def test_switch_algorithm():
    html = """
      <p>To <dfn id="be">be or not to be</dfn>, given <var>will</var>:</p>
      <dl class="switch">
        <dt>to be</dt>
        <dd>Do something.</dd>
        <dt>not to be</dt>
        <dd>Do nothing.</dd>
      </dl>"""
    spans = spans_from_html(html, "https://x.example/")
    batch = pa.table(
        {
            "doc_id": pa.array(["sw"]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array(["https://x.example/"]),
        }
    )
    rows = ex.extract_algorithms(batch).to_pylist()
    assert len(rows) == 1
    a = rows[0]
    assert a["name"] == "be or not to be"
    assert a["href"] == "https://x.example/#be"
    assert a["rationale"] == ".switch"
    steps = json.loads(a["steps_json"])
    assert steps["steps"] == [
        {
            "operation": "switch",
            "steps": [
                {"case": "to be", "html": "Do something."},
                {"case": "not to be", "html": "Do nothing."},
            ],
        }
    ]


# -- event dfns (test/extract-events.js:80-126) ------------------------------


def test_event_dfn():
    html = "<p><dfn id=success data-dfn-type=event data-dfn-for=Example>success</dfn> is an event, not a state.</p>"
    spans = spans_from_html(html, "https://x.example/")
    batch = pa.table(
        {
            "doc_id": pa.array(["ev"]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array(["https://x.example/"]),
        }
    )
    rows = ex.extract_events(batch).to_pylist()
    assert len(rows) == 1
    e = rows[0]
    assert e["type"] == "success"
    assert e["targets"] == ["Example"]
    assert e["href"] == "https://x.example/#success"
    assert e["src_format"] == "dfn"


def test_event_dfn_completes_table_event():
    html = """
      <table>
        <thead><tr><th>Event type</th><th>Interface</th><th>Bubbles</th><th>Cancelable</th></tr></thead>
        <tbody><tr><th>success</th><td>SuccessEvent</td><td>Yes</td><td>Yes</td></tr></tbody>
      </table>
      <p><dfn id=success data-dfn-type=event data-dfn-for=Example>success</dfn></p>"""
    spans = spans_from_html(html, "https://x.example/")
    batch = pa.table(
        {
            "doc_id": pa.array(["ev2"]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array(["https://x.example/"]),
        }
    )
    rows = ex.extract_events(batch).to_pylist()
    # the summary row has no dfn/a/code element in its type cell, so the
    # reference skips it (extract-events.mjs:107-112); the event dfn is
    # the only extracted event, with its data-dfn-for as target
    assert len(rows) == 1
    e = rows[0]
    assert e["interface"] is None
    assert e["targets"] == ["Example"]
    assert e["src_format"] == "dfn"


def test_spans_from_html_hostile_inputs():
    """Adversarial parser inputs must come back as span lists (possibly
    empty), never raise — the htmldom MAX_DEPTH cap bounds recursion
    (stages/htmldom.py:135) and the tokenizer tolerates truncation."""
    from reffy_ray.stages.parse import spans_from_html

    hostile = [
        "<table><tr><th>Name:<td>" * 1000,
        "<div>" * 500 + "text" + "</div>" * 120,
        "<dl><dt>" * 300,
        "<p <span<<>><b>" * 200,
        "<!doctype html><html><body>" + "&amp;" * 5000,
        "\x00\x01<h1>x</h1>\xff",
        "<script>" + "a<b" * 1000,  # unterminated script
        "",
    ]
    for html in hostile:
        spans = spans_from_html(html, "https://x.example/")
        assert isinstance(spans, list)
    # deep-but-valid doc still yields its heading
    ok = spans_from_html("<div>" * 100 + "<h2 id=a>Deep</h2>", "https://x.example/")
    assert any(s.get("kind") == "heading" for s in ok)
