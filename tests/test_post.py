"""Post-processing stage tests (SURVEY.md §2.4/2.5 joins & aggregations)."""

import json

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from reffy_ray.post.annotate_links import annotate_links, build_spec_url_index
from reffy_ray.post.backrefs import backrefs, single_page_form
from reffy_ray.post.cssmerge import merge_css
from reffy_ray.post.events import consolidate_events
from reffy_ray.post.idlnames import idlnames
from reffy_ray.post.series import is_latest_level_that_passes, reduce_extracts_per_series
from reffy_ray.post.sinks import build_index, merge_crawl_results, write_extracts
from reffy_ray.sources.corpus import fixture_seeds


# -- annotate-links (J2) -----------------------------------------------------


def test_spec_url_index():
    idx = build_spec_url_index(fixture_seeds())
    assert idx["https://www.w3.org/TR/WOFF2/"] == "WOFF2"
    assert idx["https://w3c.github.io/woff/woff2/"] == "WOFF2"
    # page URLs of multipage specs are indexed too
    assert idx["https://w3c.github.io/woff/woff2/page.html"] == "WOFF2"


def test_annotate_links(ray_session):
    links = rd.from_arrow(pa.table({
        "doc_id": ["a", "a"],
        "page_url": ["http://www.w3.org/TR/WOFF2", "https://example.org/unknown/"],
        "auto": [False, False],
        "anchors": [["x"], []],
    }))
    out = annotate_links(links, fixture_seeds()).to_pandas()
    assert out["spec_shortname"].tolist() == ["WOFF2", None]


# -- backrefs (J3, the wide shuffle) -----------------------------------------


def test_single_page_form():
    assert (
        single_page_form("https://html.spec.whatwg.org/multipage/forms.html#x")
        == "https://html.spec.whatwg.org/#x"
    )
    assert single_page_form("https://example.org/a#b") is None


def test_backrefs_join(ray_session):
    dfns = rd.from_arrow(pa.table({
        "doc_id": ["specA", "specB"],
        "id": ["term1", "term2"],
        "href": ["https://a.example/#term1", "https://b.example/#term2"],
        "type": ["dfn", "dfn"],
        "access": ["public", "public"],
    }))
    links = rd.from_arrow(pa.table({
        "doc_id": ["specB", "specC", "specA"],
        "page_url": ["https://a.example/", "https://a.example/", "https://a.example/"],
        "auto": [False, False, False],
        # specA links to its own term → excluded (anti self-join)
        "anchors": [["term1"], ["term1", "nothere"], ["term1"]],
    }))
    out = backrefs(links, dfns).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["defining_doc"] == "specA"
    assert row["href"] == "https://a.example/#term1"
    assert list(row["referenced_by"]) == ["specB", "specC"]


def test_backrefs_multipage_alias(ray_session):
    dfns = rd.from_arrow(pa.table({
        "doc_id": ["html"],
        "id": ["dom-foo"],
        "href": ["https://html.spec.whatwg.org/multipage/dom.html#dom-foo"],
        "type": ["interface"],
        "access": ["public"],
    }))
    links = rd.from_arrow(pa.table({
        "doc_id": ["other"],
        "page_url": ["https://html.spec.whatwg.org/"],
        "auto": [True],
        "anchors": [["dom-foo"]],  # single-page link form
    }))
    out = backrefs(links, dfns).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["defining_doc"] == "html"


# -- idlnames (A3 + J7) ------------------------------------------------------


def test_idlnames_first_in_crawl_order_wins(ray_session):
    rows = [
        {"doc_id": "late", "seed_rank": 5,
         "idlparsed": json.dumps({"idlNames": {"Foo": {"type": "interface"}},
                                  "dependencies": {"Foo": ["Bar"]}})},
        {"doc_id": "early", "seed_rank": 1,
         "idlparsed": json.dumps({"idlNames": {"Foo": {"type": "interface"}},
                                  "dependencies": {"Foo": []}})},
        {"doc_id": "ext", "seed_rank": 3,
         "idlparsed": json.dumps({"idlExtendedNames": {"Foo": [{"type": "includes", "includes": "Mix"}]},
                                  "dependencies": {"Foo": ["Mix"]}})},
        {"doc_id": "bar", "seed_rank": 2,
         "idlparsed": json.dumps({"idlNames": {"Bar": {"type": "interface"},
                                               "Mix": {"type": "interface mixin"}},
                                  "dependencies": {"Bar": ["Mix"], "Mix": []}})},
    ]
    out = idlnames(rd.from_arrow(pa.Table.from_pylist(rows)))
    by_name = {r["name"]: r for r in out.to_pylist()}
    # first-in-crawl-order wins (idlnames.js:208-215)
    assert by_name["Foo"]["defined_in"] == "early"
    assert by_name["Foo"]["extended_in"] == ["ext"]
    # transitive deps with expansion: Foo → Bar → Mix
    assert by_name["Foo"]["all_deps"] == ["Bar", "Mix"]


def test_idlnames_cycle_guard(ray_session):
    rows = [
        {"doc_id": "a", "seed_rank": 0,
         "idlparsed": json.dumps({"idlNames": {"A": {}}, "dependencies": {"A": ["B"]}})},
        {"doc_id": "b", "seed_rank": 1,
         "idlparsed": json.dumps({"idlNames": {"B": {}}, "dependencies": {"B": ["A"]}})},
    ]
    out = idlnames(rd.from_arrow(pa.Table.from_pylist(rows)))
    by_name = {r["name"]: r for r in out.to_pylist()}
    assert by_name["A"]["all_deps"] == ["B"]
    assert by_name["B"]["all_deps"] == ["A"]


# -- events consolidation (A5 + J4) ------------------------------------------


def test_events_mixin_expansion_and_sort(ray_session):
    events = rd.from_arrow(pa.table({
        "doc_id": ["s1", "s1", "s2"],
        "type": ["zed", "alpha", "alpha"],
        "interface": ["Event", "CustomEvent", "CustomEvent"],
        "bubbles": [True, None, None],
        "cancelable": [None, None, None],
        "targets": [["GlobalEventHandlers"], ["Window"], ["Window"]],
        "href": ["https://x/#zed", "https://x/#alpha", "https://y/#alpha"],
        "src_format": ["summary table"] * 3,
        "is_extension": [False, False, False],
    }))
    idlparsed = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": "html", "idlparsed": json.dumps({
            "idlExtendedNames": {
                "HTMLElement": [{"type": "includes", "includes": "GlobalEventHandlers"}],
                "Document": [{"type": "includes", "includes": "GlobalEventHandlers"}],
            }})},
    ]))
    out = consolidate_events(events, idlparsed).to_pylist()
    # sorted by type first (events.js:81-88)
    assert [e["type"] for e in out] == ["alpha", "alpha", "zed"]
    zed = [e for e in out if e["type"] == "zed"][0]
    assert sorted(zed["targets"]) == ["Document", "HTMLElement"]


def test_events_extension_folding(ray_session):
    events = rd.from_arrow(pa.table({
        "doc_id": ["base", "base"],
        "type": ["go", "go"],
        "interface": ["Event", None],
        "bubbles": [None, True],
        "cancelable": [None, None],
        "targets": [["A"], ["B"]],
        "href": ["https://x/#go", "https://x/#go"],
        "src_format": ["summary table", "summary table"],
        "is_extension": [False, True],
    }))
    out = consolidate_events(events).to_pylist()
    assert len(out) == 1
    assert out[0]["bubbles"] is True  # filled from extension
    assert sorted(out[0]["targets"]) == ["A", "B"]


# -- cssmerge (A4) -----------------------------------------------------------


def test_cssmerge_base_and_new_values(ray_session):
    # distributed wrapper around the faithful consolidation
    # (test_cssmerge_reference covers every reference case driver-side)
    specs = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": "css-x-1", "crawl_rank": 0,
         "css_json": json.dumps({
             "properties": [{"name": "foo",
                             "href": "https://x.org/css-x-1/#foo",
                             "value": "a | b"}],
             "atrules": [], "selectors": [], "values": [],
         }),
         "shortname": "css-x-1", "series_shortname": "css-x",
         "series_version": "1", "crawled": "https://x.org/css-x-1/",
         "url": "https://x.org/css-x-1/"},
        {"doc_id": "css-x-2", "crawl_rank": 1,
         "css_json": json.dumps({
             "properties": [{"name": "foo",
                             "href": "https://x.org/css-x-2/#foo",
                             "newValues": "c"}],
             "atrules": [], "selectors": [], "values": [],
         }),
         "shortname": "css-x-2", "series_shortname": "css-x",
         "series_version": "2", "crawled": "https://x.org/css-x-2/",
         "url": "https://x.org/css-x-2/"},
    ]))
    out = merge_css(specs).to_pylist()
    assert len(out) == 1
    payload = json.loads(out[0]["payload_json"])
    # base definition + newValues union with extension provenance
    # (cssmerge.js:250-300)
    assert payload["syntax"] == "a | b | c"
    assert payload["extended"] == ["https://x.org/css-x-2/#foo"]


# -- series reduction (A2) ---------------------------------------------------


def test_is_latest_level():
    specs = [
        {"shortname": "css-foo-1", "series_shortname": "css-foo",
         "series_composition": "full", "series_current": "css-foo-2",
         "series_next": "css-foo-2", "series_previous": None},
        {"shortname": "css-foo-2", "series_shortname": "css-foo",
         "series_composition": "full", "series_current": "css-foo-2",
         "series_next": None, "series_previous": "css-foo-1"},
    ]
    has = lambda s: True
    assert not is_latest_level_that_passes(specs[0], specs, has)
    assert is_latest_level_that_passes(specs[1], specs, has)
    # when the newer level lacks the extract AND the older level is the
    # series' current specification, the older level wins (the final
    # walk at util.js:761-772 requires reaching currentSpecification)
    only_1 = lambda s: s["shortname"] == "css-foo-1"
    specs_cur1 = [dict(s, series_current="css-foo-1") for s in specs]
    assert is_latest_level_that_passes(specs_cur1[0], specs_cur1, only_1)
    # an old level below the series current never wins, even if it is
    # the only one passing the predicate
    assert not is_latest_level_that_passes(specs[0], specs, only_1)


def test_reduce_extracts_per_series(ray_session):
    extract = rd.from_arrow(pa.table({
        "doc_id": ["css-foo-1", "css-foo-2"],
        "idl": ["old", "new"],
    }))
    seeds = pa.Table.from_pylist([
        {"shortname": "css-foo-1", "series_shortname": "css-foo",
         "series_composition": "full", "series_current": "css-foo-2",
         "series_next": "css-foo-2", "series_previous": None},
        {"shortname": "css-foo-2", "series_shortname": "css-foo",
         "series_composition": "full", "series_current": "css-foo-2",
         "series_next": None, "series_previous": "css-foo-1"},
    ])
    out = reduce_extracts_per_series(
        extract, seeds, docs_with_extract={"css-foo-1", "css-foo-2"}
    ).to_pandas()
    assert out["doc_id"].tolist() == ["css-foo-2"]


# -- sinks (S6/S7/S8) --------------------------------------------------------


def test_write_extracts_skips_empty(ray_session, tmp_path):
    import os

    counts = write_extracts(
        {
            "idl": rd.from_arrow(pa.table({"doc_id": ["a"], "idl": ["x"]})),
            "cddl": rd.from_arrow(pa.table({"doc_id": pa.array([], pa.string()),
                                            "cddl": pa.array([], pa.string())})),
        },
        str(tmp_path / "out"),
    )
    assert counts == {"idl": 1, "cddl": 0}
    assert os.path.isdir(tmp_path / "out" / "idl")
    assert not os.path.isdir(tmp_path / "out" / "cddl")  # empty skipped


def test_build_index(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": ["a", "b"], "error": [None, "HTTP 404"],
    }))
    idx = build_index(docs, "reffy-ray-0.1.0")
    assert idx["stats"] == {"crawled": 2, "errors": 1}
    assert idx["crawler"] == "reffy-ray-0.1.0"


def test_merge_crawl_results(ray_session):
    ref = rd.from_arrow(pa.table({
        "url": ["https://a/", "https://b/"], "title": ["oldA", "oldB"],
    }))
    new = rd.from_arrow(pa.table({
        "url": ["https://b/", "https://c/"], "title": ["newB", "newC"],
    }))
    out = merge_crawl_results(ref, new).to_pandas()
    assert out["url"].tolist() == ["https://a/", "https://b/", "https://c/"]
    assert out["title"].tolist() == ["oldA", "newB", "newC"]


# -- J6: idl → dfn linking (idlparsed.js:16-112) -----------------------------


def test_idlparsed_dfn_linking(ray_session):
    import json as _json

    from reffy_ray.post.idlparsed_link import link_idlparsed_to_dfns

    idlparsed = rd.from_arrow(pa.Table.from_pylist([
        {
            "doc_id": "spec",
            "idlparsed": _json.dumps({
                "idlNames": {
                    "Foo": {
                        "type": "interface", "name": "Foo",
                        "fragment": "interface Foo { attribute DOMString bar; };",
                    }
                }
            }),
        }
    ]))
    dfns = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": "spec", "id": "dom-foo", "href": "https://s/#dom-foo",
         "linking_text": ["Foo"], "type": "interface", "for": [],
         "access": "public"},
        {"doc_id": "spec", "id": "dom-foo-bar", "href": "https://s/#dom-foo-bar",
         "linking_text": ["bar"], "type": "attribute", "for": ["Foo"],
         "access": "public"},
        # a dfn for another interface's attribute must NOT match
        {"doc_id": "spec", "id": "other-bar", "href": "https://s/#other-bar",
         "linking_text": ["bar"], "type": "attribute", "for": ["Other"],
         "access": "public"},
    ]))
    out = link_idlparsed_to_dfns(idlparsed, dfns).to_pandas()
    by_key = {(r["idl_name"], r["member"]): r["dfn_href"]
              for _, r in out.iterrows()}
    assert by_key[("Foo", None)] == "https://s/#dom-foo"
    assert by_key[("Foo", "bar")] == "https://s/#dom-foo-bar"


# -- J5: interface-tree bubbling (events.js:112-144, util.js:989-1046) -------


def test_interface_tree_info():
    from reffy_ray.functions.interface_trees import get_interface_tree_info

    info = get_interface_tree_info("IDBRequest", {})
    assert info["tree"] == "IndexedDB"
    assert info["depth"] == 2
    assert info["bubblingPath"] == ["IDBTransaction", "IDBDatabase"]
    # inheritance chain walking
    info2 = get_interface_tree_info("MyRequest", {"MyRequest": "IDBRequest"})
    assert info2["interface"] == "IDBRequest"
    assert get_interface_tree_info("Unrelated", {}) is None


def test_events_tree_bubbling(ray_session):
    import json as _json

    events = rd.from_arrow(pa.table({
        "doc_id": ["idb"],
        "type": ["success"],
        "interface": ["Event"],
        "bubbles": [None],
        "cancelable": [None],
        "targets": [["IDBRequest"]],
        "href": ["https://idb/#success"],
        "src_format": ["summary table"],
        "is_extension": [False],
    }))
    out = consolidate_events(events).to_pylist()
    assert len(out) == 1
    # non-root tree target with unknown bubbles → bubbles=false
    # (events.js:134-136)
    assert out[0]["bubbles"] is False
    detail = _json.loads(out[0]["targets_detail"])
    assert detail == [{"target": "IDBRequest", "bubbles": False}]


# -- patch-dfns (spec-level dfn patches, patch-dfns.js:13-51) -----------------


def _dfn_batch(rows):
    return pa.table({
        "doc_id": pa.array([r.get("doc_id", "d") for r in rows]),
        "href": pa.array([r["href"] for r in rows]),
        "linking_text": pa.array(
            [r.get("lt", []) for r in rows], pa.list_(pa.string())),
        "for": pa.array([r.get("for", []) for r in rows],
                        pa.list_(pa.string())),
        "access": pa.array([r.get("access", "public") for r in rows]),
    })


def test_patch_dfns_orientation_event_drop():
    from reffy_ray.post.patch_dfns import patch_dfns_batch

    batch = _dfn_batch([
        # dropped: linkingText includes PermissionState
        {"href": "https://w3c.github.io/deviceorientation/#ps",
         "lt": ["PermissionState"]},
        # dropped: for includes PermissionState
        {"href": "https://www.w3.org/TR/orientation-event/#granted",
         "lt": ["granted"], "for": ["PermissionState"]},
        # kept: unrelated dfn in the same spec
        {"href": "https://w3c.github.io/deviceorientation/#alpha",
         "lt": ["alpha"]},
        # kept: PermissionState dfn in an UNPATCHED spec
        {"href": "https://w3c.github.io/permissions/#ps",
         "lt": ["PermissionState"]},
    ])
    out = patch_dfns_batch(batch)
    assert out.column("href").to_pylist() == [
        "https://w3c.github.io/deviceorientation/#alpha",
        "https://w3c.github.io/permissions/#ps",
    ]


def test_patch_dfns_portals_first_linking_text_only():
    from reffy_ray.post.patch_dfns import patch_dfns_batch

    batch = _dfn_batch([
        # dropped: first linking text is MessageEventSource
        {"href": "https://wicg.github.io/portals/#mes",
         "lt": ["MessageEventSource", "other"]},
        # kept: MessageEventSource not FIRST (reference checks [0] only)
        {"href": "https://wicg.github.io/portals/#other",
         "lt": ["other", "MessageEventSource"]},
    ])
    out = patch_dfns_batch(batch)
    assert out.column("href").to_pylist() == [
        "https://wicg.github.io/portals/#other"]


def test_patch_dfns_tr_privatize_and_precedence():
    from reffy_ray.post.patch_dfns import patch_dfns_batch

    batch = _dfn_batch([
        {"href": "https://www.w3.org/TR/WebCryptoAPI/#dfn-a", "lt": ["a"]},
        {"href": "https://www.w3.org/TR/pub-manifest/#dfn-b", "lt": ["b"]},
        {"href": "https://www.w3.org/TR/audiobooks/#dfn-c", "lt": ["c"]},
        # nightly WebCrypto is NOT matched (TR-only patch)
        {"href": "https://w3c.github.io/webcrypto/#dfn-d", "lt": ["d"]},
    ])
    out = patch_dfns_batch(batch)
    assert out.num_rows == 4
    assert out.column("access").to_pylist() == [
        "private", "private", "private", "public"]


def test_patch_dfns_fast_path_zero_copy(ray_session):
    from reffy_ray.post.patch_dfns import patch_dfns, patch_dfns_batch

    batch = _dfn_batch([
        {"href": "https://example.org/spec/#x", "lt": ["x"]},
    ])
    assert patch_dfns_batch(batch) is batch  # unpatched specs untouched
    out = patch_dfns(rd.from_arrow(batch)).to_pandas()
    assert out["access"].tolist() == ["public"]
