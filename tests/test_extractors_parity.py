"""Extra extractor parity tests ported from the reference's inline
fixtures (test/extract-references.js, test/extract-elements.js,
test/extract-cddl.js, test/extract-dfns.js variants)."""

import json

import pyarrow as pa

from reffy_ray.schemas import SPAN_STRUCT
from reffy_ray.stages import extract as ex
from reffy_ray.stages.parse import spans_from_html

URL = "https://x.example/"


def batch_of(html: str, doc_id: str = "d") -> pa.Table:
    spans = spans_from_html(html, URL)
    return pa.table(
        {
            "doc_id": pa.array([doc_id]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array([URL]),
        }
    )


def refs_of(html: str):
    rows = ex.extract_refs(batch_of(html)).to_pylist()
    return (
        [(r["name"], r["url"]) for r in rows if r["normative"]],
        [(r["name"], r["url"]) for r in rows if not r["normative"]],
    )


# -- extract-references.js fixtures ------------------------------------------


def test_refs_normative_section():
    n, i = refs_of(
        """
<section>
  <h3>F.1 Normative references</h3>
  <dl>
    <dt id="bib-dom">[dom]</dt>
    <dd><a href="https://dom.spec.whatwg.org/"><cite>DOM Standard</cite></a>. Anne van Kesteren.</dd>
  </dl>
</section>"""
    )
    assert n == [("dom", "https://dom.spec.whatwg.org/")]
    assert i == []


def test_refs_informative_nested_section():
    n, i = refs_of(
        """
<section>
  <h2>F. References</h2>
  <section>
    <h3>F.2 Informative references</h3>
    <dl>
      <dt id="bib-webrtc">[webrtc]</dt>
      <dd><a href="https://www.w3.org/TR/webrtc/"><cite>WebRTC</cite></a>.</dd>
    </dl>
  </section>
</section>"""
    )
    assert n == []
    assert i == [("webrtc", "https://www.w3.org/TR/webrtc/")]


def test_refs_flat_list_with_non_normative_marker():
    n, i = refs_of(
        """
<h2>F. References</h2>
<p>All references are normative unless marked "Non-normative".</p>
<dl>
  <dt id="refsABNF">[ABNF]</dt>
  <dd><cite><a href="https://www.rfc-editor.org/rfc/rfc5234">ABNF</a></cite>, D. Crocker.</dd>
  <dt id="refsAPNG">[APNG]</dt>
  <dd>(Non-normative) <cite><a href="https://wiki.mozilla.org/APNG_Specification">APNG</a></cite>.</dd>
</dl>"""
    )
    assert n == [("ABNF", "https://www.rfc-editor.org/rfc/rfc5234")]
    assert i == [("APNG", "https://wiki.mozilla.org/APNG_Specification")]


def test_refs_split_sections_without_section_elements():
    n, i = refs_of(
        """
<h2>References</h2>
<h3>Normative References</h3>
<dl>
   <dt id="biblio-css-align-3">[CSS-ALIGN-3]</dt>
   <dd><a href="https://drafts.csswg.org/css-align/"><cite>CSS Box Alignment</cite></a>.</dd>
</dl>
<h3>Informative References</h3>
<dl>
  <dt>[CSS-MULTICOL-1]</dt>
  <dd><a href="https://drafts.csswg.org/css-multicol/"><cite>CSS Multicol</cite></a>.</dd>
</dl>"""
    )
    assert n == [("CSS-ALIGN-3", "https://drafts.csswg.org/css-align/")]
    assert i == [("CSS-MULTICOL-1", "https://drafts.csswg.org/css-multicol/")]


def test_refs_not_confused_by_further_lists():
    n, i = refs_of(
        """
<h2>Normative references</h2>
<p>No references.</p>
<h2>A few terms</h2>
<dl>
   <dt>A term</dt>
   <dd>but not a ref</dd>
</dl>"""
    )
    assert n == [] and i == []


def test_refs_in_ul_lists():
    n, i = refs_of(
        """
<h2>11 References</h2>
<h3>11.1 Normative References</h3>
<ul>
  <li><p><a href="https://aomediacodec.github.io/av1-spec/av1-spec.pdf">AV1</a> <strong>AV1 Bitstream</strong>, January 2019.</p></li>
</ul>
<h3>11.2 Informative References</h3>
<ul>
  <li><p><a href="https://tools.ietf.org/html/rfc3711">RFC3711</a> <strong>SRTP</strong>, March 2004.</p></li>
</ul>"""
    )
    assert n == [("AV1", "https://aomediacodec.github.io/av1-spec/av1-spec.pdf")]
    assert i == [("RFC3711", "https://tools.ietf.org/html/rfc3711")]


# -- extract-elements.js fixtures --------------------------------------------


def test_element_with_own_interface():
    html = """
<h4 id="the-p-element"><span class="secno">4.4.1</span> The <dfn id="the-p"><code>p</code></dfn> element</h4>
<dl class="element">
<dt><a href="dom.html#concept-element-dom">DOM interface</a>:</dt>
<dd><pre><code class="idl">[Exposed=Window]
interface <dfn id="htmlparagraphelement" data-dfn-type="interface">HTMLParagraphElement</dfn> : HTMLElement {
};</code></pre></dd>
</dl>"""
    rows = ex.extract_elements(batch_of(html)).to_pylist()
    assert rows == [
        {"doc_id": "d", "name": "p", "href": f"{URL}#the-p",
         "interface": "HTMLParagraphElement"}
    ]


def test_element_using_other_interface():
    html = """
<h4 id="the-thead-element"><span class="secno">4.9.6</span> The <dfn id="thead"><code>thead</code></dfn> element</h4>
<dl class="element">
<dt>Categories:</dt><dd>None.</dd>
<dt><a href="dom.html#concept-element-dom">DOM interface</a>:</dt>
<dd>Uses <code><a href="#htmltablesectionelement">HTMLTableSectionElement</a></code>, as defined for <code>tbody</code> elements.</dd>
</dl>"""
    rows = ex.extract_elements(batch_of(html)).to_pylist()
    assert rows == [
        {"doc_id": "d", "name": "thead", "href": f"{URL}#thead",
         "interface": "HTMLTableSectionElement"}
    ]


def test_grouped_elements():
    html = """
<h4 id="the-sub-and-sup-elements"><span class="secno">4.5.19</span> The <dfn id="the-sub-element" data-dfn-type="element"><code>sub</code></dfn> and <dfn id="the-sup-element" data-dfn-type="element"><code>sup</code></dfn> elements</h4>
<dl class="element"><dt><a href="dom.html#concept-element-dom">DOM interface</a>:</dt><dd>Use <code><a href="dom.html#htmlelement">HTMLElement</a></code>.</dd>
</dl>"""
    rows = ex.extract_elements(batch_of(html)).to_pylist()
    assert [(r["name"], r["interface"], r["href"]) for r in rows] == [
        ("sub", "HTMLElement", f"{URL}#the-sub-element"),
        ("sup", "HTMLElement", f"{URL}#the-sup-element"),
    ]


# -- extract-cddl.js fixtures ------------------------------------------------


def cddl_of(html: str):
    return ex.extract_cddl(batch_of(html)).to_pylist()


def test_cddl_basic():
    rows = cddl_of('<pre class="cddl">cddl = tstr</pre>')
    # no named modules: the single entry is named "" (extract-cddl.mjs:82)
    assert rows == [{"doc_id": "d", "module": "", "cddl": "cddl = tstr"}]


def test_cddl_none():
    assert cddl_of("<p>Me no define CDDL</p>") == []


def test_cddl_merges_blocks():
    rows = cddl_of(
        '<pre class="cddl">cddl = * rule</pre>\n<pre class="cddl">rule = tstr</pre>'
    )
    assert rows[0]["cddl"] == "cddl = * rule\n\nrule = tstr"


def test_cddl_strips_trailing_spaces():
    rows = cddl_of('<pre class="cddl">\n            cddl = * rule    </pre>')
    assert rows[0]["cddl"] == "cddl = * rule"


def test_cddl_preserves_internal_indentation():
    rows = cddl_of(
        """<pre class="cddl">
            rule = (
              typedef /
              groupdef
            )
            typedef = tstr
              groupdef = tstr
          </pre>"""
    )
    assert rows[0]["cddl"] == (
        "rule = (\n  typedef /\n  groupdef\n)\ntypedef = tstr\n  groupdef = tstr"
    )


def test_cddl_module_names():
    rows = cddl_of('<pre class="cddl" data-cddl-module="mod">cddl = tstr</pre>')
    assert [(r["module"], r["cddl"]) for r in rows] == [
        ("all", "cddl = tstr"),
        ("mod", "cddl = tstr"),
    ]


# -- dfn variants (extract-dfns.js semantics) --------------------------------


def test_dfn_data_lt_and_local_lt():
    html = (
        "<p><dfn id='x' data-lt='one|two' data-local-lt='Local.one' "
        "data-dfn-type='attribute' data-dfn-for='Foo'>ignored</dfn></p>"
    )
    d = ex.extract_dfns(batch_of(html)).to_pylist()[0]
    assert d["linking_text"] == ["one", "two"]
    assert d["local_linking_text"] == ["Local.one"]
    assert d["for"] == ["Foo"]
    assert d["access"] == "public"  # IDL types default exported


def test_dfn_informative_in_note_section():
    html = "<div class='note'><p><dfn id='n' data-dfn-type='dfn'>term</dfn></p></div>"
    d = ex.extract_dfns(batch_of(html)).to_pylist()[0]
    assert d["informative"] is True


def test_dfn_in_pre_defined_in():
    html = "<pre class='idl'>interface <dfn id='i' data-dfn-type='interface'>I</dfn> {};</pre>"
    d = ex.extract_dfns(batch_of(html)).to_pylist()[0]
    assert d["defined_in"] == "pre"


def test_dfn_first_wins_dedup():
    html = (
        "<p><dfn id='dup' data-dfn-type='dfn' data-export=''>first</dfn></p>"
        "<p><dfn id='dup' data-dfn-type='dfn'>second</dfn></p>"
    )
    rows = ex.extract_dfns(batch_of(html)).to_pylist()
    assert len(rows) == 1
    assert rows[0]["linking_text"] == ["first"]
    assert rows[0]["access"] == "public"


# -- typed CSS dfns (extractTypedDfns, extract-cssdfn.mjs:715-865) -----------


def test_css_typed_dfns():
    html = (
        "<p><dfn id='at-media' data-dfn-type='at-rule' data-export=''>@media</dfn>"
        " <dfn id='sel-hover' data-dfn-type='selector' data-export=''>:hover</dfn>"
        " <dfn id='typ-len' data-dfn-type='type' data-export=''>&lt;my-length&gt;</dfn></p>"
    )
    rows = ex.extract_css(batch_of(html)).to_pylist()
    by_cat = {}
    for r in rows:
        by_cat.setdefault(r["category"], []).append(json.loads(r["payload_json"]))
    assert by_cat["atrules"][0]["name"] == "@media"
    assert by_cat["atrules"][0]["href"] == f"{URL}#at-media"
    assert by_cat["selectors"][0]["name"] == ":hover"
    assert by_cat["values"][0]["name"] == "<my-length>"


# -- ids completeness inside wholesale-handled constructs --------------------


def test_ids_inside_ref_list():
    html = """
<h2>Normative references</h2>
<dl>
  <dt id="bib-dom">[dom]</dt>
  <dd><a href="https://dom.spec.whatwg.org/">DOM</a></dd>
</dl>"""
    hrefs = [r["href"] for r in ex.extract_ids(batch_of(html)).to_pylist()]
    assert f"{URL}#bib-dom" in hrefs


def test_ids_inside_propdef_table():
    html = """
<table class="propdef"><tbody>
  <tr id="rowid"><th>Name:</th><td><dfn data-dfn-type='property' data-export='' id='propdef-x'>x</dfn></td></tr>
  <tr><th>Value:</th><td>none</td></tr>
</tbody></table>"""
    hrefs = [r["href"] for r in ex.extract_ids(batch_of(html)).to_pylist()]
    assert f"{URL}#propdef-x" in hrefs
    assert f"{URL}#rowid" in hrefs


# -- heuristic unmarked-ol algorithms (lexicon, extract-algorithms.mjs) ------


def test_heuristic_ol_algorithm():
    html = """
<p>To <dfn id="compute-it">compute it</dfn>:</p>
<ol>
  <li>Let x be 1.</li>
  <li>Return x.</li>
</ol>"""
    rows = ex.extract_algorithms(batch_of(html)).to_pylist()
    assert len(rows) == 1
    a = rows[0]
    assert a["name"] == "compute it"
    assert a["rationale"] == "let"
    steps = json.loads(a["steps_json"])
    assert [s["html"] for s in steps["steps"]] == ["Let x be 1.", "Return x."]


def test_non_algorithm_ol_ignored():
    html = "<ol><li>Apples</li><li>Oranges</li></ol>"
    assert ex.extract_algorithms(batch_of(html)).to_pylist() == []


# -- extension events (isExtension, extract-events.mjs:486-488) --------------


def test_extension_event_flagged():
    html = """
<table>
  <thead><tr><th>Event type</th><th>Interface</th></tr></thead>
  <tbody><tr><th><a href="https://other.spec.example/#go">go</a></th><td>Event</td></tr></tbody>
</table>"""
    rows = ex.extract_events(batch_of(html)).to_pylist()
    assert len(rows) == 1
    assert rows[0]["is_extension"] is True
    assert rows[0]["href"] == "https://other.spec.example/#go"


# -- css in-doc duplicate merge (extract-cssdfn.mjs:558-607) -----------------


def test_css_duplicate_tables_merge():
    html = """
<table class="propdef"><tbody>
  <tr><th>Name:</th><td><dfn data-dfn-type='property' data-export='' id='propdef-x'>x</dfn></td></tr>
  <tr><th>Value:</th><td>a | b</td></tr>
</tbody></table>
<table class="propdef"><tbody>
  <tr><th>Name:</th><td>x</td></tr>
  <tr><th>Value:</th><td>c</td></tr>
  <tr><th>Initial:</th><td>a</td></tr>
</tbody></table>"""
    rows = ex.extract_css(batch_of(html)).to_pylist()
    props = [r for r in rows if r["category"] == "properties"]
    assert len(props) == 1  # not duplicated
    p = json.loads(props[0]["payload_json"])
    # two base definitions (both carry "value") cannot merge: the first
    # wins untouched and an Unmergeable-definition warning is recorded
    # (mergeDfns, extract-cssdfn.mjs:517-548)
    assert p["value"] == "a | b"
    assert "initial" not in p
    warns = [json.loads(r["payload_json"]) for r in rows
             if r["category"] == "warnings"]
    assert any(w["msg"] == "Unmergeable definition" for w in warns)


# -- RFC-style headings (extract-headings.mjs:23-38) -------------------------


def test_rfc_headings():
    html = """<pre><span class="h3"><a class="selflink" id="section-2.1" href="#section-2.1">2.1</a>.  Terminology Used</span>
some body text
</pre>"""
    rows = ex.extract_headings(batch_of(html)).to_pylist()
    assert len(rows) == 1
    h = rows[0]
    assert h["id"] == "section-2.1"
    assert h["number"] == "2.1"
    assert h["level"] == 2
    assert h["title"] == "Terminology Used"
    assert h["href"] == f"{URL}#section-2.1"


# -- versions set (completeWithAlternativeUrls, util.js:695-712) -------------


def test_complete_with_alternative_urls():
    from reffy_ray.sources.corpus import complete_with_alternative_urls

    seed = {
        "url": "https://www.w3.org/TR/WOFF2/",
        "release_url": "https://www.w3.org/TR/WOFF2/",
        "nightly_url": "https://w3c.github.io/woff/woff2/",
    }
    assert complete_with_alternative_urls(seed) == [
        "https://www.w3.org/TR/WOFF2/",
        "https://w3c.github.io/woff/woff2/",
    ]
    assert complete_with_alternative_urls(
        seed, {"https://www.w3.org/TR/WOFF2/": ["https://old.example/woff2"]}
    )[-1] == "https://old.example/woff2"


# -- CSS legacy dialects (extract-cssdfn.mjs:470-506, 927-968) ---------------


def css_of(html: str):
    from reffy_ray.stages.extract import extract_css
    import json as _json

    rows = extract_css(batch_of(html)).to_pylist()
    return {
        (r["category"], r["name"]): _json.loads(r["payload_json"]) for r in rows
    }


def test_css_dl_propdef_single():
    out = css_of(
        "<div class='propdef'><dl>"
        "<dt><dfn id='propdef-margin'>'margin'</dfn></dt>"
        "<dd><table><tr><td>Value:</td><td>&lt;margin-width&gt;{1,4}</td></tr>"
        "<tr><td>Initial:</td><td>see individual properties</td></tr>"
        "<tr><td>Inherited:</td><td>no</td></tr></table></dd>"
        "</dl></div>"
    )
    p = out[("properties", "margin")]
    assert p["href"] == f"{URL}#propdef-margin"
    assert p["value"] == "<margin-width>{1,4}"
    assert p["initial"] == "see individual properties"
    assert p["inherited"] == "no"


def test_css_dl_propdef_grouped_names():
    out = css_of(
        "<div class='propdef'><dl>"
        "<dt><dfn id='propdef-border-top-width'>'border-top-width'</dfn>, "
        "<dfn id='propdef-border-bottom-width'>'border-bottom-width'</dfn></dt>"
        "<dd><table><tr><td>Value:</td><td>&lt;border-width&gt;</td></tr>"
        "</table></dd></dl></div>"
    )
    assert out[("properties", "border-top-width")]["value"] == "<border-width>"
    assert out[("properties", "border-bottom-width")]["href"].endswith(
        "#propdef-border-bottom-width"
    )


def test_css_dl_a_name_anchor():
    out = css_of(
        "<div class='propdef'><dl>"
        "<dt><a name='propdef-clip'>'clip'</a></dt>"
        "<dd><table><tr><td>Value:</td><td>auto</td></tr></table></dd>"
        "</dl></div>"
    )
    assert out[("properties", "clip")]["href"] == f"{URL}#propdef-clip"


def test_css_dl_ignored_when_table_propdefs_exist():
    out = css_of(
        "<table class='propdef'>"
        "<tr><th>Name:</th><td><dfn id='propdef-gap' "
        "data-dfn-type='property'>gap</dfn></td></tr>"
        "<tr><th>Value:</th><td>normal</td></tr></table>"
        "<div class='propdef'><dl><dt><dfn id='propdef-old'>'old'</dfn></dt>"
        "<dd><table><tr><td>Value:</td><td>x</td></tr></table></dd></dl></div>"
    )
    assert ("properties", "gap") in out
    assert ("properties", "old") not in out


def test_css_legacy_alias_prose():
    out = css_of(
        "<p>The <dfn data-dfn-type='property' data-export='' "
        "id='propdef--webkit-flow-into'>-webkit-flow-into</dfn> property is a "
        "<a href='https://drafts.csswg.org/css-cascade-5/#legacy-name-alias'>"
        "legacy name alias</a> of <a data-link-type='property' "
        "href='#propdef-flow-into'>flow-into</a>.</p>"
    )
    p = out[("properties", "-webkit-flow-into")]
    assert p["legacyAliasOf"] == "flow-into"
    assert p["href"] == f"{URL}#propdef--webkit-flow-into"


def test_css_legacy_alias_compat_table():
    out = css_of(
        "<p>Some <a href='https://compat.example/#legacy-name-alias'>legacy "
        "name aliases</a> are defined below.</p>"
        "<table><thead><tr><th>Alias</th><th>Property</th></tr></thead>"
        "<tbody>"
        "<tr><td><dfn data-dfn-type='property' id='w-box-align'>"
        "-webkit-box-align</dfn></td>"
        "<td><a data-link-type='property' href='#align'>align-items</a></td></tr>"
        "<tr><td><dfn data-dfn-type='property' id='w-box-flex'>"
        "-webkit-box-flex</dfn></td>"
        "<td><a data-link-type='property' href='#grow'>flex-grow</a></td></tr>"
        "</tbody></table>"
    )
    assert out[("properties", "-webkit-box-align")]["legacyAliasOf"] == "align-items"
    assert out[("properties", "-webkit-box-flex")]["legacyAliasOf"] == "flex-grow"
