"""Parity tests for the spec-specific dfn preprocessors
(reference: src/browserlib/extract-dfns.mjs:312-332,387-1097 and the
matching cases in test/extract-dfns.js — fixtures re-authored, same
contracts)."""

import json

import pyarrow as pa

from reffy_ray.schemas import SPAN_STRUCT
from reffy_ray.stages.extract import extract_dfns
from reffy_ray.stages.parse import spans_from_html

URL = "about:blank"


def dfns_of(html: str, spec: str | None = None, pages=None):
    spans = spans_from_html(html, URL, pages=pages, shortname=spec)
    batch = pa.table(
        {
            "doc_id": pa.array(["d"]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array([URL]),
        }
    )
    return extract_dfns(batch).to_pylist()


def one(html: str, spec: str | None = None, **kw):
    rows = dfns_of(html, spec, **kw)
    assert len(rows) == 1, rows
    return rows[0]


# ---------------------------------------------------------------------------
# ecmascript
# ---------------------------------------------------------------------------


def test_es_namespace_object():
    d = one('<emu-clause id="sec-math-object"><h1>The Math Object</h1></emu-clause>',
            "ecmascript")
    assert d["id"] == "sec-math-object"
    assert d["linking_text"] == ["Math"]
    assert d["type"] == "namespace"
    assert d["access"] == "public"
    assert d["defined_in"] == "heading"
    assert d["heading"]["id"] == "sec-math-object"
    assert d["heading"]["title"] == "The Math Object"


def test_es_interface_object_with_constructor():
    rows = dfns_of(
        '<emu-clause id="sec-date-object"><h1>The Date Object</h1>'
        '<emu-clause id="sec-date-constructor"><h1>Date ( value )</h1>'
        "</emu-clause></emu-clause>",
        "ecmascript",
    )
    by_id = {r["id"]: r for r in rows}
    assert by_id["sec-date-object"]["type"] == "interface"
    # the inner "Date ( value )" heading is a constructor scoped to Date
    ctor = by_id["sec-date-constructor"]
    assert ctor["type"] == "constructor"
    assert ctor["for"] == ["Date"]
    assert ctor["linking_text"] == ["Date(value)"]


def test_es_irregular_object_id_exception():
    d = one(
        '<emu-clause id="sec-weak-ref-objects"><h1>The WeakRef Object</h1>'
        "</emu-clause>",
        "ecmascript",
    )
    assert d["linking_text"] == ["WeakRef"]
    assert d["type"] == "namespace"


def test_es_error_object():
    d = one(
        '<emu-clause id="sec-baderror-object"><h1>The BadError Object</h1>'
        "</emu-clause>",
        "ecmascript",
    )
    assert d["type"] == "exception"
    assert d["linking_text"] == ["BadError"]


def test_es_prototype_method():
    d = one(
        '<emu-clause id="sec-list.prototype.push"><h1>'
        '<span class="secnum">9.9.9</span> List.prototype.push ( ...vals )</h1>'
        "</emu-clause>",
        "ecmascript",
    )
    assert d["type"] == "method"
    assert d["for"] == ["List"]
    assert d["linking_text"] == ["push(...vals)"]
    assert d["heading"]["number"] == "9.9.9"


def test_es_prototype_getter_attribute():
    d = one(
        '<emu-clause id="sec-get-buf.prototype.size"><h1>get Buf.prototype.size</h1>'
        "</emu-clause>",
        "ecmascript",
    )
    assert d["type"] == "attribute"
    assert d["for"] == ["Buf"]
    assert d["linking_text"] == ["size"]


def test_es_global_value_property():
    d = one(
        '<emu-clause id="sec-value-properties-of-the-global-object">'
        "<h1>Value Properties of the Global Object</h1>"
        '<emu-clause id="gnan"><h1>NaN</h1></emu-clause></emu-clause>',
        "ecmascript",
    )
    assert d["id"] == "gnan"
    assert d["type"] == "attribute"
    assert d["for"] == ["globalThis"]


def test_es_scoped_method_and_const():
    rows = dfns_of(
        '<emu-clause id="sec-json.parse"><h1>JSON.parse ( text [ , reviver ] )</h1>'
        "</emu-clause>"
        '<emu-clause id="sec-num.max"><h1>Num.MAX</h1></emu-clause>',
        "ecmascript",
    )
    by_id = {r["id"]: r for r in rows}
    p = by_id["sec-json.parse"]
    assert p["type"] == "method" and p["for"] == ["JSON"]
    assert p["linking_text"] == ["parse(text, reviver)"]
    c = by_id["sec-num.max"]
    assert c["type"] == "const" and c["for"] == ["Num"]
    assert c["linking_text"] == ["MAX"]


def test_es_abstract_op_with_aoid():
    d = one(
        '<emu-clause id="sec-tofoo" aoid="ToFoo"><h1>'
        '<span class="secnum">7.1.1</span> ToFoo ( input [ , hint ] )</h1>'
        "</emu-clause>",
        "ecmascript",
    )
    assert d["type"] == "abstract-op"
    assert d["access"] == "public"
    assert d["linking_text"] == ["ToFoo", "ToFoo(input, hint)"]


def test_es_abstract_method_scope():
    rows = dfns_of(
        '<emu-clause id="list"><h1>Heading</h1><figure>'
        "<figcaption>Abstract Methods for <emu-xref>Scope</emu-xref></figcaption>"
        "<table><tbody><tr><td>DoThing ()</td></tr></tbody></table>"
        "</figure></emu-clause>"
        '<emu-clause id="defn"><h1>DoThing(arg)</h1></emu-clause>',
        "ecmascript",
    )
    d = next(r for r in rows if r["id"] == "defn")
    assert d["type"] == "abstract-op"
    assert d["for"] == ["Scope"]


def test_es_abstract_method_hierarchy_scope():
    rows = dfns_of(
        '<emu-clause id="list"><h1>Heading</h1><figure>'
        "<figcaption>Abstract Methods for <emu-xref>Scope</emu-xref></figcaption>"
        "<table><tbody><tr><td>DoThing ()</td></tr></tbody></table>"
        "</figure></emu-clause>"
        '<emu-clause id="abs"><h1>Scope</h1>'
        '<emu-clause id="conc"><h1>Concrete Scope</h1>'
        '<emu-clause id="defn"><h1>DoThing(arg)</h1></emu-clause>'
        "</emu-clause></emu-clause>",
        "ecmascript",
    )
    d = next(r for r in rows if r["id"] == "defn")
    assert d["for"] == ["Concrete Scope"]


def test_es_emu_eqn():
    rows = dfns_of(
        '<emu-clause id="c"><h1>heading</h1>'
        '<emu-eqn aoid="Calc" id="calc">calc</emu-eqn> is an op, but '
        '<emu-eqn aoid="msPerDay">msPerDay = 86400000</emu-eqn> is not'
        "</emu-clause>",
        "ecmascript",
    )
    assert len(rows) == 1
    assert rows[0]["id"] == "calc"
    assert rows[0]["type"] == "abstract-op"
    assert rows[0]["linking_text"] == ["Calc"]


def test_es_state_components():
    d = one(
        '<emu-clause id="ctx"><h1>Heading</h1><figure>'
        "<figcaption>State Components for Demo Execution Contexts</figcaption>"
        "<table><tbody><tr><td>Realm</td></tr></tbody></table>"
        "</figure></emu-clause>",
        "ecmascript",
    )
    assert d["id"] == "ctx"
    assert d["type"] == "dfn"
    assert d["for"] == ["Demo Execution Contexts"]
    assert d["access"] == "public"
    assert d["defined_in"] == "table"


def test_es_production_rule():
    d = one(
        '<emu-grammar type="definition">'
        '<emu-production name="ChoiceElement" id="prod-choice">x</emu-production>'
        "</emu-grammar>",
        "ecmascript",
    )
    assert d["id"] == "prod-choice"
    assert d["linking_text"] == ["ChoiceElement"]
    assert d["type"] == "grammar"
    assert d["access"] == "private"


def test_es_annex_b_production_scoped():
    d = one(
        '<section data-reffy-page="https://example.org/'
        'additional-ecmascript-features-for-web-browsers.html">'
        '<emu-grammar type="definition">'
        '<emu-production name="ChoiceElement" id="prod-choice">x</emu-production>'
        "</emu-grammar></section>",
        "ecmascript",
    )
    assert d["for"] == ["Web browsers"]
    assert d["href"].endswith(
        "additional-ecmascript-features-for-web-browsers.html#prod-choice"
    )


def test_es_generic_dfn_gets_clause_id_and_variants():
    d = one(
        '<emu-clause id="clause"><h1><span class="secnum">9.4</span> Frame Stacks'
        '</h1><p>A <dfn variants="frame stacks">frame stack</dfn> tracks frames.'
        "</p></emu-clause>",
        "ecmascript",
    )
    assert d["id"] == "clause"
    assert d["linking_text"] == ["frame stack", "frame stacks"]
    assert d["for"] == ["ECMAScript"]
    assert d["access"] == "public"
    assert d["heading"]["number"] == "9.4"


def test_es_conformance_page_dfn_ignored():
    rows = dfns_of(
        '<section data-reffy-page="https://example.org/conformance.html">'
        "<dfn id='x'>Term</dfn></section>",
        "ecmascript",
    )
    assert rows == []


# ---------------------------------------------------------------------------
# html
# ---------------------------------------------------------------------------


def test_html_heading_id_copied_to_dfn():
    d = one(
        '<h6 id="parsing-mode"><span class="secno">12.2</span> The '
        '"<dfn data-noexport>in demo</dfn>" insertion mode</h6>',
        "html",
    )
    assert d["id"] == "parsing-mode"
    assert d["linking_text"] == ["in demo"]
    assert d["access"] == "private"
    assert d["defined_in"] == "heading"
    assert d["heading"]["number"] == "12.2"


def test_html_annotated_heading_is_dfn():
    d = one(
        '<h4 id="movable-objects" data-lt="movable object" data-export="">'
        '<span class="secno">2.7</span> <dfn>Movable objects</dfn></h4>',
        "html",
    )
    assert d["id"] == "movable-objects"
    assert d["linking_text"] == ["movable object"]
    assert d["access"] == "public"
    assert d["defined_in"] == "heading"
    assert d["heading"]["title"] == "Movable objects"


def test_html_imported_dfn_ignored():
    rows = dfns_of(
        '<li>The <dfn id="req"><a href="https://other.example/#req">'
        "<code>Request</code></a></dfn> interface</li>",
        "html",
    )
    assert rows == []


def test_css2_vendor_keyword_link_exception_kept():
    d = one(
        "<p>Reserves a <dfn data-dfn-type='dfn' data-export='' id='pfx'>"
        '<a href="https://www.w3.org/TR/CSS2/syndata.html#vendor-keywords">'
        "prefixed syntax</a></dfn>.</p>"
    )
    assert d["id"] == "pfx"
    assert d["access"] == "public"


# ---------------------------------------------------------------------------
# CSS2
# ---------------------------------------------------------------------------


def test_css2_index_def_span():
    d = one(
        '<p>A <span class="index-def" title="combinator"><a name="c1">combinator'
        "</a></span> joins selectors.</p>",
        "CSS2",
    )
    assert d["id"] == "c1"
    assert d["linking_text"] == ["combinator"]
    assert d["access"] == "public"


def test_css2_index_def_inside_anchor():
    d = one(
        '<p>A <a name="c1"><span class="index-def" title="combinator">'
        "<dfn>combinator</dfn></span></a> joins selectors.</p>",
        "CSS2",
    )
    assert d["id"] == "c1"
    assert d["linking_text"] == ["combinator"]


def test_css2_propdef_title_type_and_quote_strip():
    d = one(
        '<dl><dt><span class="index-def" title="\'margin\'">'
        '<a name="propdef-margin" class="propdef-title"><strong>margin</strong>'
        "</a></span></dt><dd>Blah</dd></dl>",
        "CSS2",
    )
    assert d["id"] == "propdef-margin"
    assert d["type"] == "property"
    assert d["linking_text"] == ["margin"]
    assert d["defined_in"] == "dt"


def test_css2_value_def_and_type():
    rows = dfns_of(
        '<span class="index-def"><a name="v1" class="value-def">thick</a></span>'
        '<p><span class="index-def"><a name="t1" class="value-def">&lt;angle&gt;'
        "</a></span></p>",
        "CSS2",
    )
    by_id = {r["id"]: r for r in rows}
    assert by_id["v1"]["type"] == "value"
    assert by_id["t1"]["type"] == "type"
    assert by_id["t1"]["linking_text"] == ["<angle>"]


def test_css2_definition_of_suffix_stripped():
    d = one(
        '<dl><dt><span class="index-def" title="<angle>::definition of">'
        '<a name="t1" class="value-def">&lt;angle&gt;</a></span></dt>'
        "<dd>Blah</dd></dl>",
        "CSS2",
    )
    assert d["linking_text"] == ["<angle>"]
    assert d["type"] == "type"


# ---------------------------------------------------------------------------
# SVG2
# ---------------------------------------------------------------------------

SVG2_BASE = """
<pre class=idl>
interface DemoList {
  readonly attribute unsigned long size;
  void reset();
  Type insert(Type newItem);
};
[Exposed=Window]
interface SVGDemoInterface {
};
</pre>
<div data-reffy-page='https://example.org/attindex.html'><table>
<tr><th><span class="attr-name"><a href="struct.html#DemoAttr"><span>demoAttr</span></a></span></th>
<td><span class="element-name"><a href="s.html#R"><span>rect</span></a></span>,
<span class="element-name"><a href="s.html#C"><span>circle</span></a></span></td><td></td></tr>
<tr><th><span class="attr-name"><a href="p.html#GridUnitsAttr"><span>gridUnits</span></a></span></th>
<td><span class="element-name"><a href="p.html#GridEl"><span>grid</span></a></span></td><td>✓</td></tr>
</table></div>
<div data-reffy-page='https://example.org/propidx.html'><table>
<tr><th><a class="property" href="x.html#FillTintProperty">fill-tint</a></th>
<td><span class="element-name">‘<a href="x.html#StopEl"><span>stop</span></a>’</span></td></tr>
</table></div>
"""


def test_svg2_attrdef_table():
    rows = dfns_of(
        SVG2_BASE
        + '<table class="attrdef def"><tr><td>'
        '<dfn id="DemoAttr">demoAttr</dfn></td><td>stuff</td></tr></table>',
        "SVG2",
    )
    d = next(r for r in rows if r["id"] == "DemoAttr")
    assert d["type"] == "element-attr"
    assert d["for"] == ["rect", "circle"]
    assert d["access"] == "public"


def test_svg2_adef_dt():
    rows = dfns_of(
        SVG2_BASE + '<dt id="GridUnitsAttr"><span class="adef">gridUnits</span></dt>',
        "SVG2",
    )
    d = next(r for r in rows if r["id"] == "GridUnitsAttr")
    assert d["type"] == "element-attr"
    assert d["for"] == ["grid"]
    assert d["linking_text"] == ["gridUnits"]
    assert d["defined_in"] == "dt"


def test_svg2_propdef_dt():
    rows = dfns_of(
        SVG2_BASE
        + '<dt id="FillTintProperty">‘<span class="propdef-title property">'
        "fill-tint</span>’</dt>",
        "SVG2",
    )
    d = next(r for r in rows if r["id"] == "FillTintProperty")
    assert d["type"] == "property"
    assert d["for"] == ["stop"]
    assert d["linking_text"] == ["fill-tint"]


def test_svg2_b_idl_members():
    rows = dfns_of(
        SVG2_BASE
        + '<p>The <b id="__svg__DemoList__size">size</b> IDL attribute.</p>'
        '<p>The <b id="__svg__DemoList__insert">insert</b> method.</p>',
        "SVG2",
    )
    by_id = {r["id"]: r for r in rows}
    assert by_id["__svg__DemoList__size"]["type"] == "attribute"
    assert by_id["__svg__DemoList__size"]["for"] == ["DemoList"]
    assert by_id["__svg__DemoList__insert"]["type"] == "method"


def test_svg2_interface_heading():
    rows = dfns_of(
        SVG2_BASE
        + '<h3 id="InterfaceSVGDemoInterface" class="heading">4.6. Interface '
        'SVGDemoInterface<a class="self-link" href="#InterfaceSVGDemoInterface">'
        "</a></h3>",
        "SVG2",
    )
    d = next(r for r in rows if r["id"] == "InterfaceSVGDemoInterface")
    assert d["type"] == "interface"
    assert d["linking_text"] == ["SVGDemoInterface"]
    assert d["defined_in"] == "heading"


def test_svg2_link_element_heading():
    rows = dfns_of(
        SVG2_BASE
        + '<h2 id="LinkElement" class="heading">6.3. External style sheets: the '
        'HTML <span class="element-name">‘link’</span> element</h2>',
        "SVG2",
    )
    d = next(r for r in rows if r["id"] == "LinkElement")
    assert d["type"] == "element"
    assert d["linking_text"] == ["link"]


# ---------------------------------------------------------------------------
# rfc8610
# ---------------------------------------------------------------------------


def test_rfc8610_prelude_types():
    html = (
        '<pre class="newpage">Appendix D.  Standard Prelude\n'
        '   <a id="appendix-d">x</a>\n'
        "   any = #\n"
        "   uint = #0\n"
        "   tstr = #3\n"
        "         Figure 14: CDDL Prelude\n</pre>"
    )
    d = one(html, "rfc8610")
    assert d["id"] == "appendix-d"
    assert d["type"] == "cddl-type"
    assert d["linking_text"] == ["any", "uint", "tstr"]
    assert d["access"] == "public"


# ---------------------------------------------------------------------------
# webgl1
# ---------------------------------------------------------------------------

WEBGL1_BASE = """
<pre class=idl>
interface mixin DemoContextBase {
  attribute DemoColorSpace packColorSpace;
};
interface mixin DemoContextOverloads {
  undefined blit(GLenum target, GLint level);
  undefined blit(GLenum target); // May throw
};
</pre>
"""


def test_webgl1_attribute_anchor():
    rows = dfns_of(
        WEBGL1_BASE
        + '<p><code class="attribute-name">'
        '<a id="DOM-DemoContext-packColorSpace">packColorSpace</a></code>'
        " of type <code>DemoColorSpace</code></p>",
        "webgl1",
    )
    d = next(r for r in rows if r["id"] == "DOM-DemoContext-packColorSpace")
    assert d["type"] == "attribute"
    assert d["for"] == ["DemoContextBase"]
    assert d["linking_text"] == ["packColorSpace"]


def test_webgl1_overloaded_methods():
    rows = dfns_of(
        WEBGL1_BASE
        + '<dl class="methods">'
        '<dt class="idl-code"><a name="BLIT2">void blit</a>(GLenum target, '
        "GLint level)</dt>"
        '<dt><p class="idl-code"><a name="BLIT1">void blit</a>(GLenum target)'
        " /* May throw */</p></dt><dd></dd></dl>",
        "webgl1",
    )
    by_id = {r["id"]: r for r in rows}
    assert by_id["BLIT2"]["linking_text"] == ["blit(target, level)"]
    assert by_id["BLIT2"]["for"] == ["DemoContextOverloads"]
    assert by_id["BLIT1"]["linking_text"] == ["blit(target)"]
    assert by_id["BLIT1"]["type"] == "method"


# ---------------------------------------------------------------------------
# .domintro dev links
# ---------------------------------------------------------------------------


def test_domintro_dev_link_attached():
    rows = dfns_of(
        "<p><dfn id='foo' data-dfn-type='dfn'>Foo</dfn></p>"
        '<div class="domintro"><dl>'
        '<dt><a id="foo-dev" href="#foo">Foo</a></dt><dd>Blah</dd>'
        "</dl></div>"
    )
    assert len(rows) == 1
    links = json.loads(rows[0]["links"])
    assert links == [
        {
            "type": "dev",
            "id": "foo-dev",
            "name": "Foo",
            "href": "about:blank#foo-dev",
            "heading": {"id": None, "href": "about:blank", "title": "",
                        "number": None},
        }
    ]


def test_domintro_dev_link_heading_from_section():
    rows = dfns_of(
        "<p><dfn id='foo' data-dfn-type='interface' data-lt='Fou'>Foo</dfn></p>"
        '<section id="foo-sec"><h3>Foo section</h3>'
        '<dl class="domintro">'
        '<dt>Fou . C . <a id="foo-dev" href="#foo">Foo</a></dt><dd>Blah</dd>'
        "</dl></section>"
    )
    assert len(rows) == 1
    assert rows[0]["access"] == "public"
    links = json.loads(rows[0]["links"])
    assert len(links) == 1
    assert links[0]["name"] == "Fou . C . Foo"
    assert links[0]["heading"]["id"] == "foo-sec"
    assert links[0]["heading"]["title"] == "Foo section"


def test_domintro_with_dfn_not_a_dev_link():
    rows = dfns_of(
        "<p><dfn id='foo' data-dfn-type='dfn'>Foo</dfn></p>"
        '<dl class="domintro"><dt>'
        "<dfn id='bar' data-dfn-type='dfn'>Bar</dfn>"
        '<a id="foo-dev" href="#foo">Foo</a></dt><dd>Blah</dd></dl>'
    )
    by_id = {r["id"]: r for r in rows}
    assert json.loads(by_id["foo"]["links"]) == []
    assert by_id["bar"]["defined_in"] == "dt"


# ---------------------------------------------------------------------------
# misc contracts that ride along with the preprocessor plumbing
# ---------------------------------------------------------------------------


def test_heading_dfn_skips_section_number():
    d = one(
        '<section><div class="header-wrapper">'
        '<h3 id="oneweb" data-dfn-type="dfn"><bdi class="secno">2.1 </bdi>'
        "There is one web</h3></div></section>"
    )
    assert d["id"] == "oneweb"
    assert d["linking_text"] == ["There is one web"]
    assert d["heading"]["number"] == "2.1"
    assert d["defined_in"] == "heading"


def test_no_dfn_model_means_public():
    d = one("<p><dfn id='foo'>Foo</dfn> is public in old specs.</p>")
    assert d["access"] == "public"


def test_cddl_type_stays_private():
    d = one("<p><dfn id='foo' data-dfn-type='cddl-type'>Foo</dfn>.</p>")
    assert d["type"] == "cddl-type"
    assert d["access"] == "private"


# ---------------------------------------------------------------------------
# htmlProse from [data-defines] (getHtmlProseDefinition)
# ---------------------------------------------------------------------------


def test_html_prose_simple():
    d = one(
        "<p data-defines='#foo'>\n"
        "  <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> enters a bar.\n"
        "</p>"
    )
    assert d["html_prose"] == "<dfn>Foo</dfn> enters a bar."


def test_html_prose_keeps_structure_and_useful_attrs():
    d = one(
        "<p data-defines='#foo'>\n"
        "  <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> <i dir=\"ltr\">enters</i>"
        " a <a lang=\"en\" title=\"Ze ol' tavern\">bar</a>.\n"
        "</p>"
    )
    assert d["html_prose"] == (
        '<dfn>Foo</dfn> <i dir="ltr">enters</i> a '
        '<a lang="en" title="Ze ol\' tavern">bar</a>.'
    )


def test_html_prose_absolutizes_href():
    d = one(
        "<p data-defines='#foo'>\n"
        "  <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> enters a "
        '<a href="#bar">bar</a>.\n'
        "</p>"
    )
    assert d["html_prose"] == '<dfn>Foo</dfn> enters a <a href="about:blank#bar">bar</a>.'


def test_html_prose_strips_attrs_asides_and_complex_structure():
    d = one(
        "<div data-defines='#foo'>\n"
        "  <dfn id='foo' data-dfn-type='dfn'>Foo</dfn> "
        '<i class="verb">enters</i> a <a hidden tabindex="2">bar</a>.\n'
        "  <aside><p>I'm an aside</p></aside>\n"
        "  <p class='mdn-anno'>So am I</p>\n"
        "  <div id='dfn-panel-foo'>refs</div>\n"
        "  <section><h4>Inner</h4></section>\n"
        '  <img src="bar.png" alt="A bar">\n'
        "</div>"
    )
    assert "<dfn>Foo</dfn> <i>enters</i> a <a>bar</a>." in d["html_prose"]
    assert "aside" not in d["html_prose"]
    assert "So am I" not in d["html_prose"]
    assert "refs" not in d["html_prose"]
    assert "Inner" not in d["html_prose"]
    assert "img" not in d["html_prose"]


def test_html_prose_absent_without_data_defines():
    d = one("<p><dfn id='foo' data-dfn-type='dfn'>Foo</dfn> enters a bar.</p>")
    assert d["html_prose"] is None
