"""Parity tests for the three elements dialects
(reference: src/browserlib/extract-elements.mjs + test/extract-elements.js
cases, fixtures re-authored)."""

import pyarrow as pa

from reffy_ray.schemas import SPAN_STRUCT
from reffy_ray.stages.extract import extract_elements
from reffy_ray.stages.parse import spans_from_html

URL = "about:blank"


def elements_of(html: str, spec: str | None = None):
    spans = spans_from_html(html, URL, shortname=spec)
    batch = pa.table(
        {
            "doc_id": pa.array(["d"]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array([URL]),
        }
    )
    return extract_elements(batch).to_pylist()


def test_html_element_own_interface_idl():
    rows = elements_of(
        '<h4 id="the-q-element"><span class="secno">4.4</span> The '
        '<dfn id="the-q"><code>q</code></dfn> element</h4>'
        '<dl class="element">'
        "<dt><a href='dom.html#x'>DOM interface</a>:</dt>"
        '<dd><pre><code class="idl">[Exposed=Window]\n'
        'interface <dfn id="htmlquoteelement" data-dfn-type="interface">'
        "HTMLQuoteElement</dfn> : HTMLElement {};</code></pre></dd></dl>",
        "html",
    )
    assert rows == [
        {"doc_id": "d", "name": "q", "href": "about:blank#the-q",
         "interface": "HTMLQuoteElement"}
    ]


def test_html_element_uses_prose():
    rows = elements_of(
        '<h4 id="the-tfoot-element">The <dfn id="tfoot"><code>tfoot</code></dfn>'
        " element</h4>"
        '<dl class="element"><dt>DOM interface:</dt>'
        "<dd>Uses <code><a href='#x'>HTMLTableSectionElement</a></code>, as "
        "defined for <code>tbody</code> elements.</dd></dl>",
        "html",
    )
    assert rows[0]["name"] == "tfoot"
    assert rows[0]["interface"] == "HTMLTableSectionElement"
    assert rows[0]["href"] == "about:blank#tfoot"


def test_html_grouped_elements():
    rows = elements_of(
        '<h4 id="group">The <dfn id="the-sub" data-dfn-type="element">'
        '<code>sub</code></dfn> and <dfn id="the-sup" data-dfn-type="element">'
        "<code>sup</code></dfn> elements</h4>"
        '<dl class="element"><dt>DOM interface:</dt>'
        "<dd>Use <code>HTMLElement</code>.</dd></dl>",
        "html",
    )
    assert [(r["name"], r["href"], r["interface"]) for r in rows] == [
        ("sub", "about:blank#the-sub", "HTMLElement"),
        ("sup", "about:blank#the-sup", "HTMLElement"),
    ]


def test_html_common_behaviours_skipped():
    rows = elements_of(
        '<h2 id="mix">2. Common Behaviours Of The Demo Elements: '
        '<code class="idl">InPageMixin</code></h2>'
        '<dl class="element"><dt>DOM interface:</dt>'
        '<dd><pre class="idl">interface mixin '
        '<dfn data-dfn-type="interface" data-export="" id="inpagemixin">'
        "<code>InPageMixin</code></dfn> {};</pre></dd></dl>",
        "permission-elements",
    )
    assert rows == []


def test_html_element_qualified_idl_link():
    rows = elements_of(
        '<h2 id="geo-el">5. The <dfn data-dfn-type="element" data-export="" '
        'id="elementdef-geolocation"><code>geolocation</code></dfn> Element</h2>'
        '<dl class="element"><dt><a data-link-type="dfn" href="https://html.example/'
        '#concept-element-dom">DOM interface</a>: </dt>'
        '<dd><code class="idl"><a data-link-type="idl" href="#htmlgeolocationelement">'
        "HTMLGeolocationElement</a></code></dd></dl>",
        "permission-elements",
    )
    assert rows == [
        {"doc_id": "d", "name": "geolocation",
         "href": "about:blank#elementdef-geolocation",
         "interface": "HTMLGeolocationElement"}
    ]


def test_svg_element_summary():
    rows = elements_of(
        '<div class="element-summary"><div class="element-summary-name">'
        '<span class="element-name">‘<dfn data-dfn-type="element" data-export="" '
        'id="elementdef-animate">animate</dfn>’</span></div><dl>'
        "<dt>Categories:</dt><dd><a href='#TermAnimationElement'>Animation</a></dd>"
        "<dt>DOM Interfaces:</dt>"
        '<dd><ul class="no-bullets"><li><a class="idlinterface" '
        'href="#InterfaceSVGAnimateElement">SVGAnimateElement</a></li></ul></dd>'
        "</dl></div>",
        "SVG2",
    )
    assert rows == [
        {"doc_id": "d", "name": "animate",
         "href": "about:blank#elementdef-animate",
         "interface": "SVGAnimateElement"}
    ]


def test_svg_element_summary_no_interface():
    rows = elements_of(
        '<div class="element-summary"><div class="element-summary-name">'
        '<span class="element-name">‘<dfn data-dfn-type="element" data-export="" '
        'id="elementdef-discard">discard</dfn>’</span></div><dl>'
        "<dt>DOM Interfaces:</dt>"
        '<dd><ul class="no-bullets"></ul></dd></dl></div>',
        "SVG2",
    )
    assert rows == [
        {"doc_id": "d", "name": "discard",
         "href": "about:blank#elementdef-discard", "interface": None}
    ]


def test_svg_element_summary_svg11_heading_anchor():
    rows = elements_of(
        '<h3 id="RectElementHeading">The rect element</h3>'
        '<div class="element-summary"><div class="element-summary-name">'
        '<span class="element-name">‘rect’</span></div><dl>'
        "<dt>DOM Interfaces:</dt><dd>SVGRectElement</dd></dl></div>",
        "SVG2",
    )
    assert rows == [
        {"doc_id": "d", "name": "rect",
         "href": "about:blank#RectElementHeading",
         "interface": "SVGRectElement"}
    ]


def test_svg_definition_table():
    rows = elements_of(
        '<table class="definition-table"><tbody>'
        "<tr><th>Name:</th><td><dfn class='dfn-paneled' data-dfn-type='element' "
        "data-export='' id='elementdef-feblend'><code>feBlend</code></dfn></td></tr>"
        "<tr><th>Categories:</th><td><a href='#fp'>filter primitive</a></td></tr>"
        "<tr><th>DOM Interfaces:</th><td><a class='idlinterface' "
        "href='#InterfaceSVGFEBlendElement'>SVGFEBlendElement</a></td></tr>"
        "</tbody></table>",
        "SVG2",
    )
    assert rows == [
        {"doc_id": "d", "name": "feBlend",
         "href": "about:blank#elementdef-feblend",
         "interface": "SVGFEBlendElement"}
    ]


def test_mathml_element_dfn_contract():
    rows = elements_of(
        '<p>The <dfn id="mmm" data-dfn-type="element">mmm</dfn> element is a '
        "MathML element.</p>",
        "mathml-core",
    )
    assert rows == [
        {"doc_id": "d", "name": "mmm", "href": "about:blank#mmm",
         "interface": "MathMLElement"}
    ]


def test_dfn_contract_interface_match():
    rows = elements_of(
        '<p>The <dfn id="portal" data-dfn-type="element">portal</dfn> element '
        'uses the <dfn data-dfn-type="interface">HTMLPortalElement</dfn> '
        "interface.</p>",
        "portals",
    )
    assert rows == [
        {"doc_id": "d", "name": "portal", "href": "about:blank#portal",
         "interface": "HTMLPortalElement"}
    ]


def test_html_dialect_wins_over_dfn_contract():
    rows = elements_of(
        '<h4 id="h">The <dfn id="the-x" data-dfn-type="element">x</dfn> element'
        "</h4>"
        '<dl class="element"><dt>DOM interface:</dt>'
        "<dd><code>HTMLXElement</code></dd></dl>"
        '<p>Another <dfn id="stray" data-dfn-type="element">stray</dfn> element'
        "</p>",
        "html",
    )
    assert [(r["name"], r["interface"]) for r in rows] == [("x", "HTMLXElement")]
