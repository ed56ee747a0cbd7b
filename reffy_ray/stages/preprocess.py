"""Spec-specific DOM preprocessing passes for the dfns extractor.

Port of the reference's six shortname-keyed preprocessors
(reference: src/browserlib/extract-dfns.mjs:419-1097 — ecmascript,
html, CSS2, SVG2, rfc8610, webgl1). Each pass mutates the parsed
htmldom tree *before* the span walk so that the generic dfn contract
(dfn[id] + annotated headings) applies afterwards, exactly like the
reference mutates the live DOM before running its dfn selector.

Entry point: ``preprocess_spec(shortname, pages)`` where ``pages`` is
``[(page_url, root_node)]`` for the merged multi-page document.
"""

from __future__ import annotations

import re

from .htmldom import Node

# ---------------------------------------------------------------------------
# tree-manipulation helpers
# ---------------------------------------------------------------------------


def _norm(text: str) -> str:
    return " ".join(text.split()).replace("−", "-")


def _find_all(root: Node, pred):
    return [n for n in root.iter() if pred(n)]


def _find_by_id(pages, node_id: str) -> Node | None:
    for _, root in pages:
        for n in root.iter():
            if n.id == node_id:
                return n
    return None


def _new_node(tag: str, attrs: dict | None = None) -> Node:
    return Node(tag, dict(attrs or {}))


def _replace_with(old: Node, new: Node) -> None:
    p = old.parent
    if p is None:
        return
    new.parent = p
    p.children[p.children.index(old)] = new


def _move_children(src: Node, dst: Node) -> None:
    dst.children.extend(src.children)
    for c in src.children:
        if isinstance(c, Node):
            c.parent = dst
    src.children = []


def wrap_with_dfn(el: Node) -> Node:
    """extract-dfns.mjs wrapWithDfn: move el's children into a new
    <dfn> appended to el; dfn takes the *parent*'s id (and aoid)."""
    dfn = Node("dfn", {}, el)
    _move_children(el, dfn)
    el.children.append(dfn)
    parent = el.parent
    if parent is not None and parent.id:
        dfn.attrs["id"] = parent.id
    if parent is not None and parent.get("aoid") is not None:
        dfn.attrs["aoid"] = parent.get("aoid")
    return dfn


def _clean_method_name(name: str) -> str:
    """Strip optional-arg brackets and normalize parens/commas
    (extract-dfns.mjs cleanMethodName)."""
    name = name.replace("[", "").replace("]", "")
    name = re.sub(r" \( *", "(", name)
    name = re.sub(r" *\)", ")", name)
    name = re.sub(r" *,", ",", name)
    return name


def _page_of(node: Node, default: str) -> str:
    anc = node.closest(lambda a: a.get("data-reffy-page") is not None)
    return anc.get("data-reffy-page") if anc is not None else default


# ---------------------------------------------------------------------------
# HTML spec (extract-dfns.mjs:809-820)
# ---------------------------------------------------------------------------

_DFN_DATA_ATTRS = (
    "data-dfn-type", "data-dfn-for", "data-export", "data-noexport", "data-lt",
)


def preprocess_html(pages) -> None:
    """Copy a heading's id onto its inner <dfn> when the heading is not
    itself dfn-annotated (preProcessHTML)."""
    for _, root in pages:
        for h in root.iter():
            if h.tag not in ("h2", "h3", "h4", "h5", "h6") or not h.id:
                continue
            if any(h.get(a) is not None for a in _DFN_DATA_ATTRS):
                continue
            for d in h.find_all("dfn"):
                if not d.id:
                    d.attrs["id"] = h.id


# ---------------------------------------------------------------------------
# CSS 2.1 (extract-dfns.mjs:830-885)
# ---------------------------------------------------------------------------


def preprocess_css2(pages) -> None:
    for _, root in pages:
        spans = _find_all(root, lambda n: n.tag == "span" and "index-def" in n.classes)
        for span in spans:
            anchor = next(
                (a for a in span.iter() if a.tag == "a" and a.get("name")), None
            ) or span.closest(lambda a: a.tag == "a" and a.get("name") is not None)
            if anchor is None:
                continue
            dfn = span.first("dfn") or span.closest(lambda a: a.tag == "dfn")
            if dfn is not None and dfn.id:
                continue
            if dfn is None:
                dfn = Node("dfn", {}, span)
                _move_children(span, dfn)
                span.children.append(dfn)
            dfn.attrs["id"] = anchor.get("name")
            dfn.attrs["data-export"] = ""
            raw = span.get("title") or dfn.norm_text()
            lts = []
            for text in raw.split("|"):
                text = _norm(text)
                text = re.sub(r"::definition of$", "", text)
                text = re.sub(r", definition of$", "", text)
                text = re.sub(r"^'(.*)'$", r"\1", text)
                if text not in lts:
                    lts.append(text)
            dfn.attrs["data-lt"] = "|".join(lts)
            anchor_cls = anchor.get("class") or ""
            dfn_type = None
            if anchor_cls == "propdef-title":
                dfn_type = "property"
            elif anchor_cls == "value-def":
                dfn_type = "type" if re.match(r"^<.*>$", dfn.get("data-lt")) else "value"
            if dfn_type:
                dfn.attrs["data-dfn-type"] = dfn_type


# ---------------------------------------------------------------------------
# ECMAScript (extract-dfns.mjs:419-807)
# ---------------------------------------------------------------------------

_ES_SECTION_NUMBER = re.compile(r"^([A-Z]\.)?[0-9.]+ ")
_ES_SCOPED_NAME = re.compile(r"^[a-z0-9]+\.[a-z0-9]+", re.I)
_ES_METHOD_NAME = re.compile(r"^([a-z0-9]+)+ *\(", re.I)
_ES_ABSTRACT_OP = re.compile(r"^[A-Z][a-zA-Z0-9]+ *\(")


def _not_legacy(n: Node) -> bool:
    return n.closest(lambda a: a.get("legacy") is not None) is None


def preprocess_ecmascript(pages) -> None:
    definition_names: set[str] = set()
    idl_types: dict[str, str] = {}

    # abstract methods (scoped abstract ops) from figure captions
    abstract_methods: dict[str, str] = {}
    for _, root in pages:
        for figcaption in _find_all(root, lambda n: n.tag == "figcaption"):
            if not re.search(r"(abstract|additional) method", figcaption.text(), re.I):
                continue
            figure = figcaption.parent
            if figure is None or figure.first("emu-xref") is None:
                continue
            xref = figcaption.first("emu-xref")
            if xref is None:
                continue
            scope = xref.norm_text()
            if scope.endswith("Environment Records"):
                scope = "Environment Records"
            tbody = figure.first("tbody") or figure.first("table")
            if tbody is None:
                continue
            for tr in tbody.find_all("tr"):
                td = tr.first("td")
                if td is None:
                    continue
                method_name = td.norm_text().split("(")[0].strip()
                abstract_methods[method_name] = scope

    # h1 pass
    for page_url, root in pages:
        for el in _find_all(root, lambda n: n.tag == "h1"):
            if not _not_legacy(el):
                continue
            dfn_name = _ES_SECTION_NUMBER.sub("", el.norm_text()).strip()
            dfn_id = el.parent.id if el.parent is not None else ""
            if re.search(r"-objects?$", dfn_id) and re.search(r" Objects?$", dfn_name):
                not_object_ids = (
                    "sec-global-object", "sec-fundamental-objects",
                    "sec-waiterlist-objects",
                )
                if dfn_id in not_object_ids:
                    continue
                objects_ids_exceptions = (
                    "sec-regexp-regular-expression-objects", "sec-weak-ref-objects",
                    "sec-aggregate-error-objects", "sec-finalization-registry-objects",
                    "sec-async-function-objects",
                )
                if not re.search(r"sec-[a-z]+-objects?", dfn_id) and (
                    dfn_id not in objects_ids_exceptions
                ):
                    continue
                dfn = wrap_with_dfn(el)
                dfn_name = re.sub(r"^The ", "", dfn_name)
                dfn_name = re.sub(r" Objects?$", "", dfn_name)
                dfn_name = re.sub(r" \([^)]*\)", "", dfn_name)
                dfn.attrs["data-lt"] = dfn_name
                if dfn_name in ("Promise", "DataView", "ArrayBuffer"):
                    dfn.attrs["data-noexport"] = ""
                if re.match(r"^[A-Z]", dfn_name):
                    parent = el.parent
                    has_ctor = parent is not None and any(
                        d.id.endswith("constructor") for d in parent.iter() if d.id
                    )
                    if re.search(r"Error$", dfn_name):
                        dfn.attrs["data-dfn-type"] = "exception"
                    elif not has_ctor:
                        dfn.attrs["data-dfn-type"] = "namespace"
                    else:
                        dfn.attrs["data-dfn-type"] = "interface"
                    idl_types[dfn_name] = dfn.attrs["data-dfn-type"]
                definition_names.add(dfn_name)
            elif re.search(r"-[a-z]+error$", dfn_id) and "(" not in dfn_name:
                dfn = wrap_with_dfn(el)
                dfn.attrs["data-lt"] = dfn_name
                dfn.attrs["data-dfn-type"] = "exception"
                definition_names.add(dfn_name)
                idl_types[dfn_name] = "exception"
            elif re.search(r"[-.]prototype[-.]", dfn_id):
                if "(" not in dfn_name and (
                    " " in dfn_name and not re.match(r"^[gs]et ", dfn_name)
                ):
                    continue
                if "[[" in dfn_name:
                    continue
                if "@@" in dfn_name:
                    continue
                if dfn_name.endswith(".constructor"):
                    continue
                dfn = wrap_with_dfn(el)
                dfn.attrs["data-dfn-for"] = re.sub(
                    r"^[gs]et ", "", re.sub(r"\.prototype\..*", "", dfn_name)
                )
                dfn_name = re.sub(r".*\.prototype\.", "", dfn_name)
                if "(" in dfn_name:
                    dfn_name = _clean_method_name(dfn_name)
                    dfn.attrs["data-dfn-type"] = "method"
                else:
                    dfn.attrs["data-dfn-type"] = "attribute"
                dfn.attrs["data-lt"] = dfn_name
            elif el.closest(
                lambda a: a.id == "sec-value-properties-of-the-global-object"
            ) is not None:
                # reference compares el.id against a '#'-prefixed string,
                # which is always true — every h1 in the section is wrapped
                dfn = wrap_with_dfn(el)
                dfn.attrs["data-lt"] = dfn_name
                dfn.attrs["data-dfn-type"] = "attribute"
                dfn.attrs["data-dfn-for"] = "globalThis"
            else:
                if el.first("dfn") is not None:
                    continue
                if not _ES_SCOPED_NAME.match(dfn_name) and not _ES_METHOD_NAME.match(
                    dfn_name
                ):
                    continue
                if "@@" in dfn_name:
                    continue
                if dfn_name.endswith(".prototype"):
                    continue
                if "(" not in dfn_name and " " in dfn_name:
                    continue
                if ". . ." in dfn_name:
                    continue
                dfn = wrap_with_dfn(el)
                if _ES_SCOPED_NAME.match(dfn_name):
                    scope = re.sub(r"\..*$", "", dfn_name)
                    dfn.attrs["data-dfn-for"] = scope
                    dfn_name = dfn_name.replace(scope + ".", "", 1)
                    if "(" in dfn_name:
                        dfn_name = _clean_method_name(dfn_name)
                        dfn.attrs["data-dfn-type"] = "method"
                    else:
                        dfn.attrs["data-dfn-type"] = (
                            "const" if re.match(r"^[A-Z]+$", dfn_name) else "attribute"
                        )
                    dfn.attrs["data-lt"] = dfn_name
                elif _ES_ABSTRACT_OP.match(dfn_name):
                    dfn_name = _clean_method_name(dfn_name)
                    dfn.attrs["data-lt"] = dfn_name
                    op_name = dfn_name.split("(")[0]
                    if op_name in idl_types:
                        dfn.attrs["data-dfn-type"] = "constructor"
                        dfn.attrs["data-dfn-for"] = op_name
                    else:
                        if op_name in abstract_methods:
                            base_class = abstract_methods[op_name]
                            parent = (
                                dfn.parent.closest(lambda a: a.tag == "emu-clause")
                                if dfn.parent is not None
                                else None
                            )
                            while parent is not None:
                                h1 = parent.first("h1")
                                title = (
                                    _ES_SECTION_NUMBER.sub("", h1.norm_text()).strip()
                                    if h1 is not None
                                    else None
                                )
                                if title and title.lower().endswith(base_class.lower()):
                                    dfn.attrs["data-dfn-for"] = title
                                    break
                                parent = (
                                    parent.parent.closest(
                                        lambda a: a.tag == "emu-clause"
                                    )
                                    if parent.parent is not None
                                    else None
                                )
                            if dfn.get("data-dfn-for") is None:
                                dfn.attrs["data-dfn-for"] = base_class
                        if dfn.get("aoid"):
                            dfn.attrs["data-lt"] = (
                                dfn.get("aoid") + "|" + dfn.attrs["data-lt"]
                            )
                        dfn.attrs["data-dfn-type"] = "abstract-op"
                else:
                    dfn_name = _clean_method_name(dfn_name)
                    dfn.attrs["data-lt"] = dfn_name
                    dfn.attrs["data-dfn-type"] = "method"
                    dfn.attrs["data-dfn-for"] = "globalThis"
                definition_names.add(dfn_name)

    # abstract operations marked as <emu-eqn aoid>
    for _, root in pages:
        for el in _find_all(
            root, lambda n: n.tag == "emu-eqn" and n.get("aoid") is not None
        ):
            if not _not_legacy(el):
                continue
            if "=" in el.text():
                continue
            dfn = wrap_with_dfn(el)
            dfn.attrs["data-lt"] = el.get("aoid")
            dfn.attrs["data-dfn-type"] = "abstract-op"
            if el.id:
                dfn.attrs["id"] = el.id

    # state components from figure tables
    for _, root in pages:
        for el in _find_all(
            root,
            lambda n: n.tag == "table"
            and n.parent is not None
            and n.parent.tag == "figure",
        ):
            if not _not_legacy(el):
                continue
            figcaption = el.parent.first("figcaption")
            title = figcaption.norm_text() if figcaption is not None else ""
            if not re.search(r"state components for", title, re.I):
                continue
            scope = re.sub(r"^.*state components for", "", title, flags=re.I).strip()
            holder = el.closest(
                lambda a: a.tag in ("emu-table", "emu-clause") and bool(a.id)
            )
            for tr in el.find_all("tr"):
                td = tr.first("td")
                if td is None:
                    continue
                dfn = wrap_with_dfn(td)
                dfn.attrs["data-dfn-for"] = scope
                if holder is not None:
                    dfn.attrs["id"] = holder.id

    # production rules
    for page_url, root in pages:
        for grammar in _find_all(
            root,
            lambda n: n.tag == "emu-grammar" and n.get("type") == "definition",
        ):
            for el in grammar.find_all("emu-production"):
                dfn = wrap_with_dfn(el)
                if el.id:
                    dfn.attrs["id"] = el.id
                dfn.attrs["data-lt"] = el.get("name") or ""
                dfn.attrs["data-dfn-type"] = "grammar"
                dfn.attrs["data-noexport"] = ""
                page = _page_of(el, page_url)
                if page.endswith("additional-ecmascript-features-for-web-browsers.html"):
                    dfn.attrs["data-dfn-for"] = "Web browsers"

    # generic dfn pass
    for page_url, root in pages:
        for el in _find_all(root, lambda n: n.tag == "dfn"):
            if not _not_legacy(el):
                continue
            page = _page_of(el, page_url)
            if page.endswith("conformance.html") or page.endswith(
                "notational-conventions.html"
            ):
                el.attrs.pop("id", None)
                continue
            if el.get("aoid"):
                el.attrs["data-dfn-type"] = "abstract-op"
            text = el.norm_text()
            if re.match(r"^%[A-Z].*%$", text):
                el.attrs["data-dfn-type"] = idl_types.get(
                    text.replace("%", ""), "interface"
                )
                definition_names.add(text)
            if page.endswith("global-object.html") and re.match(r"^%[a-z]+%", text, re.I):
                el.attrs["data-dfn-for"] = "globalThis"
                el.attrs["data-dfn-type"] = "method"
            if re.match(r"^@@[a-z]*$", text, re.I):
                el.attrs["data-dfn-type"] = "const"
            if el.get("variants"):
                base_lt = el.get("data-lt") or text
                el.attrs["data-lt"] = base_lt + "|" + el.get("variants")
            if el.get("data-dfn-type") is None and text in definition_names:
                continue
            if not el.id:
                clause = el.closest(lambda a: a.tag == "emu-clause" and bool(a.id))
                if clause is not None:
                    el.attrs["id"] = clause.id
            if el.get("data-dfn-type") is None:
                if el.get("data-dfn-for") is None:
                    el.attrs["data-dfn-for"] = "ECMAScript"
                el.attrs["data-export"] = ""

    # clean-up pass: "X prototype (object)" duplicates of %X.prototype%
    for _, root in pages:
        for dfn in _find_all(
            root,
            lambda n: n.tag == "dfn"
            and bool(n.id)
            and n.get("data-export") is not None,
        ):
            if not _not_legacy(dfn):
                continue
            m = re.match(r"^(.*) prototype( object)?$", dfn.norm_text())
            if m and f"%{m.group(1).strip()}.prototype%" in definition_names:
                dfn.attrs.pop("id", None)
                dfn.attrs.pop("data-export", None)


# ---------------------------------------------------------------------------
# WebIDL member scanning (shared by SVG2 / WebGL1 preprocessors)
# ---------------------------------------------------------------------------


def _extract_idl_text(pages) -> str:
    from .parse import dedent_code

    blocks = []
    for _, root in pages:
        for n in root.iter():
            if n.tag != "pre":
                continue
            code = n.first("code")
            if n.classes & {"idl", "webidl"} or (
                code is not None and code.has_class("idl")
            ):
                blocks.append(dedent_code(n.text()))
    return "\n\n".join(blocks)


def _idl_containers(pages) -> dict[str, dict]:
    """name → {type, members: [(kind, name, n_args)]} from the document's
    IDL blocks (the reference parses the full IDL with webidl2 —
    extract-dfns.mjs:888,1042; a member-level scan suffices here)."""
    from ..functions.webidl import parse_webidl

    idl = _extract_idl_text(pages)
    if not idl.strip():
        return {}
    try:
        report = parse_webidl(idl)
    except Exception:
        return {}
    out: dict[str, dict] = {}
    for name, desc in report.get("idlNames", {}).items():
        frag = desc.get("fragment", "")
        body_start = frag.find("{")
        body = frag[body_start + 1 : frag.rfind("}")] if body_start >= 0 else ""
        body = re.sub(r"//[^\n]*", "", body)
        members = []
        for stmt in body.split(";"):
            stmt = re.sub(r"^\s*\[[^\]]*\]\s*", "", stmt.strip())
            if not stmt:
                continue
            m_op = re.match(r"([^=()]*?)\(([^)]*)\)", stmt)
            if m_op and "attribute" not in m_op.group(1):
                head = m_op.group(1).split()
                if head:
                    n_args = len([a for a in m_op.group(2).split(",") if a.strip()])
                    members.append(("operation", head[-1], n_args))
            elif "attribute" in stmt:
                mname = re.sub(r"\s*=.*$", "", stmt).split()[-1]
                members.append(("attribute", mname, None))
            else:
                parts = re.sub(r"\s*=.*$", "", stmt).split()
                if len(parts) >= 2:
                    members.append(("field", parts[-1], None))
        out[name] = {"type": desc.get("type", "interface"), "members": members}
    return out


# ---------------------------------------------------------------------------
# SVG2 (extract-dfns.mjs:887-964)
# ---------------------------------------------------------------------------


def preprocess_svg2(pages) -> None:
    containers = _idl_containers(pages)

    # the only element definition not properly marked up
    link_heading = _find_by_id(pages, "LinkElement")
    if link_heading is not None and link_heading.get("data-dfn-type") is None:
        link_heading.attrs["data-dfn-type"] = "element"
        link_heading.attrs["data-lt"] = "link"

    def _index_lookup(index_page: str, target_id: str) -> Node | None:
        """th link pointing at #target_id inside the given index page."""
        for page_url, root in pages:
            for n in root.iter():
                if n.tag != "a" or not (n.get("href") or "").endswith("#" + target_id):
                    continue
                if n.closest(lambda a: a.tag == "th") is None:
                    continue
                on_index = n.closest(
                    lambda a: (a.get("data-reffy-page") or "").endswith(index_page)
                ) is not None or page_url.endswith(index_page)
                if on_index:
                    return n
        return None

    # attrdef tables
    for _, root in pages:
        for el in _find_all(
            root,
            lambda n: n.tag == "dfn"
            and bool(n.id)
            and n.get("data-dfn-type") is None
            and n.get("data-skip") is None
            and n.closest(lambda a: "attrdef" in a.classes) is not None,
        ):
            el.attrs["data-dfn-type"] = "element-attr"
            link = _index_lookup("attindex.html", el.id)
            if link is not None:
                tr = link.closest(lambda a: a.tag == "tr")
                td = tr.first("td") if tr is not None else None
                if td is not None:
                    el.attrs["data-dfn-for"] = td.norm_text()

    # dt[id] > .adef / .property
    for _, root in pages:
        for el in _find_all(
            root,
            lambda n: n.tag == "span"
            and ({"adef", "property"} & n.classes)
            and n.parent is not None
            and n.parent.tag == "dt"
            and bool(n.parent.id),
        ):
            dt = el.parent
            dfn = Node("dfn", {"id": dt.id})
            is_adef = "adef" in el.classes
            dfn.attrs["data-dfn-type"] = "element-attr" if is_adef else "property"
            index_page = "attindex.html" if is_adef else "propidx.html"
            link = _index_lookup(index_page, dt.id)
            if link is not None:
                tr = link.closest(lambda a: a.tag == "tr")
                names = []
                if tr is not None:
                    for span in tr.iter():
                        if span.tag == "span" and "element-name" in span.classes:
                            a = span.first("a")
                            if a is not None:
                                names.append(a.norm_text())
                if names:
                    dfn.attrs["data-dfn-for"] = ",".join(names)
            dfn.children = [el.norm_text()]
            new_dt = Node("dt", {})
            new_dt.children = [dfn]
            dfn.parent = new_dt
            _replace_with(dt, new_dt)

    # b[id^=__svg__] IDL members
    for _, root in pages:
        for el in _find_all(
            root, lambda n: n.tag == "b" and n.id.startswith("__svg__")
        ):
            parts = el.id.split("__")
            if len(parts) < 4:
                continue
            container_name, member_name = parts[2], parts[3]
            container = containers.get(container_name)
            if not container:
                continue
            member = next(
                (m for m in container["members"] if m[1] == member_name), None
            )
            if member is None:
                continue
            dfn = Node("dfn", {"id": el.id})
            dfn.children = list(el.children)
            for c in dfn.children:
                if isinstance(c, Node):
                    c.parent = dfn
            dfn.attrs["data-dfn-for"] = container_name
            dfn.attrs["data-dfn-type"] = (
                "method" if member[0] == "operation" else member[0]
            )
            _replace_with(el, dfn)

    # h3 Interface headings
    for _, root in pages:
        for el in _find_all(
            root,
            lambda n: n.tag == "h3"
            and n.id.startswith("Interface")
            and n.get("data-dfn-type") is None,
        ):
            name = el.id[len("Interface"):]
            if containers.get(name, {}).get("type") == "interface":
                el.attrs["data-dfn-type"] = "interface"
                el.attrs["data-lt"] = name

    # other b[id] matching IDL names
    for _, root in pages:
        for el in _find_all(
            root,
            lambda n: n.tag == "b" and bool(n.id) and n.get("data-dfn-type") is None,
        ):
            name = el.norm_text()
            item = containers.get(name)
            if not item:
                continue
            dfn = Node("dfn", {"id": el.id, "data-dfn-type": item["type"]})
            dfn.children = list(el.children)
            for c in dfn.children:
                if isinstance(c, Node):
                    c.parent = dfn
            _replace_with(el, dfn)


# ---------------------------------------------------------------------------
# RFC8610 / CDDL standard prelude (extract-dfns.mjs:978-1017)
# ---------------------------------------------------------------------------


def preprocess_rfc8610(pages) -> None:
    pre_pages = []
    for _, root in pages:
        pre_pages.extend(
            n for n in root.iter() if n.tag == "pre" and "newpage" in n.classes
        )
    prelude_start = re.compile(r"Appendix .\.\s+Standard Prelude")
    prelude_end = re.compile(r"Figure \d+: CDDL Prelude")
    pre_start = next(
        (
            i
            for i, pre in enumerate(pre_pages)
            if prelude_start.search(pre.text())
            and any(n.tag == "a" and n.id for n in pre.iter())
        ),
        -1,
    )
    if pre_start == -1:
        return
    pre_end = next(
        (
            i
            for i, pre in enumerate(pre_pages)
            if i >= pre_start and prelude_end.search(pre.text())
        ),
        -1,
    )
    if pre_end == -1:
        return
    prelude_types = []
    for pre in pre_pages[pre_start : pre_end + 1]:
        for m in re.finditer(r"^\s+([a-z0-9-]+) = .*$", pre.text(), re.M):
            prelude_types.append(m.group(1))
    el = next(
        (n for n in pre_pages[pre_start].iter() if n.tag == "a" and n.id), None
    )
    if el is None:
        return
    dfn = Node(
        "dfn",
        {
            "id": el.id,
            "data-dfn-type": "cddl-type",
            "data-lt": "|".join(prelude_types),
            "data-export": "",
        },
    )
    dfn.children = list(el.children)
    for c in dfn.children:
        if isinstance(c, Node):
            c.parent = dfn
    _replace_with(el, dfn)


# ---------------------------------------------------------------------------
# WebGL 1.0 (extract-dfns.mjs:1031-1097)
# ---------------------------------------------------------------------------


def preprocess_webgl1(pages) -> None:
    containers = _idl_containers(pages)

    # IDL attributes: .attribute-name a[id^=DOM-]
    for _, root in pages:
        for attribute in _find_all(
            root,
            lambda n: n.tag == "a"
            and n.id.startswith("DOM-")
            and n.closest(lambda a: "attribute-name" in a.classes) is not None,
        ):
            attr_name = attribute.norm_text()
            matches = [
                name
                for name, c in containers.items()
                if any(m[0] == "attribute" and m[1] == attr_name for m in c["members"])
            ]
            if len(matches) != 1:
                continue
            dfn = Node(
                "dfn",
                {
                    "id": attribute.id,
                    "data-dfn-type": "attribute",
                    "data-dfn-for": matches[0],
                },
            )
            dfn.children = [attr_name]
            _replace_with(attribute, dfn)

    # IDL methods: .idl-code a[name]
    for _, root in pages:
        for method in _find_all(
            root,
            lambda n: n.tag == "a"
            and n.get("name")
            and n.closest(lambda a: "idl-code" in a.classes) is not None,
        ):
            method_name = method.norm_text().split(" ")[-1]
            parent = method.parent
            if parent is None:
                continue
            m_args = re.search(r"\((.*?)\)", parent.text(), re.S)
            if not m_args:
                continue
            method_args = [
                a.split()[-1] for a in m_args.group(1).split(",") if a.strip()
            ]
            item = next(
                (
                    name
                    for name, c in containers.items()
                    if any(
                        m[0] == "operation"
                        and m[1] == method_name
                        and m[2] == len(method_args)
                        for m in c["members"]
                    )
                ),
                None,
            )
            if item is None:
                continue
            dfn = Node(
                "dfn",
                {
                    "id": method.get("name"),
                    "data-dfn-type": "method",
                    "data-dfn-for": item,
                    "data-lt": f"{method_name}({', '.join(method_args)})",
                },
            )
            dfn.children = [method.norm_text()]
            _replace_with(method, dfn)


# ---------------------------------------------------------------------------
# dispatch (extract-dfns.mjs:312-332)
# ---------------------------------------------------------------------------

PREPROCESSORS = {
    "CSS2": preprocess_css2,
    "html": preprocess_html,
    "ecmascript": preprocess_ecmascript,
    "SVG2": preprocess_svg2,
    "rfc8610": preprocess_rfc8610,
    "webgl1": preprocess_webgl1,
}


def preprocess_spec(shortname: str | None, pages) -> None:
    """Apply the shortname-keyed preprocessor (if any) to the parsed
    pages ``[(page_url, root)]`` in place."""
    fn = PREPROCESSORS.get(shortname or "")
    if fn is not None:
        fn(pages)
