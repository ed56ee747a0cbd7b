"""HTML → interleaved span-table parser stage.

Replaces the reference's Puppeteer render + browserlib injection
(reference: src/lib/util.js:311-681). One fetched HTML document (plus
its subpages, merged in order as in src/lib/util.js:555-594) becomes
one row of the ``documents`` table: ``(doc_id, spans)`` where spans is
the ordered interleaved sequence of text + media spans described in
FIXTURES.md §1.

Run as an actor-pool ``map_batches`` stage (parser tables built once
per actor in ``__init__``); each ``__call__`` is one Arrow batch of
``(doc_id, url, html, pages_urls, pages_html)`` rows in, one Arrow
batch of ``documents`` rows out.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from ..schemas import SPAN_STRUCT
from .htmldom import Node, parse_html

# Heading-number fallback, aligned with the reference's reNumber shape
# (map-ids-to-headings.mjs:12): dotted forms, single digits, or
# "Appendix X." — NOT bare words like "A Sample Heading" or "10 Things".
_RE_SECNO = re.compile(
    r"^\s*([A-Z\d]\.|[A-Z](?:\.\d+)+\.?|\d+(?:\.\d+)+\.?|\d|Appendix [A-Z][.:])\s+"
)
_RE_NORMATIVE_REFS = re.compile(r"^normative\s+references?$", re.I)
_RE_INFORMATIVE_REFS = re.compile(r"^(informative|other)\s+references?$", re.I)
_RE_REFS_HEADING = re.compile(r"^references?$", re.I)

# Sections stripped entirely (clone-and-clean.mjs:7-25 +
# informative-selector.mjs annotations)
_SKIP_CLASSES = {"mdn-anno", "wpt-tests-block", "annotation", "dfn-panel"}
_SKIP_TAGS = {"del", "aside", "script", "style", "nav"}
_INFORMATIVE_CLASSES = {"informative", "note", "example", "issue", "non-normative", "advisement"}

_SUMMARY_EVENT_HEADERS = ("event type", "type")

# Normative-operation lexicon for unmarked <ol> algorithm discovery
# (extract-algorithms.mjs:123-278 stepOperations, abridged to the same
# verb list)
STEP_OPERATIONS = frozenset(
    """abort acknowledge activate add adopt advance append apply ask assert
    assign attach attempt batch block branch call check cancel cause change
    choose clamp clean clear close collect complete compute consume continue
    convert copy create deactivate decrease decrement decrypt define delete
    dequeue destroy determine discard dismiss dispatch display down-mix do
    dump emit empty end enqueue ensure error establish execute extend extract
    fail fetch finalize find finish fire gather generate give handle hand-off
    increase increment initialize insert interpret invoke issue jump let load
    make mark match move multiply navigate paint parse perform place pop
    populate prepare prepend process prompt push query queue recalculate
    rectify reference register reinitialize reject release remove replace
    reset resolve restore render remap report return run score scroll send
    serialize set shuffle skip sort split spin start stop store strip suspend
    switch take terminate throw toggle transmit try unregister unset update
    upgrade use validate verify wait write""".split()
)


def dedent_code(text: str) -> str:
    """De-indent preserving relative indentation (trim-spaces.mjs:14-36)."""
    text = text.replace("\t", "  ")
    lines = [ln.rstrip() for ln in text.split("\n")]
    while lines and not lines[0].strip():
        lines.pop(0)
    while lines and not lines[-1].strip():
        lines.pop()
    indents = [len(ln) - len(ln.lstrip()) for ln in lines if ln.strip()]
    cut = min(indents) if indents else 0
    return "\n".join(ln[cut:] if ln.strip() else "" for ln in lines)


_DFN_DATA_ATTRS = (
    "data-dfn-type", "data-dfn-for", "data-export", "data-noexport", "data-lt",
)
# Valid dfn types (hasValidType, extract-dfns.mjs:51-118 — the Bikeshed
# dfn-types list + namespace/event/permission)
_VALID_DFN_TYPES = frozenset({
    # CSS
    "property", "descriptor", "value", "type", "at-rule", "function",
    "selector",
    # Web IDL
    "namespace", "interface", "constructor", "method", "argument",
    "attribute", "callback", "dictionary", "dict-member", "enum",
    "enum-value", "exception", "const", "typedef", "stringifier",
    "serializer", "iterator", "maplike", "setlike", "extended-attribute",
    "event", "permission",
    # Elements
    "element", "element-state", "element-attr", "attr-value",
    # CDDL
    "cddl-module", "cddl-type", "cddl-parameter", "cddl-key", "cddl-value",
    # URL scheme / HTTP header / grammar / English terms
    "scheme", "http-header", "grammar", "abstract-op", "dfn",
})

_CSS2_VENDOR_URL = "https://www.w3.org/TR/CSS2/syndata.html#vendor-keywords"


def clean_text(n: Node) -> str:
    """textContent with informative-selector subtrees removed
    (clone-and-clean.mjs:7-25 — asides, .idlHeader, annotations,
    details.respec-tests-details, dfn panels)."""
    from .cssdfn import _is_informative

    parts: list[str] = []

    def rec(node: Node):
        for c in node.children:
            if isinstance(c, str):
                parts.append(c)
            elif not _is_informative(c):
                rec(c)

    rec(n)
    return "".join(parts)


class _Walker:
    """Single-document walk emitting (kind, text, media_ref) events."""

    def __init__(self, base_url: str, uses_dfn_model: bool = True):
        self.base_url = base_url
        self.page_url = base_url
        self.events: list[tuple[str, str, str]] = []
        self.heading_id = ""
        self.title_seen = False
        self.generator = None
        self.ref_section: str | None = None
        self.idl_index_events: list[tuple[str, str, str]] = []
        self.saw_idl_index = False
        self._algo_counter = 0
        self.last_heading_dfns: list[tuple[str, str]] = []
        # Document-level flag (extract-dfns.mjs:335-340): in specs that
        # never use the dfn data model, every dfn is public.
        self.uses_dfn_model = uses_dfn_model

    # -- emission ----------------------------------------------------------
    def emit(self, kind: str, text: str, media_ref: str = "", to_idl_index: bool = False):
        ev = (kind, text, media_ref)
        if to_idl_index:
            self.idl_index_events.append(ev)
        else:
            self.events.append(ev)

    # -- entry -------------------------------------------------------------
    def walk_document(self, root: Node):
        self._scan_css_legacy(root)
        self._walk(root, informative=False, in_head=False, in_idl_index=False)

    def merge_subpage(self, url: str, root: Node):
        """Subpage appended in order, flagged by a page meta span
        (analog of <section data-reffy-page>, util.js:555-594)."""
        self.page_url = url
        self.emit("meta", f"page={url}")
        self._scan_css_legacy(root)
        self._walk(root, informative=False, in_head=False, in_idl_index=False)

    def prescan(self, pages) -> None:
        """Whole-document pre-pass over [(page_url, root)] BEFORE any
        walking: data-defines prose may live on a different page than
        the dfn it defines (the reference queries the merged DOM)."""
        for page_url, root in pages:
            self._scan_data_defines(root, page_url)

    # elements kept in textual definitions (getHtmlProseDefinition
    # keepSelector, extract-dfns.mjs:138-176); everything else removed
    _PROSE_KEEP = frozenset(
        """blockquote dd div dl dt figcaption figure hr li ol p pre ul
        a abbr b bdi bdo br cite code data dfn em i kbd mark q rp rt ruby
        s samp small span strong sub sup time u var wbr""".split()
    )
    _PROSE_ATTRS = frozenset({"dir", "lang", "title"})
    _ASIDE_CLASSES = frozenset(
        """informative informative-bg note issue example ednote annotation
        practice introductory non-normative idlHeader mdn-anno
        wpt-tests-block""".split()
    )

    def _scan_data_defines(self, root: Node, default_page: str):
        """Map dfn id → cleaned prose HTML from [data-defines='#id']
        elements (extract-dfns.mjs:289-296 + getHtmlProseDefinition)."""
        if not hasattr(self, "data_defines"):
            self.data_defines: dict[str, str] = {}
        for el in root.iter():
            target = el.get("data-defines")
            if not target:
                continue
            anc = el.closest(lambda a: a.get("data-reffy-page") is not None)
            page = anc.get("data-reffy-page") if anc is not None else default_page
            self.data_defines[target.lstrip("#")] = self._html_prose_of(el, page)

    def _html_prose_of(self, el: Node, page_url: str) -> str:
        """Serialize children keeping only simple grouping/text-level
        elements, stripping asides, and dropping all attributes except
        dir/lang/title and absolutized href."""
        from urllib.parse import urljoin

        from .htmldom import VOID

        def ser(node) -> str:
            if isinstance(node, str):
                return node
            if node.tag == "aside" or (node.classes & self._ASIDE_CLASSES):
                return ""
            if node.id.startswith("dfn-panel-"):
                return ""
            if node.tag not in self._PROSE_KEEP:
                return ""
            attrs = ""
            for k, v in node.attrs.items():
                if k == "href":
                    if v.startswith("#"):
                        v = page_url.split("#")[0] + v
                    else:
                        v = urljoin(page_url, v)
                    attrs += f' href="{v}"'
                elif k in self._PROSE_ATTRS:
                    attrs += f' {k}="{v}"'
            inner = "".join(ser(c) for c in node.children)
            if node.tag in VOID:
                return f"<{node.tag}{attrs}>"
            return f"<{node.tag}{attrs}>{inner}</{node.tag}>"

        return "".join(ser(c) for c in el.children).strip()

    def _scan_css_legacy(self, root: Node):
        """Legacy '-webkit' alias extraction: paragraphs (or compat
        tables right after them) referencing #legacy-name-alias
        (extract-cssdfn.mjs:927-968 extractLegacyProperties)."""
        for a in root.iter():
            if a.tag != "a" or not (a.get("href") or "").endswith("#legacy-name-alias"):
                continue
            el = a.parent
            if el is None:
                continue
            pairs: list[tuple[Node, Node]] = []
            dfn = next(
                (d for d in el.iter()
                 if d.tag == "dfn" and d.get("data-dfn-type") == "property"),
                None,
            )
            alias = next(
                (d for d in el.iter()
                 if d.tag == "a" and d.get("data-link-type") == "property"),
                None,
            )
            if dfn is not None and alias is not None:
                pairs.append((dfn, alias))
            else:
                table = self._next_element_sibling(el)
                if table is None or table.tag != "table":
                    continue
                thead = table.first("thead")
                if thead is None or len(list(thead.find_all("th"))) != 2:
                    continue
                tbody = table.first("tbody")
                for row in tbody.find_all("tr") if tbody is not None else []:
                    d = next(
                        (x for x in row.iter()
                         if x.tag == "dfn" and x.get("data-dfn-type") == "property"),
                        None,
                    )
                    al = next(
                        (x for x in row.iter()
                         if x.tag == "a" and x.get("data-link-type") == "property"),
                        None,
                    )
                    if d is not None and al is not None:
                        pairs.append((d, al))
            for d, al in pairs:
                self.emit(
                    "css-legacy-alias",
                    json.dumps(
                        {"name": d.norm_text(), "id": d.id or None,
                         "alias_of": al.norm_text()},
                        ensure_ascii=False,
                    ),
                )

    # -- recursive walk ----------------------------------------------------
    def _walk(self, node: Node, informative: bool, in_head: bool, in_idl_index: bool):
        for child in node.element_children():
            self._visit(child, informative, in_head, in_idl_index)

    def _visit(self, n: Node, informative: bool, in_head: bool, in_idl_index: bool):
        # data-reffy-page scopes to the subtree (the reference resolves
        # pages with closest(), get-absolute-url.mjs:5-6): switch the
        # page on entry, restore it after the subtree
        page_attr = n.get("data-reffy-page")
        if page_attr and page_attr != self.page_url:
            prev = self.page_url
            self.page_url = page_attr
            self.emit("meta", f"page={page_attr}")
            try:
                self._visit_in_page(n, informative, in_head, in_idl_index)
            finally:
                self.page_url = prev
                self.emit("meta", f"page={prev}")
            return
        self._visit_in_page(n, informative, in_head, in_idl_index)

    def _visit_in_page(
        self, n: Node, informative: bool, in_head: bool, in_idl_index: bool
    ):
        tag = n.tag
        cls = n.classes
        if tag in _SKIP_TAGS or (cls & _SKIP_CLASSES):
            if tag == "script":
                self._sniff_generator_script(n)
            return
        if cls & _INFORMATIVE_CLASSES:
            informative = True
        if "domintro" in cls:
            # "For web developers" sections: capture dev anchors as
            # dev-link spans (extract-dfns.mjs:387-414), then continue
            # the normal walk (dfns inside still count).
            self._emit_dev_links(n)
        if n.id == "idl-index" or (tag == "section" and n.id == "idl-index"):
            in_idl_index = True
            self.saw_idl_index = True
            if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
                # Bikeshed idl-index as a bare heading: the IDL is the
                # next element sibling (extract-webidl.mjs:46-56)
                self._idl_index_next = True
        if tag == "div" and "head" in cls:
            in_head = True

        # anchors: every [id] element and <a name> (extract-ids.mjs:6-28)
        if n.id:
            self.emit("anchor", n.id)
        if tag == "a" and n.get("name") and not n.id:
            self.emit("anchor", n.get("name"))

        if tag == "title" and not self.title_seen:
            self.title_seen = True
            self.emit("title", n.norm_text())
            return
        if tag == "meta":
            self._visit_meta(n)
            return
        if tag == "time" and in_head:
            self.emit("meta", f"date={n.norm_text()}")
            return
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self._visit_heading(n, informative, in_head)
            return
        if tag == "dfn":
            self._visit_dfn(n, informative, in_head)
            # a dfn may still contain links
            self._walk(n, informative, in_head, in_idl_index)
            return
        if tag == "a":
            self._visit_link(n, in_head)
            self._walk(n, informative, in_head, in_idl_index)
            return
        if tag == "pre":
            self._visit_pre(n, informative, in_idl_index)
            return
        if tag == "table":
            if self._visit_table(n, informative):
                return
            self._walk(n, informative, in_head, in_idl_index)
            return
        if tag == "dl":
            if self._visit_dl(n, informative):
                return
            self._walk(n, informative, in_head, in_idl_index)
            return
        if tag == "div" and (cls & {"propdef", "descdef"}):
            # legacy dl-based CSS definitions ("old" CSS specs:
            # div.propdef dl / div.descdef dl, extract-cssdfn.mjs:470-506)
            dl = n.first("dl")
            if dl is not None:
                self._emit_dl_cssdef(dl, "descdef" if "descdef" in cls else "propdef")
            self._walk(n, informative, in_head, in_idl_index)
            return
        if tag == "div" and "element-summary" in cls:
            # SVG element-summary dialect (extract-elements.mjs:152-205)
            self._emit_element_summary(n)
            self._walk(n, informative, in_head, in_idl_index)
            return
        if tag in ("ol", "div", "section") and "algorithm" in cls:
            self._visit_algorithm(n, informative, in_head, in_idl_index)
            return
        if tag == "ul" and self.ref_section is not None and "toc" not in cls:
            self._visit_ref_ul(n)
            return
        if tag == "ol":
            op = self._ol_operation(n)
            if op is not None:
                self._visit_heuristic_algorithm(n, op)
                return
        if tag == "p":
            self._visit_p(n, informative, in_head, in_idl_index)
            return
        if tag == "figure":
            img = n.first("img")
            cap = n.first("figcaption")
            self.emit("figure", cap.norm_text() if cap else "", img.get("src", "") if img else "")
            # non-media content inside figures (e.g. the ecmascript
            # spec's state-component tables) still gets walked
            for child in n.element_children():
                if child.tag not in ("img", "figcaption"):
                    self._visit(child, informative, in_head, in_idl_index)
            return
        if tag == "img":
            self.emit("image", n.get("alt", "") or "", n.get("src", "") or "")
            return
        if tag == "emu-clause":
            self._visit_emu_clause(n, informative, in_head, in_idl_index)
            return
        self._walk(n, informative, in_head, in_idl_index)

    def _emit_descendant_anchors(self, n: Node, skip: set[str] | None = None):
        """Anchors for [id]/a[name] descendants of substructures that
        are handled wholesale (ref lists, def tables) — the ids extract
        must still see them (extract-ids.mjs covers every [id])."""
        skip = skip or set()
        for d in n.iter():
            if d is n:
                continue
            if d.id and d.id not in skip:
                self.emit("anchor", d.id)
            elif d.tag == "a" and d.get("name") and not d.id:
                self.emit("anchor", d.get("name"))

    # -- per-construct handlers -------------------------------------------
    def _sniff_generator_script(self, n: Node):
        if self.generator:
            return
        src = n.get("src", "") or ""
        body = n.text()
        if "respec" in src.lower() or "respecConfig" in body:
            self.generator = "respec"
            self.emit("meta", "generator=respec")

    def _visit_meta(self, n: Node):
        name = (n.get("name") or "").lower()
        content = n.get("content") or ""
        if name == "generator":
            gen = content.lower()
            if "bikeshed" in gen:
                self.generator = "bikeshed"
                self.emit("meta", "generator=bikeshed")
            elif "respec" in gen:
                self.generator = "respec"
                self.emit("meta", "generator=respec")
        elif name in ("document-revision", "revision"):
            self.emit("meta", f"revision={content}")
        elif name in ("date", "dcterms.date"):
            self.emit("meta", f"date={content}")

    @staticmethod
    def _heading_text(n: Node) -> str:
        """Heading text minus annotations/asides/del (the reference's
        getCleanTextContent → cloneAndClean)."""
        parts: list[str] = []

        def rec(node: Node):
            for c in node.children:
                if isinstance(c, str):
                    parts.append(c)
                elif c.tag not in _SKIP_TAGS and not (c.classes & _SKIP_CLASSES):
                    rec(c)

        rec(n)
        return "".join(parts)

    def _heading_parts(self, n: Node) -> tuple[str, str]:
        """(number, title) split via .secno child or leading numbering."""
        number = ""
        secno = None
        for c in n.element_children():
            if c.has_class("secno", "secnum"):
                secno = c
                break
        text = " ".join(self._heading_text(n).split()).replace("\u2212", "-")
        if secno is not None:
            number = secno.norm_text().rstrip(".")
            stext = secno.norm_text()
            if stext and stext in text:
                text = text.replace(stext, "", 1).strip()
        else:
            m = _RE_SECNO.match(text)
            if m:
                number = re.sub(r"^Appendix ", "", m.group(1).rstrip(".:"))
                text = text[m.end():].strip()
        return number, text

    def _visit_heading(self, n: Node, informative: bool, in_head: bool):
        # id candidates in the reference's order (map-ids-to-headings.mjs
        # :89-105): <a name> anchor, the heading's own id, the enclosing
        # section root's id — the LAST becomes the canonical id, the
        # earlier ones its alternateIds.
        ids: list[str] = []
        a = n.first("a")
        if a is not None and a.get("name"):
            ids.append(a.get("name"))
        if n.id:
            ids.append(n.id)
        anc = n.parent
        while anc is not None and anc.tag in ("div", "hgroup", "header") and not anc.id:
            anc = anc.parent
        if anc is not None and anc.tag in ("section", "article") and anc.id:
            first_h = next(
                (d for d in anc.iter()
                 if d.tag in ("h1", "h2", "h3", "h4", "h5", "h6")),
                None,
            )
            if first_h is n:
                ids.append(anc.id)
        hid = ids[-1] if ids else None
        alt_ids = ids[:-1] or None
        level = int(n.tag[1])
        number, title = self._heading_parts(n)
        if hid:
            self.heading_id = hid
        payload = {"id": hid, "level": level, "number": number, "title": title}
        if alt_ids:
            payload["alt_ids"] = alt_ids
        self.emit("heading", json.dumps(payload, ensure_ascii=False))
        # nested anchorable ids inside the heading (extract-ids walks
        # every [id]/[name] element; the heading subtree isn't recursed)
        for d in n.iter():
            if d is n:
                continue
            if d.id and d.id != hid:
                self.emit("anchor", d.id)
            elif d.tag == "a" and d.get("name") and d.get("name") != hid:
                self.emit("anchor", d.get("name"))
        # ref-section state machine (extract-references.mjs heuristics)
        if _RE_NORMATIVE_REFS.match(title):
            self.ref_section = "normative"
        elif _RE_INFORMATIVE_REFS.match(title):
            self.ref_section = "informative"
        elif _RE_REFS_HEADING.match(title):
            self.ref_section = "normative"
        else:
            self.ref_section = None
        # links inside headings still count
        for a in n.find_all("a"):
            self._visit_link(a, in_head)
        # the heading itself may be a definition (annotated headings,
        # extract-dfns.mjs:309: heading[id] with any dfn data attribute)
        if (
            hid
            and any(n.get(a) is not None for a in _DFN_DATA_ATTRS)
            and n.get("data-lt") != ""
        ):
            self._emit_dfn_payload(
                n, hid, default_lt=[title], defined_in="heading",
                informative=informative, heading_id=hid,
            )
        # dfns inside headings (annotated headings, extract-dfns.mjs:301-310);
        # also remembered for the HTML `<dl class=element>` dialect, whose
        # element names come from the heading's dfns (extract-elements.mjs)
        self.last_heading_dfns = []
        for d in n.find_all("dfn"):
            if d.id:
                self.emit("anchor", d.id)
                self._visit_dfn(d, informative, in_head)
            self.last_heading_dfns.append((d.id, d.norm_text()))

    def _dfn_access(self, n: Node, dfn_type: str | None = None) -> str:
        """Reference access rule (extract-dfns.mjs:259-268): public when
        the doc doesn't use the dfn data model, when explicitly
        exported, or when typed as anything but 'dfn'/'cddl-*' without
        an explicit noexport."""
        if dfn_type is None:
            dfn_type = n.get("data-dfn-type")
        if not self.uses_dfn_model or n.get("data-export") is not None:
            return "public"
        if (
            n.get("data-noexport") is None
            and dfn_type
            and dfn_type != "dfn"
            and not dfn_type.startswith("cddl-")
        ):
            return "public"
        return "private"

    def _emit_dfn_payload(
        self, n: Node, dfn_id: str, default_lt: list[str], defined_in: str,
        informative: bool, heading_id: str, html_prose: str | None = None,
    ):
        lt = n.get("data-lt")
        linking = [s.strip() for s in lt.split("|")] if lt else default_lt
        local_lt = n.get("data-local-lt")
        local = [s.strip() for s in local_lt.split("|")] if local_lt else []
        # `for` list is not purely comma-separated (method(foo,bar) args)
        dfn_for = [
            s.strip()
            for s in re.split(r",(?![^(]*\))", n.get("data-dfn-for") or "")
            if s.strip()
        ]
        dfn_type = n.get("data-dfn-type") or "dfn"
        if dfn_type == "idl":
            # respec's invalid "idl" type for internal slots/methods →
            # method when the term is a call, attribute otherwise
            # (extract-dfns.mjs:344-354)
            dfn_type = (
                "method" if linking and linking[0].endswith(")") else "attribute"
            )
        if dfn_type not in _VALID_DFN_TYPES:
            # unknown types are dropped with a warning in the reference
            # (hasValidType, extract-dfns.mjs:51-118)
            return
        self.emit(
            "dfn",
            json.dumps(
                {
                    "id": dfn_id,
                    "lt": linking,
                    "local_lt": local,
                    "type": dfn_type,
                    "for": dfn_for,
                    "access": self._dfn_access(n, dfn_type),
                    "informative": informative,
                    "heading_id": heading_id,
                    "defined_in": defined_in,
                    "html_prose": html_prose,
                },
                ensure_ascii=False,
            ),
        )

    def _visit_dfn(self, n: Node, informative: bool, in_head: bool):
        if not n.id:
            # id-less interface dfns still matter to the elements
            # extractor's name→interface lookup (extract-elements.mjs
            # queries dfn[data-dfn-type=interface] without an id filter)
            if n.get("data-dfn-type") == "interface":
                self.emit("iface-name", n.norm_text())
            return
        if n.get("data-lt") == "":
            return
        # a dfn whose whole text is an http link is an *imported*
        # definition, not a real one (extract-dfns.mjs:365-375), with
        # one hardcoded CSS2 exception
        link = next(
            (a for a in n.iter()
             if a is not n and a.tag == "a" and (a.get("href") or "").startswith("http")),
            None,
        ) or n.closest(
            lambda a: a is not n and a.tag == "a"
            and (a.get("href") or "").startswith("http")
        )
        if (
            link is not None
            and n.norm_text() == link.norm_text()
            and link.get("href") != _CSS2_VENDOR_URL
        ):
            return
        container = n.closest(
            lambda a: a.tag in ("pre", "dt", "h1", "h2", "h3", "h4", "h5", "h6", "li", "table")
        )
        # prose definition from a [data-defines='#id'] element
        # (extract-dfns.mjs:289-296; no fallback in the reference)
        html_prose = getattr(self, "data_defines", {}).get(n.id)
        if container is None:
            defined_in = "prose"
        elif container.tag == "pre":
            defined_in = "pre"
        elif container.tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            defined_in = "heading"
        elif container.tag == "dt":
            defined_in = "dt"
        elif container.tag == "li":
            defined_in = "list"
        elif container.tag == "table":
            defined_in = "table"
        else:
            defined_in = "prose"
        self._emit_dfn_payload(
            n, n.id, default_lt=[n.norm_text()], defined_in=defined_in,
            informative=informative, heading_id=self.heading_id,
            html_prose=html_prose,
        )

    def _emit_dev_links(self, n: Node):
        """`.domintro dt:not(:has(dfn)) a[id]` anchors become dev-link
        spans attached to the target dfn downstream
        (extract-dfns.mjs:387-414)."""
        from urllib.parse import urljoin

        for dt in n.find_all("dt"):
            if dt.first("dfn") is not None:
                continue
            for a in dt.iter():
                if a.tag != "a" or not a.id:
                    continue
                href = a.get("href") or ""
                if href.startswith("#"):
                    # urljoin can't resolve fragments against opaque
                    # bases like about:blank
                    target = self.page_url.split("#")[0] + href
                else:
                    target = urljoin(self.page_url, href) if href else ""
                self.emit(
                    "dev-link",
                    json.dumps(
                        {
                            "id": a.id,
                            "name": dt.norm_text(),
                            "target": target,
                            "heading_id": self.heading_id,
                        },
                        ensure_ascii=False,
                    ),
                )

    def _visit_link(self, n: Node, in_head: bool):
        href = n.get("href") or ""
        if not href.startswith("http"):
            return
        auto = n.get("data-link-type") is not None or n.get("data-xref-type") is not None
        self.emit(
            "link",
            json.dumps(
                {"href": href, "auto": auto, "in_head": in_head, "in_dfn_panel": False},
                ensure_ascii=False,
            ),
        )

    def _visit_pre(self, n: Node, informative: bool, in_idl_index: bool):
        cls = n.classes
        # RFC-style headings: pre > span.h2-.h6 > a.selflink[id]
        # (extract-headings.mjs:23-38)
        for span in n.element_children():
            if span.tag != "span" or not span.classes & {"h2", "h3", "h4", "h5", "h6"}:
                continue
            a = next(
                (c for c in span.element_children()
                 if c.tag == "a" and c.has_class("selflink") and c.id),
                None,
            )
            if a is None:
                continue
            number = a.norm_text()
            title = span.norm_text().replace(number, "", 1).lstrip(". ").strip()
            level = len(number.split(".")) if number else None
            number = re.sub(r"(?i)\s*appendix\s+", "", number)
            self.heading_id = a.id
            self.emit("anchor", a.id)
            self.emit(
                "heading",
                json.dumps(
                    {"id": a.id, "level": level, "number": number, "title": title},
                    ensure_ascii=False,
                ),
            )
        body = dedent_code(clean_text(n))
        # dfns/anchors inside code blocks must still be emitted
        for d in n.find_all("dfn"):
            if d.id:
                self.emit("anchor", d.id)
                self._visit_dfn(d, informative, False)
        if self._is_idl_pre(n, cls):
            if not informative:
                to_index = in_idl_index or getattr(self, "_idl_index_next", False)
                self._idl_index_next = False
                self.emit("idl-block", body, to_idl_index=to_index)
            return
        if "prod" in cls:
            self.emit("css-prod", body)
            return
        if "cddl" in cls:
            attr = n.get("data-cddl-module")
            if attr:
                modules = [m.strip() for m in attr.split(",") if m.strip()]
            else:
                # class forms cddl-<name> and <name>-cddl
                # (getModules, extract-cddl.mjs:107-125)
                modules = []
                for c in n.get("class", "").split():
                    m = re.match(r"^(.*)-cddl$|^cddl-(.*)$", c)
                    if m:
                        name = m.group(1) if m.group(1) is not None else m.group(2)
                        if name and name not in modules:
                            modules.append(name)
            self.emit(
                "cddl-block",
                json.dumps({"cddl": body, "modules": modules}, ensure_ascii=False),
            )
            return
        # plain code block → prose-ish, ignore

    @staticmethod
    def _is_idl_pre(n: Node, cls: set[str]) -> bool:
        """ReSpec-convention IDL block selectors
        (extract-webidl.mjs:73-79): pre.idl / pre.widl, pre > code.idl /
        code.idl-code, div.idl-code > pre — all minus .exclude/.extract
        and the #actual-idl-index / #idl-index / .chapter-idl scopes."""
        excluded = {"exclude", "extract"}
        if cls & excluded:
            return False
        if n.closest(
            lambda a: a.id in ("idl-index",) or "chapter-idl" in a.classes
        ) is not None:
            # handled by the Bikeshed idl-index path (saw_idl_index)
            return False
        if (cls & {"idl", "widl", "webidl"}) and n.id != "actual-idl-index":
            return True
        code = next((c for c in n.element_children() if c.tag == "code"), None)
        if code is not None and (
            code.classes & {"idl", "idl-code"}
        ) and not (code.classes & excluded):
            return True
        if (
            n.parent is not None
            and n.parent.tag == "div"
            and "idl-code" in n.parent.classes
            and not (n.parent.classes & excluded)
        ):
            return True
        return False

    # -- tables ------------------------------------------------------------
    def _visit_table(self, n: Node, informative: bool) -> bool:
        cls = n.classes
        if "definition-table" in cls:
            # SVG definition-table dialect (extract-elements.mjs:208-239);
            # generic walk still emits the dfn/link spans inside
            self._emit_definition_table_element(n)
            return False
        if cls & {"propdef", "descdef"}:
            self._emit_propdef(n, "descdef" if "descdef" in cls else "propdef")
            return True
        if "element" in cls and "def" in cls:
            return False
        header_cells = [
            c.norm_text().lower() for c in (n.first("thead") or n).find_all("th")
        ][:6]
        if header_cells and header_cells[0] in _SUMMARY_EVENT_HEADERS and "interface" in header_cells:
            self._emit_summary_event_table(n, header_cells)
            return True
        if "def" in cls and self._looks_like_event_def(n):
            self._emit_event_def_table(n)
            return True
        return False

    def _emit_propdef(self, n: Node, kind: str):
        table_id = n.id
        if not table_id:
            first_dfn = next((d for d in n.find_all("dfn") if d.id), None)
            self._algo_counter += 1
            table_id = first_dfn.id if first_dfn is not None else f"__table{self._algo_counter}"
        rows = list(n.find_all("tr"))
        for tr in rows:
            th = tr.first("th")
            tds = [c for c in tr.find_all("td")]
            if th is None or not tds:
                continue
            label = th.norm_text().rstrip(": ").strip()
            value = " ".join(td.norm_text() for td in tds).strip()
            dfn_ids = [d.id for d in tr.find_all("dfn") if d.id]
            for d in tr.find_all("dfn"):
                if d.id:
                    self.emit("anchor", d.id)
                    self._visit_dfn(d, False, False)
            self.emit(
                "css-propdef-row",
                json.dumps(
                    {
                        "table_id": table_id,
                        "table_kind": kind,
                        "row_label": label,
                        "row_value": value,
                        "dfn_ids": dfn_ids,
                    },
                    ensure_ascii=False,
                ),
            )
        self._emit_descendant_anchors(
            n, skip={d.id for d in n.find_all("dfn") if d.id}
        )

    def _looks_like_event_def(self, n: Node) -> bool:
        labels = {tr.first("th").norm_text().rstrip(":").lower()
                  for tr in n.find_all("tr") if tr.first("th")}
        return "type" in labels and ("interface" in labels or "bubbles" in labels)

    @staticmethod
    def _boolish(text: str) -> bool | None:
        t = text.strip().lower()
        if t in ("yes", "✓", "true", "✓", "✔"):
            return True
        if t in ("no", "✗", "false", "✗", "✘", "none"):
            return True if False else False
        return None

    def _emit_summary_event_table(self, n: Node, header_cells: list[str]):
        col = {name: i for i, name in enumerate(header_cells)}
        body = n.first("tbody") or n
        for tr in body.find_all("tr"):
            cells = [c for c in tr.element_children() if c.tag in ("th", "td")]
            if not cells or cells[0].tag == "th" and tr.parent and tr.parent.tag == "thead":
                continue
            texts = [c.norm_text() for c in cells]
            if texts and texts[0].lower() in _SUMMARY_EVENT_HEADERS:
                continue
            type_cell = cells[0]
            dfn = type_cell.first("dfn")
            ev_id = dfn.id if dfn is not None and dfn.id else type_cell.id
            if dfn is not None and dfn.id:
                self.emit("anchor", dfn.id)
            # a type cell linking to another spec marks an extension
            # event (isExtension, extract-events.mjs:486-488)
            ext_href = None
            if dfn is None:
                a = type_cell.first("a")
                if a is not None and (a.get("href") or "").startswith("http"):
                    ext_href = a.get("href")
            get = lambda key: texts[col[key]] if key in col and col[key] < len(texts) else ""
            iface = get("interface")
            self.emit(
                "event-row",
                json.dumps(
                    {
                        "type": texts[0],
                        "iface": iface.strip() or None,
                        "bubbles": self._boolish(get("bubbles")),
                        "cancelable": self._boolish(get("cancelable")),
                        "targets": None,
                        "id": ev_id,
                        "ext_href": ext_href,
                        "src_format": "summary table",
                    },
                    ensure_ascii=False,
                ),
            )
        self._emit_descendant_anchors(
            n, skip={d.id for d in n.find_all("dfn") if d.id}
        )

    def _emit_event_def_table(self, n: Node):
        vals: dict[str, str] = {}
        for tr in n.find_all("tr"):
            th = tr.first("th")
            if th is None:
                continue
            label = th.norm_text().rstrip(":").lower()
            tds = list(tr.find_all("td"))
            if tds:
                vals[label] = " ".join(td.norm_text() for td in tds).strip()
            else:
                # `<tr><th>Type<td>success` parsed flat
                cells = [c for c in tr.element_children() if c.tag == "td"]
                if cells:
                    vals[label] = cells[0].norm_text()
        self.emit(
            "event-row",
            json.dumps(
                {
                    "type": vals.get("type", ""),
                    "iface": vals.get("interface") or None,
                    "bubbles": self._boolish(vals.get("bubbles", "")),
                    "cancelable": self._boolish(vals.get("cancelable", "")),
                    "targets": [t.strip() for t in vals.get("targets", "").split(",") if t.strip()]
                    or None,
                    "id": n.id,
                    "src_format": "css definition table",
                },
                ensure_ascii=False,
            ),
        )

    # -- definition lists --------------------------------------------------
    def _visit_dl(self, n: Node, informative: bool) -> bool:
        cls = n.classes
        if "element" in cls:
            # emit the element mapping, then let the generic walk pick
            # up IDL blocks / dfns / links nested in the dds (the HTML
            # spec inlines the interface IDL inside dl.element)
            self._emit_element_def(n)
            return False
        if "switch" in cls:
            self._emit_switch_algorithm(n)
            return True
        section = self.ref_section
        parent_sec = n.closest(
            lambda a: a.id in ("normative-references", "informative-references", "references")
        )
        if parent_sec is not None:
            if "informative" in parent_sec.id:
                section = "informative"
            else:
                section = section or "normative"
        if section is None:
            return False
        name = None
        for child in n.element_children():
            if child.tag == "dt":
                name = child.norm_text().strip("[] ")
            elif child.tag == "dd" and name is not None:
                a = child.first("a")
                url = a.get("href") if a is not None else None
                # flat reference lists mark informative entries inline
                # ("(Non-normative)" prefix — extract-references.mjs
                # non-normative text filter)
                entry_section = section
                if child.norm_text().lower().startswith("(non-normative)"):
                    entry_section = "informative"
                self.emit(
                    "ref-entry",
                    json.dumps(
                        {"section": entry_section, "name": name, "url": url},
                        ensure_ascii=False,
                    ),
                )
                # reference entries still contribute to the links extract
                for link in child.find_all("a"):
                    self._visit_link(link, False)
                name = None
        self._emit_descendant_anchors(n)
        return True

    def _visit_ref_ul(self, n: Node) -> None:
        """References expressed as <ul> lists (extract-references.mjs
        ul walking): per <li>, name = first link's text, url = href."""
        for li in n.find_all("li"):
            a = li.first("a")
            if a is None:
                continue
            self.emit(
                "ref-entry",
                json.dumps(
                    {
                        "section": self.ref_section,
                        "name": a.norm_text().strip("[] "),
                        "url": a.get("href"),
                    },
                    ensure_ascii=False,
                ),
            )
            for link in li.find_all("a"):
                self._visit_link(link, False)
        self._emit_descendant_anchors(n)

    def _emit_element_def(self, n: Node):
        """HTML-spec style `<dl class=element>` (extract-elements.mjs:25-149):
        element name(s) come from the preceding heading's dfn(s) —
        grouped headings yield one element per dfn; the interface comes
        from the "DOM interface:" dd (typed dfn/idl link > "Uses X"
        prose > lenient code/a fallback)."""
        names = list(getattr(self, "last_heading_dfns", []))
        iface = None
        grab_next = False
        for child in n.element_children():
            if child.tag == "dt":
                grab_next = "dom interface" in child.norm_text().lower()
            elif child.tag == "dd" and grab_next:
                iface_el = next(
                    (
                        d for d in child.iter()
                        if (d.tag == "dfn" and d.get("data-dfn-type") == "interface")
                        or (d.tag == "a" and d.get("data-link-type") == "idl")
                    ),
                    None,
                )
                if iface_el is not None:
                    iface = iface_el.norm_text() or None
                else:
                    m = re.match(r"^Uses? (.*?)[,.\s]", child.norm_text())
                    if m:
                        iface = m.group(1)
                    else:
                        code = child.first("code") or child.first("a")
                        iface = (
                            code.norm_text() if code is not None else child.norm_text()
                        ) or None
                grab_next = False
        for el_id, el_name in names:
            if not el_name:
                continue
            self.emit(
                "element-def",
                json.dumps(
                    {"dialect": "html", "name": el_name, "id": el_id,
                     "interface": iface},
                    ensure_ascii=False,
                ),
            )

    def _emit_dl_cssdef(self, dl: Node, kind: str):
        """One css-dl-def span per legacy dl definition list: names from
        the first dt's dfn[id]/a[name] (else the dt id, else the
        comma-split dt text), properties from dd table rows
        (extract-cssdfn.mjs extractDlDfns)."""
        names: list[dict] = []
        dt = dl.first("dt")
        if dt is None:
            return
        named = [
            d for d in dt.iter()
            if (d.tag == "dfn" and d.id) or (d.tag == "a" and d.get("name"))
        ]
        if named:
            for d in named:
                names.append(
                    {
                        "name": d.norm_text().replace("'", ""),
                        "id": d.id or d.get("name"),
                    }
                )
        elif dt.id:
            names.append({"name": dt.norm_text().replace("'", ""), "id": dt.id})
        else:
            for nm in dt.norm_text().split(","):
                nm = " ".join(nm.replace("'", "").split())
                if nm:
                    names.append({"name": nm, "id": None})
        props: dict[str, str] = {}
        for dd in dl.find_all("dd"):
            table = dd.first("table")
            if table is None:
                continue
            for tr in table.find_all("tr"):
                cells = [
                    c for c in tr.element_children() if c.tag in ("th", "td")
                ]
                if len(cells) < 2:
                    continue
                props[cells[0].norm_text()] = cells[-1].norm_text()
        self.emit(
            "css-dl-def",
            json.dumps(
                {"kind": kind, "names": names, "props": props},
                ensure_ascii=False,
            ),
        )

    def _emit_element_summary(self, n: Node):
        """SVG `div.element-summary`: name from .element-name (curly
        quotes stripped), anchor from the inner dfn, the parent's id, or
        the preceding heading; interface from the "DOM Interfaces" dd."""
        name_el = next(
            (d for d in n.iter() if "element-name" in d.classes), None
        )
        if name_el is None:
            return
        name = name_el.norm_text().replace("‘", "").replace("’", "")
        dfn = n.first("dfn")
        if dfn is not None and dfn.id:
            eid = dfn.id
        elif n.parent is not None and n.parent.id:
            eid = n.parent.id
        else:
            eid = self.heading_id or None
        iface = None
        grab = False
        for d in n.iter():
            if d.tag == "dt":
                grab = d.norm_text().rstrip(":").lower() == "dom interfaces"
            elif d.tag == "dd" and grab:
                iface = d.norm_text() or None
                grab = False
        self.emit(
            "element-def",
            json.dumps(
                {"dialect": "svg", "name": name, "id": eid, "interface": iface},
                ensure_ascii=False,
            ),
        )

    def _emit_definition_table_element(self, n: Node):
        """SVG `table.definition-table`: name from the inner dfn,
        interface from the "DOM Interfaces" th's td."""
        dfn = n.first("dfn")
        if dfn is None:
            return
        iface = None
        for tr in n.find_all("tr"):
            th = tr.first("th")
            if th is None or th.norm_text().rstrip(":").lower() != "dom interfaces":
                continue
            td = tr.first("td")
            if td is not None:
                iface = td.norm_text() or None
        self.emit(
            "element-def",
            json.dumps(
                {"dialect": "svg", "name": dfn.norm_text(),
                 "id": dfn.id or None, "interface": iface},
                ensure_ascii=False,
            ),
        )

    # -- algorithms --------------------------------------------------------
    def _visit_algorithm(self, n: Node, informative: bool, in_head: bool, in_idl_index: bool):
        self._algo_counter += 1
        algo_id = n.id or f"__algo{self._algo_counter}"
        name = n.get("data-algorithm") or ""
        intro_html = ""
        if n.tag == "ol":
            prev = self._prev_element_sibling(n)
            if prev is not None and prev.tag == "p":
                intro_html = prev.inner_html().strip()
                if not name:
                    d = prev.first("dfn")
                    if d is not None:
                        name = d.norm_text()
            steps_parent = n
        else:
            p = n.first("p")
            if p is not None:
                intro_html = p.inner_html().strip()
            steps_parent = n.first("ol") or n
        self.emit(
            "algo-step",
            json.dumps(
                {
                    "algo_id": algo_id,
                    "name": name,
                    "rationale": ".algorithm",
                    "depth": -1,
                    "html": intro_html,
                },
                ensure_ascii=False,
            ),
        )
        if steps_parent.tag == "ol":
            self._emit_steps(steps_parent, algo_id, depth=0)
        # anchors inside
        for d in n.find_all("dfn"):
            if d.id:
                self.emit("anchor", d.id)

    def _emit_steps(self, ol: Node, algo_id: str, depth: int):
        for li in (c for c in ol.element_children() if c.tag == "li"):
            inner_parts = []
            nested: list[Node] = []
            for c in li.children:
                if isinstance(c, Node) and c.tag == "ol":
                    nested.append(c)
                else:
                    inner_parts.append(c if isinstance(c, str) else c.outer_html())
            html = "".join(inner_parts).strip()
            self.emit(
                "algo-step",
                json.dumps(
                    {"algo_id": algo_id, "depth": depth, "html": html},
                    ensure_ascii=False,
                ),
            )
            for sub in nested:
                self._emit_steps(sub, algo_id, depth + 1)

    @staticmethod
    def _ol_operation(n: Node) -> str | None:
        """First-step operation verb if this unmarked <ol> looks like a
        normative algorithm (extract-algorithms.mjs:123-307 lexicon)."""
        lis = [c for c in n.element_children() if c.tag == "li"]
        if not lis:
            return None
        first_words = []
        for li in lis:
            txt = li.norm_text()
            if not txt:
                return None
            first_words.append(txt.split()[0].rstrip(",.:;").lower())
        if all(w in STEP_OPERATIONS for w in first_words):
            return first_words[0]
        return None

    def _visit_heuristic_algorithm(self, n: Node, operation: str):
        """Unmarked <ol> qualified by the operation lexicon; rationale
        is the qualifying verb (extract-algorithms.mjs fixtures)."""
        self._algo_counter += 1
        algo_id = n.id or f"__algo{self._algo_counter}"
        name, intro_html = "", ""
        prev = self._prev_element_sibling(n)
        if prev is not None and prev.tag == "p":
            intro_html = prev.inner_html().strip()
            d = prev.first("dfn")
            if d is not None:
                name = d.norm_text()
                if d.id:
                    algo_id = d.id
        self.emit(
            "algo-step",
            json.dumps(
                {"algo_id": algo_id, "name": name, "rationale": operation,
                 "depth": -1, "html": intro_html},
                ensure_ascii=False,
            ),
        )
        self._emit_steps(n, algo_id, depth=0)
        for d in n.find_all("dfn"):
            if d.id:
                self.emit("anchor", d.id)

    def _emit_switch_algorithm(self, n: Node):
        """dl.switch (extract-algorithms.mjs switch handling): the
        preceding 'To <dfn>…' paragraph names the algorithm; dt/dd pairs
        become switch cases."""
        self._algo_counter += 1
        prev = self._prev_element_sibling(n)
        name, algo_id, intro_html = "", f"__algo{self._algo_counter}", ""
        if prev is not None and prev.tag == "p":
            intro_html = prev.inner_html().strip()
            d = prev.first("dfn")
            if d is not None:
                name = d.norm_text()
                if d.id:
                    algo_id = d.id
        self.emit(
            "algo-step",
            json.dumps(
                {"algo_id": algo_id, "name": name, "rationale": ".switch",
                 "depth": -1, "html": intro_html},
                ensure_ascii=False,
            ),
        )
        self.emit(
            "algo-step",
            json.dumps(
                {"algo_id": algo_id, "depth": 0, "operation": "switch", "html": ""},
                ensure_ascii=False,
            ),
        )
        case_name = None
        for child in n.element_children():
            if child.tag == "dt":
                case_name = child.norm_text()
            elif child.tag == "dd" and case_name is not None:
                self.emit(
                    "algo-step",
                    json.dumps(
                        {"algo_id": algo_id, "depth": 1, "case": case_name,
                         "html": child.inner_html().strip()},
                        ensure_ascii=False,
                    ),
                )
                case_name = None

    @staticmethod
    def _prev_element_sibling(n: Node) -> Node | None:
        if n.parent is None:
            return None
        prev = None
        for c in n.parent.element_children():
            if c is n:
                return prev
            prev = c
        return None

    # -- prose -------------------------------------------------------------
    def _visit_p(self, n: Node, informative: bool, in_head: bool, in_idl_index: bool):
        # one-paragraph algorithm? ("To <dfn>x</dfn>, ..." —
        # extract-algorithms.mjs:285-307)
        txt = n.norm_text()
        first_dfn = n.first("dfn")
        if (
            txt.startswith("To ")
            and first_dfn is not None
            and first_dfn.id
            and self._next_element_sibling(n) is None
        ):
            self.emit(
                "algo-step",
                json.dumps(
                    {
                        "algo_id": first_dfn.id,
                        "name": first_dfn.norm_text(),
                        "rationale": "To <dfn>",
                        "depth": -1,
                        "html": n.inner_html().strip(),
                    },
                    ensure_ascii=False,
                ),
            )
        if txt:
            self.emit("prose", txt)
        # anchors for every [id]/a[name] inside the paragraph (the ids
        # extract covers every anchorable id, extract-ids.mjs:6-28)
        self._emit_descendant_anchors(n)
        # dfns/links inside prose
        for d in n.find_all("dfn"):
            self._visit_dfn(d, informative, in_head)
        for a in n.find_all("a"):
            self._visit_link(a, in_head)

    def _next_element_sibling(self, n: Node) -> Node | None:
        if n.parent is None:
            return None
        seen = False
        for c in n.parent.element_children():
            if seen:
                return c
            if c is n:
                seen = True
        return None

    def _visit_emu_clause(self, n: Node, informative: bool, in_head: bool, in_idl_index: bool):
        """EcmaScript-style emu-clause[id] > h1 headings
        (extract-headings.mjs:10-21)."""
        h1 = None
        for c in n.element_children():
            if c.tag == "h1":
                h1 = c
                break
        if n.id and h1 is not None:
            number, title = self._heading_parts(h1)
            level = len(number.split(".")) if number else 1
            self.heading_id = n.id
            self.emit(
                "heading",
                json.dumps(
                    {"id": n.id, "level": level, "number": number, "title": title},
                    ensure_ascii=False,
                ),
            )
        self._walk(n, informative, in_head, in_idl_index)


def _uses_dfn_model(roots) -> bool:
    """Whether any dfn[id] / heading[id] carries a dfn data attribute
    (extract-dfns.mjs:335-340 usesDfnDataModel)."""
    flags = ("data-dfn-type", "data-dfn-for", "data-export", "data-noexport")
    for root in roots:
        for n in root.iter():
            if not n.id:
                continue
            if n.tag == "dfn" or n.tag in ("h2", "h3", "h4", "h5", "h6"):
                if any(n.get(a) is not None for a in flags):
                    return True
    return False


def spans_from_html(
    html: str,
    base_url: str,
    pages: list[tuple[str, str]] | None = None,
    shortname: str | None = None,
) -> list[dict]:
    """Parse one (possibly multi-page) document into its span sequence.

    ``shortname`` selects a spec-specific preprocessing pass
    (stages/preprocess.py — extract-dfns.mjs:312-332 dispatch)."""
    from .htmldom import clear_parents
    from .preprocess import preprocess_spec

    root = parse_html(html)
    page_roots = [(url, parse_html(page_html)) for url, page_html in pages or []]
    all_pages = [(base_url, root)] + page_roots
    preprocess_spec(shortname, all_pages)
    w = _Walker(base_url, uses_dfn_model=_uses_dfn_model([r for _, r in all_pages]))
    w.prescan(all_pages)
    if shortname:
        # downstream extractors with shortname-keyed behavior (e.g. the
        # MathML element dialect) read it from this meta span
        w.emit("meta", f"shortname={shortname}")
    w.walk_document(root)
    for url, proot in page_roots:
        w.merge_subpage(url, proot)
    events = w.events
    if w.saw_idl_index:
        # Bikeshed IDL index wins over in-prose IDL blocks
        # (extract-webidl.mjs:13-35)
        events = [e for e in events if e[0] != "idl-block"]
        events.extend(w.idl_index_events)
    # whole-document CSS definitions pass (needs DOM context the span
    # stream doesn't carry: parent/sibling prose, production-rule
    # mapping, value attachment) — extract-cssdfn.mjs main flow
    from .cssdfn import extract_css_struct

    css_struct = extract_css_struct(all_pages)
    if any(css_struct.get(k) for k in css_struct):
        events.append(
            ("css-data", json.dumps(css_struct, ensure_ascii=False), "")
        )
    # whole-document references pass (generator-keyed selectors +
    # heading/sibling walks) — extract-references.mjs main flow
    from .refsdfn import extract_references

    refs_struct = extract_references(all_pages)
    if refs_struct:
        events.append(
            ("refs-data", json.dumps(refs_struct, ensure_ascii=False), "")
        )
    # whole-document events pass (summary/def/event-definition tables,
    # fire-an-event phrasing ranges, IDL handlers, event dfns) —
    # extract-events.mjs main flow
    from .eventsdfn import extract_events_struct

    ev_struct = extract_events_struct(all_pages, shortname=shortname)
    if ev_struct:
        events.append(
            ("events-data", json.dumps(ev_struct, ensure_ascii=False), "")
        )
    # whole-document algorithms pass (.algorithm/.switch containers,
    # probable <ol>s via the operation lexicon, "To <dfn>" one-liners)
    # — extract-algorithms.mjs main flow
    from .algodfn import extract_algorithms_struct

    algo_struct = extract_algorithms_struct(all_pages)
    if algo_struct:
        events.append(
            ("algos-data", json.dumps(algo_struct, ensure_ascii=False), "")
        )
    for _, r in all_pages:
        clear_parents(r)
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(events)
    ]


def respec_source_error(spans: list[dict]) -> str | None:
    """Ungenerated-source guard. The reference renders specs in a
    browser and WAITS for ReSpec generation before extracting
    (src/lib/util.js:613-628 — ≤60 retries then error); this engine
    parses static HTML, so a raw ReSpec/Bikeshed *source* — generator
    machinery present but none of the generated structure (no title
    span, no heading spans) — would otherwise silently extract
    nothing. Return the reference-style error message for such a
    document (caller records it in the ``error`` column, content
    kept, crawl continues — specs-crawler.js:166-171 semantics)."""
    gen = None
    saw_marker = False
    first_title = None
    checked_h1 = False
    for s in spans:
        k = s["kind"]
        if k in ("title", "heading"):
            # Draft-CSS-server hiccup: a directory listing served in
            # place of the spec ("Index of /css-foo/..."), detected on
            # the FIRST level-1 heading exactly as the reference does
            # (src/lib/util.js:600-604: document.querySelector('h1')
            # textContent) — scanning past titles and lower-level
            # headings until an h1 appears, falling back to the title
            # span only when the document has no h1 at all.
            if k == "title" and first_title is None:
                first_title = s["text"]
            elif k == "heading" and not checked_h1:
                try:
                    h = json.loads(s["text"])
                except (ValueError, AttributeError):
                    h = None
                if isinstance(h, dict) and h.get("level") == 1:
                    checked_h1 = True
                    if (h.get("title") or "").lstrip().startswith("Index of "):
                        return "CSS server issue detected"
            saw_marker = True
        elif k == "meta" and s["text"].startswith("generator="):
            gen = s["text"][len("generator="):]
    if (not checked_h1 and first_title is not None
            and first_title.lstrip().startswith("Index of ")):
        return "CSS server issue detected"
    if gen and not saw_marker:
        return (
            f"Spec generator '{gen}' detected but no generated content "
            "markers (title/headings) present — document looks like an "
            "ungenerated source; the reference waits for generation "
            "before extracting (src/lib/util.js:613-628)"
        )
    return None


class SpanParser:
    """Actor-pool stage: Arrow batch of fetched HTML → documents rows.

    Input columns : doc_id, url, html, page_urls:list<string>,
                    page_htmls:list<string>
    Output columns: doc_id, spans (input_hint schema) + url passthrough.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        pus = (
            batch.column("page_urls").to_pylist()
            if "page_urls" in batch.column_names
            else [[] for _ in doc_ids]
        )
        phs = (
            batch.column("page_htmls").to_pylist()
            if "page_htmls" in batch.column_names
            else [[] for _ in doc_ids]
        )
        shortnames = (
            batch.column("shortname").to_pylist()
            if "shortname" in batch.column_names
            else [None for _ in doc_ids]
        )
        spans_col = []
        errors = []
        for url, html, purls, phtmls, shortname in zip(urls, htmls, pus, phs, shortnames):
            pages = list(zip(purls or [], phtmls or []))
            try:
                spans_col.append(
                    spans_from_html(html or "", url, pages, shortname=shortname)
                )
                errors.append(None)
            except Exception as e:  # per-doc error capture; crawl continues
                # (reference records spec.error and moves on,
                #  specs-crawler.js:166-171)
                spans_col.append([])
                errors.append(f"{type(e).__name__}: {e}")
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "spans": pa.array(spans_col, pa.list_(SPAN_STRUCT)),
                "url": pa.array(urls, pa.string()),
                "error": pa.array(errors, pa.string()),
            }
        )
