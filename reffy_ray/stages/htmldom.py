"""Minimal DOM built on the stdlib HTMLParser.

Stand-in for the reference's rendered Puppeteer DOM
(reference: src/lib/util.js:311-681). Handles the fixture-grade HTML
of the mock corpus (src/lib/mock-server.js) and of the inline fixtures
in test/extract-*.js: unclosed <p>/<li>/<dt>/<dd>/<tr>/<th>/<td>,
void elements, and attribute access. No scripting, no CSS.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# tag → set of open tags it implicitly closes (HTML5-ish)
_AUTOCLOSE = {
    "li": {"li"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
    "tr": {"tr", "th", "td"},
    "th": {"th", "td"},
    "td": {"th", "td"},
    "p": {"p"},
    "option": {"option"},
    "thead": {"thead", "tbody", "tr", "th", "td"},
    "tbody": {"thead", "tbody", "tr", "th", "td"},
}
_BLOCK = {
    "address", "article", "aside", "blockquote", "div", "dl", "fieldset",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "main", "nav", "ol", "pre", "section", "table", "ul",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "_css_el_cache")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None, parent: "Node | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node | str] = []
        self.parent = parent

    # -- attribute helpers -------------------------------------------------
    def get(self, name: str, default: str | None = None) -> str | None:
        return self.attrs.get(name, default)

    @property
    def id(self) -> str:
        return self.attrs.get("id", "")

    @property
    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    def has_class(self, *names: str) -> bool:
        cls = self.classes
        return any(n in cls for n in names)

    # -- tree helpers ------------------------------------------------------
    def element_children(self):
        return [c for c in self.children if isinstance(c, Node)]

    def iter(self):
        """Depth-first pre-order iteration over element nodes."""
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter()

    def find_all(self, *tags: str):
        for n in self.iter():
            if n.tag in tags:
                yield n

    def first(self, *tags: str) -> "Node | None":
        for n in self.iter():
            if n is not self and n.tag in tags:
                return n
        return None

    def closest(self, pred) -> "Node | None":
        n = self
        while n is not None:
            if pred(n):
                return n
            n = n.parent
        return None

    def text(self) -> str:
        parts: list[str] = []
        self._collect_text(parts)
        return "".join(parts)

    def _collect_text(self, parts: list[str]) -> None:
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                c._collect_text(parts)

    def norm_text(self) -> str:
        """Whitespace-normalized text (extract-dfns.mjs:44-46 analog)."""
        return " ".join(self.text().split()).replace("−", "-")

    def inner_html(self) -> str:
        return "".join(_serialize(c) for c in self.children)

    def outer_html(self) -> str:
        return _serialize(self)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} id={self.id!r} children={len(self.children)}>"


def _serialize(node) -> str:
    if isinstance(node, str):
        return node
    attrs = "".join(
        f' {k}="{v}"' if v != "" else f' {k}=""' for k, v in node.attrs.items()
    )
    if node.tag in VOID:
        return f"<{node.tag}{attrs}>"
    return f"<{node.tag}{attrs}>{node.inner_html()}</{node.tag}>"


# Maximum element nesting depth. Deeper (malformed / adversarial) markup
# is flattened: elements beyond the cap attach as children but never
# nest further, bounding recursion everywhere downstream. Real specs
# nest a few dozen levels at most.
MAX_DEPTH = 120


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]
        self._rawtext_tag: str | None = None

    def handle_starttag(self, tag, attrs):
        if self._rawtext_tag:
            return
        close = _AUTOCLOSE.get(tag)
        if close:
            # pop implicitly-closed open elements (but never cross a
            # structural container boundary)
            while (
                len(self.stack) > 1
                and self.stack[-1].tag in close
            ):
                self.stack.pop()
        elif tag in _BLOCK:
            # an open <p> is closed by any block element
            while len(self.stack) > 1 and self.stack[-1].tag == "p":
                self.stack.pop()
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID and len(self.stack) < MAX_DEPTH:
            self.stack.append(node)
            if tag in ("script", "style"):
                self._rawtext_tag = tag

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if self._rawtext_tag:
            if tag == self._rawtext_tag:
                self._rawtext_tag = None
            else:
                return
        # find matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    def handle_comment(self, data):  # comments stripped (clone-and-clean.mjs:7-25)
        pass


def parse_html(html: str) -> Node:
    p = _TreeBuilder()
    p.feed(html)
    p.close()
    return p.root


def clear_parents(root: Node) -> None:
    """Break parent-pointer cycles after a tree is no longer walked, so
    plain refcounting frees it. Lets hot workers run with the cyclic GC
    disabled — GC heap scans are a memory-bandwidth amplifier when many
    parser processes run concurrently on one node."""
    stack = [root]
    while stack:
        n = stack.pop()
        n.parent = None
        for c in n.children:
            if isinstance(c, Node):
                stack.append(c)
