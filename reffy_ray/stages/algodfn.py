"""Algorithms extraction — faithful port of the reference contract
(reference: src/browserlib/extract-algorithms.mjs, line refs below).

Whole-document pass over the in-memory DOM (".algorithm"/".switch"
containers, probable <ol> steps via the operation lexicon, one-line
"To <dfn>" algorithms, nested/additional/ignored step handling), run
at parse time; the result lands in one ``algos-data`` span that
``extract_algorithms`` explodes into rows.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from .cssdfn import _abs_url, _is_informative
from .htmldom import VOID, Node

# stepOperations (extract-algorithms.mjs:123-283) — reuse the walker's
# lexicon, completed with branching keywords the reference lists
from .parse import STEP_OPERATIONS

_BRANCHES = ("for", "if", "while", "otherwise", "assert")

_STEP_INLINE_OPS: list = [
    "abort all these steps",
    "abort these steps",
    "fire a simple event",
    "fire an event",
    "in parallel",
    "reject",
    "resolve",
    "run the following steps",
    "run these steps",
    "terminate these steps",
    re.compile(r"queue a( \w+)? task", re.I),
]

_STEP_ANCHORS: list = [
    re.compile(r"^⌛"),
    "in parallel",
    re.compile(r"^otherwise(\,| )", re.I),
]


def _normalize(s: str) -> str:
    """extract-algorithms.mjs:352-354."""
    return re.sub(r"\s+", " ", re.sub(r"\r|\n", " ", s)).strip()


def _clean_text(el: Node) -> str:
    """getTextContent (cloneAndClean → informative subtrees out)."""
    parts: list[str] = []

    def rec(n: Node):
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            elif not _is_informative(c):
                rec(c)

    rec(el)
    return _normalize("".join(parts))


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


def _serialize_inner(
    el: Node, page_url: str, drop_ol: bool = False
) -> str:
    """getHTMLContent (extract-algorithms.mjs:324-348): innerHTML with
    informative subtrees (and optionally <ol>s) removed and relative
    href/src absolutized."""

    def ser(n) -> str:
        if isinstance(n, str):
            return _escape_text(n)
        if _is_informative(n) or (drop_ol and n.tag == "ol"):
            return ""
        attrs = []
        for k, v in n.attrs.items():
            if k in ("href", "src") and v and not v.startswith("http"):
                if v.startswith("#"):
                    # urljoin can't resolve against non-hierarchical
                    # schemes like about:blank; a fragment always
                    # attaches to the page URL
                    v = page_url.split("#")[0] + v
                else:
                    v = urljoin(page_url, v)
            attrs.append(f' {k}="{_escape_attr(v)}"' if v != "" else f' {k}=""')
        a = "".join(attrs)
        if n.tag in VOID:
            return f"<{n.tag}{a}>"
        inner = "".join(ser(c) for c in n.children)
        return f"<{n.tag}{a}>{inner}</{n.tag}>"

    return "".join(ser(c) for c in el.children).strip()


def _page_of(el: Node, default: str) -> str:
    anc = el.closest(lambda a: a.get("data-reffy-page") is not None)
    return anc.get("data-reffy-page") if anc is not None else default


def _contains(ancestor: Node, el: Node) -> bool:
    n = el
    while n is not None:
        if n is ancestor:
            return True
        n = n.parent
    return False


def _prev_element_sibling(n: Node) -> Node | None:
    p = n.parent
    if p is None:
        return None
    sibs = p.element_children()
    try:
        i = sibs.index(n)
    except ValueError:
        return None
    return sibs[i - 1] if i > 0 else None


def _in_informative(el: Node) -> bool:
    return el.closest(_is_informative) is not None


def _defined_name_in(el: Node, page_url: str) -> dict:
    """getDefinedNameIn (extract-algorithms.mjs:359-402)."""
    if el.tag == "dfn":
        dfn = el
    else:
        dfn = next(
            (
                d
                for d in el.iter()
                if d is not el
                and (
                    d.tag == "dfn"
                    or (
                        d.tag in ("h2", "h3", "h4", "h5", "h6")
                        and d.get("data-dfn-type") is not None
                    )
                )
            ),
            None,
        )
    if dfn is not None:
        name = ""
        if dfn.get("data-dfn-for"):
            name = (
                _normalize(
                    re.split(r",(?![^\(]*\))", dfn.get("data-dfn-for"))[0]
                )
                + "/"
            )
        if dfn.get("data-lt"):
            name += _normalize(dfn.get("data-lt").split("|")[0])
        else:
            name += _clean_text(dfn)
        if dfn.id:
            return {"name": name, "href": _abs_url(dfn, _page_of(dfn, page_url))}
        return {"name": name}
    heading = next(
        (
            h
            for h in el.iter()
            if h is not el and h.tag in ("h2", "h3", "h4", "h5", "h6") and h.id
        ),
        None,
    )
    if heading is not None:
        return {
            "name": _clean_text(heading),
            "href": _abs_url(heading, _page_of(heading, page_url)),
        }
    return {}


def _find_intro_paragraph(algo: dict) -> Node | None:
    """findIntroParagraph (extract-algorithms.mjs:405-436)."""
    root: Node = algo["root"]
    paragraph = None
    container = root.closest(
        lambda a: a.tag == "li" or "algorithm" in a.classes
    )
    while container is not None:
        dfn = next(
            (d for d in container.iter() if d.tag == "dfn"), None
        )
        if dfn is not None and not _contains(root, dfn):
            paragraph = dfn.closest(
                lambda a: a.tag in ("p", "div", "li")
            )
            break
        if container.tag == "li":
            break
        parent = container.parent
        container = (
            parent.closest(lambda a: a.tag == "li" or "algorithm" in a.classes)
            if parent is not None
            else None
        )

    if paragraph is None:
        paragraph = root
        while paragraph is not None and (
            paragraph.tag != "p" or _is_informative(paragraph)
        ):
            paragraph = _prev_element_sibling(paragraph)
    return paragraph


def _find_rationale(ol: Node) -> str | None:
    """findRationale (extract-algorithms.mjs:594-634)."""
    if "algorithm" in ol.classes:
        return ".algorithm"
    ops = sorted(STEP_OPERATIONS | set(_BRANCHES))
    for li in ol.find_all("li"):
        text = _clean_text(li).lower()
        for op in ops:
            if re.match(rf"^{re.escape(op)}(\.|:| )", text, re.I):
                return op
        for op in _STEP_INLINE_OPS:
            if isinstance(op, str):
                if op in text:
                    return op
            elif op.search(text):
                return op.pattern if not hasattr(op, "js_str") else str(op)
        for anchor in _STEP_ANCHORS:
            if isinstance(anchor, str):
                if anchor in text:
                    return anchor
            elif anchor.search(text):
                return _js_regex_str(anchor)
    return None


def _js_regex_str(rex: re.Pattern) -> str:
    """String form of the rationale the reference produces for regexp
    anchors (RegExp.toString(): /pattern/flags)."""
    flags = "i" if rex.flags & re.I else ""
    return f"/{rex.pattern}/{flags}"


def _find_algorithms(
    section: Node, page_url: str, include_ignored: bool = False,
    doc_order: dict[int, int] | None = None,
) -> list[dict]:
    """findAlgorithms (extract-algorithms.mjs:638-709)."""
    actual = []
    for el in section.iter():
        if el is section or not (el.classes & {"algorithm", "switch"}):
            continue
        if _in_informative(el):
            continue
        algo = {
            "rationale": ".algorithm" if "algorithm" in el.classes else ".switch",
            "root": el,
        }
        if el.tag not in ("dl", "ol"):
            inner = next(
                (o for o in el.iter() if o is not el and o.tag == "ol"), None
            )
            algo["root"] = inner
        if algo["root"] is not None:
            actual.append(algo)

    probable = []
    for ol in section.iter():
        if ol is section or ol.tag != "ol":
            continue
        if _in_informative(ol):
            continue
        if ol.closest(
            lambda a: a.tag == "nav" or "toc" in a.classes or a.id == "toc"
        ) is not None:
            continue
        if any(_contains(a["root"], ol) for a in actual):
            continue
        rationale = _find_rationale(ol)
        if isinstance(rationale, re.Pattern):
            rationale = _js_regex_str(rationale)
        algo = {"rationale": rationale, "root": ol}
        if include_ignored or rationale:
            probable.append(algo)

    all_algos = actual + probable
    seen_roots: list[Node] = []
    deduped = []
    for a in all_algos:
        if any(a["root"] is r for r in seen_roots):
            continue
        seen_roots.append(a["root"])
        deduped.append(a)
    all_algos = [
        a1
        for a1 in deduped
        if not any(
            a2 is not a1 and _contains(a2["root"], a1["root"]) for a2 in deduped
        )
    ]

    for algo in all_algos:
        algo["intro"] = _find_intro_paragraph(algo)

    # probable one-line "To <dfn>" algorithms (extract-algorithms.mjs:682-694)
    def is_candidate_dfn(d: Node) -> bool:
        return (
            d.tag == "dfn"
            and d.get("data-export") is not None
            and d.get("data-dfn-type") in ("dfn", "abstract-op")
        )

    for p in section.iter():
        if p.tag != "p":
            continue
        dfn = next(
            (d for d in p.iter() if d is not p and is_candidate_dfn(d)), None
        )
        if dfn is None:
            continue
        if not p.text().startswith("To " + dfn.text()):
            continue
        if any(a.get("intro") is p for a in all_algos):
            continue
        all_algos.append({"rationale": "To <dfn>", "root": p, "intro": p})

    if doc_order:
        all_algos.sort(key=lambda a: doc_order.get(id(a["root"]), 0))
    return all_algos


def _serialize_steps(root: Node, page_url: str, doc_order) -> list[dict]:
    """serializeSteps (extract-algorithms.mjs:539-561)."""
    if root.tag == "dl":
        options = [c for c in root.element_children() if c.tag == "dt"]
        steps = []
        for option in options:
            sibs = root.element_children()
            i = sibs.index(option)
            dd = next((s for s in sibs[i + 1:] if s.tag == "dd"), None)
            entry = {"case": _clean_text(option)}
            if dd is not None:
                entry.update(_serialize_step(dd, page_url, doc_order))
            steps.append(entry)
        return [{"operation": "switch", "steps": steps}]
    if root.tag == "ol":
        return [
            _serialize_step(li, page_url, doc_order)
            for li in root.element_children()
            if li.tag == "li"
        ]
    return []


def _serialize_step(li: Node, page_url: str, doc_order) -> dict:
    """serializeStep (extract-algorithms.mjs:567-590)."""
    res: dict = {}
    candidates = _find_algorithms(
        li, page_url, include_ignored=True, doc_order=doc_order
    )
    algorithms = [a for a in candidates if a.get("rationale")]
    if algorithms:
        res = _serialize_algorithm(
            algorithms[0], page_url, doc_order, nested=True
        )
    if not res.get("html"):
        res["html"] = _serialize_inner(
            li, _page_of(li, page_url), drop_ol=True
        )
    if len(algorithms) > 1:
        res["additional"] = [
            _serialize_algorithm(a, page_url, doc_order, nested=True)
            for a in algorithms[1:]
        ]
    ignored = [a for a in candidates if not a.get("rationale")]
    if ignored:
        res["ignored"] = [_clean_text(a["root"]) for a in ignored]
    return res


def _algorithm_info(algo: dict, page_url: str, nested: bool) -> dict:
    """getAlgorithmInfo (extract-algorithms.mjs:442-523)."""
    info: dict = {}
    root: Node = algo["root"]
    container = root.closest(lambda a: "algorithm" in a.classes)
    if not nested:
        while container is not None:
            if container.get("data-algorithm"):
                info = {"name": _normalize(container.get("data-algorithm"))}
                if container.get("data-algorithm-for"):
                    info["name"] = (
                        _normalize(container.get("data-algorithm-for"))
                        + "/"
                        + info["name"]
                    )
                if container.id:
                    info["href"] = _abs_url(
                        container, _page_of(container, page_url)
                    )
                else:
                    dfn = _defined_name_in(container, page_url)
                    if dfn.get("href"):
                        info["href"] = dfn["href"]
            else:
                info = _defined_name_in(container, page_url)
                if info.get("name") or info.get("href"):
                    break
            parent = container.parent
            container = (
                parent.closest(lambda a: "algorithm" in a.classes)
                if parent is not None
                else None
            )

    paragraph = algo.get("intro")
    if paragraph is not None:
        if not nested and not (info.get("name") and info.get("href")):
            merged = _defined_name_in(paragraph, page_url)
            merged.update(info)
            info = merged
        info["html"] = _serialize_inner(
            paragraph, _page_of(paragraph, page_url), drop_ol=True
        )
    elif root.parent is not None and root.parent.tag in ("li", "dd", "div"):
        # prose before the algorithm inside a list/definition item
        holder = Node("div")
        for c in root.parent.children:
            if c is root:
                break
            holder.children.append(c)
        if not nested and not (info.get("name") and info.get("href")):
            merged = _defined_name_in(holder, page_url)
            merged.update(info)
            info = merged
        info["html"] = _serialize_inner(
            holder, _page_of(root, page_url), drop_ol=True
        )

    if (
        not nested
        and not (info.get("name") and info.get("href"))
        and root.parent is not None
        and root.parent.tag == "dd"
    ):
        dt = _prev_element_sibling(root.parent)
        while dt is not None and dt.tag != "dt":
            dt = _prev_element_sibling(dt)
        if dt is not None:
            merged = _defined_name_in(dt, page_url)
            merged.update(info)
            info = merged
    return info


def _serialize_algorithm(
    algo: dict, page_url: str, doc_order, nested: bool = False
) -> dict:
    """serializeAlgorithm (extract-algorithms.mjs:526-534)."""
    res = _algorithm_info(algo, page_url, nested)
    res["rationale"] = algo.get("rationale")
    steps = _serialize_steps(algo["root"], page_url, doc_order)
    if steps:
        res["steps"] = steps
    return res


def extract_algorithms_struct(pages) -> list[dict]:
    """extract-algorithms.mjs:713-719 over the merged page list."""
    out: list[dict] = []
    for page_url, root in pages:
        doc_order = {id(n): i for i, n in enumerate(root.iter())}
        for algo in _find_algorithms(root, page_url, doc_order=doc_order):
            out.append(
                _serialize_algorithm(algo, page_url, doc_order)
            )
    return out
