"""References extraction — faithful port of the reference contract
(reference: src/browserlib/extract-references.mjs, line refs below).

Heading-and-sibling algorithm over the in-memory DOM (generator-keyed
list selectors, last-matching-heading scans, nextTag sibling walks),
run at parse time; the result lands in one ``refs-data`` span that
``extract_refs`` explodes into rows.
"""

from __future__ import annotations

import re

from .htmldom import Node

_HEADINGS = ("h1", "h2", "h3", "h4", "h5", "h6")


def get_generator(pages) -> str | None:
    """get-generator.mjs (DOM-visible part)."""
    for _url, root in pages:
        for el in root.iter():
            if el.tag == "meta" and (el.get("name") or "").lower() == "generator":
                content = el.get("content") or ""
                if re.search(r"bikeshed", content, re.I):
                    return "bikeshed"
                if re.search(r"respec", content, re.I):
                    return "respec"
        body = next((b for b in root.iter() if b.tag == "body"), None)
        if body is not None and body.id == "respecDocument":
            return "respec"
    return None


def _next_siblings(node: Node):
    parent = node.parent
    if parent is None:
        return
    sibs = parent.element_children()
    try:
        i = sibs.index(node)
    except ValueError:
        return
    yield from sibs[i + 1:]


def _next_tag(node: Node, name: str, until: Node | None = None) -> Node | None:
    """extract-references.mjs:66-85."""
    tags = (_HEADINGS + ("hgroup",)) if name == "heading" else (name,)
    for el in _next_siblings(node):
        if until is not None and el is until:
            return None
        if el.tag in tags:
            return el
    return None


def _text(n: Node) -> str:
    return n.text()


def _parse_references(lst: Node, filter_informative: bool = False):
    """extract-references.mjs:100-147."""
    default_ref: list[dict] = []
    informative_ref: list[dict] = []
    if lst.tag == "dl":
        for dt in (c for c in lst.element_children() if c.tag == "dt"):
            ref: dict = {"name": re.sub(r"[\[\] \n]", "", _text(dt))}
            desc = _next_tag(dt, "dd")
            if desc is None or not ref["name"]:
                continue
            url = next(
                (
                    a.get("href")
                    for a in desc.find_all("a")
                    if "://" in (a.get("href") or "")
                ),
                None,
            )
            if url:
                ref["url"] = url
            if filter_informative and re.search(
                r"non-normative", _text(desc), re.I
            ):
                informative_ref.append(ref)
                continue
            default_ref.append(ref)
    elif lst.tag == "ul":
        for li in (c for c in lst.element_children() if c.tag == "li"):
            # drop nested lists (subparts of the main reference)
            def no_nested(node: Node) -> str:
                parts: list[str] = []

                def rec(x: Node):
                    for c in x.children:
                        if isinstance(c, str):
                            parts.append(c)
                        elif c.tag != "ul":
                            rec(c)

                rec(node)
                return "".join(parts)

            # anchors inside nested uls were dropped with the clone; emulate
            anchor = next(
                (
                    a
                    for a in li.find_all("a")
                    if a.get("href") is not None
                    and not _in_nested_ul(a, li)
                ),
                None,
            )
            ref = {}
            if anchor is not None:
                ref["name"] = _text(anchor).strip()
                ref["url"] = anchor.get("href")
            else:
                ref["name"] = no_nested(li).strip()
            default_ref.append(ref)
    return default_ref, informative_ref


def _in_nested_ul(el: Node, li: Node) -> bool:
    n = el.parent
    while n is not None and n is not li:
        if n.tag == "ul":
            return True
        n = n.parent
    return False


_RE_NORMATIVE = re.compile(
    r"^\s*((\w|\d+)(\.\d+)*\.?)?\s*normative\s+references\s*$", re.I
)
_RE_INFORMATIVE = re.compile(
    r"^\s*((\w|\d+)(\.\d+)*\.?)?\s*(informative|non-normative)\s+references\s*$",
    re.I,
)


def _find_all(pages, pred):
    out = []
    for _url, root in pages:
        for el in root.iter():
            if pred(el):
                out.append(el)
    return out


def _without_rules(pages) -> dict:
    """extract-references.mjs:160-268."""
    references: dict = {"normative": [], "informative": []}
    anchors = _find_all(pages, lambda el: el.tag in ("h1", "h2", "h3"))

    # ECMA-426 style <emu-clause id="sec-...-references">
    for ref_type in ("normative", "informative"):
        clause = next(
            (
                el
                for el in _find_all(pages, lambda e: e.tag == "emu-clause")
                if el.id in (
                    f"sec-references-{ref_type}", f"sec-{ref_type}-references",
                )
            ),
            None,
        )
        if clause is not None:
            refs = []
            for p in clause.find_all("p"):
                txt = _text(p)
                m = re.search(r"(.+?)(,|\.)", txt, re.M)
                name = m.group(1).strip() if m else None
                has_full_title = p.first("i") is not None
                anchor = next(
                    (a for a in p.find_all("a") if a.get("href")), None
                )
                if name and (anchor is not None or has_full_title):
                    ref: dict = {"name": name}
                    if anchor is not None and re.match(
                        r"^https?://", anchor.get("href") or ""
                    ):
                        ref["url"] = anchor.get("href")
                    refs.append(ref)
            references[ref_type] = refs

    def find_last(regex):
        # JS .match() searches anywhere in the string
        found = None
        for el in anchors:
            if regex.search(_text(el)):
                found = el
        return found

    normative = find_last(_RE_NORMATIVE)
    if normative is not None:
        nxt = _next_tag(normative, "heading")
        lst = _next_tag(normative, "dl", nxt) or _next_tag(normative, "ul", nxt)
        if lst is not None:
            references["normative"] = _parse_references(lst)[0]

    informative = find_last(_RE_INFORMATIVE)
    if informative is not None:
        nxt = _next_tag(informative, "heading")
        lst = _next_tag(informative, "dl", nxt) or _next_tag(informative, "ul", nxt)
        if lst is not None:
            references["informative"] = _parse_references(lst)[0]

    if informative is not None or normative is not None:
        return references

    ref_heading = find_last(re.compile(r"references", re.I))
    if ref_heading is not None:
        next_section = _next_tag(ref_heading, ref_heading.tag)
        sub_level = "h" + str(int(ref_heading.tag[1]) + 1)
        sub = ref_heading
        while True:
            sub = _next_tag(sub, sub_level, next_section)
            if sub is None:
                break
            txt = _text(sub)
            if re.search(r"normative", txt, re.I) or re.search(
                r"informative", txt, re.I
            ):
                lst = _next_tag(sub, "dl", next_section) or _next_tag(
                    sub, "ul", next_section
                )
                if lst is not None:
                    ref_type = (
                        "normative"
                        if re.search(r"normative", txt, re.I)
                        and not re.search(r"non-normative", txt, re.I)
                        and not re.search(r"informative", txt, re.I)
                        else "informative"
                    )
                    # the reference checks /normative/i first — which
                    # also matches "non-normative"/"informative"… mirror
                    ref_type = (
                        "normative"
                        if re.search(r"normative", txt, re.I)
                        else "informative"
                    )
                    references[ref_type] = _parse_references(lst)[0]

        if not references["normative"] and not references["informative"]:
            lst = _next_tag(ref_heading, "dl", next_section) or _next_tag(
                ref_heading, "ul", next_section
            )
            if lst is not None:
                refs = _parse_references(lst, filter_informative=True)
                references["normative"] = refs[0]
                references["informative"] = refs[1]
    return references


def extract_references(pages) -> dict | None:
    """extract-references.mjs:19-28 + 280-307."""
    generator = get_generator(pages)
    selectors = {
        "bikeshed": {
            "normative": ("normative", "+dl"),
            "informative": ("informative", "+dl"),
        },
        "respec": {
            "normative": ("normative-references", ">dl"),
            "informative": ("informative-references", ">dl"),
        },
    }.get(generator)

    if selectors is None:
        references = _without_rules(pages)
    else:
        references = {"normative": [], "informative": []}
        for ref_type in ("normative", "informative"):
            anchor_id, mode = selectors[ref_type]
            target = next(
                (
                    el
                    for el in _find_all(pages, lambda e: True)
                    if el.id == anchor_id
                ),
                None,
            )
            lst = None
            if target is not None:
                if mode == "+dl":
                    lst = next(
                        (s for s in _next_siblings(target) if s.tag == "dl"),
                        None,
                    )
                    if lst is not None:
                        sibs = list(_next_siblings(target))
                        lst = sibs[0] if sibs and sibs[0].tag == "dl" else None
                else:
                    lst = next(
                        (
                            c
                            for c in target.element_children()
                            if c.tag == "dl"
                        ),
                        None,
                    )
            if lst is not None:
                refs = _parse_references(
                    lst, filter_informative=(ref_type == "normative")
                )
                references[ref_type] = references[ref_type] + refs[0]
                if ref_type == "normative":
                    references["informative"] = references["informative"] + refs[1]

    if references and (references["normative"] or references["informative"]):
        return references
    return None
