"""HTML5 outline algorithm — faithful port of the reference contract
(reference: src/browserlib/create-outline.mjs, line refs below; the
algorithm itself is
https://html.spec.whatwg.org/multipage/sections.html#outlines).

``create_outline(root)`` returns ``(outline, node_to_section)``:
conceptual sections with ``heading`` (a Node or the string
"__implied"), ``root``, ``subSections`` and ``subRoots`` lists, plus a
mapping from every element with an id/name to its containing section —
the substrate for faithful id→heading mapping on real specs (implied
sections, aside/nav scoping, hgroup handling).
"""

from __future__ import annotations

from .htmldom import Node

HEADING_CONTENT = ("h1", "h2", "h3", "h4", "h5", "h6", "hgroup")
SECTIONING_CONTENT = ("article", "aside", "nav", "section")
SECTIONING_ROOT = ("blockquote", "body", "details", "dialog", "fieldset",
                   "figure", "td")


def _new_section() -> dict:
    return {"heading": None, "root": None, "subSections": [], "subRoots": []}


def flatten_sections(outline: list[dict]) -> list[dict]:
    out = list(outline)
    for section in outline:
        out.extend(flatten_sections(section["subSections"]))
    return out


def _rank(node) -> int:
    """create-outline.mjs:59-70."""
    if isinstance(node, Node):
        if node.tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            return -int(node.tag[1])
        if node.tag == "hgroup":
            ranks = [
                _rank(c) for c in node.element_children()
            ]
            return max(ranks) if ranks else -100
    return -100


def create_outline(root: Node):
    """create-outline.mjs:15-353."""
    current_outline_target: Node | None = None
    current_section: dict | None = None
    stack: list[Node] = []
    node_to_outline: dict[int, list[dict]] = {}
    node_to_parent_section: dict[int, dict] = {}
    node_to_section: dict[int, dict] = {}

    def enter(node: Node):
        nonlocal current_outline_target, current_section
        top = stack[-1] if stack else None
        if top is not None and (
            top.tag in HEADING_CONTENT or top.get("hidden") is not None
        ):
            return
        if node.get("hidden") is not None:
            stack.append(node)
            return
        if node.tag in SECTIONING_CONTENT:
            if current_outline_target is not None:
                if not current_section["heading"]:
                    current_section["heading"] = "__implied"
                stack.append(current_outline_target)
            current_outline_target = node
            current_section = _new_section()
            current_section["root"] = current_outline_target
            node_to_section[id(current_outline_target)] = current_section
            node_to_outline[id(current_outline_target)] = [current_section]
            return
        if node.tag in SECTIONING_ROOT:
            if current_outline_target is not None:
                stack.append(current_outline_target)
            current_outline_target = node
            node_to_parent_section[id(current_outline_target)] = current_section
            current_section = _new_section()
            current_section["root"] = current_outline_target
            node_to_outline[id(current_outline_target)] = [current_section]
            return
        if node.tag in HEADING_CONTENT:
            outline = node_to_outline[id(current_outline_target)]
            last_section = outline[-1]
            if not current_section["heading"]:
                current_section["heading"] = node
            elif last_section["heading"] == "__implied" or _rank(node) >= _rank(
                last_section["heading"]
            ):
                current_section = _new_section()
                current_section["heading"] = node
                outline.append(current_section)
            else:
                candidate = current_section
                while candidate is not None:
                    if _rank(node) < _rank(candidate["heading"]):
                        current_section = _new_section()
                        current_section["heading"] = node
                        candidate["subSections"].append(current_section)
                        break
                    sections = flatten_sections(
                        node_to_outline[id(current_outline_target)]
                    )
                    candidate = next(
                        (
                            s
                            for s in sections
                            if candidate in s["subSections"]
                        ),
                        None,
                    )
                stack.append(node)
                return

    def exit_(node: Node):
        nonlocal current_outline_target, current_section

        def inner_exit():
            nonlocal current_outline_target, current_section
            top = stack[-1] if stack else None
            if top is node:
                stack.pop()
                return
            if top is not None and (
                top.tag in HEADING_CONTENT or top.get("hidden") is not None
            ):
                return
            if node.tag in SECTIONING_CONTENT and stack:
                if not current_section["heading"]:
                    current_section["heading"] = "__implied"
                current_outline_target = stack.pop()
                outline = node_to_outline[id(current_outline_target)]
                current_section = outline[-1]
                current_section["subSections"].extend(
                    node_to_outline[id(node)]
                )
                return
            if node.tag in SECTIONING_ROOT and stack:
                if not current_section["heading"]:
                    current_section["heading"] = "__implied"
                current_section = node_to_parent_section[
                    id(current_outline_target)
                ]
                current_section["subRoots"].extend(node_to_outline[id(node)])
                current_outline_target = stack.pop()
                return
            if node.tag in SECTIONING_CONTENT or node.tag in SECTIONING_ROOT:
                if not current_section["heading"]:
                    current_section["heading"] = "__implied"
                return

        inner_exit()
        if (node.get("id") or node.get("name")) and id(node) not in node_to_section:
            node_to_section[id(node)] = current_section

    # depth-first walk with enter/exit, skipping hgroup children
    # (create-outline.mjs:310-333)
    def walk(n: Node):
        enter(n)
        if n.tag != "hgroup":
            for c in n.element_children():
                walk(c)
        exit_(n)

    walk(root)
    return node_to_outline.get(id(root)), node_to_section
