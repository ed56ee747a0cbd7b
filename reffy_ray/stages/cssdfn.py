"""CSS definitions extraction — faithful port of the reference contract
(reference: src/browserlib/extract-cssdfn.mjs, all line refs below).

Runs at parse time over the in-memory DOM (the reference runs in the
browser page for the same reason: the model needs parent/sibling
context, cloned-subtree text and whole-document assembly), producing
the final ``{properties, atrules, selectors, values, warnings}``
structure that is emitted as ONE ``css-data`` span per document; the
``extract_css`` stage then just explodes it into Arrow rows.
"""

from __future__ import annotations

import re

from .htmldom import Node

# informative-selector.mjs
_INFORMATIVE_CLASSES = {
    "informative", "informative-bg", "note", "issue", "example", "ednote",
    "annotation", "practice", "introductory", "non-normative", "idlHeader",
    "mdn-anno", "wpt-tests-block",
}


def _is_informative(el: Node) -> bool:
    if el.tag == "aside":
        return True
    if el.classes & _INFORMATIVE_CLASSES:
        return True
    if el.id.startswith("dfn-panel-"):
        return True
    if el.tag == "details" and "respec-tests-details" in el.classes:
        return True
    return False


def _in_informative(el: Node) -> bool:
    return el.closest(_is_informative) is not None


def _is_aside(el: Node) -> bool:
    # asideSelector (extract-cssdfn.mjs:392)
    return el.tag == "aside" or bool(el.classes & {"mdn-anno", "wpt-tests-block"})


def _text_excluding(el: Node, drop) -> str:
    """textContent of ``el`` skipping subtrees where drop(node) is True
    (stand-in for the reference's clone-and-remove passes)."""
    parts: list[str] = []

    def rec(n: Node):
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            elif not drop(c):
                rec(c)

    rec(el)
    return "".join(parts)


def _clean_text(el: Node) -> str:
    """textContent with <sup> and asides removed (extract-cssdfn.mjs
    :745-751)."""
    return _text_excluding(el, lambda n: n.tag == "sup" or _is_aside(n))


def normalize(value: str) -> str:
    """extract-cssdfn.mjs:365."""
    return re.sub(r"\s+", " ", value.strip()).replace("−", "-")


def dfn_label2property(label: str) -> str:
    """extract-cssdfn.mjs:375-384."""
    label = label.strip().replace(":", "", 1)
    words = re.split(r"\s", label)
    out = "".join(
        w.lower() if i == 0 else (w[:1].upper() + w[1:]) for i, w in enumerate(words)
    )
    return re.sub(r"^newValue$", "newValues", out)


# extract-cssdfn.mjs:628,634
_RE_SPLIT_RULES = re.compile(
    r"\s(?=(?:[^\]\s]+?|<.*?\[\s*<.*?>\s*\]>)\s*?=[^'])"
)
_RE_PRODUCTION_RULE = re.compile(r"\s?=\s")
_RE_FN = re.compile(r"^([:a-zA-Z_][:a-zA-Z0-9_\-]+)\([^\)]*\)$")


def parse_production_rule(rule: str, res: list[dict], pure_syntax: bool = False) -> dict:
    """extract-cssdfn.mjs:645-679."""
    rule = re.sub(r"/\*.*?\*/", "", rule, flags=re.S)
    parts = [
        re.sub(r"\s+", " ", s.strip())
        for s in _RE_PRODUCTION_RULE.split(rule, maxsplit=1)
    ]
    name = re.sub(r"\[[^\]]+\]", "", parts[0])
    value = parts[1] if len(parts) > 1 else ""
    normalized = normalize(value)
    entry = next((e for e in res if e.get("name") == name), None)
    if entry is None:
        entry = {"name": name}
        res.append(entry)
    if not entry.get("value") or (pure_syntax and not entry.get("pureSyntax")):
        entry["value"] = normalized
        entry["pureSyntax"] = pure_syntax
    elif entry["value"] != normalized:
        entry["value"] += f" | {normalized}"
    return entry


def _get_dfn_names(dfn: Node) -> list[str]:
    """extract-cssdfn.mjs:687-713."""
    lt = dfn.get("data-lt")
    names = (
        [normalize(s) for s in lt.split("|")] if lt else [dfn.text().strip()]
    )
    re_at, re_fn, re_sel, re_type = (
        re.compile(r"^@"), re.compile(r"\(\)$"), re.compile(r"^:"),
        re.compile(r"^<.*>$"),
    )
    is_keyword = all(
        not (re_at.search(n) or re_fn.search(n) or re_type.search(n)
             or re_sel.search(n))
        for n in names
    )
    return [
        n for n in names
        if re_at.search(n) or re_fn.search(n) or re_type.search(n)
        or (re_sel.search(n) and not any(re_fn.search(x) for x in names))
        or is_keyword
    ]


def _abs_url(el: Node, page_url: str, attribute: str = "id") -> str:
    """getAbsoluteUrl (get-absolute-url.mjs): page of closest
    [data-reffy-page], fragment percent-encoded."""
    from urllib.parse import quote

    anc = el.closest(lambda a: a.get("data-reffy-page") is not None)
    page = anc.get("data-reffy-page") if anc is not None else page_url
    frag = el.get(attribute) or ""
    if frag:
        return f"{page}#{quote(frag, safe=chr(33) + chr(39) + '()*-._~')}"
    return page


def _next_element_sibling_chain(start: Node):
    """Yield start, then its following siblings (elements only)."""
    n = start
    while n is not None:
        yield n
        parent = n.parent
        if parent is None:
            return
        sibs = parent.element_children()
        try:
            i = sibs.index(n)
        except ValueError:
            return
        n = sibs[i + 1] if i + 1 < len(sibs) else None


# ---------------------------------------------------------------------------
# per-construct extractors
# ---------------------------------------------------------------------------


def extract_table_dfns(table: Node, page_url: str) -> list[dict]:
    """extract-cssdfn.mjs:407-458 (NB the reference clones the table to
    strip annotations but then iterates the ORIGINAL — mirrored)."""
    res: list[dict] = []
    properties: list[dict] = []
    for line in table.find_all("tr"):
        kids = line.element_children()
        name_el = kids[0] if kids else None
        tds = [c for c in kids if c.tag == "td"]
        value_el = tds[-1] if tds else None
        if name_el is None or value_el is None:
            continue
        prop_name = dfn_label2property(name_el.text())
        if prop_name == "name":
            dfns = [d for d in value_el.find_all("dfn") if d.id]
            if dfns:
                res = [
                    {"name": normalize(d.text()), "href": _abs_url(d, page_url)}
                    for d in dfns
                ]
            else:
                value = normalize(value_el.text())
                res = [{"name": n.strip()} for n in value.split(",")]
        elif prop_name:
            properties.append(
                {"name": prop_name, "value": normalize(value_el.text())}
            )
    for dfn in res:
        for prop in properties:
            dfn[prop["name"]] = prop["value"]
    return res


def extract_dl_dfns(dl: Node, page_url: str) -> list[dict]:
    """extract-cssdfn.mjs:470-506."""
    res: list[dict] = []
    first_dt = next(
        (c for c in dl.element_children() if c.tag == "dt"), None
    )
    dfns = []
    if first_dt is not None:
        dfns = [d for d in first_dt.find_all("dfn") if d.id] + [
            a for a in first_dt.find_all("a") if a.get("name")
        ]
    if dfns:
        res = [
            {
                "name": normalize(d.text().replace("'", "")),
                "href": _abs_url(d, page_url, "id" if d.id else "name"),
            }
            for d in dfns
        ]
    else:
        dt = dl.first("dt")
        if dt is None:
            return []
        if dt.id:
            res = [{"name": normalize(dt.text().replace("'", "")),
                    "href": _abs_url(dt, page_url)}]
        else:
            res = [
                {"name": normalize(n.replace("'", ""))}
                for n in dt.text().split(",")
            ]
    properties = []
    for dd in (c for c in dl.element_children() if c.tag == "dd"):
        for tbl in dd.find_all("table"):
            for line in tbl.find_all("tr"):
                kids = line.element_children()
                tds = [c for c in kids if c.tag == "td"]
                if not kids or not tds:
                    continue
                properties.append(
                    {
                        "name": dfn_label2property(kids[0].text()),
                        "value": normalize(tds[-1].text()),
                    }
                )
    for dfn in res:
        for prop in properties:
            dfn[prop["name"]] = prop["value"]
    return res


def extract_typed_dfns(dfn: Node, page_url: str) -> list[dict]:
    """extract-cssdfn.mjs:715-866."""
    dfns: list[dict] = []
    dfn_type = dfn.get("data-dfn-type")
    dfn_for = dfn.get("data-dfn-for")
    parent = (
        dfn
        if dfn.tag.startswith("h")
        or (dfn.parent is not None and dfn.parent.tag in ("body", "main", "[document]"))
        or dfn.parent is None
        else dfn.parent
    )

    # skip scoped type/function dfns that wrap a link to ANOTHER construct
    wrapped = next(
        (a for a in dfn.find_all("a") if a.get("data-link-type") is not None),
        None,
    )
    if (
        dfn_for
        and dfn_type in ("function", "type")
        and wrapped is not None
        and dfn.text().strip() == wrapped.text().strip()
    ):
        href = wrapped.get("href") or ""
        self_hrefs = {f"#{dfn.id}", f"{page_url}#{dfn.id}"}
        if href not in self_hrefs:
            return dfns

    dfn_names = _get_dfn_names(dfn)
    text = _clean_text(parent).strip()

    for dfn_name in dfn_names:
        res: dict = {"name": dfn_name}
        if _RE_PRODUCTION_RULE.search(text):
            prod = next(
                (
                    p
                    for p in _RE_SPLIT_RULES.split(text)
                    if p.strip().startswith(dfn.text().strip())
                ),
                None,
            )
            if dfn.closest(lambda a: a.tag == "pre") is not None:
                m = _RE_FN.match(dfn_name)
                if m:
                    fn = m.group(1)
                    full_fn = dfn.text().strip()
                    if full_fn.startswith(fn + "("):
                        res = parse_production_rule(
                            f"{fn}() = {full_fn}", res=[], pure_syntax=False
                        )
            elif prod:
                res = parse_production_rule(prod, res=[], pure_syntax=True)
            else:
                res = {"name": dfn_name, "prose": re.sub(r"\s+", " ", text)}
        elif _RE_FN.match(dfn_name):
            fn = _RE_FN.match(dfn_name).group(1)
            full_fn = dfn.text().strip()
            if full_fn.startswith(fn + "(") and full_fn != f"{fn}()":
                res = parse_production_rule(
                    f"{fn}() = {full_fn}", res=[], pure_syntax=False
                )
        elif parent.tag == "dt":
            dd = next(
                (
                    el
                    for el in _next_element_sibling_chain(dfn.parent)
                    if el.tag == "dd"
                ),
                None,
            )
            if dd is None:
                continue
            code = next(
                (
                    c
                    for c in dd.iter()
                    if (c.tag == "code" or c.tag == "pre") and "prod" in c.classes
                ),
                None,
            )
            if code is not None and not _in_informative(code):
                ctext = code.text()
                if ctext.startswith(f"{dfn_name} = ") or ctext.startswith(
                    f"<{dfn_name}> = "
                ):
                    res = parse_production_rule(ctext, res=[], pure_syntax=True)
                elif not _RE_PRODUCTION_RULE.search(ctext):
                    res = parse_production_rule(
                        f"{dfn_name} = {ctext}", res=[], pure_syntax=False
                    )
            else:
                def drop(c: Node, _top=dd) -> bool:
                    if c.tag == "sup" or _is_aside(c):
                        return True
                    return (
                        c.parent is _top
                        and (c.tag in ("details", "dl") or "note" in c.classes)
                    )

                res = {
                    "name": dfn_name,
                    "prose": re.sub(r"\s+", " ", _text_excluding(dd, drop).strip()),
                }

        if not res.get("value") and parent.tag == "p":
            res["prose"] = re.sub(r"\s+", " ", _clean_text(parent).strip())
        if dfn.id:
            res["href"] = _abs_url(dfn, page_url)
        res["type"] = dfn_type
        if dfn_type == "value":
            res["value"] = normalize(res["name"])
        if dfn_for:
            res["for"] = dfn_for
        dfns.append(res)
    return dfns


# ---------------------------------------------------------------------------
# generic walker over (selector-equivalent) element sets
# ---------------------------------------------------------------------------

_CSS_DFN_TYPES = ("at-rule", "selector", "value", "function", "type")
_DFN_EL_TAGS = ("dfn", "h2", "h3", "h4", "h5", "h6")


def _iter_elements(pages, match) -> list[tuple[Node, str]]:
    # one DOM walk per page, cached on the root (extract_css_struct
    # filters this list ~8 times — rewalking the tree per selector
    # dominated parse cost on large specs)
    out = []
    for page_url, root in pages:
        els = getattr(root, "_css_el_cache", None)
        if els is None:
            els = list(root.iter())
            try:
                root._css_el_cache = els
            except AttributeError:
                pass
        for el in els:
            if match(el):
                out.append((el, page_url))
    return out


def extract_dfns_generic(
    pages,
    match,
    extractor,
    duplicates: str = "reject",
    keep_dfn_type: bool = False,
    warnings: list | None = None,
):
    """extract-cssdfn.mjs:558-607 (incl. the case fall-through: 'push'
    also records a Duplicate-definition warning)."""
    warnings = warnings if warnings is not None else []
    res: list = []
    for el, page_url in _iter_elements(pages, match):
        if _in_informative(el):
            continue
        if any(c.tag in ("ins", "del") for c in el.iter() if c is not el):
            continue
        dfns = extractor(el, page_url)
        if not isinstance(dfns, list):
            dfns = [dfns]
        for dfn in dfns:
            if not dfn or not dfn.get("name"):
                continue
            if dfn.get("type") and not keep_dfn_type:
                del dfn["type"]
            idx = next(
                (
                    i
                    for i, e in enumerate(res)
                    if (e[0] if isinstance(e, list) else e).get("name")
                    == dfn["name"]
                ),
                -1,
            )
            if idx >= 0:
                if duplicates == "merge":
                    merged = merge_dfns(
                        res[idx], dfn
                    )
                    if merged:
                        res[idx] = merged
                    else:
                        warnings.append(
                            {"msg": "Unmergeable definition", **dfn}
                        )
                else:
                    if duplicates == "push":
                        res[idx].append(dfn)
                    warnings.append({"msg": "Duplicate definition", **dfn})
            else:
                res.append(dfn if duplicates != "push" else [dfn])
    return res


def merge_dfns(dfn1: dict, dfn2: dict):
    """extract-cssdfn.mjs:517-548."""
    if dfn1.get("name") != dfn2.get("name"):
        return None
    if dfn1.get("value") and dfn2.get("value"):
        return None
    base, partial = (dfn2, dfn1) if dfn2.get("value") else (dfn1, dfn2)
    if (
        (not base.get("value") and not base.get("newValues"))
        or not partial.get("newValues")
        or (partial.get("initial") and partial.get("initial") != base.get("initial"))
    ):
        return None
    merged = base
    if merged.get("value"):
        merged["value"] += f" | {normalize(partial['newValues'])}"
    else:
        merged["newValues"] += f" | {normalize(partial['newValues'])}"
    return merged


def extract_production_rules(pages) -> list[dict]:
    """extract-cssdfn.mjs:871-924."""
    rules: list[dict] = []
    pres: list[Node] = []
    for _page_url, root in pages:
        for el in root.iter():
            if el.tag != "pre":
                continue
            has_del_ins = any(
                c.tag in ("del", "ins") for c in el.iter() if c is not el
            )
            if "prod" in el.classes:
                if has_del_ins:
                    continue
                pres.append(el)
            elif "idl" not in el.classes:
                if has_del_ins or any(
                    "idl" in c.classes for c in el.iter() if c is not el
                ):
                    continue
                if any(
                    c.tag == "dfn" and c.get("data-dfn-type") in _CSS_DFN_TYPES
                    for c in el.iter()
                ):
                    pres.append(el)
    for el in pres:
        if _in_informative(el):
            continue
        text = _clean_text(el)
        text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
        for piece in _RE_SPLIT_RULES.split(text):
            piece = piece.strip()
            if _RE_PRODUCTION_RULE.search(piece):
                parse_production_rule(piece, res=rules, pure_syntax=True)
            elif piece.startswith("@"):
                name = piece.split(" ")[0]
                parse_production_rule(
                    f"{name} = {piece}", res=rules, pure_syntax=True
                )
    return rules


def extract_legacy_properties(pages) -> list[dict]:
    """extract-cssdfn.mjs:927-968."""
    out: list[dict] = []
    for page_url, root in pages:
        for a in root.iter():
            if a.tag != "a" or not (a.get("href") or "").endswith("#legacy-name-alias"):
                continue
            el = a.parent
            if el is None:
                continue
            dfn = next(
                (
                    d
                    for d in el.find_all("dfn")
                    if d.get("data-dfn-type") == "property"
                ),
                None,
            )
            alias = next(
                (
                    x
                    for x in el.find_all("a")
                    if x.get("data-link-type") == "property"
                ),
                None,
            )
            if dfn is not None and alias is not None:
                out.append(
                    {
                        "name": normalize(dfn.text()),
                        "href": _abs_url(dfn, page_url),
                        "legacyAliasOf": normalize(alias.text()),
                    }
                )
                continue
            sibs = el.parent.element_children() if el.parent is not None else []
            try:
                i = sibs.index(el)
            except ValueError:
                continue
            table = sibs[i + 1] if i + 1 < len(sibs) else None
            if table is None or table.tag != "table":
                continue
            thead = table.first("thead")
            ths = list(thead.find_all("th")) if thead is not None else []
            if len(ths) != 2:
                continue
            tbody = table.first("tbody") or table
            for row in tbody.find_all("tr"):
                d = next(
                    (
                        x
                        for x in row.find_all("dfn")
                        if x.get("data-dfn-type") == "property"
                    ),
                    None,
                )
                al = next(
                    (
                        x
                        for x in row.find_all("a")
                        if x.get("data-link-type") == "property"
                    ),
                    None,
                )
                if d is not None and al is not None:
                    out.append(
                        {
                            "name": normalize(d.text()),
                            "href": _abs_url(d, page_url),
                            "legacyAliasOf": normalize(al.text()),
                        }
                    )
    return out


# ---------------------------------------------------------------------------
# whole-document assembly
# ---------------------------------------------------------------------------


def _match_name(dfn: dict, name: str, approx: bool = False) -> bool:
    """extract-cssdfn.mjs:154-166."""
    res = dfn.get("name") == name
    if not res and re.match(r"^@.+/.+$", name):
        parts = name.split("/")
        res = dfn.get("name") == parts[1] and dfn.get("for") == parts[0]
    if not res and approx:
        res = f"<{dfn.get('name')}>" == name
    return res


def _typed_dfn_match(types, for_mode):
    """Build a matcher for dfn/h2-h6[data-dfn-type=...] with the
    data-dfn-for constraint: 'none' (absent or empty), 'absent',
    'nonempty', 'any'."""

    def match(el: Node) -> bool:
        if el.tag not in _DFN_EL_TAGS:
            return False
        if el.get("data-dfn-type") not in types:
            return False
        dfor = el.get("data-dfn-for")
        if for_mode == "none":
            return dfor is None or dfor == ""
        if for_mode == "absent":
            return dfor is None
        if for_mode == "nonempty":
            return dfor is not None and dfor != ""
        return True

    return match


def extract_css_struct(pages) -> dict:
    """extract-cssdfn.mjs:15-360 (main flow)."""
    warnings: list[dict] = []

    def table_match(kinds):
        def match(el: Node) -> bool:
            return (
                el.tag == "table"
                and bool(el.classes & kinds)
                and "attrdef" not in el.classes
            )

        return match

    res: dict = {}
    res["properties"] = extract_dfns_generic(
        pages, table_match({"propdef"}), extract_table_dfns,
        duplicates="merge", warnings=warnings,
    ) + extract_legacy_properties(pages)
    res["atrules"] = extract_dfns_generic(
        pages, _typed_dfn_match(("at-rule",), "absent"), extract_typed_dfns,
        duplicates="reject", warnings=warnings,
    )

    def selector_match(el: Node) -> bool:
        if el.tag not in _DFN_EL_TAGS or el.get("data-dfn-type") != "selector":
            return False
        if el.get("data-export") is None:
            return False
        dfor = el.get("data-dfn-for")
        return dfor is None or dfor == ""

    res["selectors"] = extract_dfns_generic(
        pages, selector_match, extract_typed_dfns,
        duplicates="reject", warnings=warnings,
    )
    res["values"] = extract_dfns_generic(
        pages, _typed_dfn_match(("function", "type"), "none"),
        extract_typed_dfns, duplicates="reject", keep_dfn_type=True,
        warnings=warnings,
    )

    descriptors = extract_dfns_generic(
        pages, table_match({"descdef"}), extract_table_dfns,
        duplicates="push", keep_dfn_type=True, warnings=warnings,
    )

    # legacy recipes when no modern tables exist (extract-cssdfn.mjs:83-99)
    if not res["properties"] and not descriptors:
        def dl_in_div(kind):
            def match(el: Node) -> bool:
                return el.tag == "dl" and el.closest(
                    lambda a: a.tag == "div" and kind in a.classes
                ) is not None

            return match

        res["properties"] = extract_dfns_generic(
            pages, dl_in_div("propdef"), extract_dl_dfns,
            duplicates="merge", warnings=warnings,
        )
        descriptors = extract_dfns_generic(
            pages, dl_in_div("descdef"), extract_dl_dfns,
            duplicates="push", warnings=warnings,
        )

    subsidiary = extract_dfns_generic(
        pages, _typed_dfn_match(("at-rule",), "nonempty"), extract_typed_dfns,
        duplicates="reject", keep_dfn_type=True, warnings=warnings,
    )
    descriptors = descriptors + [subsidiary]

    # move descriptors under their at-rule (extract-cssdfn.mjs:110-130)
    for desclist in descriptors:
        for desc in desclist:
            rule = next(
                (r for r in res["atrules"] if r.get("name") == desc.get("for")),
                None,
            )
            if rule is None:
                rule = {"name": desc.get("for"), "descriptors": []}
                res["atrules"].append(rule)
            rule.setdefault("descriptors", [])
            rule["descriptors"].append(desc)
    for rule in res["atrules"]:
        rule.setdefault("descriptors", [])

    root_dfns = (
        list(res["properties"]) + list(res["atrules"])
        + list(res["selectors"]) + list(res["values"])
    )
    for desclist in descriptors:
        root_dfns.extend(desclist)

    # namespaced value dfns (extract-cssdfn.mjs:139-151)
    values_nested = extract_dfns_generic(
        pages,
        _typed_dfn_match(("value", "function", "type", "selector"), "nonempty"),
        extract_typed_dfns, duplicates="push", keep_dfn_type=True,
        warnings=warnings,
    )
    values: list[dict] = [d for lst in values_nested for d in lst]

    # production rules → dfn values (extract-cssdfn.mjs:170-198)
    for rule in extract_production_rules(pages):
        dfn = next(
            (d for d in root_dfns if _match_name(d, rule["name"])), None
        ) or next(
            (d for d in root_dfns if _match_name(d, rule["name"], approx=True)),
            None,
        )
        if dfn is not None:
            dfn["value"] = rule["value"]
        else:
            matching = [v for v in values if _match_name(v, rule["name"])]
            if not matching:
                matching = [
                    v for v in values if _match_name(v, rule["name"], approx=True)
                ]
            for m in matching:
                m["value"] = rule["value"]
            if not matching:
                warning = {"msg": "Missing definition", **rule}
                warnings.append(warning)
                root_dfns.append(warning)

    # parents graph (extract-cssdfn.mjs:217-248)
    parents: dict[str, list[str]] = {}
    for value in values:
        parents.setdefault(value["name"], []).extend(
            ref.strip() for ref in value.get("for", "").split(",")
        )
    for typ in res["values"]:
        parents.setdefault(typ["name"], [])
        for value in values:
            if typ["name"] in (value.get("value") or ""):
                parents[typ["name"]].append(value["name"])
        for dfn in root_dfns:
            if typ["name"] in (dfn.get("value") or ""):
                parents[typ["name"]].append(dfn["name"])

    def is_ancestor_of(ancestor: str, child: str) -> bool:
        def check(c: str, depth: int) -> bool:
            if depth >= 10:
                return False
            if c == ancestor:
                return True
            return any(check(p, depth + 1) for p in parents.get(c, []))

        return check(child, 0)

    def is_deepest(name: str, lst) -> bool:
        return all(p == name or not is_ancestor_of(name, p) for p in lst)

    # attach values to dfns (extract-cssdfn.mjs:263-300)
    for value in values:
        refs = [r.strip() for r in value.get("for", "").split(",")]
        for ref in (r for r in refs if is_deepest(r, refs)):
            dfn = next(
                (d for d in root_dfns if _match_name(d, ref)), None
            ) or next(
                (d for d in root_dfns if _match_name(d, ref, approx=True)), None
            )
            if dfn is not None:
                dfn.setdefault("values", []).append(value)
            else:
                referenced = [v for v in values if _match_name(v, ref)]
                if not referenced:
                    referenced = [
                        v for v in values if _match_name(v, ref, approx=True)
                    ]
                for rv in referenced:
                    rv.setdefault("values", []).append(value)
                if not referenced:
                    warnings.append({"msg": "Dangling value", **value, "for": ref})

    for dfn in root_dfns:
        dfn.pop("pureSyntax", None)
    for value in values:
        value.pop("for", None)
        value.pop("pureSyntax", None)

    # selector syntax from name (extract-cssdfn.mjs:307-343)
    def set_value_from_name(selector: dict) -> None:
        if selector.get("value"):
            return
        if re.search(r"\(", selector["name"]):
            return
        if re.match(r"^[:a-z]", selector["name"], flags=re.I):
            selector["value"] = selector["name"]
        else:
            tokens = list(selector["name"])
            selector["value"] = " ".join(f"'{t}'" for t in tokens)

    for selector in res["selectors"]:
        set_value_from_name(selector)
        for sub in selector.get("values", []):
            set_value_from_name(sub)

    if warnings:
        res["warnings"] = warnings
    return res
