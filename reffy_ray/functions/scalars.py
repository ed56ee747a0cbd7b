"""Scalar/string helper functions (SURVEY.md §2.8).

- css_property_to_idl_attributes: util.js:923-960 (CSSOM
  css-property-to-idl-attribute: dashed, camel-cased, webkit-cased)
- camel_case_module_name: util.js:106-121 (module path → camelCase)
- normalize_whitespace: extract-dfns.mjs:44-46 (+ minus-sign fold,
  extract-cssdfn.mjs:365)
"""

from __future__ import annotations

import re


def css_property_to_idl_attribute(prop: str, lowercase_first: bool = False) -> str:
    """CSSOM conversion (util.js:925-942)."""
    if lowercase_first:
        prop = prop[1:]
    out = []
    upper_next = False
    for c in prop:
        if c == "-":
            upper_next = True
        elif upper_next:
            upper_next = False
            out.append(c.upper())
        else:
            out.append(c)
    return "".join(out)


def css_property_to_idl_attributes(prop: str) -> list[str]:
    """All generated IDL attribute names for one CSS property
    (util.js:944-959): dashed, then camel-cased if different, then
    webkit-cased for -webkit- properties."""
    res = [prop]
    camel = css_property_to_idl_attribute(prop)
    if camel != prop:
        res.append(camel)
    if prop.startswith("-webkit-"):
        res.append(css_property_to_idl_attribute(prop, lowercase_first=True))
    return res


def camel_case_module_name(href: str) -> str:
    """Module path → camelCase name (util.js:106-121)."""
    filename = re.sub(r".*[/\\]", "", href)
    filename = re.sub(r"\.mjs$", "", filename)
    parts = filename.split("-")
    name = ""
    for part in parts:
        part = re.sub(r"\W", "", part)
        if not part:
            continue
        name += part if not name else part[0].upper() + part[1:]
    return name


def normalize_whitespace(text: str) -> str:
    """trim + collapse runs + fold the minus sign
    (extract-dfns.mjs:44-46, extract-cssdfn.mjs:365)."""
    return " ".join((text or "").split()).replace("−", "-")
