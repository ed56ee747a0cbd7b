"""Markdown crawl reports (S9).

Faithful port of the reference's per-spec GitHub-Markdown summary
(reference: src/lib/markdown-report.js generateSpecReport): spec
metadata, a "Spec defines:" block with per-module summaries, a
"No X definitions found" line, and expandable <details> sections for
CSS definitions, explicitly exported terms and parsed Web IDL names.

Inputs are this engine's extract rows for ONE spec (small — reports
are human-readable artifacts; the reference also builds them one spec
at a time on the driver, `--markdown` path)."""

from __future__ import annotations

import json
from urllib.parse import quote

from reffy_ray.functions.webidl import parse_webidl

# (label, module) in the reference's registry order
# (src/browserlib/reffy.json)
_METADATA_MODULES = [
    ("Title", "title"),
    ("Authoring tool", "generator"),
    ("Date", "date"),
    ("Revision ID", "revision"),
]
_EXTRACT_MODULES = [
    ("Algorithms", "algorithms"),
    ("Links", "links"),
    ("References", "refs"),
    ("Events", "events"),
    ("Web IDL", "idl"),
    ("CSS", "css"),
    ("Terms", "dfns"),
    ("Headings", "headings"),
    ("IDs", "ids"),
    ("CDDL", "cddl"),
]

_CSS_LABELS = {
    "atrules": ("at-rule", "at-rules"),
    "properties": ("property", "properties"),
    "selectors": ("selector", "selectors"),
    "values": ("value", "values"),
}

_CSS_XREF_TYPES = ",".join(
    ["css-at-rule", "css-descriptor", "css-function", "css-property",
     "css-selector", "css-type", "css-value"]
)


def _css_label(prop: str, n: int) -> str:
    one, many = _CSS_LABELS[prop]
    return many if n > 1 else one


def _wrap_term(term: str, typ: str, href: str | None = None) -> str:
    """markdown-report.js wrapTerm: dfn/abstract-op as prose, the rest
    as code; linked when an href exists."""
    if typ in ("abstract-op", "dfn"):
        return f"[{term}]({href})" if href else f'"{term}"'
    res = f"`{term}`"
    return f"[{res}]({href})" if href else res


def _details(summary: str, lines: list[str]) -> str:
    return "\n".join(["<details>", f"<summary>{summary}</summary>", "", *lines,
                      "</details>"])


def _summarize(module: str, rows: list[dict], idlparsed: dict | None):
    """(summary text or None, details markdown or None) per module —
    mirrors markdown-report.js moduleFunctions."""
    if module in ("algorithms", "events", "headings", "ids", "elements"):
        return (f"{len(rows)} found" if rows else None), None
    if module == "cddl":
        return ("found" if rows else None), None
    if module == "links":
        raw = len({r["page_url"] for r in rows if not r.get("auto")})
        auto = len({r["page_url"] for r in rows if r.get("auto")})
        parts = [f"{n} {name}" for n, name in ((raw, "rawlinks"), (auto, "autolinks")) if n]
        return (", ".join(parts) if parts else None), None
    if module == "refs":
        norm = sum(1 for r in rows if r.get("normative"))
        inf = len(rows) - norm
        parts = [f"{n} {name}" for n, name in ((norm, "normative"), (inf, "informative")) if n]
        return (", ".join(parts) if parts else None), None
    if module == "css":
        by_cat: dict[str, list] = {}
        for r in rows:
            by_cat.setdefault(r["category"], []).append(r)
        parts = [
            f"{len(by_cat[p])} {_css_label(p, len(by_cat[p]))}"
            for p in ("properties", "atrules", "selectors", "values")
            if by_cat.get(p)
        ]
        if not parts:
            return None, None
        details = []
        for prop in ("properties", "atrules", "selectors"):
            vals = by_cat.get(prop) or []
            lines = []
            for v in vals:
                payload = json.loads(v.get("payload_json") or "{}")
                href = payload.get("href")
                lines.append(
                    "- " + _wrap_term(v["name"], "css type", href)
                    + f" ([xref search](https://respec.org/xref/?term="
                    f"{quote(v['name'], safe='')}&types={quote(_CSS_XREF_TYPES, safe='')}))"
                )
            if lines:
                details.append(
                    _details(f"{len(lines)} CSS {_css_label(prop, len(lines))}", lines)
                )
        return ", ".join(parts), ("\n".join(details) if details else None)
    if module == "dfns":
        explicit = [r for r in rows if r["access"] == "public"
                    and r["type"] in ("dfn", "cddl")]
        default_exp = [r for r in rows if r["access"] == "public"
                       and r["type"] not in ("dfn", "cddl")]
        private = [r for r in rows if r["access"] != "public"]
        parts = [
            f"{len(g)} {name}"
            for g, name in (
                (explicit, "explicitly exported"),
                (default_exp, "exported by default"),
                (private, "private"),
            )
            if g
        ]
        if not parts:
            return None, None
        lines = []
        for d in explicit:
            lt0 = (d.get("linking_text") or [""])[0]
            line = "- " + _wrap_term(lt0, d["type"], d.get("href"))
            if d.get("for"):
                line += " for " + _wrap_term(d["for"][0], d["type"])
            line += (
                f", type {d['type']}"
                f" ([xref search](https://respec.org/xref/?term={quote(lt0, safe='')}))"
            )
            lines.append(line)
        details = None
        if lines:
            s = "s" if len(lines) > 1 else ""
            details = _details(f"{len(lines)} explicitly exported term{s}", lines)
        return ", ".join(parts), details
    if module == "idl":
        if not rows:
            return None, None
        if not idlparsed:
            return "invalid Web IDL found", None
        names = list(idlparsed.get("idlNames", {}))
        extended = [n for n in idlparsed.get("idlExtendedNames", {})
                    if n not in idlparsed.get("idlNames", {})]
        globs = list(idlparsed.get("globals", {}))
        parts = []
        if names or extended:
            n = len(names) + len(extended)
            s = "s" if n > 1 else ""
            parts.append(f"{n} name{s} (or partial{s})")
        if globs:
            s = "s" if len(globs) > 1 else ""
            parts.append(f"{len(globs)} global{s}")
        details = []
        if names:
            s = "s" if len(names) > 1 else ""
            details.append(_details(
                f"{len(names)} Web IDL name{s}",
                [
                    f"- {idlparsed['idlNames'][n].get('type', 'interface')} "
                    + _wrap_term(n, idlparsed["idlNames"][n].get("type", ""))
                    + f" ([xref search](https://respec.org/xref/?term="
                    f"{quote(n, safe='')}&types=_IDL_))"
                    for n in names
                ],
            ))
        if extended:
            s = "s" if len(extended) > 1 else ""
            details.append(_details(
                f"{len(extended)} extended Web IDL name{s}",
                [
                    f"- {idlparsed['idlExtendedNames'][n][0].get('type', '')} "
                    + _wrap_term(n, idlparsed["idlExtendedNames"][n][0].get("type", ""))
                    + f" ([xref search](https://respec.org/xref/?term="
                    f"{quote(n, safe='')}&types=_IDL_))"
                    for n in extended
                ],
            ))
        if globs:
            s = "s" if len(globs) > 1 else ""
            details.append(_details(
                f"{len(globs)} Web IDL global{s}",
                [f"- `{g}`" for g in globs],
            ))
        return (", ".join(parts) if parts else None), ("\n".join(details) or None)
    return (f"{len(rows)} found" if rows else None), None


def generate_spec_report(
    spec: dict,
    extracts: dict[str, list[dict]],
    idlparsed: dict | None = None,
) -> str:
    """Markdown report for one spec. ``spec`` needs url (and optionally
    crawled/title/date/generator/revision); ``extracts`` maps module →
    that spec's extract rows."""
    # The reference runs the idlparsed post-processing module
    # automatically when it is absent (markdown-report.js:134-137); a
    # string-valued spec.idlparsed means "invalid Web IDL found".
    if idlparsed is None and not isinstance(spec.get("idlparsed"), str):
        if isinstance(spec.get("idlparsed"), dict):
            idlparsed = spec["idlparsed"]
        else:
            idl_rows = extracts.get("idl") or []
            idl_text = spec.get("idl") if isinstance(spec.get("idl"), str) \
                else (idl_rows[0].get("idl") if idl_rows else None)
            if idl_text:
                try:
                    idlparsed = parse_webidl(idl_text)
                except Exception:
                    idlparsed = None
    summary: list[str] = []
    meta = dict(spec)
    title_rows = extracts.get("title") or []
    if title_rows and "title" not in meta:
        meta["title"] = title_rows[0].get("title")
    meta_rows = extracts.get("meta") or []
    if meta_rows:
        for key in ("generator", "date", "revision"):
            if meta.get(key) is None:
                meta[key] = meta_rows[0].get(key)
    for label, prop in _METADATA_MODULES:
        if meta.get(prop):
            summary.append(f"- {label}: {meta[prop]}")
    url = spec.get("url") or ""
    summary.append(f"- Canonical URL: [{url}]({url})")
    crawled = spec.get("crawled")
    if crawled and crawled != url:
        summary.append(f"- Crawled URL: [{crawled}]({crawled})")

    extracts_summary: list[str] = []
    missing: list[str] = []
    details_out: list[str] = []
    for label, module in _EXTRACT_MODULES:
        rows = extracts.get(module) or []
        text, details = _summarize(module, rows, idlparsed)
        if text:
            extracts_summary.append(f"  - {label}: {text}")
        else:
            missing.append(label)
        if details:
            details_out.append(details)
    if extracts_summary:
        extracts_summary.sort()
        summary.append("- Spec defines:")
        summary.extend(extracts_summary)
    if missing:
        missing.sort()
        summary.append(f"- No {', '.join(missing)} definitions found")

    report = ["Crawl summary:", *summary]
    if details_out:
        report.append("")
        report.extend(details_out)
    return "\n".join(report)
