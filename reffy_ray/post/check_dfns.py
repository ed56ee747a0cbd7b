"""Missing-definitions checker (check-missing-dfns analog).

Reimplements the reference's dfn-coverage diagnostic
(src/cli/check-missing-dfns.js:1-587): compare the CSS and IDL
extracts against the dfns extract and report CSS/IDL terms without a
corresponding ``<dfn>`` in the spec.  CSS expectations come straight
from the CSS extract's "Missing definition" warnings
(check-missing-dfns.js:69-77); IDL expectations are derived from the
parsed IDL report by walking every defined name and its members
(check-missing-dfns.js:150-258), then matched against the spec's dfns
with the reference's relaxation cascade — exact, then ignoring
arguments (→ warning), then also type, then also ``for``
(check-missing-dfns.js:411-449).

The check is local to one document, so the Ray shape is the same
doc_id-bucketed union groupby as the other spec-level joins
(post/idlparsed_link.py): both sides shuffle once on doc_id and every
group is one spec's worth of rows.
"""

from __future__ import annotations

import json
import re

import pandas as pd
import pyarrow as pa
import ray.data as rd

# specs that don't follow the dfns data model (check-missing-dfns.js:33-37)
OBSOLETE_DFNS_MODEL = frozenset(
    {
        "svg-animations", "svg-markers", "svg-strokes", "SVG2",
        "webgl1", "webgl2", "webrtc-identity",
    }
)

_PRIMITIVE_TOKENS = frozenset(
    {
        "long", "short", "float", "double", "boolean", "byte", "octet",
        "any", "object", "undefined", "void", "DOMString", "USVString",
        "ByteString", "symbol", "unrestricted", "unsigned",
    }
)

_RE_EXTATTR = re.compile(r"^\s*\[([^\]]*)\]\s*")
_RE_CONSTRUCTOR = re.compile(r"^constructor\s*\((.*)\)\s*$", re.S)
_RE_ATTRIBUTE = re.compile(
    r"^(?:(?:readonly|static|inherit|stringifier)\s+)*attribute\s+.*?"
    r"([A-Za-z_]\w*)\s*$",
    re.S,
)
_RE_CONST = re.compile(r"^const\s+.*?([A-Za-z_]\w*)\s*=", re.S)
_RE_ITER = re.compile(r"^(?:readonly\s+)?(?:async\s+)?(?:iterable|maplike|setlike)\s*<")
_RE_SPECIAL_OP = re.compile(r"^(?:static\s+)?(getter|setter|deleter)\b(.*)$", re.S)
_RE_OPERATION = re.compile(r"^(.*?)([A-Za-z_]\w*)\s*\((.*)\)\s*$", re.S)
_RE_FIELD = re.compile(r"^(?:required\s+)?.*?([A-Za-z_]\w*)\s*(?:=.*)?$", re.S)


def _serialize_args(argstr: str) -> str:
    """serializeArgs (check-missing-dfns.js:151-155): argument names,
    variadics prefixed ``...``, joined with ", "."""
    out = []
    depth = 0
    cur = ""
    parts = []
    for ch in argstr:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur)
    for part in parts:
        part = part.split("=")[0]
        variadic = "..." in part
        names = re.findall(r"[A-Za-z_]\w*", part)
        if not names:
            continue
        name = names[-1]
        out.append(f"...{name}" if variadic else name)
    return ", ".join(out)


def _body_of(fragment: str) -> str:
    start = fragment.find("{")
    end = fragment.rfind("}")
    return fragment[start + 1 : end] if 0 <= start < end else ""


def _expected_from_member(member: str, parent: str, parent_type: str):
    """Expected dfn for one member text (the reference's per-member
    switch, check-missing-dfns.js:163-258, over the lightweight
    parser's fragment text).  Returns None when no dfn is expected."""
    ext = ""
    m = _RE_EXTATTR.match(member)
    if m:
        ext = m.group(1)
        member = member[m.end() :]
    member = member.strip()
    if not member:
        return None

    if parent_type == "enum":
        return None  # enum values handled from the body's string list

    if _RE_ITER.match(member):
        return None  # iterable/maplike/setlike need no dfn

    m = _RE_CONSTRUCTOR.match(member)
    if m:
        if parent.startswith("HTML"):
            return None  # HTML element constructors have their own section
        return {
            "linkingText": [f"constructor({_serialize_args(m.group(1))})"],
            "type": "constructor",
            "for": [parent],
        }

    m = _RE_ATTRIBUTE.match(member)
    if m:
        return {"linkingText": [m.group(1)], "type": "attribute", "for": [parent]}

    m = _RE_CONST.match(member)
    if m:
        return {"linkingText": [m.group(1)], "type": "const", "for": [parent]}

    if parent_type == "dictionary":
        m = _RE_FIELD.match(member)
        if m and "(" not in member:
            return {
                "linkingText": [m.group(1)],
                "type": "dict-member",
                "for": [parent],
            }
        return None

    if member == "stringifier" or re.match(r"^stringifier\s*\(", member) or (
        member.startswith("stringifier") and "(" not in member
    ):
        return {
            "linkingText": ["stringification behavior", "stringificationbehavior"],
            "type": "dfn",
            "for": [parent],
        }

    m = _RE_SPECIAL_OP.match(member)
    if m:
        rest = m.group(2)
        paren = rest.find("(")
        head = rest[:paren] if paren >= 0 else rest
        toks = re.findall(r"[A-Za-z_]\w*", head)
        # unnamed getter/setter/deleter → prose label is arbitrary, skip
        name = (
            toks[-1]
            if toks and toks[-1] not in _PRIMITIVE_TOKENS and len(toks) >= 2
            else None
        )
        if not name:
            return None
        argstr = rest[paren + 1 : rest.rfind(")")] if paren >= 0 else ""
        return {
            "linkingText": [f"{name}({_serialize_args(argstr)})"],
            "type": "method",
            "for": [parent],
        }

    m = _RE_OPERATION.match(member)
    if m:
        name, argstr = m.group(2), m.group(3)
        if name == "toJSON" and "Default" in ext:
            return None  # default toJSON steps live in WebIDL
        return {
            "linkingText": [f"{name}({_serialize_args(argstr)})"],
            "type": "method",
            "for": [parent],
        }
    return None


def _expected_from_desc(desc: dict, exclude_root: bool = False) -> list[dict]:
    """getExpectedDfnsFromIdlDesc (check-missing-dfns.js:268-300) over
    one idlNames/idlExtendedNames entry of the lightweight parser."""
    out: list[dict] = []
    idl_type = desc.get("type")
    name = desc.get("name")
    if not name or idl_type == "includes":
        return out
    fragment = desc.get("fragment", "")

    if not exclude_root:
        root_type = {
            "callback interface": "callback",
            "interface mixin": "interface",
        }.get(idl_type, idl_type)
        out.append({"linkingText": [name], "type": root_type, "for": []})

    body = _body_of(fragment)
    if idl_type == "enum":
        for value in re.findall(r'"([^"]*)"', body):
            lt = [f'"{value}"', value] if value else [f'"{value}"']
            out.append({"linkingText": lt, "type": "enum-value", "for": [name]})
        return out

    if idl_type in (
        "callback", "callback interface", "dictionary", "interface",
        "interface mixin", "namespace",
    ):
        for member in body.split(";"):
            exp = _expected_from_member(member.strip(), name, idl_type)
            if exp:
                out.append(exp)
    return out


def expected_dfns_from_idl(report: dict) -> list[dict]:
    """getExpectedDfnsFromIdl (check-missing-dfns.js:105-117): defined
    names contribute root + members; extended names members only."""
    out: list[dict] = []
    for desc in (report.get("idlNames") or {}).values():
        out.extend(_expected_from_desc(desc))
    for extensions in (report.get("idlExtendedNames") or {}).values():
        for desc in extensions:
            out.extend(_expected_from_desc(desc, exclude_root=True))
    return out


def expected_dfns_from_css(warnings: list[dict]) -> list[dict]:
    """getExpectedDfnsFromCSS (check-missing-dfns.js:62-78)."""
    return [
        {
            "linkingText": [w.get("name")],
            "type": w.get("type"),
            "for": w.get("for"),
            "value": w.get("value"),
        }
        for w in warnings
        if w.get("msg") == "Missing definition"
    ]


def _arrays_equal(a, b) -> bool:
    return isinstance(a, list) and isinstance(b, list) and a == b


def match_css_dfn(expected: dict, actual: dict) -> bool:
    """matchCSSDfn (check-missing-dfns.js:90-94)."""
    return (
        _arrays_equal(expected["linkingText"], actual.get("linkingText") or [])
        and (
            not expected.get("for")
            or _arrays_equal(expected["for"], actual.get("for") or [])
        )
        and (not expected.get("type") or expected["type"] == actual.get("type"))
    )


def match_idl_dfn(
    expected: dict,
    actual: dict,
    skip_args: bool = False,
    skip_for: bool = False,
    skip_type: bool = False,
) -> bool:
    """matchIdlDfn (check-missing-dfns.js:411-449), including the
    overload-marker and Respec-#3200 linking-text fixups."""
    fixed = [
        re.sub(r"\(, ", "(", re.sub(r"!overload-\d", "", lt))
        for lt in (actual.get("linkingText") or [])
    ]
    found = any(v in fixed for v in expected["linkingText"])
    if not found and skip_args:
        names = [re.sub(r"\(.*\)", "", lt) for lt in fixed]
        found = any(
            re.sub(r"\(.*\)", "", v) in names for v in expected["linkingText"]
        )
    return (
        found
        and (
            skip_for
            or all(v in (actual.get("for") or []) for v in expected["for"])
        )
        and (skip_type or expected["type"] == actual.get("type"))
    )


def check_spec_definitions(
    dfns: list[dict], css_warnings: list[dict], idl_report: dict
) -> list[dict]:
    """checkSpecDefinitions (check-missing-dfns.js:365-455) for one
    spec: list of missing-dfn records ``{source, expected, found,
    warning}``."""
    missing: list[dict] = []

    for expected in expected_dfns_from_css(css_warnings):
        actual = next((d for d in dfns if match_css_dfn(expected, d)), None)
        if not actual and not expected.get("type"):
            alt = [re.sub(r"^<(.*)\(\)>$", r"\1()", expected["linkingText"][0])]
            actual = next(
                (d for d in dfns if _arrays_equal(alt, d.get("linkingText") or [])),
                None,
            )
        if not actual and expected.get("value"):
            actual = next(
                (
                    d
                    for d in dfns
                    if _arrays_equal(
                        [expected["value"]], d.get("linkingText") or []
                    )
                ),
                None,
            )
        if not actual:
            found = next(
                (
                    d
                    for d in dfns
                    if _arrays_equal(d.get("linkingText") or [], expected["linkingText"])
                ),
                None,
            )
            missing.append(
                {"source": "css", "expected": expected, "found": found,
                 "warning": False}
            )

    for expected in expected_dfns_from_idl(idl_report):
        if any(match_idl_dfn(expected, d) for d in dfns):
            continue
        found = next(
            (d for d in dfns if match_idl_dfn(expected, d, skip_args=True)), None
        )
        if found:
            missing.append(
                {"source": "idl", "expected": expected, "found": found,
                 "warning": True}
            )
            continue
        found = next(
            (
                d
                for d in dfns
                if match_idl_dfn(expected, d, skip_args=True, skip_type=True)
            ),
            None,
        )
        if not found:
            found = next(
                (
                    d
                    for d in dfns
                    if match_idl_dfn(
                        expected, d, skip_args=True, skip_type=True, skip_for=True
                    )
                ),
                None,
            )
        missing.append(
            {"source": "idl", "expected": expected, "found": found,
             "warning": False}
        )
    return missing


def check_missing_dfns(
    dfns: rd.Dataset,
    css: rd.Dataset,
    idlparsed: rd.Dataset,
) -> rd.Dataset:
    """→ Dataset(doc_id, source, expected_lt, expected_type,
    expected_for, found_lt, found_type, warning) — one row per
    missing definition, empty when coverage is complete.

    ``dfns``: extracts_dfns shape (doc_id, linking_text, for, type, ...).
    ``css``: extracts_css shape (doc_id, category, payload_json).
    ``idlparsed``: (doc_id, idlparsed JSON).
    """

    def tag_dfns(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        payloads = [
            json.dumps(
                {
                    "linkingText": r.get("linking_text") or [],
                    "for": r.get("for") or [],
                    "type": r.get("type"),
                },
                ensure_ascii=False,
            )
            for r in rows
        ]
        return pa.table(
            {
                "doc_id": pa.array(
                    [str(r["doc_id"]) for r in rows], pa.string()
                ),
                "side": pa.array(["dfn"] * len(rows), pa.string()),
                "payload": pa.array(payloads, pa.large_string()),
            }
        )

    def tag_css(batch: pa.Table) -> pa.Table:
        rows = [
            r
            for r in batch.to_pylist()
            if r.get("category") == "warnings"
        ]
        return pa.table(
            {
                "doc_id": pa.array(
                    [str(r["doc_id"]) for r in rows], pa.string()
                ),
                "side": pa.array(["css"] * len(rows), pa.string()),
                "payload": pa.array(
                    [r.get("payload_json") or "{}" for r in rows],
                    pa.large_string(),
                ),
            }
        )

    def tag_idl(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [str(v) for v in batch.column("doc_id").to_pylist()],
                    pa.string(),
                ),
                "side": pa.array(["idl"] * batch.num_rows, pa.string()),
                "payload": pc_cast_large(batch.column("idlparsed")),
            }
        )

    import pyarrow.compute as pc

    def pc_cast_large(col):
        return pc.cast(col, pa.large_string())

    def add_bucket(batch: pa.Table) -> pa.Table:
        from ..urlnorm import fnv1a64, mix64

        b = pa.array(
            [
                mix64(fnv1a64(d)) % 64
                for d in batch.column("doc_id").to_pylist()
            ],
            pa.int64(),
        )
        return batch.append_column("_bucket", b)

    both = (
        dfns.map_batches(tag_dfns, batch_format="pyarrow")
        .union(css.map_batches(tag_css, batch_format="pyarrow"))
        .union(idlparsed.map_batches(tag_idl, batch_format="pyarrow"))
        .map_batches(add_bucket, batch_format="pyarrow")
    )

    def per_doc(group: pd.DataFrame) -> dict:
        doc_id = group["doc_id"].iloc[0]
        doc_dfns = [
            json.loads(p) for p in group[group["side"] == "dfn"]["payload"]
        ]
        warnings = [
            json.loads(p) for p in group[group["side"] == "css"]["payload"]
        ]
        reports = [
            json.loads(p or "{}")
            for p in group[group["side"] == "idl"]["payload"]
        ]
        out = {
            "doc_id": [], "source": [], "expected_lt": [],
            "expected_type": [], "expected_for": [], "found_lt": [],
            "found_type": [], "warning": [],
        }
        for report in reports or [{}]:
            missing = check_spec_definitions(doc_dfns, warnings, report)
            warnings = []  # css warnings checked once per doc
            for rec in missing:
                exp, found = rec["expected"], rec["found"]
                out["doc_id"].append(doc_id)
                out["source"].append(rec["source"])
                out["expected_lt"].append(exp["linkingText"][0])
                out["expected_type"].append(exp.get("type") or "")
                out["expected_for"].append(
                    (exp.get("for") or [""])[0] if exp.get("for") else ""
                )
                out["found_lt"].append(
                    (found.get("linkingText") or [""])[0] if found else ""
                )
                out["found_type"].append(found.get("type") or "" if found else "")
                out["warning"].append(bool(rec["warning"]))
        return out

    _EMPTY = {
        "doc_id": [], "source": [], "expected_lt": [], "expected_type": [],
        "expected_for": [], "found_lt": [], "found_type": [], "warning": [],
    }

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # one Ray group per doc-hash bucket (bounded group count); the
        # per-doc check loops inside the task
        outs = [per_doc(g) for _, g in group.groupby("doc_id", sort=False)]
        if not outs:
            return pd.DataFrame(_EMPTY)
        merged = {k: sum((o[k] for o in outs), []) for k in outs[0]}
        return pd.DataFrame(merged)

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def missing_dfns_markdown(df: pd.DataFrame) -> str:
    """Markdown rendering of a collected check_missing_dfns result —
    the reference CLI's per-spec details/summary format
    (check-missing-dfns.js:547-580)."""
    lines: list[str] = []
    for doc_id, g in df.groupby("doc_id", sort=True):
        errors = g[~g["warning"]]
        warns = g[g["warning"]]
        lines.append("<details>")
        lines.append(
            f"<summary><b>{doc_id}</b> ({len(errors)} errors, "
            f"{len(warns)} warnings)</summary>"
        )
        lines.append("")
        for title, part in (("Errors", errors), ("Warnings", warns)):
            if part.empty:
                continue
            lines.append("<details open>")
            lines.append(f"<summary><i>{title}</i> ({len(part)})</summary>")
            lines.append("")
            for _, row in part.iterrows():
                line = f"- `{row['expected_lt']}`"
                if row["expected_type"]:
                    line += f" with type `{row['expected_type']}`"
                if row["found_lt"]:
                    line += (
                        f", but found `{row['found_lt']}` with type "
                        f"`{row['found_type']}`"
                    )
                lines.append(line)
            lines.append("</details>")
        lines.append("</details>")
        lines.append("")
    return "\n".join(lines)
