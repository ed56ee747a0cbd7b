"""Minimal WebIDL parser producing the reference's idlparsed report.

Reimplements the report semantics of the reference's parse-webidl CLI
(reference: src/cli/parse-webidl.js:85-230) without WebIDL2.js: a
lightweight tokenizer + definition scanner sufficient for the
constructs exercised by the reference's own webidl-parser tests and
fixture corpus (interfaces incl. partial/mixin/callback, dictionaries,
enums, typedefs, callbacks, namespaces, includes statements, extended
attributes Global/Exposed, inheritance, member type references).

Report shape (parse-webidl.js:89-119):
  jsNames{constructors, functions}, idlNames, idlExtendedNames,
  globals, exposed, dependencies, externalDependencies.

Used as a stateful actor stage (ST2, SURVEY.md §2.3): construct
``IdlParser`` once per actor, call per batch.
"""

from __future__ import annotations

import re

# WebIDL 1 → 2 normalization (parse-webidl.js:30-37)
_RE_ARRAY = re.compile(r"attribute +([^\[ ]*)\[\]")
_RE_SERIALIZER = re.compile(r"serializer\s*=\s*{[^}]*}")


def normalize_webidl_1to2(idl: str) -> str:
    idl = _RE_ARRAY.sub(r"attribute FrozenArray<\1>", idl)
    idl = _RE_SERIALIZER.sub("[Default] object toJSON()", idl)
    return idl


BUILTIN_TYPES = {
    "undefined", "void", "any", "object", "boolean", "byte", "octet",
    "short", "unsigned", "long", "float", "double", "unrestricted",
    "DOMString", "ByteString", "USVString", "CSSOMString",
    "sequence", "record", "Promise", "FrozenArray", "ObservableArray",
    "optional", "readonly", "attribute", "const", "static", "stringifier",
    "iterable", "async", "maplike", "setlike", "constructor", "getter",
    "setter", "deleter", "inherit", "required", "or", "true", "false",
    "null", "Infinity", "NaN", "ArrayBuffer", "SharedArrayBuffer",
    "DataView", "Int8Array", "Int16Array", "Int32Array", "Uint8Array",
    "Uint16Array", "Uint32Array", "Uint8ClampedArray", "BigInt64Array",
    "BigUint64Array", "Float16Array", "Float32Array", "Float64Array",
    "bigint", "symbol", "callback", "partial", "interface", "mixin",
    "dictionary", "enum", "typedef", "namespace", "includes",
}

_RE_EXTATTRS = re.compile(r"^\s*\[((?:[^\[\]]|\[[^\]]*\])*)\]\s*", re.S)
_RE_DEF = re.compile(
    r"^\s*(?P<partial>partial\s+)?(?P<kind>callback\s+interface|interface\s+mixin|"
    r"interface|dictionary|enum|namespace|callback|typedef)\s+"
    r"(?P<name>[A-Za-z_][\w]*)",
    re.S,
)
_RE_INCLUDES = re.compile(r"^\s*([A-Za-z_]\w*)\s+includes\s+([A-Za-z_]\w*)\s*;")
_RE_IDENT = re.compile(r"[A-Za-z_]\w*")


def _split_defs(idl: str) -> list[tuple[str, str]]:
    """Split IDL text into (extattrs, definition) chunks at top level."""
    out = []
    i, n = 0, len(idl)
    while i < n:
        # skip whitespace + comments
        m = re.match(r"(\s+|//[^\n]*\n|/\*.*?\*/)+", idl[i:], re.S)
        if m:
            i += m.end()
        if i >= n:
            break
        start = i
        depth = 0
        j = i
        while j < n:
            c = idl[j]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
            elif c == ";" and depth <= 0:
                j += 1
                break
            j += 1
        out.append(("", idl[start:j]))
        i = j
    return out


def _parse_extattrs(text: str) -> tuple[dict, str]:
    """Extract leading [ ... ] extended attributes → {name: [values]}."""
    attrs: dict[str, list[str]] = {}
    m = _RE_EXTATTRS.match(text)
    if not m:
        return attrs, text
    body = m.group(1)
    # split top-level commas (parens may nest)
    parts, depth, cur = [], 0, []
    for c in body:
        if c in "(<":
            depth += 1
        elif c in ")>":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    if cur:
        parts.append("".join(cur))
    for p in parts:
        p = p.strip()
        if "=" in p:
            k, v = p.split("=", 1)
            v = v.strip()
            if v.startswith("(") and v.endswith(")"):
                vals = [x.strip() for x in v[1:-1].split(",") if x.strip()]
            else:
                vals = [v]
            attrs[k.strip()] = vals
        elif p:
            attrs[p] = []
    return attrs, text[m.end():]


def _member_type_refs(member: str) -> list[str]:
    """Type references in one member declaration: drop the member name
    (identifier right before '(' for operations, trailing identifier
    otherwise) and each argument's name (last identifier per arg)."""
    member = member.strip()
    if not member:
        return []
    paren = member.find("(")
    refs: list[str] = []
    if paren >= 0:
        head = member[:paren]
        args = member[paren + 1 : member.rfind(")")] if ")" in member else ""
        head_ids = _RE_IDENT.findall(head)
        refs.extend(head_ids[:-1] if head_ids else [])  # last = op name
        for arg in args.split(","):
            arg_ids = _RE_IDENT.findall(re.sub(r"=.*$", "", arg))
            refs.extend(arg_ids[:-1] if arg_ids else [])  # last = arg name
    else:
        # attribute / const / field: `modifiers Type name [= default];`
        decl = re.sub(r"=.*$", "", member)
        ids = _RE_IDENT.findall(decl)
        refs.extend(ids[:-1] if ids else [])
    return refs


def _referenced_names(body: str) -> list[str]:
    """Type names referenced in a definition body, builtins filtered,
    member/argument names excluded, first-appearance order preserved."""
    body = re.sub(r"\[[^\]]*\]", " ", body)
    body = re.sub(r'"[^"]*"', " ", body)
    seen, out = set(), []
    for member in body.split(";"):
        for name in _member_type_refs(member):
            if name in BUILTIN_TYPES or name in seen:
                continue
            seen.add(name)
            out.append(name)
    return out


def parse_webidl(idl: str) -> dict:
    """Parse IDL text → idlparsed report (parse-webidl.js:85-130)."""
    idl = normalize_webidl_1to2(idl)
    report = {
        "jsNames": {"constructors": {}, "functions": {}},
        "idlNames": {},
        "idlExtendedNames": {},
        "globals": {},
        "exposed": {},
        "dependencies": {},
        "externalDependencies": [],
    }
    ext_deps: list[str] = []

    for _, chunk in _split_defs(idl):
        attrs, rest = _parse_extattrs(chunk)
        m_inc = _RE_INCLUDES.match(rest)
        if m_inc:
            target, mixin = m_inc.group(1), m_inc.group(2)
            report["idlExtendedNames"].setdefault(target, []).append(
                {"type": "includes", "includes": mixin}
            )
            report["dependencies"].setdefault(target, [])
            if mixin not in report["dependencies"][target]:
                report["dependencies"][target].append(mixin)
            ext_deps.append(mixin)
            continue
        m = _RE_DEF.match(rest)
        if not m:
            continue
        kind = re.sub(r"\s+", " ", m.group("kind"))
        name = m.group("name")
        partial = bool(m.group("partial"))
        after = rest[m.end():]

        # inheritance
        inherits = None
        m_inh = re.match(r"\s*:\s*([A-Za-z_]\w*)", after)
        if m_inh:
            inherits = m_inh.group(1)

        body_start = after.find("{")
        body = after[body_start + 1 : after.rfind("}")] if body_start >= 0 else after

        idl_type = {
            "interface": "interface",
            "interface mixin": "interface mixin",
            "callback interface": "callback interface",
            "dictionary": "dictionary",
            "enum": "enum",
            "namespace": "namespace",
            "callback": "callback",
            "typedef": "typedef",
        }[kind]

        desc = {
            "type": idl_type,
            "name": name,
            "fragment": chunk.strip(),
        }
        if inherits:
            desc["inheritance"] = inherits
        if attrs:
            desc["extAttrs"] = attrs

        if partial:
            report["idlExtendedNames"].setdefault(name, []).append(desc)
        else:
            report["idlNames"][name] = desc

        # dependencies from body + inheritance
        deps = []
        if inherits:
            deps.append(inherits)
        if idl_type == "typedef":
            deps.extend(_referenced_names(after.replace(name, "", 1)))
        else:
            deps.extend(_referenced_names(body))
        deps = [d for d in dict.fromkeys(d for d in deps if d != name)]
        key = name
        existing = report["dependencies"].setdefault(key, [])
        for d in deps:
            if d not in existing:
                existing.append(d)
        ext_deps.extend(deps)

        # [Global=...] (parse-webidl.js globals handling)
        if "Global" in attrs and idl_type.startswith("interface"):
            for g in attrs["Global"] or [name]:
                report["globals"].setdefault(g, [])
                if name not in report["globals"][g]:
                    report["globals"][g].append(name)
        # [Exposed=...]
        if "Exposed" in attrs and idl_type in (
            "interface", "callback interface", "namespace", "interface mixin"
        ):
            exposed_on = attrs["Exposed"] or []
            for g in exposed_on:
                report["exposed"].setdefault(g, [])
                if name not in report["exposed"][g]:
                    report["exposed"][g].append(name)
                if g != "*":
                    fns = report["jsNames"]["functions"].setdefault(g, [])
                    if name not in fns:
                        fns.append(name)
                    if "constructor(" in body.replace(" ", "") or "Constructor" in attrs:
                        ctors = report["jsNames"]["constructors"].setdefault(g, [])
                        if name not in ctors:
                            ctors.append(name)

    report["externalDependencies"] = [
        n for n in dict.fromkeys(ext_deps) if n not in report["idlNames"]
    ]
    return report


class IdlParser:
    """Actor-pool stage (ST2): extracts_idl batch → idlparsed column."""

    def __call__(self, batch):
        import json

        import pyarrow as pa

        doc_ids = batch.column("doc_id").to_pylist()
        idls = batch.column("idl").to_pylist()
        reports, errors = [], []
        for idl in idls:
            try:
                reports.append(json.dumps(parse_webidl(idl or ""), ensure_ascii=False))
                errors.append(None)
            except Exception as e:
                reports.append(None)
                errors.append(f"{type(e).__name__}: {e}")
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "idlparsed": pa.array(reports, pa.large_string()),
                "error": pa.array(errors, pa.string()),
            }
        )


_IDL_PARSER = IdlParser()


def parse_idl_batch(batch):
    """Task-based wrapper (IdlParser holds no construction state, so a
    plain task pool beats an actor pool: no pool churn between
    consecutive dataset executions, elastic scaling)."""
    return _IDL_PARSER(batch)
