"""Shared helper: evaluate a JS `const tests = [...]` literal from the
reference's test files as Python data (read-don't-copy policy — the
tables are parsed from /root/reference at collection time and never
committed to this repo)."""

from __future__ import annotations

import json
import os
import re


def load_js_tests(path: str, var: str = "tests", namespace: dict | None = None,
                  substitutions: dict[str, str] | None = None):
    """Return the `const <var> = [...]` array from a reference test
    file as Python data, or [] when the file is unavailable.

    ``namespace`` provides values for identifiers the table references
    (e.g. a `defaultResults(...)` helper); ``substitutions`` replaces
    `${name}` template interpolations inside backtick strings."""
    if not os.path.isfile(path):
        return []
    src = open(path).read()
    marker = f"const {var} = ["
    start = src.index(marker)
    body = src[start + len(f"const {var} = "):]
    arr = body[: body.index("\n];") + 2]
    for name, value in (substitutions or {}).items():
        arr = arr.replace("${" + name + "}", value)
    return eval_js_literal(arr, namespace)


def eval_js_literal(arr: str, namespace: dict | None = None):
    blocks: list[str] = []

    _ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
                "v": "\v", "0": "\0", "\\": "\\", "`": "`", "'": "'",
                '"': '"', "$": "$"}

    def stash(m):
        # string literals process escape sequences
        def esc(e):
            if e.group(1):
                return chr(int(e.group(1), 16))
            return _ESCAPES.get(e.group(2), e.group(2))

        raw = next(g for g in m.groups() if g is not None)
        block = re.sub(r"\\u([0-9a-fA-F]{4})|\\(.)", esc, raw, flags=re.S)
        blocks.append(block)
        return f"__BLOCK_{len(blocks) - 1}__"

    # stash EVERY string literal (backtick, single- and double-quoted)
    # in ONE left-to-right pass — the quote types nest inside each
    # other's content, so separate passes would match quotes inside
    # already-string content; keys inside string content (e.g.
    # "Then, run:") must never be mistaken for object keys
    s = re.sub(
        r"`([^`]*)`|'((?:[^'\\\n]|\\.)*)'|\"((?:[^\"\\\n]|\\.)*)\"",
        stash,
        arr,
        flags=re.S,
    )
    s = re.sub(r"^\s*//.*$", "", s, flags=re.M)
    # quote bare keys; stashed strings used as keys restore with their
    # own quotes, so leave placeholders alone
    s = re.sub(r"([{,\[]\s*)(?!__BLOCK_\d+__)([A-Za-z_]\w*)\s*:", r'\1"\2":', s)
    s = re.sub(r"\btrue\b", "True", s)
    s = re.sub(r"\bfalse\b", "False", s)
    s = re.sub(r"\bnull\b", "None", s)
    s = re.sub(r"\bundefined\b", "None", s)
    s = re.sub(r"__BLOCK_(\d+)__", lambda m: json.dumps(blocks[int(m.group(1))]), s)
    return eval(s, {"__builtins__": {}}, dict(namespace or {}))  # noqa: S307


def norm(v, keymap: dict[str, str] | None = None):
    """Recursively drop None-valued keys (absent key in JS ≡ null field
    in Arrow) and rename camelCase keys via keymap."""
    keymap = keymap or {}
    if isinstance(v, dict):
        return {
            keymap.get(k, k): norm(x, keymap) for k, x in v.items() if x is not None
        }
    if isinstance(v, list):
        return [norm(x, keymap) for x in v]
    return v
