"""CSS value-definition grammar → JSON-schema-like AST.

Faithful reimplementation of the reference's grammar parser
(reference: src/lib/css-grammar-parser.js:4-440), golden-tested
against its test corpus (test/css-grammar-parser/{in,out.json}).

Semantics preserved exactly, including the reference's combinator
componentization order (&& → || → |, each removed going down, which
makes `|` bind tighter than `||` — see componentizeByCombinators,
css-grammar-parser.js:53-80) and multiplier/bracket-group handling.
One deliberate divergence: the reference tokenizer has a literal-'c'
typo when a keyword directly follows `|` without spaces
(css-grammar-parser.js:355 `currentToken = 'c'`); we use the actual
character — no golden case hits that path.
"""

from __future__ import annotations

import re

PRIMITIVES = [
    "ident", "ident-token", "declaration-value", "number-token",
    "hash-token", "any-value", "string-token", "function-token",
    "dimension-token", "zero", "custom-ident", "string", "url", "integer",
    "number", "percentage", "number-percentage", "length-percentage",
    "frequency-percentage", "angle-percentage", "time-percentage",
    "dimension", "length", "angle", "time", "frequency", "resolution",
    "color", "image", "position",
]

COMBINATORS = [("&&", "allOf"), ("||", "anyOf"), ("|", "oneOf")]
MULTIPLIER_STARTERS = ("{", "+", "#", "!", "?", "*")
UNQUOTED_TOKENS = ("/", ",", "(", ")")

_DELIMITER_STATES = ("new", "keyword", "pipe")


def tokenize(value: str) -> list[str]:
    """State-machine tokenizer (css-grammar-parser.js:196-371)."""
    i, cur, tokens, state = 0, "", [], "new"
    while i < len(value):
        c = value[i]
        if c.isspace():
            if state == "labracket":
                cur += c
            else:
                if cur:
                    tokens.append(cur)
                cur = ""
                state = "new"
        elif c == "<":
            if state in _DELIMITER_STATES:
                if cur:
                    tokens.append(cur)
                cur = c
                state = "labracket"
            elif state == "quote":
                cur += c
            else:
                raise ValueError(f"Unexpected < in {cur} while parsing {value}")
        elif c == ">":
            if state == "quote":
                cur += c
            elif state in ("rabracket", "labracket"):
                cur += c
                tokens.append(cur)
                cur = ""
                state = "new"
            else:
                raise ValueError(f"Unexpected > in {cur} while parsing {value}")
        elif c == "'":
            if state == "quote":
                cur += c
                tokens.append(cur)
                cur = ""
                state = "new"
            elif state == "labracket":
                cur += c
                state = "labracketquote"
            elif state == "labracketquote":
                cur += c
                state = "rabracket"
            else:
                if cur:
                    tokens.append(cur)
                cur = c
                state = "quote"
        elif c in ("[", "]", "+", "*", "#", "!", "?", "/"):
            if state in _DELIMITER_STATES:
                if cur:
                    tokens.append(cur)
                tokens.append(c)
                cur = ""
                state = "new"
            elif state == "quote":
                cur += c
            elif state == "labracket" and c == "[":
                state = "bracketedrange"
                cur += c
            elif state == "bracketedrange" and c == "]":
                cur += c
                state = "labracket"
            else:
                raise ValueError(f"Unexpected {c} in {cur} while parsing {value}")
        elif c == "{":
            if state == "quote":
                cur += c
            elif state in _DELIMITER_STATES:
                if cur:
                    tokens.append(cur)
                cur = c
                state = "curlybracket"
            else:
                raise ValueError(f"Unexpected {{ in {cur} while parsing {value}")
        elif c == "}":
            if state == "quote":
                cur += c
            elif state == "curlybracket":
                cur += c
                tokens.append(cur)
                cur = ""
                state = "new"
            else:
                raise ValueError(f"Unexpected }} in {cur} while parsing {value}")
        elif c == ",":
            if state in _DELIMITER_STATES:
                if cur:
                    tokens.append(cur)
                tokens.append(c)
                cur = ""
                state = "new"
            elif state in ("quote", "curlybracket", "bracketedrange"):
                cur += c
            else:
                raise ValueError(f"Unexpected , in {cur} while parsing {value}")
        elif c == "(":
            if state in ("new", "pipe"):
                if cur:
                    tokens.append(cur)
                tokens.append(c)
                cur = ""
                state = "new"
            elif state in ("quote", "labracket", "labracketquote"):
                cur += c
            elif state == "keyword":
                cur += c
                tokens.append(cur)
                cur = ""
                state = "new"
            else:
                raise ValueError(f"Unexpected ( in {cur} while parsing {value}")
        elif c == ")":
            if state in _DELIMITER_STATES:
                if cur:
                    tokens.append(cur)
                tokens.append(c)
                cur = ""
                state = "new"
            elif state in ("quote", "labracket", "labracketquote"):
                cur += c
            else:
                raise ValueError(f"Unexpected ) in {cur} while parsing {value}")
        elif c == "&":
            if state in ("new", "keyword"):
                if cur:
                    tokens.append(cur)
                cur = c
                state = "ampersand"
            elif state == "quote":
                cur += c
            elif state == "ampersand":
                cur += c
                tokens.append(cur)
                cur = ""
                state = "new"
            else:
                raise ValueError(f"Unexpected & in {cur} while parsing {value}")
        elif c == "|":
            if state in ("new", "keyword"):
                if cur:
                    tokens.append(cur)
                cur = c
                state = "pipe"
            elif state == "quote":
                cur += c
            elif state == "pipe":
                cur += c
                tokens.append(cur)
                cur = ""
                state = "new"
            else:
                raise ValueError(f"Unexpected | in {cur} while parsing {value}")
        else:
            if state == "pipe":
                tokens.append(cur)
                cur = c  # reference has literal 'c' here (typo) — fixed
                state = "keyword"
            else:
                cur += c
                if state == "new":
                    state = "keyword"
        i += 1
    if state in ("new", "keyword"):
        if cur:
            tokens.append(cur)
    else:
        raise ValueError(f"Unexpected EOF while parsing {value} in state {state}")
    return tokens


def _is_multiplier(s) -> bool:
    return isinstance(s, str) and s.startswith(MULTIPLIER_STARTERS)


def _parse_multiplier_range(rng: str) -> dict:
    if not (rng.startswith("{") and rng.endswith("}")):
        raise ValueError(f"Bad multiplier range {rng}")
    values = rng[1:-1]
    if re.fullmatch(r"[0-9]+", values):
        return {"minItems": int(values), "maxItems": int(values)}
    m = re.fullmatch(r"([0-9]+),([0-9]+)?", values)
    if m:
        out = {"minItems": int(m.group(1))}
        if m.group(2):
            out["maxItems"] = int(m.group(2))
        return out
    raise ValueError(f"Unrecognized range format in multiplier {rng}")


def _apply_multiplier(multiplier: str, modifiee):
    if multiplier == "*":
        return {"type": "array", "items": modifiee}
    if multiplier == "+":
        return {"type": "array", "items": modifiee, "minItems": 1}
    if multiplier == "#":
        return {"type": "array", "items": modifiee, "separator": ","}
    if multiplier.startswith("{"):
        return {"type": "array", "items": modifiee, **_parse_multiplier_range(multiplier)}
    if multiplier == "?":
        if isinstance(modifiee, list):
            return {"type": "array", "items": modifiee, "maxItems": 1}
        return {**modifiee, "optional": True}
    if multiplier == "!":
        if isinstance(modifiee, list):
            return {"type": "array", "items": modifiee, "minItems": 1}
        raise ValueError(f'Multiplier "!" applied to non-group {modifiee}')
    raise ValueError(f"Unrecognized multiplier {multiplier}")


def _primitive_match(s: str, p: str):
    return re.search(rf"<({re.escape(p)})( +\[[^\]]*\])?>", s)


def _parse_bracketed_range(s: str | None):
    if not s or not s.strip():
        return None
    inner = s.strip()[1:-1]
    return [x.strip() for x in inner.split(",")]


def _parse_terminals(s: str):
    combinator_keys = [c for c, _ in COMBINATORS]
    if s in combinator_keys or s == "[" or s.startswith("]") or _is_multiplier(s):
        return s
    if s in UNQUOTED_TOKENS:
        return {"type": "string", "content": s}
    m = re.fullmatch(r"'([^']*)'", s)
    if m:
        return {"type": "string", "content": m.group(1)}
    m = re.fullmatch(r"<'([-_a-zA-Z][^'>]*)'>", s)
    if m:
        return {"type": "propertyref", "name": m.group(1)}
    for p in PRIMITIVES:
        pm = _primitive_match(s, p)
        if pm:
            out = {"type": "primitive", "name": pm.group(1)}
            rng = _parse_bracketed_range(pm.group(2))
            if rng:
                if len(rng) != 2:
                    raise ValueError(f"Unrecognized range descriptor {pm.group(2)}")
                out["range"] = rng
            return out
    if re.fullmatch(r"<[-_a-zA-Z][^>]*>", s):
        return {"type": "valuespace", "name": s[1:-1]}
    if re.fullmatch(r"[-_a-zA-Z][-_a-zA-Z0-9]*", s):
        return {"type": "keyword", "name": s}
    if re.fullmatch(r"[-_a-zA-Z][-_a-zA-Z0-9]*\(", s):
        return {"type": "functionstart", "name": s}
    raise ValueError(f"Unrecognized token {s}")


def _split_by_combinator(parts: list, combinator: str) -> list:
    components, head = [], []
    for i, b in enumerate(parts):
        if b == combinator:
            components.append(head[0] if len(head) == 1 else head)
            head = []
        else:
            head.append(_componentize(b) if isinstance(b, list) else b)
        if i == len(parts) - 1:
            components.append(head[0] if len(head) == 1 else head)
    return components


def _componentize(parts, combinators: list | None = None):
    combinators = COMBINATORS if combinators is None else combinators
    for c, t in combinators:
        if isinstance(parts, list) and c in parts:
            lower = [(cc, tt) for cc, tt in combinators if cc != c]
            return {t: [_componentize(p, lower) for p in _split_by_combinator(parts, c)]}
    if isinstance(parts, list):
        if len(parts) > 1:
            return {"type": "array", "items": [_componentize(p) for p in parts]}
        return _componentize(parts[0])
    if isinstance(parts, dict) and parts.get("type") == "array":
        return {**parts, "items": _componentize(parts["items"])}
    return parts


def parse_propdef_value(value: str):
    """Parse one CSS value definition (css-grammar-parser.js:373-437)."""
    value = value.strip()
    parts = [_parse_terminals(t) for t in tokenize(value) if t]

    # apply multipliers on terminals
    reduced = []
    for i, item in enumerate(parts):
        if not _is_multiplier(item):
            reduced.append(item)
            continue
        if not reduced:
            raise ValueError(f"Unexpected multiplier {item} at the start of {value}")
        prev = reduced.pop()
        if prev != "]":
            reduced.append(_apply_multiplier(item, prev))
        else:
            reduced.append(prev)
            reduced.append(item)
    parts = reduced

    # functional notations
    while any(isinstance(p, dict) and p.get("type") == "functionstart" for p in parts):
        fi = next(i for i, p in enumerate(parts)
                  if isinstance(p, dict) and p.get("type") == "functionstart")
        ci = next(
            (i for i, p in enumerate(parts)
             if i > fi and isinstance(p, dict) and p.get("content") == ")"),
            -1,
        )
        if ci == -1:
            raise ValueError(f"Unterminated function notation in {value}")
        name = parts[fi]["name"]
        func = {"type": "function", "name": name[:-1], "arguments": parts[fi + 1 : ci]}
        parts = parts[:fi] + [func] + parts[ci + 1 :]

    # nested bracket groups, innermost-last first
    while "[" in parts:
        bi = len(parts) - 1 - parts[::-1].index("[")
        mi = next((i for i, p in enumerate(parts) if p == "]" and i > bi), -1)
        if mi == -1:
            raise ValueError(f"Unterminated bracket-group in {value}")
        group = parts[bi + 1 : mi]
        i = 0
        multiplied = False
        rest = parts[mi + 1 :]
        while i < len(rest) and _is_multiplier(rest[i]):
            group = _apply_multiplier(rest[i], group)
            multiplied = True
            i += 1
        # JS concat semantics (css-grammar-parser.js:430-433): whether
        # multiplied (dict) or not (list wrapped then flattened by
        # concat), exactly one item — `group` — is inserted
        parts = parts[:bi] + [group] + parts[mi + 1 + i :]

    res = _componentize(parts)
    if isinstance(res, list) and len(res) == 1:
        return res[0]
    return res
