"""check-missing-dfns analog (post/check_dfns) parity tests
(reference src/cli/check-missing-dfns.js)."""

import json

import pyarrow as pa
import ray.data as rd

from reffy_ray.functions.webidl import parse_webidl
from reffy_ray.post.check_dfns import (
    check_spec_definitions,
    expected_dfns_from_idl,
    match_idl_dfn,
    missing_dfns_markdown,
)

IDL = """
enum Mode { "open", "" };
interface Foo {
  constructor(DOMString a, optional long b);
  readonly attribute DOMString name;
  const unsigned short X = 3;
  undefined doIt(long x, long... rest);
  getter DOMString (DOMString key);
  [Default] object toJSON();
  iterable<DOMString>;
  stringifier;
};
interface HTMLFooElement {
  constructor();
};
dictionary Opts { required long a; DOMString b = "x"; };
"""


def _dfn(lt, typ, for_=()):
    return {"linkingText": list(lt), "for": list(for_), "type": typ}


def test_expected_dfns_from_idl_walk():
    exp = expected_dfns_from_idl(parse_webidl(IDL))
    by_lt = {tuple(e["linkingText"]): e for e in exp}
    # roots
    assert by_lt[("Mode",)]["type"] == "enum"
    assert by_lt[("Foo",)]["type"] == "interface"
    assert by_lt[("Opts",)]["type"] == "dictionary"
    # enum values: quoted + unquoted; empty value quoted only
    assert by_lt[('"open"', "open")]["type"] == "enum-value"
    assert ('""',) in by_lt
    # members
    assert by_lt[("constructor(a, b)",)]["for"] == ["Foo"]
    assert by_lt[("name",)]["type"] == "attribute"
    assert by_lt[("X",)]["type"] == "const"
    assert by_lt[("doIt(x, ...rest)",)]["type"] == "method"
    assert by_lt[("a",)]["type"] == "dict-member"
    assert by_lt[("stringification behavior", "stringificationbehavior")][
        "type"
    ] == "dfn"
    # skipped: unnamed getter, default toJSON, iterable, HTML constructor
    assert not any("toJSON" in lt[0] for lt in by_lt)
    assert not any(
        e["for"] == ["HTMLFooElement"] and e["type"] == "constructor"
        for e in exp
    )


def test_match_idl_dfn_fixups_and_skips():
    exp = {"linkingText": ["doIt(x, ...rest)"], "type": "method", "for": ["Foo"]}
    # overload marker + Respec #3200 fixups
    assert match_idl_dfn(
        exp, _dfn(["doIt(x, ...rest)!overload-1"], "method", ["Foo"])
    )
    assert match_idl_dfn(
        {"linkingText": ["f(a)"], "type": "method", "for": ["I"]},
        _dfn(["f(, a)"], "method", ["I"]),
    )
    # arg-insensitive only with skip_args
    other = _dfn(["doIt(y)"], "method", ["Foo"])
    assert not match_idl_dfn(exp, other)
    assert match_idl_dfn(exp, other, skip_args=True)
    # for/type gates
    assert not match_idl_dfn(exp, _dfn(["doIt(x, ...rest)"], "method", ["Bar"]))
    assert not match_idl_dfn(exp, _dfn(["doIt(x, ...rest)"], "dfn", ["Foo"]))


def test_check_spec_definitions_cascade():
    report = parse_webidl("interface Foo { undefined go(long x); };")
    dfns = [
        _dfn(["Foo"], "interface"),
        # wrong args → skip_args match → warning
        _dfn(["go(y)"], "method", ["Foo"]),
    ]
    missing = check_spec_definitions(dfns, [], report)
    assert len(missing) == 1
    rec = missing[0]
    assert rec["warning"] is True
    assert rec["expected"]["linkingText"] == ["go(x)"]
    assert rec["found"]["linkingText"] == ["go(y)"]

    # fully covered → no missing
    dfns2 = [_dfn(["Foo"], "interface"), _dfn(["go(x)"], "method", ["Foo"])]
    assert check_spec_definitions(dfns2, [], report) == []


def test_check_spec_definitions_css_warnings():
    warnings = [
        {"msg": "Missing definition", "name": "--covered", "type": "property"},
        {"msg": "Missing definition", "name": "--missing", "type": "property"},
        {"msg": "Duplicate definition", "name": "ignored", "type": "property"},
    ]
    dfns = [_dfn(["--covered"], "property")]
    missing = check_spec_definitions(dfns, warnings, {})
    assert [m["expected"]["linkingText"][0] for m in missing] == ["--missing"]
    assert missing[0]["source"] == "css"


def test_check_missing_dfns_dataset_and_markdown(ray_session):
    from reffy_ray.post.check_dfns import check_missing_dfns

    idl = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1"], pa.string()),
                "idlparsed": pa.array(
                    [
                        json.dumps(
                            parse_webidl(
                                "interface Foo { attribute DOMString name; };"
                            )
                        )
                    ],
                    pa.large_string(),
                ),
            }
        )
    )
    dfns = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1"], pa.string()),
                "linking_text": pa.array([["Foo"]], pa.list_(pa.string())),
                "for": pa.array([[]], pa.list_(pa.string())),
                "type": pa.array(["interface"], pa.string()),
            }
        )
    )
    css = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1"], pa.string()),
                "category": pa.array(["warnings"], pa.string()),
                "payload_json": pa.array(
                    [json.dumps({"msg": "Missing definition", "name": "--x"})],
                    pa.large_string(),
                ),
            }
        )
    )
    out = check_missing_dfns(dfns, css, idl).to_pandas()
    assert sorted(out["expected_lt"]) == ["--x", "name"]
    assert set(out["source"]) == {"css", "idl"}
    md = missing_dfns_markdown(out)
    assert "<b>d1</b> (2 errors, 0 warnings)" in md
    assert "- `name` with type `attribute`" in md
