"""The reference's merge-css post-processing tests, hand-mirrored
(reference: test/merge-css.js — same constructs, same 15 assertions,
against our faithful consolidate_css)."""

from __future__ import annotations

import copy
import re

import pytest

from reffy_ray.post.cssmerge import consolidate_css

EMPTY_EXTRACT = {"atrules": [], "properties": [], "selectors": [], "values": []}
EMPTY_MERGED = {
    "atrules": [], "functions": [], "properties": [], "selectors": [],
    "types": [],
}

ATRULE1 = {
    "name": "@-webkit-keyframes",
    "href": "https://compat.spec.whatwg.org/#at-ruledef--webkit-keyframes",
    "descriptors": [],
}
ATRULE2 = {
    "name": "@media",
    "href": "https://drafts.csswg.org/css-conditional-3/#at-ruledef-media",
    "descriptors": [],
}
DESCRIPTOR1 = {
    "name": "descriptor1",
    "href": "https://compat.spec.whatwg.org/#descdef-media--webkit-device-pixel-ratio",
    "for": "@media", "value": "<number>", "type": "range",
}
DESCRIPTOR2 = {
    "name": "descriptor2",
    "href": "https://compat.spec.whatwg.org/#descdef-media--webkit-transform-3d",
    "for": "@media", "value": "<mq-boolean>", "type": "discrete",
}
DESCRIPTOR_BASE = {
    "name": "descriptor",
    "href": "https://drafts.csswg.org/css-stuff-1/#descdef-descriptor",
    "for": "@media", "value": "base", "type": "discrete",
}
DESCRIPTOR_EXTENSION = {
    **DESCRIPTOR_BASE,
    "href": "https://drafts.csswg.org/css-stuff-2/#descdef-descriptor",
    "value": "extended",
}
PROPERTY1 = {
    "name": "overlay",
    "href": "https://drafts.csswg.org/css-position-4/#propdef-overlay",
    "value": "none | auto", "initial": "none", "appliesTo": "all elements",
    "inherited": "no", "percentages": "n/a", "computedValue": "as specified",
    "canonicalOrder": "per grammar", "animationType": "see prose",
    "styleDeclaration": ["overlay"],
}
PROPERTY_LEGACY = {
    "name": "good-old-overlay",
    "href": "https://compat.spec.whatwg.org/#good-old-overlay",
    "legacyAliasOf": "overlay",
}
SELECTOR1 = {
    "name": ":first-of-page",
    "href": "https://drafts.csswg.org/css-gcpm-4/#selectordef-first-of-page",
    "value": ":first-of-page",
}
TYPE1 = {
    "name": "<repetition>",
    "href": "https://drafts.csswg.org/css-backgrounds-4/#typedef-repetition",
    "type": "type", "value": "repeat | space | round | no-repeat",
}
TYPE1_EXTENSION = {
    "name": "<repetition>", "type": "type", "value": "bis repetita",
}
FUNCTION_VAR = {
    "name": "var()",
    "href": "https://drafts.csswg.org/css-variables-2/#funcdef-var",
    "type": "function",
    "value": "var( <custom-property-name> , <declaration-value>? )",
}
FUNCTION_ENV = {
    "name": "env()",
    "href": "https://drafts.csswg.org/css-env-1/#funcdef-env",
    "type": "function",
    "value": "env( <custom-ident> <integer [0,∞]>*, <declaration-value>? )",
}


def conv(entry, parent_key=None):
    """Mirror of the test's conv() (merge-css.js:121-152)."""
    if not isinstance(entry, (dict, list)):
        return entry
    if isinstance(entry, list):
        return [conv(v, parent_key) for v in entry]
    res = {}
    if entry.get("href") and "extended" not in entry and parent_key != "descriptors":
        entry = {**entry, "extended": []}
    for key, value in entry.items():
        if isinstance(value, list):
            res[key] = [conv(v, key) for v in value]
        elif key == "value":
            res["syntax"] = value
        elif key == "type" and value in ("function", "type"):
            pass
        elif isinstance(value, str) and re.match(r"^<([^>]+)>$", value):
            res[key] = value[1:-1]
        else:
            res[key] = value
    return res


def spec(shortname, series, version, css, crawled=None):
    out = {
        "shortname": shortname,
        "series": {"shortname": series},
        "seriesVersion": version,
        "css": {**EMPTY_EXTRACT, **css},
    }
    if crawled:
        out["crawled"] = crawled
    return out


def run(results):
    return consolidate_css(copy.deepcopy(results))


def test_empty_report():
    assert run([{"shortname": "x", "series": {"shortname": "x"}}]) == EMPTY_MERGED


def test_includes_all_definitions_and_sorts():
    results = [
        spec("css-stuff-1", "css-stuff", "1", {
            "atrules": [ATRULE1, {**ATRULE2, "descriptors": [DESCRIPTOR1]}],
            "selectors": [SELECTOR1],
            "values": [TYPE1, FUNCTION_VAR],
        }),
        spec("css-otherstuff-1", "css-otherstuff", "1", {
            "atrules": [{
                **ATRULE2,
                "value": "@media <media-query-list> { <rule-list> }",
                "descriptors": [DESCRIPTOR2],
            }],
            "properties": [PROPERTY1],
            "values": [FUNCTION_ENV],
        }),
    ]
    result = run(results)
    expected = conv({
        "atrules": [
            ATRULE1,
            {**ATRULE2, "value": "@media <media-query-list> { <rule-list> }",
             "descriptors": [DESCRIPTOR1, DESCRIPTOR2]},
        ],
        "functions": [FUNCTION_ENV, FUNCTION_VAR],
        "properties": [PROPERTY1],
        "selectors": [SELECTOR1],
        "types": [TYPE1],
    })
    for category in expected:
        assert result[category] == expected[category], category


def test_includes_nested_functions_and_types():
    basic_shape = {
        "name": "<basic-shape>",
        "href": "https://drafts.csswg.org/css-shapes-1/#typedef-basic-shape",
        "type": "type",
    }
    move_type = {
        "name": "<move-command>", "value": "move <command-end-point>",
        "href": "https://drafts.csswg.org/css-shapes-1/#typedef-shape-move-command",
        "type": "type",
    }
    shape_fn = {
        "name": "shape()",
        "href": "https://drafts.csswg.org/css-shapes-1/#funcdef-basic-shape-shape",
        "type": "function", "value": "shape( <shape-command># )",
    }
    results = [
        spec("css-stuff-1", "css-stuff", "1", {
            "values": [
                {
                    "name": "<track-repeat>",
                    "href": "https://drafts.csswg.org/css-grid-2/#typedef-track-repeat",
                    "type": "type",
                    "values": [FUNCTION_ENV, TYPE1],
                },
                {**basic_shape, "values": [{**shape_fn, "values": [move_type]}]},
            ],
        }),
    ]
    assert run(results) == conv({
        **EMPTY_MERGED,
        "functions": [
            {**FUNCTION_ENV, "for": ["<track-repeat>"]},
            {**shape_fn, "for": [basic_shape["name"]]},
        ],
        "types": [
            basic_shape,
            {**move_type, "for": [shape_fn["name"]]},
            {**TYPE1, "for": ["<track-repeat>"]},
            {
                "name": "<track-repeat>",
                "href": "https://drafts.csswg.org/css-grid-2/#typedef-track-repeat",
                "type": "type",
            },
        ],
    })


def test_most_recent_definition_in_series():
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"properties": [PROPERTY1]}),
        spec("css-stuff-2", "css-stuff", "2",
             {"properties": [{**PROPERTY1, "value": "none | auto | train"}]}),
    ]
    assert run(results)["properties"] == [
        {**conv(PROPERTY1), "syntax": "none | auto | train"}
    ]


def test_merges_extended_properties():
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"properties": [PROPERTY1]}),
        spec("css-otherstuff-2", "css-otherstuff", "2", {"properties": [{
            **PROPERTY1, "value": None, "newValues": "train",
            "href": "https://drafts.csswg.org/css-otherstuff-2/#tchou-tchou",
        }]}),
    ]
    assert run(results)["properties"] == [
        {**conv(PROPERTY1), "syntax": "none | auto | train",
         "extended": ["https://drafts.csswg.org/css-otherstuff-2/#tchou-tchou"]}
    ]


def test_discards_duplicated_property_extensions():
    ext = {
        **PROPERTY1, "value": None, "newValues": "train",
    }
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"properties": [PROPERTY1]}),
        spec("css-otherstuff-1", "css-otherstuff", "1", {"properties": [{
            **ext,
            "href": "https://drafts.csswg.org/css-otherstuff-1/#tchou-tchou",
        }]}),
        spec("css-otherstuff-2", "css-otherstuff", "2", {"properties": [{
            **ext,
            "href": "https://drafts.csswg.org/css-otherstuff-2/#tchou-tchou",
        }]}),
    ]
    assert run(results)["properties"] == [
        {**conv(PROPERTY1), "syntax": "none | auto | train",
         "extended": ["https://drafts.csswg.org/css-otherstuff-2/#tchou-tchou"]}
    ]


def test_merges_atrule_descriptors():
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"atrules": [
            {**ATRULE2, "value": "@media foo", "descriptors": [DESCRIPTOR1]}
        ]}),
        spec("css-otherstuff-1", "css-otherstuff", "1", {"atrules": [
            {**ATRULE2, "descriptors": [DESCRIPTOR2]}
        ]}),
    ]
    assert run(results)["atrules"] == [
        conv({**ATRULE2, "syntax": "@media foo",
              "descriptors": [DESCRIPTOR1, DESCRIPTOR2]})
    ]


def test_merges_extended_atrule_descriptors():
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"atrules": [
            {**ATRULE2, "value": "@media foo", "descriptors": [DESCRIPTOR_BASE]}
        ]}),
        spec("css-stuff-2", "css-stuff", "2", {"atrules": [
            {**ATRULE2, "descriptors": [DESCRIPTOR_EXTENSION]}
        ]}),
    ]
    assert run(results)["atrules"] == [
        conv({**ATRULE2, "syntax": "@media foo",
              "descriptors": [DESCRIPTOR_EXTENSION]})
    ]


def test_discards_duplicated_descriptor_definitions():
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"atrules": [
            {**ATRULE2, "value": "@media foo", "descriptors": [DESCRIPTOR1]}
        ]}),
        spec("css-otherstuff-1", "css-otherstuff", "1", {"atrules": [
            {**ATRULE2, "descriptors": [DESCRIPTOR2]}
        ]}),
        spec("css-otherstuff-2", "css-otherstuff", "2", {"atrules": [
            {**ATRULE2, "descriptors": [DESCRIPTOR2]}
        ]}),
    ]
    assert run(results)["atrules"] == [
        conv({**ATRULE2, "syntax": "@media foo",
              "descriptors": [DESCRIPTOR1, DESCRIPTOR2]})
    ]


def test_discards_scoped_matching_unscoped():
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"values": [
            {**TYPE1, "values": [FUNCTION_ENV]},
            FUNCTION_ENV,
        ]}),
    ]
    assert run(results) == conv({
        **EMPTY_MERGED, "functions": [FUNCTION_ENV], "types": [TYPE1],
    })


def test_sets_syntax_of_legacy_aliases():
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"properties": [PROPERTY_LEGACY]}),
        spec("css-otherstuff-1", "css-otherstuff", "1",
             {"properties": [PROPERTY1]}),
    ]
    assert run(results)["properties"] == [
        {**conv(PROPERTY_LEGACY), "syntax": PROPERTY1["value"]},
        conv(PROPERTY1),
    ]


def test_merges_scopes_when_possible():
    scoped = {**FUNCTION_ENV,
              "href": "https://drafts.csswg.org/css-first-1/#funcdef-env",
              "value": "env(first)"}
    other_scoped = {**FUNCTION_ENV,
                    "href": "https://drafts.csswg.org/css-second-1/#funcdef-env",
                    "value": "env(second)"}
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"values": [
            FUNCTION_ENV,
            {"name": "<track-repeat>",
             "href": "https://drafts.csswg.org/css-grid-2/#typedef-track-repeat",
             "type": "type", "values": [scoped]},
            {"name": "<repeat-ad-libitum>",
             "href": "https://drafts.csswg.org/css-grid-2/#typedef-repeat-ad-libitum",
             "type": "type", "values": [scoped]},
            {"name": "<another-repeat>",
             "href": "https://drafts.csswg.org/css-grid-2/#typedef-another-repeat",
             "type": "type", "values": [other_scoped]},
        ]}),
    ]
    assert run(results) == conv({
        **EMPTY_MERGED,
        "functions": [
            FUNCTION_ENV,
            {**other_scoped, "for": ["<another-repeat>"]},
            {**scoped, "for": ["<repeat-ad-libitum>", "<track-repeat>"]},
        ],
        "types": [
            {"name": "another-repeat",
             "href": "https://drafts.csswg.org/css-grid-2/#typedef-another-repeat",
             "type": "type"},
            {"name": "repeat-ad-libitum",
             "href": "https://drafts.csswg.org/css-grid-2/#typedef-repeat-ad-libitum",
             "type": "type"},
            {"name": "track-repeat",
             "href": "https://drafts.csswg.org/css-grid-2/#typedef-track-repeat",
             "type": "type"},
        ],
    })


def test_merges_extended_types():
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"values": [dict(TYPE1)]},
             crawled="https://drafts.csswg.org/css-stuff-1/"),
        spec("css-otherstuff-1", "css-otherstuff", "1",
             {"values": [dict(TYPE1_EXTENSION)]},
             crawled="https://drafts.csswg.org/css-otherstuff-1/"),
    ]
    assert run(results) == conv({
        **EMPTY_MERGED,
        "types": [
            {**conv(TYPE1), "syntax": TYPE1_EXTENSION["value"],
             "extended": ["https://drafts.csswg.org/css-otherstuff-1/"]},
        ],
    })


def test_discards_type_extensions_without_base():
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"values": [dict(TYPE1_EXTENSION)]}),
    ]
    assert run(results) == conv(EMPTY_MERGED)


def test_flattens_nested_atrules():
    nested = {"name": "@nested", "for": ATRULE2["name"], "type": "at-rule",
              "href": "https://example.org/nestedatrule"}
    results = [
        spec("css-stuff-1", "css-stuff", "1", {"atrules": [
            {**ATRULE2, "descriptors": [DESCRIPTOR1, nested]}
        ]}),
    ]
    assert run(results) == conv({
        **EMPTY_MERGED,
        "atrules": [
            {**ATRULE2, "descriptors": [DESCRIPTOR1]},
            {"name": nested["name"], "for": [ATRULE2["name"]],
             "href": nested["href"], "descriptors": []},
        ],
    })
