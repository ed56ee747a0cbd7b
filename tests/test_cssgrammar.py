"""CSS value grammar parser golden tests.

Runs the reference's own golden corpus
(/root/reference/test/css-grammar-parser/{in,out.json}) through our
parser and requires exact AST equality — the same check as the
reference's test/css-grammar-parser/test.js. The corpus is read from
the reference location (skipped if unavailable) rather than copied.
"""

import json
import os

import pytest

from reffy_ray.functions.cssgrammar import parse_propdef_value

REF_DIR = "/root/reference/test/css-grammar-parser"


def _load_corpus():
    if not os.path.isdir(REF_DIR):
        return []
    with open(os.path.join(REF_DIR, "in")) as f:
        inputs = [line.rstrip("\n") for line in f if line.strip()]
    with open(os.path.join(REF_DIR, "out.json")) as f:
        expected = json.load(f)
    return list(zip(inputs, expected))


CORPUS = _load_corpus()


@pytest.mark.skipif(not CORPUS, reason="reference golden corpus unavailable")
@pytest.mark.parametrize(
    "value,expected", CORPUS, ids=[c[0][:40] for c in CORPUS]
)
def test_golden_case(value, expected):
    assert parse_propdef_value(value) == expected


# a few standalone cases so the suite still exercises the parser if the
# reference corpus is absent
def test_simple_keywords():
    assert parse_propdef_value("left | right") == {
        "oneOf": [
            {"type": "keyword", "name": "left"},
            {"type": "keyword", "name": "right"},
        ]
    }


def test_primitive_with_range():
    assert parse_propdef_value("<integer [0,10]>") == {
        "type": "primitive", "name": "integer", "range": ["0", "10"]
    }


def test_hash_multiplier():
    assert parse_propdef_value("<single-animation>#") == {
        "type": "array",
        "items": {"type": "valuespace", "name": "single-animation"},
        "separator": ",",
    }
