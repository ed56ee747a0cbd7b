"""Property-based robustness tests (hypothesis).

The verify-skill probes that found bugs before (deep/malformed HTML
through SpanParser) become standing properties here, plus brute-force
equivalence for the substring window kernel.
"""

import re

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from reffy_ray.ops.substr import ngram_doc_table
from reffy_ray.ops.text import doc_token_partials
from reffy_ray.stages.parse import SpanParser

_PARSER = SpanParser()


def _parse_one(html: str) -> pa.Table:
    batch = pa.Table.from_pylist(
        [
            {
                "doc_id": "p", "url": "https://example.org/p/", "html": html,
                "seed_rank": 0, "depth": 0, "status": 200,
            }
        ]
    )
    return _PARSER(batch)


# fragments that stress the tag soup: unclosed tags, stray closers,
# nesting, entities, attributes with odd quoting
_HTML_BITS = st.sampled_from(
    [
        "<div>", "</div>", "<p>", "<table><tr><th>x<td>", "</b>",
        "<dfn id=a data-dfn-type='dfn'>", "text & more", "&amp;", "&#x41;",
        "<a href='#f'>", "<h2 id=h>", "<!-- c -->", "<![CDATA[x]]>",
        "<pre><code>", "<input>", "<br>", '<span class="x y">', "»±—",
        "<script>var a = '<div>';</script>", "<style>p{}</style>", "\x00",
    ]
)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_HTML_BITS, max_size=40))
def test_spanparser_never_crashes_on_tag_soup(bits):
    out = _parse_one("".join(bits))
    assert out.num_rows == 1  # one row per document, error column at worst


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=100, max_value=400))
def test_spanparser_survives_pathological_depth(n):
    out = _parse_one("<div>" * n + "deep" + "</div>" * n)
    assert out.num_rows == 1
    out2 = _parse_one("<table><tr><th>Name:<td>" * n)
    assert out2.num_rows == 1


_TEXTS = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=80,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=60, deadline=None)
@given(_TEXTS, st.integers(min_value=1, max_value=12))
def test_ngram_doc_table_equals_bruteforce(texts, n):
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = ngram_doc_table(tbl, n).to_pandas()
    for i, t in enumerate(texts):
        grams = [t[j : j + n] for j in range(len(t) - n + 1)]
        mine = out[out["doc_id"] == i]
        expect: dict = {}
        for g in grams:
            expect[g] = expect.get(g, 0) + 1
        assert dict(zip(mine["gram"], mine["occ"])) == expect


@settings(max_examples=40, deadline=None)
@given(_TEXTS)
def test_doc_token_partials_equals_bruteforce(texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = doc_token_partials(tbl).to_pandas()
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"\W+", t.lower()) if w]
        mine = out[out["doc_id"] == i]
        expect: dict = {}
        for w in toks:
            expect[w] = expect.get(w, 0) + 1
        assert dict(zip(mine["word"], mine["tf"])) == expect
        if toks:
            assert set(mine["n_tok"]) == {len(toks)}
