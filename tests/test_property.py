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


# --- jaccard_pairs: group merge count == scalar set arithmetic -------------

_WORDS = st.lists(
    st.sampled_from("alpha beta gamma delta eps zeta eta theta".split()),
    min_size=0, max_size=30,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_WORDS, min_size=2, max_size=6))
def test_jaccard_pairs_matches_scalar_set_math(docs):
    import numpy as np
    import pandas as pd

    from reffy_ray.ops.dedup import jaccard_pairs

    texts = [" ".join(ws) for ws in docs]

    # expected via plain set arithmetic on word 3-grams
    def grams(t):
        ws = t.split()
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    expect = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            gi, gj = grams(texts[i]), grams(texts[j])
            inter = len(gi & gj)
            union = len(gi | gj)
            if inter > 0:  # threshold 1/10**9 ≈ any overlap
                expect[(i, j)] = (inter, union)

    import ray.data as rd
    out = (
        jaccard_pairs(
            rd.from_items(
                [{"doc_id": i, "text": t, "source": "s"} for i, t in enumerate(texts)]
            ),
            threshold_num=1, threshold_den=10**9,
        )
        .to_pandas()
    )
    if out.empty:  # all-empty groups can collapse to a schemaless frame
        assert expect == {}
        return
    got = {
        (a, b): (i, u)
        for a, b, i, u in zip(out.doc_a, out.doc_b, out.inter, out.union_size)
    }
    assert got == expect


# --- sample_frames invariants ----------------------------------------------


@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(min_value=-5, max_value=10_000), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=1000),
    st.integers(min_value=1, max_value=10),
)
def test_sample_frames_counts_and_stride(durations, step_ms, max_frames):
    import pyarrow as pa
    import ray.data as rd

    from reffy_ray.ops.multimodal import sample_frames

    ds = rd.from_arrow(
        pa.table(
            {
                "media_id": [f"v{i}" for i in range(len(durations))],
                "duration_ms": durations,
            }
        )
    )
    out = sample_frames(ds, step_ms=step_ms, max_frames=max_frames).to_pandas()
    sizes = {} if out.empty else out.groupby("media_id").size().to_dict()
    for i, d in enumerate(durations):
        expect = min(max_frames, 1 + d // step_ms) if d > 0 else 0
        assert sizes.get(f"v{i}", 0) == expect
    if len(out):
        assert (out.ts_ms == out.frame_idx * step_ms).all()
        assert out.frame_idx.min() == 0


# ---------------------------------------------------------------------------
# distributed-op equivalence vs brute-force references (small Ray runs)
# ---------------------------------------------------------------------------

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),      # event_id (uniquified)
        st.integers(min_value=1, max_value=4),       # user_id
        st.integers(min_value=0, max_value=10_000),  # ts (us)
    ),
    min_size=1,
    max_size=40,
)


def _uniq_events(rows):
    seen, out = set(), []
    for i, u, t in rows:
        if i not in seen:
            seen.add(i)
            out.append((i, u, t))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_EVENTS)
def test_late_events_matches_bruteforce(ray_session, rows):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.window import late_events

    rows = _uniq_events(rows)
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    out = (
        late_events(rd.from_pandas(df).repartition(3),
                    shards=2, lateness_us=500)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # brute force: replay each user's (id % 2, id) arrival order
    expect = {}
    for u in sorted({r[1] for r in rows}):
        stream = sorted(
            (r for r in rows if r[1] == u), key=lambda r: (r[0] % 2, r[0])
        )
        mx = None
        for seq, (i, _, t) in enumerate(stream):
            late = mx is not None and t < mx - 500
            expect[i] = (u, seq, int(late), (mx - 500 - t) if late else 0)
            mx = t if mx is None else max(mx, t)
    assert len(out) == len(expect)
    for i, (u, seq, is_late, late_us) in expect.items():
        assert out.loc[i].tolist() == [u, seq, is_late, late_us], i


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_EVENTS, st.data())
def test_event_pattern_matches_bruteforce(ray_session, rows, data):
    import pandas as pd
    import ray.data as rd

    from reffy_ray.ops.patterns import event_pattern

    rows = _uniq_events(rows)
    types = ["view", "click", "purchase"]
    typed = [
        (i, u, t, data.draw(st.sampled_from(types), label=f"ty{i}"))
        for i, u, t in rows
    ]
    df = pd.DataFrame(typed, columns=["event_id", "user_id", "ts_us",
                                      "event_type"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    out = event_pattern(
        rd.from_pandas(df[["event_id", "user_id", "ts", "event_type"]])
        .repartition(3)
    ).to_pandas()
    if out.empty:
        # Ray drops the schema when every group emits zero rows
        out = pd.DataFrame(
            columns=["user_id", "match_idx", "a_id", "b_id", "c_id",
                     "span_us"]
        )
    out = out.sort_values(["user_id", "match_idx"]).reset_index(drop=True)
    # brute force greedy skip-till-next-match in id order
    expect = []
    for u in sorted({r[1] for r in typed}):
        stream = sorted((r for r in typed if r[1] == u), key=lambda r: r[0])
        ts_of = {i: t for i, _, t, _ in stream}
        pos, idx = -1, 0
        while True:
            a = next((i for i, _, _, ty in stream
                      if ty == "view" and i > pos), None)
            if a is None:
                break
            b = next((i for i, _, _, ty in stream
                      if ty == "click" and i > a), None)
            if b is None:
                break
            c = next((i for i, _, _, ty in stream
                      if ty == "purchase" and i > b), None)
            if c is None:
                break
            expect.append([u, idx, a, b, c, ts_of[c] - ts_of[a]])
            pos, idx = c, idx + 1
    assert out.values.tolist() == expect
