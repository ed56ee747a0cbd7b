"""Regression tests for the round-4 ADVICE findings (fixed round 5).

1. cache_info must skip rows with a non-null error column (the
   reference refuses crawl-cache reuse for errored entries,
   specs-crawler.js:89-98) — both the CrawlResult.cache_info fold and
   the --fallback loader in cli.py.
2. The 'Index of' directory-listing guard must check the FIRST
   level-1 heading (util.js:600-604), not whatever title/heading span
   happens to come first.
3. random_walks must drop edges with out-of-range endpoints up front
   so the broadcast and join tiers walk the same graph.
"""

import json

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


# 1. errored rows are excluded from conditional-GET validator harvest -------


def _docs_table():
    return pa.Table.from_pylist([
        {"url": "https://x.example/ok", "spans": [],
         "last_modified": "Mon, 01 Jan 2024 00:00:00 GMT", "error": None},
        {"url": "https://x.example/bad", "spans": [],
         "last_modified": "Mon, 01 Jan 2024 00:00:00 GMT",
         "error": "CSS server issue detected"},
        {"url": "https://x.example/nolm", "spans": [],
         "last_modified": None, "error": None},
    ])


def test_crawlresult_cache_info_skips_errored_rows(ray_session, tmp_path):
    from reffy_ray.pipelines.crawl import CrawlResult

    path = str(tmp_path / "documents")
    rd.from_arrow(_docs_table()).write_parquet(path)
    res = CrawlResult(documents_path=path, counters=pa.table({}))
    info = res.cache_info()
    assert "https://x.example/ok" in info
    assert "https://x.example/bad" not in info  # errored → refetch
    assert "https://x.example/nolm" not in info


def test_load_fallback_spans_skips_errored_validators(tmp_path):
    from reffy_ray.cli import _load_fallback_spans

    pq.write_table(_docs_table(), str(tmp_path / "docs.parquet"))
    spans, cache = _load_fallback_spans(str(tmp_path))
    # spans stay available for content substitution for ALL rows...
    assert set(spans) == {
        "https://x.example/ok", "https://x.example/bad",
        "https://x.example/nolm",
    }
    # ...but only non-errored rows arm If-Modified-Since
    assert set(cache) == {"https://x.example/ok"}


# 2. 'Index of' guard reads the first h1, not the first span ---------------


def _h(level, title):
    return {"kind": "heading", "media_ref": "",
            "text": json.dumps({"level": level, "title": title})}


def _t(title):
    return {"kind": "title", "media_ref": "", "text": title}


def test_index_of_detected_when_title_differs_from_h1():
    from reffy_ray.stages.parse import respec_source_error

    # listing whose <title> is NOT the listing string but whose h1 is
    spans = [_t("css-foo draft"), _h(1, "Index of /css-foo/")]
    assert respec_source_error(spans) == "CSS server issue detected"


def test_index_of_detected_past_leading_h2():
    from reffy_ray.stages.parse import respec_source_error

    # an h2 precedes the h1 — the guard must scan on to the h1
    spans = [_h(2, "Navigation"), _h(1, "Index of /css-bar/")]
    assert respec_source_error(spans) == "CSS server issue detected"


def test_index_of_title_fallback_only_without_h1():
    from reffy_ray.stages.parse import respec_source_error

    # no h1 at all → fall back to the title span
    assert (respec_source_error([_t("Index of /css-baz/")])
            == "CSS server issue detected")
    # a real h1 wins over a listing-looking title (reference checks
    # the h1 textContent, not <title>)
    spans = [_t("Index of things (an essay)"), _h(1, "Indexes in CSS")]
    assert respec_source_error(spans) is None


# 3. out-of-range edges dropped identically in both walk tiers -------------


def test_random_walks_tiers_agree_on_out_of_range_edges(ray_session):
    from reffy_ray.ops.graph import random_walks

    # node 1 has one in-range neighbor (0) and one out-of-range (7);
    # node 2's only edge leaves the graph → dead end in BOTH tiers
    el = [(0, 1), (1, 0), (1, 7), (2, 9)]
    outs = {}
    for mode in ("broadcast", "join"):
        edges = rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
        outs[mode] = (
            random_walks(edges, n_nodes=3, walk_len=3, mode=mode)
            .to_pandas().sort_values(["walk_id", "step"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["broadcast"], outs["join"])
    nodes = set(outs["broadcast"]["node"])
    assert nodes <= {0, 1, 2}  # never follows 7 or 9
    w2 = outs["broadcast"]
    assert w2[w2.walk_id == 2]["node"].tolist() == [2, 2, 2, 2]
