"""Regression tests for defects found in the round-1 code review."""

import json

import pandas as pd
import pyarrow as pa
import ray.data as rd

from reffy_ray.schemas import SPAN_STRUCT
from reffy_ray.stages import extract as ex
from reffy_ray.stages.parse import spans_from_html
from reffy_ray.state.cuckoo import CuckooFilter

URL = "https://x.example/"


def batch_of(html: str, doc_id: str = "d") -> pa.Table:
    spans = spans_from_html(html, URL)
    return pa.table(
        {
            "doc_id": pa.array([doc_id]),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
            "url": pa.array([URL]),
        }
    )


# 1. ids inside <p> must reach the ids extract --------------------------------


def test_ids_inside_paragraphs():
    html = (
        "<p>The term <dfn id='foo-term'>foo</dfn> and "
        "<span id='note1'>x</span> and <a name='oldanchor'>y</a>.</p>"
    )
    hrefs = {r["href"] for r in ex.extract_ids(batch_of(html)).to_pylist()}
    assert f"{URL}#foo-term" in hrefs
    assert f"{URL}#note1" in hrefs
    assert f"{URL}#oldanchor" in hrefs


# 2. politeness-deferred shallow rows still expand in late rounds -------------


def test_deferred_rows_expand_after_round_boundary(ray_session, tmp_path):
    from reffy_ray.pipelines.crawl import CrawlConfig, crawl

    # two csswg seeds, 1 admission per round → the second seed is
    # fetched in round 1; its links must STILL expand (depth 0 < max 1)
    seeds = pa.Table.from_pylist([
        {
            "url": f"https://drafts.csswg.org/deferred-{i}/",
            "shortname": f"deferred-{i}", "series_shortname": f"deferred-{i}",
            "series_composition": "full", "series_version": "1.0",
            "nightly_url": f"https://drafts.csswg.org/deferred-{i}/",
            "release_url": None, "pages": [], "standing": "good", "seed_rank": i,
        }
        for i in range(2)
    ])
    cfg = CrawlConfig(
        mode="synth", checkpoint_dir=str(tmp_path / "ck"),
        max_depth=1, expand_links=True, round_ms=2000.0, max_rounds=8,
        synth_links=2, num_seen_shards=4,
    )
    res = crawl(seeds, cfg)
    docs = res.documents().take_all()
    by_depth = {}
    for d in docs:
        by_depth.setdefault(d["depth"], []).append(d["url"])
    assert len(by_depth[0]) == 2
    # links of BOTH depth-0 docs were expanded (4 distinct targets modulo
    # hash collisions; at least more than one doc's worth)
    assert len(by_depth.get(1, [])) >= 3


# 3. fresh crawl over stale checkpoint must not duplicate documents -----------


def test_fresh_crawl_wipes_stale_checkpoint(ray_session, tmp_path):
    from reffy_ray.pipelines.crawl import CrawlConfig, crawl
    from reffy_ray.sources.corpus import fixture_seeds

    ckpt = str(tmp_path / "ck")
    cfg = CrawlConfig(mode="fixture", checkpoint_dir=ckpt, num_seen_shards=4)
    crawl(fixture_seeds(), cfg)
    res2 = crawl(fixture_seeds(), CrawlConfig(
        mode="fixture", checkpoint_dir=ckpt, num_seen_shards=4, resume=False
    ))
    assert rd.read_parquet(res2.documents_path).count() == 5  # not 10


# 4. on<event> handlers attach to the declaring interface only ----------------


def test_onhandlers_per_interface():
    html = """<pre class=idl>interface A {
  attribute EventHandler onfoo;
};
interface B {
  attribute EventHandler onbar;
};</pre>"""
    rows = ex.extract_events(batch_of(html)).to_pylist()
    by_type = {r["type"]: r for r in rows}
    assert by_type["foo"]["targets"] == ["A"]
    assert by_type["bar"]["targets"] == ["B"]


# 5. extension events fold into originals from OTHER specs --------------------


def test_extension_folds_across_specs(ray_session):
    from reffy_ray.post.events import consolidate_events

    events = rd.from_arrow(pa.table({
        "doc_id": ["defining-spec", "extending-spec"],
        "type": ["go", "go"],
        "interface": ["Event", None],
        "bubbles": [None, True],
        "cancelable": [None, None],
        "targets": [["A"], ["B"]],
        "href": ["https://def.spec/#go", "https://def.spec/#go"],
        "src_format": ["summary table", "summary table"],
        "is_extension": [False, True],
    }))
    out = consolidate_events(events).to_pylist()
    assert len(out) == 1
    assert out[0]["doc_id"] == "defining-spec"
    assert out[0]["bubbles"] is True
    assert sorted(out[0]["targets"]) == ["A", "B"]


def test_unmatched_extension_kept(ray_session):
    from reffy_ray.post.events import consolidate_events

    events = rd.from_arrow(pa.table({
        "doc_id": ["orig", "ext"],
        "type": ["go", "go"],
        "interface": ["Event", None],
        "bubbles": [None, None],
        "cancelable": [None, None],
        "targets": [["A"], ["B"]],
        "href": ["https://a/#go", "https://b/#go"],  # different originals
        "src_format": ["summary table", "summary table"],
        "is_extension": [False, True],
    }))
    out = consolidate_events(events).to_pylist()
    assert len(out) == 2  # could not extend → extension kept (events.js:56-60)


# 6. CLI --fallback is actually used ------------------------------------------


def test_full_crawl_forwards_fallback(ray_session, tmp_path):
    from reffy_ray.pipelines.crawl import CrawlConfig
    from reffy_ray.pipelines.full_crawl import full_crawl

    seeds = pa.Table.from_pylist([
        {
            "url": "https://www.w3.org/TR/idontexist/",
            "shortname": "idontexist", "series_shortname": "idontexist",
            "series_composition": "full", "series_version": "1.0",
            "nightly_url": "https://www.w3.org/TR/idontexist/",
            "release_url": None, "pages": [], "standing": "good", "seed_rank": 0,
        }
    ])
    fallback = {
        "https://www.w3.org/TR/idontexist/": [
            {"kind": "title", "text": "From Fallback", "media_ref": "", "offset": 0}
        ]
    }
    res = full_crawl(
        seeds, str(tmp_path / "out"),
        CrawlConfig(mode="fixture", num_seen_shards=4),
        run_post=False, fallback_spans=fallback,
    )
    titles = rd.read_parquet(
        str(tmp_path / "out" / "extracts" / "title")
    ).take_all()
    assert titles[0]["title"] == "From Fallback"


# 7. multi-level series actually reduces --------------------------------------


def test_series_reduction_multi_level_derived_chain(ray_session):
    from reffy_ray.post.series import reduce_extracts_per_series

    seeds = pa.Table.from_pylist([
        {"shortname": "css-x-1", "series_shortname": "css-x",
         "series_composition": "full", "series_version": "1"},
        {"shortname": "css-x-2", "series_shortname": "css-x",
         "series_composition": "full", "series_version": "2"},
        {"shortname": "other", "series_shortname": "other",
         "series_composition": "full", "series_version": "1"},
    ])
    extract = rd.from_arrow(pa.table({
        "doc_id": ["css-x-1", "css-x-2", "other"], "idl": ["a", "b", "c"],
    }))
    out = reduce_extracts_per_series(
        extract, seeds, {"css-x-1", "css-x-2", "other"}
    ).to_pandas()
    assert sorted(out["doc_id"]) == ["css-x-2", "other"]  # css-x-1 dropped


# 8. empty exact-backup set survives serialization ----------------------------


def test_cuckoo_empty_exact_roundtrip():
    f = CuckooFilter(capacity=256, exact_backup=True)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.exact is not None and len(g.exact) == 0
    # still exact after restore: no false positives possible
    assert not g.contains("never-added")
    f2 = CuckooFilter(capacity=256, exact_backup=False)
    g2 = CuckooFilter.from_bytes(f2.to_bytes())
    assert g2.exact is None


# 4. resume after a mid-round crash must not duplicate round output ----------


def test_resume_midround_crash_no_duplicates(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from reffy_ray.pipelines.crawl import CrawlConfig, crawl
    from reffy_ray.sources.corpus import fixture_seeds

    ckpt = str(tmp_path / "ck")
    cfg = CrawlConfig(mode="fixture", checkpoint_dir=ckpt, num_seen_shards=4)
    res = crawl(fixture_seeds(), cfg)
    n = res.documents().count()

    # simulate a crash after round 0's write_parquet but before the
    # manifest bump: roll the manifest back so round 0 re-executes
    import json as _json

    mpath = os.path.join(ckpt, "manifest.json")
    with open(mpath) as f:
        manifest = _json.load(f)
    manifest["rounds_done"] = 0
    with open(mpath, "w") as f:
        _json.dump(manifest, f)
    # the stale round-0 parquet is still on disk; a resume must wipe it
    # before re-executing, not append duplicate part files
    cfg2 = CrawlConfig(mode="fixture", checkpoint_dir=ckpt, num_seen_shards=4,
                       resume=True)
    res2 = crawl(fixture_seeds(), cfg2)
    docs = res2.documents().take_all()
    assert len(docs) == n
    assert len({d["doc_id"] for d in docs}) == n


# 5. resume with a different seen-shard count must restart cleanly -----------


def test_resume_shard_mismatch_restarts(ray_session, tmp_path):
    from reffy_ray.pipelines.crawl import CrawlConfig, crawl
    from reffy_ray.sources.corpus import fixture_seeds

    ckpt = str(tmp_path / "ck")
    res = crawl(fixture_seeds(),
                CrawlConfig(mode="fixture", checkpoint_dir=ckpt,
                            num_seen_shards=4))
    n = res.documents().count()
    # resume with fewer shards: snapshot partitioning no longer matches —
    # must be treated like a version mismatch (full restart, no dupes,
    # no missing docs)
    res2 = crawl(fixture_seeds(),
                 CrawlConfig(mode="fixture", checkpoint_dir=ckpt,
                             num_seen_shards=2, resume=True))
    docs = res2.documents().take_all()
    assert len(docs) == n
    assert len({d["doc_id"] for d in docs}) == n


def test_quantize_oracle_zero_and_empty_vector_parity(ray_session, tmp_path):
    """Review fix: DuckDB x/0.0 yields NULL qvec elements and
    array_to_string([]) yields NULL — the oracle must pin both to the
    op's all-zero / empty-string emission."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as m

    pq.write_table(
        pa.table({"vec_id": [0, 1, 2],
                  "embedding": [[0.5, -1.0], [0.0, 0.0], []]}),
        str(tmp_path / "embeddings.parquet"),
    )
    ours = m.queries()["quantize_embeddings"](str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    orc = con.execute(m.oracle_sql()["quantize_embeddings"]).fetchdf()

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(ours), norm(orc), check_dtype=True)
