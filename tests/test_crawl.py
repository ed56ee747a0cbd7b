"""End-to-end crawl pipeline tests over the fixture corpus
(mirrors test/crawl.js:51-208: golden crawl, 404 error capture,
fallback substitution, 304 reuse, ordering contract, resume)."""

import json

import pyarrow as pa
import pytest

from reffy_ray.pipelines.crawl import CrawlConfig, crawl
from reffy_ray.sources.corpus import fixture_seeds
from reffy_ray.stages import extract as ex


@pytest.fixture(scope="module")
def fixture_crawl(ray_session, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt"))
    cfg = CrawlConfig(mode="fixture", checkpoint_dir=ckpt, num_seen_shards=4, num_gates=2)
    return crawl(fixture_seeds(), cfg), ckpt


def test_all_seeds_crawled(fixture_crawl):
    res, _ = fixture_crawl
    docs = res.ordered_documents().take_all()
    assert [d["doc_id"] for d in docs] == [
        "WOFF2", "audio-output", "accelerometer", "css-backgrounds-3", "example-events",
    ]
    assert all(d["error"] is None for d in docs)


def test_order_contract_is_seed_order(fixture_crawl):
    # reffy.js:164-167: output order == input order
    res, _ = fixture_crawl
    ranks = [d["seed_rank"] for d in res.ordered_documents().take_all()]
    assert ranks == sorted(ranks) == [0, 1, 2, 3, 4]


def test_multipage_merged_into_one_doc(fixture_crawl):
    res, _ = fixture_crawl
    woff2 = [d for d in res.documents().take_all() if d["doc_id"] == "WOFF2"]
    assert len(woff2) == 1
    kinds = [s["kind"] for s in woff2[0]["spans"]]
    assert "heading" in kinds  # subpage heading merged in
    page_metas = [s for s in woff2[0]["spans"] if s["kind"] == "meta" and s["text"].startswith("page=")]
    assert page_metas and page_metas[0]["text"].endswith("page.html")


def test_extracts_match_golden_through_crawl(fixture_crawl):
    res, _ = fixture_crawl
    docs_ds = res.documents()
    idl = docs_ds.map_batches(ex.extract_idl, batch_format="pyarrow").take_all()
    by_doc = {r["doc_id"]: r["idl"] for r in idl}
    assert by_doc["audio-output"] == "[Exposed=Window] interface Foo { attribute DOMString bar; };"


def test_counters_emitted(fixture_crawl):
    res, _ = fixture_crawl
    counters = res.counters.to_pylist()
    assert counters[0]["fetched"] == 5
    assert counters[0]["errors"] == 0
    assert counters[0]["deferred_politeness"] == 0  # budget covers the corpus


def test_seen_set_dedups_repeat_candidates(ray_session, tmp_path):
    seeds = fixture_seeds()
    dup = pa.concat_tables([seeds, seeds.set_column(
        seeds.schema.get_field_index("shortname"),
        "shortname",
        pa.array([s + "-dup" for s in seeds.column("shortname").to_pylist()]),
    )])
    cfg = CrawlConfig(mode="fixture", checkpoint_dir=str(tmp_path / "ck"), num_seen_shards=4)
    res = crawl(dup, cfg)
    # second copy of every URL rejected by the seen set
    assert res.documents().count() == 5
    assert sum(s["rejected"] for s in res.stats["seen"]) == 5


def test_error_url_captured_with_fallback(ray_session, tmp_path):
    # test/crawl.js:137-158 analog: 404 seed with fallback content
    seeds = pa.Table.from_pylist([
        {
            "url": "https://www.w3.org/TR/idontexist/",
            "shortname": "idontexist",
            "series_shortname": "idontexist",
            "series_composition": "full",
            "series_version": "1.0",
            "nightly_url": "https://www.w3.org/TR/idontexist/",
            "release_url": None,
            "pages": [],
            "standing": "good",
            "seed_rank": 0,
        }
    ])
    fallback = {
        "https://www.w3.org/TR/idontexist/": [
            {"kind": "title", "text": "Fallback Title", "media_ref": "", "offset": 0}
        ]
    }
    cfg = CrawlConfig(mode="fixture", checkpoint_dir=str(tmp_path / "ck"))
    res = crawl(seeds, cfg, fallback_spans=fallback)
    docs = res.documents().take_all()
    assert len(docs) == 1
    # error recorded AND fallback content present (specs-crawler.js:54-65)
    assert "404" in docs[0]["error"]
    assert docs[0]["spans"][0]["text"] == "Fallback Title"
    assert res.counters.to_pylist()[0]["errors"] == 1


def test_not_modified_reuses_checkpoint(ray_session, tmp_path):
    # test/crawl.js:114-126 analog: conditional GET → 304 → reuse
    url = "https://www.w3.org/TR/ididnotchange/"
    seeds = pa.Table.from_pylist([
        {
            "url": url, "shortname": "ididnotchange",
            "series_shortname": "ididnotchange", "series_composition": "full",
            "series_version": "1.0", "nightly_url": url, "release_url": None,
            "pages": [], "standing": "good", "seed_rank": 0,
        }
    ])
    fallback = {url: [{"kind": "title", "text": "Cached Title", "media_ref": "", "offset": 0}]}
    cache_info = {url: "Fri, 11 Feb 2022 00:00:42 GMT"}
    cfg = CrawlConfig(mode="fixture", checkpoint_dir=str(tmp_path / "ck"))
    res = crawl(seeds, cfg, fallback_spans=fallback, cache_info=cache_info)
    docs = res.documents().take_all()
    assert docs[0]["status"] == 304
    assert docs[0]["crawl_cache"] == "not modified"
    assert docs[0]["spans"][0]["text"] == "Cached Title"
    assert docs[0]["error"] is None


def test_politeness_defers_beyond_budget(ray_session, tmp_path):
    # Tight budget: csswg origin interval 2000ms, round 2000ms → 1 URL/round
    seeds = pa.Table.from_pylist([
        {
            "url": f"https://drafts.csswg.org/css-mod-{i}/",
            "shortname": f"css-mod-{i}",
            "series_shortname": f"css-mod-{i}", "series_composition": "full",
            "series_version": "1.0",
            "nightly_url": f"https://drafts.csswg.org/css-mod-{i}/",
            "release_url": None, "pages": [], "standing": "good", "seed_rank": i,
        }
        for i in range(3)
    ])
    cfg = CrawlConfig(
        mode="synth", checkpoint_dir=str(tmp_path / "ck"),
        round_ms=2000.0, max_rounds=10, num_gates=2,
    )
    res = crawl(seeds, cfg)
    assert res.documents().count() == 3
    assert res.stats["rounds"] == 3  # one admission per round
    # priority order respected: round r fetched seed_rank r
    per_round = {c["partition"]: c["fetched"] for c in res.counters.to_pylist()}
    assert per_round == {0: 1, 1: 1, 2: 1}
    assert res.stats["gates"]["deferred"] == 3  # 2 + 1 + 0 deferrals


def test_resume_from_checkpoint(ray_session, tmp_path):
    ckpt = str(tmp_path / "ck")
    seeds = fixture_seeds()
    cfg = CrawlConfig(mode="fixture", checkpoint_dir=ckpt, num_seen_shards=4)
    res1 = crawl(seeds, cfg)
    assert res1.documents().count() == 5
    # resume: nothing left to do, no refetch, documents preserved
    cfg2 = CrawlConfig(mode="fixture", checkpoint_dir=ckpt, num_seen_shards=4, resume=True)
    res2 = crawl(seeds, cfg2)
    assert res2.stats["rounds"] == res1.stats["rounds"]
    assert res2.documents().count() == 5
    with open(f"{ckpt}/manifest.json") as f:
        m = json.load(f)
    assert m["version"].startswith("reffy-ray-")


def test_synth_crawl_with_link_expansion(ray_session, tmp_path):
    from reffy_ray.sources.corpus import scaled_seeds

    cfg = CrawlConfig(
        mode="synth", checkpoint_dir=str(tmp_path / "ck"),
        max_depth=1, expand_links=True, max_rounds=4,
        round_ms=float("inf"), synth_links=4, num_seen_shards=4,
    )
    res = crawl(scaled_seeds(10), cfg)
    docs = res.documents().take_all()
    depths = {d["depth"] for d in docs}
    assert depths == {0, 1}
    assert len(docs) > 10  # discovered URLs crawled
    # every doc parsed to spans
    assert all(len(d["spans"]) > 0 for d in docs if d["error"] is None)


def test_resume_mid_crawl(ray_session, tmp_path):
    """Crash-and-resume lineage: run only round 0 of a depth-1 crawl,
    then resume — round 1 completes from the checkpointed frontier and
    restored seen set, with no round-0 refetch."""
    from reffy_ray.sources.corpus import scaled_seeds

    ckpt = str(tmp_path / "ck")
    base = dict(mode="synth", checkpoint_dir=ckpt, max_depth=1,
                expand_links=True, round_ms=float("inf"), synth_links=3,
                num_seen_shards=4)
    res1 = crawl(scaled_seeds(8), CrawlConfig(**base, max_rounds=1))
    assert res1.stats["rounds"] == 1
    n_round0 = res1.documents().count()
    assert n_round0 == 8

    res2 = crawl(scaled_seeds(8), CrawlConfig(**base, max_rounds=6, resume=True))
    docs = res2.documents().take_all()
    # round-0 docs preserved + round-1 discovered docs crawled
    assert len(docs) > n_round0
    depths = {d["depth"] for d in docs}
    assert depths == {0, 1}
    # counters continue (round 1 appended), no double-fetch of round 0
    rounds = [c["partition"] for c in res2.counters.to_pylist()]
    assert rounds[-1] == 1
    from collections import Counter as _C

    url_counts = _C(d["url"] for d in docs)
    assert all(v == 1 for v in url_counts.values())


def test_robots_excluded_and_tallied(ray_session, tmp_path):
    """robots gate: /private/ paths are never fetched and the exclusion
    is tallied (north_star robots gating + lineage counters)."""
    seeds = pa.Table.from_pylist([
        {
            "url": u, "shortname": f"s{i}", "series_shortname": f"s{i}",
            "series_composition": "full", "series_version": "1.0",
            "nightly_url": u, "release_url": None, "pages": [],
            "standing": "good", "seed_rank": i,
        }
        for i, u in enumerate([
            "https://spec1.example.org/ok-spec/",
            "https://spec1.example.org/private/secret-spec/",
            "https://spec1.example.org/wip/draft-spec/",
        ])
    ])
    cfg = CrawlConfig(mode="synth", checkpoint_dir=str(tmp_path / "ck"),
                      num_seen_shards=4)
    res = crawl(seeds, cfg)
    docs = res.documents().take_all()
    assert [d["url"] for d in docs] == ["https://spec1.example.org/ok-spec/"]
    assert res.stats["tally"].get("robots_excluded") == 2


def test_politeness_real_sleep(ray_session):
    """ST4 real pacing: with real_sleep=True a gate actually sleeps
    interval ms per admitted token (throttled-queue.js:110-128)."""
    import time as _time

    import ray as _ray

    from reffy_ray.crawl.politeness import OriginGate

    gate = OriginGate.remote(real_sleep=True)
    t0 = _time.perf_counter()
    k = _ray.get(gate.admit.remote("https://example.org", 2, 10_000.0))
    dt = _time.perf_counter() - t0
    assert k == 2
    assert dt >= 0.15  # 2 × 100 ms default interval
    _ray.kill(gate)


def test_resume_mid_crawl_fused_extracts(ray_session, tmp_path):
    """Fused-extract resume: extract round dirs >= start_round are wiped
    on resume (a re-executed round may re-batch differently, so stale
    part files would duplicate extract rows), while finished rounds'
    extracts are preserved and the resumed totals equal a from-scratch
    fused crawl's."""
    import glob
    import os

    import pyarrow.parquet as pq

    from reffy_ray.sources.corpus import scaled_seeds
    from reffy_ray.stages.extract import EXTRACTORS

    ckpt = str(tmp_path / "ck")
    base = dict(mode="synth", checkpoint_dir=ckpt, max_depth=1,
                expand_links=True, round_ms=float("inf"), synth_links=3,
                num_seen_shards=4, extract_modules=tuple(EXTRACTORS))

    def counts(c):
        return {
            m: sum(pq.read_metadata(f).num_rows for f in
                   glob.glob(f"{c}/extracts/{m}/round=*/*.parquet"))
            for m in EXTRACTORS
        }

    crawl(scaled_seeds(8), CrawlConfig(**base, max_rounds=1))
    round0 = counts(ckpt)
    assert round0["headings"] > 0
    # plant a stale part as if round 1 had crashed mid-write
    stale_dir = f"{ckpt}/extracts/headings/round=1"
    os.makedirs(stale_dir, exist_ok=True)
    stale = f"{stale_dir}/part-deadbeef.parquet"
    pq.write_table(
        pq.read_table(glob.glob(f"{ckpt}/extracts/headings/round=0/*.parquet")[0]),
        stale,
    )
    res = crawl(scaled_seeds(8), CrawlConfig(**base, max_rounds=6, resume=True))
    assert not os.path.exists(stale)  # stale round-1 part wiped

    # reference: the same crawl from scratch in one go
    ckpt2 = str(tmp_path / "ck2")
    base2 = dict(base, checkpoint_dir=ckpt2)
    crawl(scaled_seeds(8), CrawlConfig(**base2, max_rounds=6))
    assert counts(ckpt) == counts(ckpt2)
    assert res.documents().count() > 8


def test_unknown_extract_module_fails_fast(ray_session, tmp_path):
    import pytest as _pytest

    from reffy_ray.sources.corpus import scaled_seeds

    with _pytest.raises(ValueError, match="unknown extract_modules"):
        crawl(scaled_seeds(2), CrawlConfig(
            mode="synth", checkpoint_dir=str(tmp_path / "ck"),
            extract_modules=("headngs",),
        ))


def test_politeness_url_prefix_within_boundary_class(ray_session):
    """Round budget splits ONE (origin, rank, depth) class mid-way: the
    url-sorted prefix is admitted, the rest deferred (the reference's
    priority-queue order), and the decision travels as a per-origin
    cutoff — exercises the boundary-class path of
    _politeness_admission directly."""
    import ray.data as rd

    from reffy_ray.crawl.politeness import PolitenessGates
    from reffy_ray.pipelines.crawl import _politeness_admission

    urls = [f"https://drafts.csswg.org/css-x{i}/" for i in (4, 2, 0, 3, 1)]
    frontier = rd.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "origin": pa.array(["https://csswg.org"] * 5, pa.string()),
        "seed_rank": pa.array([7] * 5, pa.int64()),
        "depth": pa.array([0] * 5, pa.int32()),
        "pages": pa.array([[]] * 5, pa.list_(pa.string())),
        "state": pa.array(["pending"] * 5, pa.string()),
    }))
    # csswg interval 2000ms; round 6000ms → budget 3 of 5 (weight 1 each)
    out = _politeness_admission(frontier, PolitenessGates(2), 6000.0)
    df = out.to_pandas().sort_values("url")
    admitted = df[df["state"] == "admitted"]["url"].tolist()
    assert admitted == [
        "https://drafts.csswg.org/css-x0/",
        "https://drafts.csswg.org/css-x1/",
        "https://drafts.csswg.org/css-x2/",
    ]
    assert (df["state"] == "deferred").sum() == 2


def test_politeness_boundary_weighted_pages(ray_session):
    """Multipage weights inside the boundary class: weight = 1+len(pages),
    so the prefix stops as soon as the next url would overflow."""
    import ray.data as rd

    from reffy_ray.crawl.politeness import PolitenessGates
    from reffy_ray.pipelines.crawl import _politeness_admission

    frontier = rd.from_arrow(pa.table({
        "url": pa.array([
            "https://drafts.csswg.org/a/",   # weight 1
            "https://drafts.csswg.org/b/",   # weight 3 (2 extra pages)
            "https://drafts.csswg.org/c/",   # weight 1
        ], pa.string()),
        "origin": pa.array(["https://csswg.org"] * 3, pa.string()),
        "seed_rank": pa.array([0] * 3, pa.int64()),
        "depth": pa.array([0] * 3, pa.int32()),
        "pages": pa.array([[], ["p1", "p2"], []], pa.list_(pa.string())),
        "state": pa.array(["pending"] * 3, pa.string()),
    }))
    # budget 3: a (1) admitted, b (cum 4 > 3) rejected → prefix breaks,
    # c rejected too (url-ordered prefix, not best-fit)
    out = _politeness_admission(frontier, PolitenessGates(2), 6000.0)
    df = out.to_pandas()
    states = dict(zip(df["url"], df["state"]))
    assert states["https://drafts.csswg.org/a/"] == "admitted"
    assert states["https://drafts.csswg.org/b/"] == "deferred"
    assert states["https://drafts.csswg.org/c/"] == "deferred"


def test_crash_between_docs_write_and_manifest_resumes_clean(ray_session, tmp_path):
    """Crash-consistency: kill the crawl AFTER round r's document part
    files are written but BEFORE the seen-snapshot/frontier/manifest
    checkpoint lands (the write ordering in crawl()'s checkpoint
    block), then resume. The resume must wipe the partial round and
    re-execute it: zero duplicate doc_ids and a seen-set identical to
    an uninterrupted run (reference version-gate semantics,
    specs-crawler.js:87-98)."""
    import shutil

    from reffy_ray.sources.corpus import scaled_seeds
    from reffy_ray.state.cuckoo import CuckooFilter

    base = dict(mode="synth", max_depth=1, expand_links=True,
                round_ms=float("inf"), synth_links=3, num_seen_shards=4)
    seeds = scaled_seeds(8)

    # uninterrupted reference run
    a_dir = tmp_path / "a"
    res_a = crawl(seeds, CrawlConfig(**base, checkpoint_dir=str(a_dir)))
    docs_a = sorted(
        r["doc_id"]
        for r in res_a.documents().select_columns(["doc_id"]).take_all()
    )
    rounds_a = res_a.stats["rounds"]
    assert rounds_a >= 2  # the crash round below must not be round 0

    # crash run: complete rounds 0..r-1, snapshot the manifest, run
    # round r to get its docs on disk, then rewind every checkpoint
    # artifact the crash would have prevented — manifest, seen
    # snapshot, counters — leaving the round-r docs dir behind,
    # truncated to make it genuinely partial
    last = rounds_a - 1
    b_dir = tmp_path / "b"
    crawl(seeds, CrawlConfig(**base, checkpoint_dir=str(b_dir),
                             max_rounds=last))
    manifest_before = (b_dir / "manifest.json").read_text()
    counters_before = (b_dir / "counters.parquet").read_bytes()
    crawl(seeds, CrawlConfig(**base, checkpoint_dir=str(b_dir),
                             max_rounds=rounds_a, resume=True))
    (b_dir / "manifest.json").write_text(manifest_before)
    (b_dir / "counters.parquet").write_bytes(counters_before)
    shutil.rmtree(b_dir / "seen" / f"round={last}", ignore_errors=True)
    stray_frontier = b_dir / "frontier" / f"round={rounds_a}.parquet"
    if stray_frontier.exists():
        shutil.rmtree(stray_frontier, ignore_errors=True)
    partial = sorted((b_dir / "documents" / f"round={last}").glob("*.parquet"))
    assert partial, "crash simulation needs round-r doc part files"
    partial[0].unlink()  # the round is now half-written

    # resume from the crash state
    res_b = crawl(seeds, CrawlConfig(**base, checkpoint_dir=str(b_dir),
                                     max_rounds=rounds_a, resume=True))
    docs_b = [
        r["doc_id"]
        for r in res_b.documents().select_columns(["doc_id"]).take_all()
    ]
    assert len(docs_b) == len(set(docs_b)), "duplicate doc_ids after resume"
    assert sorted(docs_b) == docs_a
    assert res_b.stats["rounds"] == rounds_a

    # seen-set content identical to the uninterrupted run (exact sets
    # from the final snapshots; cuckoo table bytes are layout-dependent)
    for i in range(4):
        sa = CuckooFilter.from_bytes(
            (a_dir / "seen" / f"round={last}" / f"shard-{i}.bin").read_bytes()
        )
        sb = CuckooFilter.from_bytes(
            (b_dir / "seen" / f"round={last}" / f"shard-{i}.bin").read_bytes()
        )
        assert sa.exact == sb.exact


def test_seed_frontier_release_mode():
    """--release semantics: crawl release URLs, skip seeds without one
    (prepareListOfSpecs release branch; test/crawl.js --release)."""
    import pyarrow as pa

    from reffy_ray.pipelines.crawl import _seed_frontier

    seeds = fixture_seeds()
    # add a nightly-only seed that release mode must skip
    extra = pa.Table.from_pylist([{
        "url": "https://example.org/draft/", "shortname": "draft-only",
        "series_shortname": "draft-only", "series_composition": "full",
        "series_version": "1.0",
        "nightly_url": "https://example.org/draft/", "release_url": None,
        "pages": [], "standing": "good", "seed_rank": 99,
    }], schema=seeds.schema)
    seeds = pa.concat_tables([seeds, extra])

    rel = _seed_frontier(seeds, use_release=True)
    urls = rel.column("url").to_pylist()
    assert len(urls) == 5 and all("www.w3.org/TR/" in u for u in urls)
    assert "draft-only" not in rel.column("doc_id").to_pylist()

    default = _seed_frontier(seeds)
    assert default.num_rows == 6  # nightly mode keeps every seed
