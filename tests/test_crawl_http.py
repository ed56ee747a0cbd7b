"""mode='http' e2e: the real-HTTP fetch tier driven against the
in-process mock server (reference: test/crawl.js:51-208 runs the whole
crawl against src/lib/mock-server.js). Covers 200, 304, 404+fallback,
redirect — the same assertions as the fixture-mode tests, now over a
genuine socket + headers path."""

import pyarrow as pa
import pytest

from reffy_ray.crawl.mockserver import FixtureHTTPServer, original_url, proxy_path
from reffy_ray.pipelines.crawl import CrawlConfig, crawl
from reffy_ray.sources.corpus import fixture_seeds


RAW_RESPEC_URL = "https://w3c.github.io/raw-respec-source/"
RAW_RESPEC_HTML = """<html><head>
  <script>var respecConfig = { shortName: 'raw', specStatus: 'ED' };</script>
  <script src='https://www.w3.org/Tools/respec/respec-w3c' async></script>
</head><body>
  <section data-include='intro.md' data-include-format='markdown'></section>
  <section id='conformance'></section>
</body></html>"""


@pytest.fixture(scope="module")
def http_server():
    with FixtureHTTPServer(
        extra={RAW_RESPEC_URL: RAW_RESPEC_HTML},
        redirects={
            "https://www.w3.org/TR/imoved/": "https://w3c.github.io/mediacapture-output/"
        },
    ) as srv:
        yield srv


def _seed_row(url, rank=0, shortname="s"):
    return {
        "url": url, "shortname": shortname, "series_shortname": shortname,
        "series_composition": "full", "series_version": "1.0",
        "nightly_url": url, "release_url": None, "pages": [],
        "standing": "good", "seed_rank": rank,
    }


def test_proxy_path_roundtrip():
    for u in ["https://www.w3.org/TR/WOFF2/", "https://a.b/c/d.html?x=1"]:
        assert original_url(proxy_path(u)) == u


def test_http_mode_matches_fixture_mode(ray_session, tmp_path, http_server):
    """The flagship assertion: an http-mode crawl over the wire yields
    the exact same document table (order contract included) as the
    in-memory fixture mode."""
    seeds = fixture_seeds()
    res_http = crawl(seeds, CrawlConfig(
        mode="http", http_base=http_server.base_url,
        checkpoint_dir=str(tmp_path / "ck_http"),
    ))
    res_fix = crawl(seeds, CrawlConfig(
        mode="fixture", checkpoint_dir=str(tmp_path / "ck_fix"),
    ))
    rows_http = sorted(
        res_http.ordered_documents().take_all(), key=lambda r: r["url"]
    )
    rows_fix = sorted(
        res_fix.ordered_documents().take_all(), key=lambda r: r["url"]
    )
    assert len(rows_http) == len(rows_fix) == 5
    for a, b in zip(rows_http, rows_fix):
        assert a["url"] == b["url"]
        assert a["status"] == b["status"]
        assert a["spans"] == b["spans"]
    # order contract holds over the wire too (reffy.js:164-167)
    ranks = [r["seed_rank"] for r in res_http.ordered_documents().take_all()]
    assert ranks == sorted(ranks)


def test_http_not_modified_reuses_checkpoint(ray_session, tmp_path, http_server):
    # conditional GET over the wire: If-Modified-Since → 304 → reuse
    url = "https://www.w3.org/TR/ididnotchange/"
    seeds = pa.Table.from_pylist([_seed_row(url, shortname="ididnotchange")])
    fallback = {url: [
        {"kind": "title", "text": "Cached Title", "media_ref": "", "offset": 0}
    ]}
    cache_info = {url: "Fri, 11 Feb 2022 00:00:42 GMT"}
    cfg = CrawlConfig(
        mode="http", http_base=http_server.base_url,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    res = crawl(seeds, cfg, fallback_spans=fallback, cache_info=cache_info)
    docs = res.documents().take_all()
    assert docs[0]["status"] == 304
    assert docs[0]["crawl_cache"] == "not modified"
    assert docs[0]["spans"][0]["text"] == "Cached Title"
    assert docs[0]["error"] is None
    # the server really answered 304 (not a client-side shortcut)
    assert (url, 304) in http_server.request_log


def test_http_etag_if_none_match_304(ray_session, tmp_path, http_server):
    # ETag-only conditional GET (stale Last-Modified, matching
    # If-None-Match) → 304 → checkpoint reuse
    from reffy_ray.crawl.mockserver import fixture_etag

    url = "https://www.w3.org/TR/ididnotchange/"
    lm = "Fri, 11 Feb 2022 00:00:42 GMT"
    seeds = pa.Table.from_pylist([_seed_row(url, shortname="ididnotchange")])
    fallback = {url: [
        {"kind": "title", "text": "Cached Title", "media_ref": "", "offset": 0}
    ]}
    cache_info = {url: {"last_modified": "Mon, 01 Jan 2001 00:00:00 GMT",
                        "etag": fixture_etag(lm)}}
    cfg = CrawlConfig(
        mode="http", http_base=http_server.base_url,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    res = crawl(seeds, cfg, fallback_spans=fallback, cache_info=cache_info)
    docs = res.documents().take_all()
    assert docs[0]["status"] == 304
    assert docs[0]["spans"][0]["text"] == "Cached Title"


def test_http_changed_page_refetches(ray_session, tmp_path, http_server):
    # stale If-Modified-Since → 200 with fresh body + new Last-Modified
    url = "https://www.w3.org/TR/ididnotchange/"
    seeds = pa.Table.from_pylist([_seed_row(url, shortname="ididnotchange")])
    cache_info = {url: "Mon, 01 Jan 2001 00:00:00 GMT"}
    cfg = CrawlConfig(
        mode="http", http_base=http_server.base_url,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    res = crawl(seeds, cfg, cache_info=cache_info)
    docs = res.documents().take_all()
    assert docs[0]["status"] == 200
    titles = [s["text"] for s in docs[0]["spans"] if s["kind"] == "title"]
    assert titles == ["Changed"]


def test_http_error_url_captured_with_fallback(ray_session, tmp_path, http_server):
    # real 404 over the wire: error recorded AND fallback content kept
    url = "https://www.w3.org/TR/idontexist/"
    seeds = pa.Table.from_pylist([_seed_row(url, shortname="idontexist")])
    fallback = {url: [
        {"kind": "title", "text": "Fallback Title", "media_ref": "", "offset": 0}
    ]}
    cfg = CrawlConfig(
        mode="http", http_base=http_server.base_url,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    res = crawl(seeds, cfg, fallback_spans=fallback)
    docs = res.documents().take_all()
    assert len(docs) == 1
    assert "404" in docs[0]["error"]
    assert docs[0]["spans"][0]["text"] == "Fallback Title"
    assert res.counters.to_pylist()[0]["errors"] == 1
    assert (url, 404) in http_server.request_log


def test_raw_respec_source_guard_unit():
    # parse-level guard: generator machinery but no generated markers
    from reffy_ray.stages.parse import respec_source_error, spans_from_html

    spans = spans_from_html(RAW_RESPEC_HTML, RAW_RESPEC_URL)
    msg = respec_source_error(spans)
    assert msg is not None and "ungenerated" in msg
    # a generated-looking ReSpec doc (has headings) is NOT flagged
    ok = spans_from_html(
        "<script>respecConfig = {};</script><h2 id='x'>1. Intro</h2>",
        RAW_RESPEC_URL,
    )
    assert respec_source_error(ok) is None


def test_css_server_index_of_guard_unit():
    # draft-CSS-server hiccup: directory listing in place of the spec
    # (reference throws on the first h1 — src/lib/util.js:600-604)
    from reffy_ray.stages.parse import respec_source_error, spans_from_html

    listing = spans_from_html(
        "<title>Index of /css-align-3</title><h1>Index of /css-align-3</h1>"
        "<ul><li><a href='Overview.html'>Overview.html</a></li></ul>",
        "https://drafts.csswg.org/css-align-3/",
    )
    msg = respec_source_error(listing)
    assert msg == "CSS server issue detected"
    # bare directory listing with no <title> — the h1 heading span
    # carries the text inside the heading JSON struct
    bare = spans_from_html(
        "<h1>Index of /css-grid-9</h1><ul><li>Overview.html</li></ul>",
        "https://drafts.csswg.org/css-grid-9/",
    )
    assert respec_source_error(bare) == "CSS server issue detected"
    # a real spec whose h1 merely CONTAINS 'Index of' later is fine
    ok = spans_from_html(
        "<h1>CSS Alignment</h1><h2>Index of terms</h2>",
        "https://drafts.csswg.org/css-align-3/",
    )
    assert respec_source_error(ok) is None


def test_http_raw_respec_source_error_row(ray_session, tmp_path, http_server):
    # e2e: the crawl records the reference-style error row instead of
    # silently extracting nothing (util.js:613-628 wait analog)
    seeds = pa.Table.from_pylist([_seed_row(RAW_RESPEC_URL, shortname="raw")])
    cfg = CrawlConfig(
        mode="http", http_base=http_server.base_url,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    res = crawl(seeds, cfg)
    docs = res.documents().take_all()
    assert len(docs) == 1
    assert docs[0]["status"] == 200
    assert docs[0]["error"] is not None and "ungenerated" in docs[0]["error"]


def test_http_release_mode_crawls_release_urls(ray_session, tmp_path):
    # --release e2e: the release URL is fetched (served via extra),
    # the nightly-only seed is skipped
    rel_url = "https://www.w3.org/TR/WOFF2/"
    with FixtureHTTPServer(
        extra={rel_url: "<title>WOFF2 Release</title><h2 id='a'>1. A</h2>"}
    ) as srv:
        seeds = pa.Table.from_pylist([
            {**_seed_row("https://w3c.github.io/woff/woff2/",
                         rank=0, shortname="WOFF2"),
             "release_url": rel_url},
            _seed_row("https://example.org/draft-only/", rank=1,
                      shortname="draft-only"),  # no release_url
        ])
        cfg = CrawlConfig(
            mode="http", http_base=srv.base_url,
            checkpoint_dir=str(tmp_path / "ck"), use_release=True,
        )
        res = crawl(seeds, cfg)
        docs = res.documents().take_all()
        assert [d["url"] for d in docs] == [rel_url]
        titles = [s["text"] for s in docs[0]["spans"] if s["kind"] == "title"]
        assert titles == ["WOFF2 Release"]


def test_http_redirect_followed(ray_session, tmp_path, http_server):
    # 301 → client follows Location to the target spec's content
    url = "https://www.w3.org/TR/imoved/"
    seeds = pa.Table.from_pylist([_seed_row(url, shortname="imoved")])
    cfg = CrawlConfig(
        mode="http", http_base=http_server.base_url,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    res = crawl(seeds, cfg)
    docs = res.documents().take_all()
    assert docs[0]["status"] == 200
    assert docs[0]["error"] is None
    # body is the redirect target's (mediacapture-output) content
    idl = [s["text"] for s in docs[0]["spans"] if s["kind"] == "idl-block"]
    assert idl and "interface Foo" in idl[0]
    assert (url, 301) in http_server.request_log


def test_http_validator_harvest_roundtrip(ray_session, tmp_path, http_server):
    # crawl 1 harvests the conditional-GET validators into the
    # documents checkpoint (the reference's crawl-cache.json analog,
    # specs-crawler.js:87-98); crawl 2 fed res.cache_info() hits 304
    # via the re-armed validators
    url = "https://www.w3.org/TR/ididnotchange/"
    seeds = pa.Table.from_pylist([_seed_row(url, shortname="ididnotchange")])
    cfg1 = CrawlConfig(
        mode="http", http_base=http_server.base_url,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    res1 = crawl(seeds, cfg1)
    docs1 = res1.documents().take_all()
    assert docs1[0]["status"] == 200
    ci = res1.cache_info()
    # the harvested validator is the JSON composite carrying BOTH
    # validators (the mock server sends Last-Modified and ETag)
    import json as _json

    v = _json.loads(ci[url])
    assert v["last_modified"] and v["etag"].startswith('"')

    spans1 = docs1[0]["spans"]
    cfg2 = CrawlConfig(
        mode="http", http_base=http_server.base_url,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    res2 = crawl(seeds, cfg2, fallback_spans={url: spans1}, cache_info=ci)
    docs2 = res2.documents().take_all()
    assert docs2[0]["status"] == 304
    assert docs2[0]["crawl_cache"] == "not modified"
    assert (url, 304) in http_server.request_log
    # a 304 keeps the validators armed for crawl 3
    assert _json.loads(res2.cache_info()[url])["etag"] == v["etag"]
