"""URL canonicalization/origin tests (semantics: annotate-links.js:6-17,
throttled-queue.js:18-37)."""

from reffy_ray.urlnorm import (
    canonicalize_url,
    coarse_origin,
    fnv1a64,
    host_shard,
    sleep_interval_ms,
    url_shard,
)


def test_canonicalize_http_to_https():
    assert canonicalize_url("http://www.w3.org/TR/foo/") == "https://www.w3.org/TR/foo/"


def test_canonicalize_strips_fragment():
    assert canonicalize_url("https://www.w3.org/TR/bar/#baz") == "https://www.w3.org/TR/bar/"


def test_canonicalize_index_html():
    assert canonicalize_url("https://example.org/spec/index.html") == "https://example.org/spec/"
    assert canonicalize_url("https://example.org/spec/Overview.html") == "https://example.org/spec/"


def test_canonicalize_whatwg_subpage():
    assert (
        canonicalize_url("https://html.spec.whatwg.org/multipage/forms.html")
        == "https://html.spec.whatwg.org/"
    )


def test_canonicalize_w3c_tr_subpage():
    assert (
        canonicalize_url("https://www.w3.org/TR/css2/visudet.html")
        == "https://www.w3.org/TR/css2/"
    )


def test_canonicalize_trailing_slash():
    assert canonicalize_url("https://www.w3.org/TR/woff2") == "https://www.w3.org/TR/woff2/"
    assert canonicalize_url("https://w3c.github.io/woff") == "https://w3c.github.io/woff/"


def test_coarse_origin_collapse():
    assert coarse_origin("https://html.spec.whatwg.org/x") == "https://whatwg.org"
    assert coarse_origin("https://w3c.github.io/woff/") == "https://github.io"
    assert coarse_origin("https://drafts.csswg.org/css-fonts/") == "https://csswg.org"
    assert coarse_origin("https://drafts.css-houdini.org/x/") == "https://csswg.org"
    assert coarse_origin("https://drafts.fxtf.org/x/") == "https://csswg.org"
    assert coarse_origin("https://www.w3.org/TR/x/") == "https://www.w3.org"


def test_sleep_intervals():
    # specs-crawler.js:460-472
    assert sleep_interval_ms("https://csswg.org") == 2000
    assert sleep_interval_ms("https://www.w3.org") == 1000
    assert sleep_interval_ms("https://github.io") == 100


def test_hash_stability():
    assert fnv1a64("abc") == fnv1a64("abc")
    assert fnv1a64("abc") != fnv1a64("abd")
    assert 0 <= url_shard("https://x.org/", 16) < 16
    assert 0 <= host_shard("https://x.org/", 16) < 16
