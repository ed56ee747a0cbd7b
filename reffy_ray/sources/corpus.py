"""Deterministic synthetic crawl corpus.

Two corpora, both fully deterministic (fixed seed, no external data):

1. ``fixture_seeds()`` / ``fixture_html(url)`` — the 5-spec mock corpus
   modeled on the reference's mock server
   (reference: src/lib/mock-server.js:33-63) plus the error/304 cases
   used by test/crawl.js. Golden expectations in tests mirror
   test/crawl-test.json.

2. ``scaled_seeds(n)`` / ``synth_html(url)`` — template replication for
   bench scale: hash-derived doc ids and span counts, a Zipf-skewed
   host distribution whose hot host plays the csswg.org role
   (politeness salting exercise; FIXTURES.md §5). Content for any URL
   is synthesized deterministically from the URL hash so the frontier
   can be arbitrarily large without materializing the corpus.
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import SEEDS
from ..urlnorm import fnv1a64

# ---------------------------------------------------------------------------
# Fixture corpus (mock-server analog)
# ---------------------------------------------------------------------------

_FIXTURE_SPECS = [
    {
        "url": "https://www.w3.org/TR/WOFF2/",
        "shortname": "WOFF2",
        "series_shortname": "WOFF",
        "series_composition": "full",
        "series_version": "2.0",
        "nightly_url": "https://w3c.github.io/woff/woff2/",
        "release_url": "https://www.w3.org/TR/WOFF2/",
        "pages": ["https://w3c.github.io/woff/woff2/page.html"],
        "standing": "good",
    },
    {
        "url": "https://www.w3.org/TR/audio-output/",
        "shortname": "audio-output",
        "series_shortname": "audio-output",
        "series_composition": "full",
        "series_version": "1.0",
        "nightly_url": "https://w3c.github.io/mediacapture-output/",
        "release_url": "https://www.w3.org/TR/audio-output/",
        "pages": [],
        "standing": "good",
    },
    {
        "url": "https://www.w3.org/TR/accelerometer/",
        "shortname": "accelerometer",
        "series_shortname": "accelerometer",
        "series_composition": "full",
        "series_version": "1.0",
        "nightly_url": "https://w3c.github.io/accelerometer/",
        "release_url": "https://www.w3.org/TR/accelerometer/",
        "pages": [],
        "standing": "good",
    },
    {
        "url": "https://www.w3.org/TR/css-backgrounds-3/",
        "shortname": "css-backgrounds-3",
        "series_shortname": "css-backgrounds",
        "series_composition": "full",
        "series_version": "3",
        "nightly_url": "https://drafts.csswg.org/css-backgrounds-3/",
        "release_url": "https://www.w3.org/TR/css-backgrounds-3/",
        "pages": [],
        "standing": "good",
    },
    {
        "url": "https://www.w3.org/TR/example-events/",
        "shortname": "example-events",
        "series_shortname": "example-events",
        "series_composition": "full",
        "series_version": "1.0",
        "nightly_url": "https://w3c.github.io/example-events/",
        "release_url": "https://www.w3.org/TR/example-events/",
        "pages": [],
        "standing": "good",
    },
]

_FIXTURE_HTML: dict[str, str] = {
    # woff2-like (mock-server.js:34-44): dfn + rawlink + toc subpage
    "https://w3c.github.io/woff/woff2/": """
      <title>WOFF2</title>
      <body>
        <dfn id='foo' data-dfn-type="dfn">Foo</dfn>
        <a href="https://www.w3.org/TR/bar/#baz">bar</a>
        <ul class='toc'><li><a href='page.html'>page</a></ul>""",
    "https://w3c.github.io/woff/woff2/page.html": "<h2 id='bar'>Heading in subpage</h2>",
    # respec spec with IDL (mock-server.js:45-49), modeled post-ReSpec
    # rendering: generator meta, autolinks and the generated informative
    # reference section that ReSpec produces from the IDL
    "https://w3c.github.io/mediacapture-output/": """
      <script>respecConfig = { shortName: 'test' };</script>
      <script src='https://www.w3.org/Tools/respec/respec-w3c'></script>
      <div id=abstract></div>
      <pre class='idl'>[Exposed=Window] interface Foo { attribute DOMString bar; };</pre>
      <p><a data-link-type='idl' href='https://webidl.spec.whatwg.org/#Exposed'>Exposed</a>
         <a data-link-type='idl' href='https://webidl.spec.whatwg.org/#idl-DOMString'>DOMString</a></p>
      <section id='informative-references'><h2>Informative references</h2>
        <dl><dt>[webidl]</dt><dd><a href='https://webidl.spec.whatwg.org/'>Web IDL</a></dd></dl>
      </section>""",
    # accelerometer-like (mock-server.js:50-55): revision + normative refs
    "https://w3c.github.io/accelerometer/": """<html>
      <meta name='document-revision' content='c0917d216986f88bdd43c72c0b13352c71f283aa'>
      <h2 id='refs'>Normative references</h2>
      <dl>
        <dt>FOO</dt>
        <dd><a href='https://www.w3.org/TR/Foo'>Foo</a></dd>
      </dl>""",
    # css propdef spec (test/extract-css.js:10-50 fixture shape)
    "https://drafts.csswg.org/css-backgrounds-3/": """
      <title>CSS Backgrounds</title>
      <h2 id='background-color'><span class='secno'>2.1.</span> Background color</h2>
      <table class="propdef">
        <tbody>
          <tr><th>Name:</th>
              <td><dfn class="css" data-dfn-type="property" data-export="" id="propdef-background-color">background-color</dfn></td></tr>
          <tr><th>Value:</th><td><a class="production css" data-link-type="type" href="https://www.w3.org/TR/css-color-3/#valuea-def-color">&lt;color&gt;</a></td></tr>
          <tr><th>Initial:</th><td>transparent</td></tr>
          <tr><th>Applies to:</th><td>all elements</td></tr>
          <tr><th>Inherited:</th><td>no</td></tr>
          <tr><th>Percentages:</th><td>N/A</td></tr>
          <tr><th>Computed value:</th><td>computed color</td></tr>
          <tr><th>Animation type:</th><td>by computed value</td></tr>
        </tbody></table>
      <pre class='prod'>&lt;position&gt; = [ left | center | right ]</pre>""",
    # events + algorithms spec (test/extract-events.js / extract-algorithms.js)
    "https://w3c.github.io/example-events/": """
      <title>Example Events</title>
      <table>
        <thead><tr><th>Event type</th><th>Interface</th><th>Bubbles</th><th>Cancelable</th></tr></thead>
        <tbody>
          <tr><th><dfn id=success>success</dfn></th><td><a href=''>SuccessEvent</a></td><td>Yes</td><td>Yes</td></tr>
          <tr><th><dfn id=error>error</dfn></th><td><a href=''>ErrorEvent</a></td><td>No</td><td>No</td></tr>
        </tbody></table>
      <pre class=idl>interface Example {
  attribute EventHandler onsuccess;
  attribute EventHandler onerror;
};</pre>
      <p>To do nothing, run these steps:</p>
      <ol class="algorithm" data-algorithm="my algo" id="algo-id"><li><p>Nothing.</p></li></ol>""",
}

# URLs with special fetch behavior (test/crawl.js:114-158 analogs)
ERROR_URLS = {"https://www.w3.org/TR/idontexist/": 404}
NOT_MODIFIED_URLS = {"https://www.w3.org/TR/ididnotchange/": "Fri, 11 Feb 2022 00:00:42 GMT"}


def complete_with_alternative_urls(
    seed: dict, equivalents: dict[str, list[str]] | None = None
) -> list[str]:
    """`versions` set for a seed: canonical + release + nightly URLs,
    plus known equivalents, insertion-ordered and deduped
    (completeWithAlternativeUrls, src/lib/util.js:695-712)."""
    versions: dict[str, None] = {}
    for u in (seed.get("url"), seed.get("release_url"), seed.get("nightly_url")):
        if u:
            versions.setdefault(u)
    for u in (equivalents or {}).get(seed.get("url", ""), []):
        versions.setdefault(u)
    return list(versions)


def fixture_seeds() -> pa.Table:
    rows = []
    for rank, s in enumerate(_FIXTURE_SPECS):
        rows.append({**s, "seed_rank": rank})
    return pa.table(
        {f.name: pa.array([r[f.name] for r in rows], f.type) for f in SEEDS}
    )


def fixture_html(url: str) -> str | None:
    return _FIXTURE_HTML.get(url)


# ---------------------------------------------------------------------------
# Scaled corpus (bench)
# ---------------------------------------------------------------------------

# Zipf-ish host distribution: host 0 ("drafts.csswg.org" analog) is hot.
_HOSTS = (
    ["https://drafts.csswg.org"] * 40
    + ["https://w3c.github.io"] * 25
    + ["https://www.w3.org"] * 15
    + [f"https://spec{i}.example.org" for i in range(20)]
)

_TEMPLATE_KINDS = 5


def _host_for(i: int) -> str:
    return _HOSTS[fnv1a64(f"host{i}") % len(_HOSTS)]


def synth_url(i: int) -> str:
    return f"{_host_for(i)}/spec-{i:08d}/"


_WORDS = (
    "interface specification attribute algorithm value property element "
    "document rendering normative conformance implementation behavior user "
    "agent resource request response stream token parser context state"
).split()


def _synth_prose(h: int, n_paras: int) -> str:
    """Deterministic filler prose ≈ real spec body text volume."""
    out = []
    x = h or 1
    for p in range(n_paras):
        words = []
        for w in range(60):
            x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            words.append(_WORDS[(x >> 33) % len(_WORDS)])
        out.append(f"<p>Paragraph {p}: {' '.join(words)}.</p>")
    return "\n".join(out)


def synth_html(url: str, n_links: int = 8, n_paras: int = 30) -> str:
    """Deterministic spec HTML derived from the URL hash alone; every
    template kind exercises a different extractor path and emits
    `n_links` outbound links for frontier expansion. ``n_paras``
    paragraphs of filler prose (~60 words each) put the document in
    the tens-of-kilobytes range of real specs, so parse cost per URL
    is realistic and the crawl is compute-dominated at scale."""
    h = fnv1a64(url)
    kind = h % _TEMPLATE_KINDS
    name = f"spec{h % 100000:05d}"
    links = "".join(
        f"<li><a href='{synth_url((h + 7 * j) % (1 << 31))}#sec{j}'>ref {j}</a></li>"
        for j in range(n_links)
    )
    dfns = "".join(
        f"<p>The term <dfn id='{name}-t{d}' data-dfn-type='dfn'>term {d} of {name}</dfn> is defined here.</p>"
        for d in range(8)
    )
    headings = "".join(
        f"<h3 id='{name}-s{s}'><span class='secno'>1.{s}.</span> Subsection {s}</h3>"
        + _synth_prose(h + s, max(1, n_paras // 6))
        for s in range(6)
    )
    common = (
        f"<title>Spec {name}</title>\n<h2 id='intro'>1. Introduction</h2>\n"
        + _synth_prose(h, n_paras // 3)
        + headings
        + dfns
    )
    if kind == 0:
        body = (
            f"<dfn id='{name}-dfn' data-dfn-type='dfn'>{name} term</dfn>"
            f"<p>Prose about <a href='https://www.w3.org/TR/dep/#frag'>{name}</a>.</p>"
        )
    elif kind == 1:
        body = (
            f"<pre class='idl'>[Exposed=Window] interface I{name} "
            f"{{ attribute DOMString field{h % 7}; }};</pre>"
        )
    elif kind == 2:
        body = (
            "<h2 id='refs'>Normative references</h2><dl>"
            f"<dt>REF{h % 13}</dt><dd><a href='https://www.w3.org/TR/ref{h % 13}/'>Ref</a></dd></dl>"
        )
    elif kind == 3:
        body = (
            "<table class='propdef'><tbody>"
            f"<tr><th>Name:</th><td><dfn data-dfn-type='property' data-export='' "
            f"id='propdef-{name}'>{name}-prop</dfn></td></tr>"
            "<tr><th>Value:</th><td>&lt;color&gt;</td></tr>"
            "<tr><th>Initial:</th><td>none</td></tr></tbody></table>"
            f"<figure><img src='https://img.example.org/{name}.png'>"
            f"<figcaption>Figure for {name}</figcaption></figure>"
        )
    else:
        body = (
            "<p>To do nothing, run these steps:</p>"
            f"<ol class='algorithm' data-algorithm='{name} algo' id='{name}-algo'>"
            "<li><p>Let x be 1.</p></li><li><p>Return x.</p><ol><li><p>Done.</p></li></ol></li></ol>"
        )
    return f"{common}{body}\n<ul class='toc'>{links}</ul>"


def scaled_seeds(n: int, offset: int = 0) -> pa.Table:
    rows = []
    for i in range(offset, offset + n):
        url = synth_url(i)
        rows.append(
            {
                "url": url,
                "shortname": f"spec-{i:08d}",
                "series_shortname": f"spec-{i:08d}",
                "series_composition": "full",
                "series_version": "1.0",
                "nightly_url": url,
                "release_url": url,
                "pages": [],
                "standing": "good",
                "seed_rank": i,
            }
        )
    return pa.table(
        {f.name: pa.array([r[f.name] for r in rows], f.type) for f in SEEDS}
    )
