"""Fetch stage: stateful actor-pool over the admitted frontier.

Mirrors the reference fetch wrapper (reference: src/lib/fetch.js:33-51
file cache; conditional GET with If-Modified-Since → 304 short-circuit
at src/lib/util.js:461-487 and src/lib/specs-crawler.js:87-98,128-132).

The sandbox has no network: ``mode='fixture'`` serves the mock corpus
(incl. the 404 and 304 cases of test/crawl.js:114-158), and
``mode='synth'`` synthesizes deterministic HTML from the URL hash so
the frontier can grow without bound. Swap ``_do_fetch`` for a real
HTTP session (requests/httpx with per-actor connection pool) to crawl
live — everything downstream is format-identical.

A spec's subpages are fetched in the same task as its main page, as
the reference loads them into the same browser page
(src/lib/util.js:555-594); admission weighting accounts for them.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray

from ..sources import corpus


def _validator(lm: str | None, etag: str | None) -> str:
    """Composite conditional-GET validator string for the
    ``last_modified`` fetch column: the bare Last-Modified value when
    that's all the origin sent (back-compat), else a JSON object
    carrying both validators. Round-trips through ``cache_info``
    (Fetcher.__init__ json-parses '{'-prefixed values), so a harvested
    column re-arms BOTH If-Modified-Since and If-None-Match on the
    next crawl."""
    if etag:
        return json.dumps({"last_modified": lm or "", "etag": etag})
    return lm or ""


class Fetcher:
    """Actor-pool map_batches stage: frontier rows → fetched HTML rows.

    ``cache_info_ref``: ray.put() of {url: last_modified} from the
    previous crawl's checkpoint — the conditional-GET state.
    """

    def __init__(self, mode: str = "fixture", cache_info_ref=None,
                 synth_links: int = 8, http_base: str | None = None,
                 http_timeout: float = 30.0):
        self.mode = mode
        raw_cache = (
            ray.get(cache_info_ref) if cache_info_ref is not None else {}
        )
        # values are bare Last-Modified strings, {"last_modified",
        # "etag"} dicts, or the JSON composite a previous crawl's
        # last_modified column harvested (_validator)
        self.cache_info = {}
        for u, v in raw_cache.items():
            if isinstance(v, str) and v.startswith("{"):
                try:
                    v = json.loads(v)
                except ValueError:
                    pass
            self.cache_info[u] = v
        self.synth_links = synth_links
        self.session_fetches = 0  # per-actor cache: ≤1 fetch per URL per crawl
        self._memo: dict[str, tuple[int, str]] = {}
        self.http_base = (http_base or "").rstrip("/")
        self.http_timeout = http_timeout
        if mode == "http":
            if not self.http_base:
                raise ValueError("mode='http' requires http_base")
            # real HTTP client state, built once per actor: an opener
            # with a persistent redirect handler (reference fetch
            # wrapper: src/lib/fetch.js:33-51)
            import urllib.request

            self._opener = urllib.request.build_opener()

    def _http_fetch(self, url: str) -> tuple[int, str, str]:
        """Real HTTP GET against ``http_base`` using the host-in-path
        proxy mapping (see crawl/mockserver.py). Conditional GET: sends
        ``If-Modified-Since`` from the previous crawl's cache_info and
        short-circuits on 304 (src/lib/util.js:461-487,
        specs-crawler.js:128-132). Redirects are followed; a redirected
        response suppresses cache info like the reference
        (test/crawl.js redirect case), so the next crawl refetches
        rather than conditional-GETting a moved URL."""
        import urllib.error
        import urllib.request

        from .mockserver import proxy_path

        target = self.http_base + proxy_path(url)
        headers = {}
        known = self.cache_info.get(url)
        # cache_info values are either the bare Last-Modified string or
        # {"last_modified": ..., "etag": ...} — the reference's
        # crawlCacheInfo carries both validators (specs-crawler.js:
        # 87-98; fetch wrapper sends If-Modified-Since AND If-None-Match)
        lm_known = known.get("last_modified") if isinstance(known, dict) else known
        etag_known = known.get("etag") if isinstance(known, dict) else None
        if lm_known:
            headers["If-Modified-Since"] = lm_known
        if etag_known:
            headers["If-None-Match"] = etag_known
        req = urllib.request.Request(target, headers=headers)
        try:
            with self._opener.open(req, timeout=self.http_timeout) as resp:
                body = resp.read().decode("utf-8", errors="replace")
                redirected = resp.geturl() != target
                # a redirected response suppresses BOTH validators so
                # the next crawl refetches the moved URL
                lm = "" if redirected else (
                    resp.headers.get("Last-Modified") or ""
                )
                etag = None if redirected else resp.headers.get("ETag")
                return resp.status, body, _validator(lm, etag)
        except urllib.error.HTTPError as e:
            if e.code == 304:
                # both known validators stay armed for the next crawl
                # (the 304 itself confirms they're still valid)
                return 304, "", _validator(lm_known, etag_known)
            return e.code, "", ""
        except (urllib.error.URLError, TimeoutError, OSError):
            # network-level failure: captured per URL like any HTTP
            # error (crawl continues, error column set —
            # specs-crawler.js:166-171); 599 is the conventional
            # network-connect-timeout pseudo-status
            return 599, "", ""

    def _do_fetch(self, url: str) -> tuple[int, str, str]:
        """→ (status, html, last_modified)."""
        if url in self._memo:
            st, html = self._memo[url]
            return st, html, ""
        if self.mode == "http":
            result3 = self._http_fetch(url)
            # memoize non-304 outcomes: ≤1 wire fetch per URL per crawl
            # per actor (refresh:'once', src/lib/fetch.js:41-43); 304
            # stays unmemoized so its last_modified survives
            if result3[0] != 304:
                self._memo[url] = (result3[0], result3[1])
                self.session_fetches += 1
            return result3
        if self.mode == "fixture":
            if url in corpus.ERROR_URLS:
                return corpus.ERROR_URLS[url], "", ""
            lm = corpus.NOT_MODIFIED_URLS.get(url)
            if lm is not None:
                if self.cache_info.get(url) == lm:
                    return 304, "", lm
                return 200, "<title>Changed</title>", lm
            html = corpus.fixture_html(url)
            if html is None:
                return 404, "", ""
            result = (200, html, "")
        else:
            result = (200, corpus.synth_html(url, self.synth_links), "")
        self._memo[url] = (result[0], result[1])
        self.session_fetches += 1
        return result

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        pages_col = (
            batch.column("pages").to_pylist()
            if "pages" in batch.column_names
            else [[] for _ in urls]
        )
        seed_ranks = batch.column("seed_rank").to_pylist()
        depths = batch.column("depth").to_pylist()
        out = {
            "doc_id": [], "url": [], "seed_rank": [], "depth": [],
            "status": [], "html": [], "page_urls": [], "page_htmls": [],
            "last_modified": [], "fetch_error": [],
        }
        for doc_id, url, pages, rank, depth in zip(
            doc_ids, urls, pages_col, seed_ranks, depths
        ):
            status, html, lm = self._do_fetch(url)
            purls, phtmls = [], []
            if status == 200:
                for p in pages or []:
                    pst, phtml, _ = self._do_fetch(p)
                    if pst == 200:
                        purls.append(p)
                        phtmls.append(phtml)
            err = None
            if status >= 400:
                err = f"Loading {url} triggered HTTP status {status}"
            out["doc_id"].append(doc_id)
            out["url"].append(url)
            out["seed_rank"].append(rank)
            out["depth"].append(depth)
            out["status"].append(status)
            out["html"].append(html)
            out["page_urls"].append(purls)
            out["page_htmls"].append(phtmls)
            out["last_modified"].append(lm or None)
            out["fetch_error"].append(err)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "url": pa.array(out["url"], pa.string()),
                "seed_rank": pa.array(out["seed_rank"], pa.int64()),
                "depth": pa.array(out["depth"], pa.int32()),
                "status": pa.array(out["status"], pa.int32()),
                "html": pa.array(out["html"], pa.large_string()),
                "page_urls": pa.array(out["page_urls"], pa.list_(pa.string())),
                "page_htmls": pa.array(out["page_htmls"], pa.list_(pa.large_string())),
                "last_modified": pa.array(out["last_modified"], pa.string()),
                "fetch_error": pa.array(out["fetch_error"], pa.string()),
            }
        )
