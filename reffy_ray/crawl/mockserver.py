"""In-process HTTP server serving the fixture corpus over real HTTP.

The reference tests its whole crawl against a mocked network
(reference: src/lib/mock-server.js:33-203 — undici MockAgent with
disableNetConnect, inline spec HTML, a 404 spec, a 304 spec, redirect
handling); this is the same seam for the Ray engine: a localhost
`ThreadingHTTPServer` that the `mode='http'` fetch tier
(`crawl/fetch.py`) drives through a genuine HTTP client, so the
production swap-in point (real sockets, headers, status lines,
conditional GET, redirects) is exercised end-to-end without any
external network.

URL mapping: the corpus addresses specs by their public URLs
(`https://host/path`); the server exposes each as
`http://127.0.0.1:<port>/<host>/<path>` — the same host-in-path scheme
the fetcher's proxy rewrite uses, so redirect Location headers can
point at other specs and be followed by the client.

Behaviors served:
- 200 + body for every `corpus.fixture_html` URL (Content-Type
  text/html; charset=utf-8);
- the corpus error URLs with their status (test/crawl.js:137-158
  analog);
- the corpus 304 URLs: `Last-Modified` on 200; `304 Not Modified`
  when `If-Modified-Since` matches (test/crawl.js:114-126 analog);
- optional `redirects` map url→url served as `301` with a
  proxy-relative `Location`;
- anything else → 404.

Request accounting (`server.request_log`) lets tests assert the
≤1-fetch-per-URL-per-crawl contract (reference refresh:'once',
src/lib/fetch.js:41-43) over the real wire.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlsplit

from ..sources import corpus


def fixture_etag(last_modified: str) -> str:
    """Deterministic ETag the server derives from Last-Modified."""
    import hashlib

    return '"' + hashlib.md5(last_modified.encode()).hexdigest()[:16] + '"'


def proxy_path(url: str) -> str:
    """`https://host/path` → `/host/path` (the host-in-path mapping)."""
    parts = urlsplit(url)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    return f"/{parts.netloc}{path}"


def original_url(path: str) -> str:
    """`/host/path` → `https://host/path` (inverse of proxy_path)."""
    rest = path.lstrip("/")
    host, _, tail = rest.partition("/")
    return f"https://{host}/{tail}"


class FixtureHTTPServer:
    """Context-managed localhost server over the fixture corpus.

    ``extra``: additional url→html entries; ``redirects``: url→url
    301 map. ``base_url`` is the value to pass as the fetcher's
    ``http_base``.
    """

    def __init__(self, extra: dict[str, str] | None = None,
                 redirects: dict[str, str] | None = None):
        self.extra = extra or {}
        self.redirects = redirects or {}
        self.request_log: list[tuple[str, int]] = []
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *args):  # keep pytest output clean
                pass

            def _reply(self, status: int, body: bytes = b"",
                       headers: dict[str, str] | None = None):
                self.send_response(status)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                if status != 304:
                    self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body and status != 304:
                    self.wfile.write(body)

            def do_GET(self):  # noqa: N802 (stdlib handler contract)
                url = original_url(self.path)
                if url in outer.redirects:
                    status = 301
                    with outer._lock:
                        outer.request_log.append((url, status))
                    self._reply(
                        status, b"",
                        {"Location": proxy_path(outer.redirects[url])},
                    )
                    return
                if url in corpus.ERROR_URLS:
                    status = corpus.ERROR_URLS[url]
                    with outer._lock:
                        outer.request_log.append((url, status))
                    self._reply(status)
                    return
                lm = corpus.NOT_MODIFIED_URLS.get(url)
                if lm is not None:
                    # both validators, like a real origin: Last-Modified
                    # and a derived ETag; 304 when EITHER matches
                    etag = fixture_etag(lm)
                    if (
                        self.headers.get("If-Modified-Since") == lm
                        or self.headers.get("If-None-Match") == etag
                    ):
                        with outer._lock:
                            outer.request_log.append((url, 304))
                        self._reply(
                            304, headers={"Last-Modified": lm, "ETag": etag}
                        )
                        return
                    body = "<title>Changed</title>".encode()
                    with outer._lock:
                        outer.request_log.append((url, 200))
                    self._reply(
                        200, body,
                        {"Content-Type": "text/html; charset=utf-8",
                         "Last-Modified": lm, "ETag": etag},
                    )
                    return
                html = outer.extra.get(url)
                if html is None:
                    html = corpus.fixture_html(url)
                if html is None:
                    with outer._lock:
                        outer.request_log.append((url, 404))
                    self._reply(404)
                    return
                with outer._lock:
                    outer.request_log.append((url, 200))
                self._reply(
                    200, html.encode(),
                    {"Content-Type": "text/html; charset=utf-8"},
                )

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread: threading.Thread | None = None

    @property
    def base_url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "FixtureHTTPServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "FixtureHTTPServer":
        return self.start()

    def __exit__(self, *exc):
        self.stop()
