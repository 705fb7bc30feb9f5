"""Localhost HTTP front-end for the pages corpus.

The reference fetches the live web through an async HTTP client with
custom headers and timeouts (/root/reference/siren/core/http.py:58-147).
This engine's normal fetch is a corpus JOIN (stages/fetch.py), which
makes headers/timeouts vestigial — so the live-HTTP seam is exercised
against THIS server: a real socket listener over the same Parquet pages,
serving ``GET /page?url=<quoted-url>``. Tests and the ``http`` fetch
mode drive actual HTTP requests (identity headers, per-request timeouts,
status-code error mapping) end-to-end without leaving the machine.

Deliberately test-grade: a threading stdlib server, not a production
sink. The production seam is ``stages.transport.HttpTransport`` — point
it at any real host instead of this one and the engine fetches live.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pyarrow.dataset as pads


def load_pages_map(pages_dir: str) -> dict[str, bytes]:
    """(url -> html) dict from a hive-partitioned pages corpus dir."""
    t = pads.dataset(pages_dir, partitioning="hive").to_table(
        columns=["url", "html"]
    )
    return dict(zip(t["url"].to_pylist(), t["html"].to_pylist()))


class CorpusHttpServer:
    """Serve a (url -> html bytes) map over localhost HTTP.

    - ``GET /page?url=<quoted>`` -> 200 + html, or 404 if unknown.
    - ``require_headers``: exact-match request headers; a request
      missing or mismatching any of them gets 403 (the identity-check
      a polite crawler must pass: F3).
    - ``slow_urls``: per-url artificial latency in seconds, for client
      timeout tests (F5).
    - ``etags=True``: strong validators — every 200 carries
      ``ETag: "<md5(body)>"`` and a request whose ``If-None-Match``
      equals the current tag gets ``304 Not Modified`` with NO body
      (RFC 9110 §13.1.2). Counters ``n_200``/``n_304``/``body_bytes``
      let tests assert the bandwidth actually saved.
    """

    def __init__(self, pages: dict[str, bytes], *,
                 require_headers: dict[str, str] | None = None,
                 slow_urls: dict[str, float] | None = None,
                 etags: bool = False,
                 redirects: dict[str, str] | None = None,
                 error_urls: dict[str, int] | None = None,
                 gzip: bool = False,
                 xrobots: dict[str, str | list[str]] | None = None,
                 retry_after_urls: dict[str, tuple[int, str]] | None = None):
        self.pages = pages
        self.require_headers = dict(require_headers or {})
        self.slow_urls = dict(slow_urls or {})
        self.etags = bool(etags)
        # gzip=True: a request advertising ``Accept-Encoding: gzip``
        # gets the body compressed (Content-Encoding: gzip, mtime
        # pinned for byte-stable responses); others get identity.
        # ``n_gzip`` counts compressed responses; ``body_bytes`` counts
        # bytes actually sent on the wire either way, so tests can
        # assert the bandwidth saved.
        self.gzip = bool(gzip)
        self.n_gzip = 0
        # url -> target url; served as 301 + relative Location so the
        # client's own opener follows the hop (chains compose)
        self.redirects = dict(redirects or {})
        # url -> HTTP status to fail with (e.g. 500/503 for RFC 9309
        # unreachable-robots tests)
        self.error_urls = dict(error_urls or {})
        # url -> X-Robots-Tag header value(s); a list sends the header
        # REPEATED (the multi-header case a client must union)
        self.xrobots = dict(xrobots or {})
        # url -> (status, Retry-After header value): the request is
        # throttled with that status (429/503) + header ONCE, then the
        # url serves normally — the RFC 9110 §10.2.3 server-directed
        # backoff scenario. ``n_throttled`` counts throttle responses.
        self.retry_after_urls = dict(retry_after_urls or {})
        self.n_throttled = 0
        self.n_301 = 0
        self.n_200 = 0
        self.n_304 = 0
        self.body_bytes = 0
        # per-host concurrency observation: {host: max simultaneous
        # in-flight requests seen} — lets tests assert a client's
        # per-host connection cap over real sockets
        self.max_inflight: dict[str, int] = {}
        self._inflight: dict[str, int] = {}
        self._counter_lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self.base_url: str | None = None

    @staticmethod
    def etag_of(body: bytes) -> str:
        import hashlib

        return '"' + hashlib.md5(body).hexdigest() + '"'

    def start(self) -> str:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # keep test output quiet
                pass

            def do_GET(self):
                parsed = urlparse(self.path)
                if parsed.path != "/page":
                    self.send_error(404)
                    return
                for k, v in outer.require_headers.items():
                    if self.headers.get(k) != v:
                        self.send_error(403)
                        return
                q = parse_qs(parsed.query)
                url = q.get("url", [None])[0]
                if url is None:
                    self.send_error(400)
                    return
                from urllib.parse import urlparse as _up

                page_host = _up(url).netloc or "?"
                with outer._counter_lock:
                    cur = outer._inflight.get(page_host, 0) + 1
                    outer._inflight[page_host] = cur
                    if cur > outer.max_inflight.get(page_host, 0):
                        outer.max_inflight[page_host] = cur
                try:
                    self._serve_page(outer, url)
                finally:
                    with outer._counter_lock:
                        outer._inflight[page_host] -= 1

            def _serve_page(self, outer, url):
                delay = outer.slow_urls.get(url)
                if delay:
                    time.sleep(delay)
                code = outer.error_urls.get(url)
                if code is not None:
                    self.send_error(code)
                    return
                with outer._counter_lock:
                    throttle = outer.retry_after_urls.pop(url, None)
                    if throttle is not None:
                        outer.n_throttled += 1
                if throttle is not None:
                    t_code, t_val = throttle
                    self.send_response(t_code)
                    self.send_header("Retry-After", t_val)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                target = outer.redirects.get(url)
                if target is not None:
                    from urllib.parse import quote

                    with outer._counter_lock:
                        outer.n_301 += 1
                    self.send_response(301)
                    self.send_header(
                        "Location", "/page?url=" + quote(target, safe=""))
                    self.end_headers()
                    return
                body = outer.pages.get(url)
                if body is None:
                    self.send_error(404)
                    return
                if outer.etags:
                    tag = outer.etag_of(body)
                    if self.headers.get("If-None-Match") == tag:
                        with outer._counter_lock:
                            outer.n_304 += 1
                        self.send_response(304)
                        self.send_header("ETag", tag)
                        self.end_headers()
                        return
                wire = body
                use_gzip = (outer.gzip and "gzip" in
                            (self.headers.get("Accept-Encoding") or ""))
                if use_gzip:
                    import gzip as _gz

                    wire = _gz.compress(body, mtime=0)
                self.send_response(200)
                xr = outer.xrobots.get(url)
                if xr is not None:
                    for val in ([xr] if isinstance(xr, str) else xr):
                        self.send_header("X-Robots-Tag", val)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                if use_gzip:
                    self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(wire)))
                if outer.etags:
                    self.send_header("ETag", outer.etag_of(body))
                self.end_headers()
                self.wfile.write(wire)
                with outer._counter_lock:
                    outer.n_200 += 1
                    outer.body_bytes += len(wire)
                    if use_gzip:
                        outer.n_gzip += 1

        class _Server(ThreadingHTTPServer):
            # stdlib default listen backlog is 5: a fetch pool opening
            # 16+ connections at once overflows it, dropped SYNs
            # retransmit after ~1 s, and every chunk start pays a ~1 s
            # stall (measured: 58 urls / 16 threads = 1.2 s, 1000 urls
            # = 2.1 s — the floor, not the rate, dominated)
            request_queue_size = 256

        self._httpd = _Server(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        host, port = self._httpd.server_address[:2]
        self.base_url = f"http://{host}:{port}"
        return self.base_url

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    def __enter__(self) -> "CorpusHttpServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()


def write_server_spec(path: str, server: CorpusHttpServer) -> None:
    """Persist base_url so fetch actors in other processes can find it."""
    with open(path, "w") as f:
        json.dump({"base_url": server.base_url}, f)
