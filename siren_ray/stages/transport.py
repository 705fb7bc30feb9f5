"""Live-HTTP transport for fetch actors (F3 identity headers, F5
timeouts — reference /root/reference/siren/core/http.py:58-147).

One ``HttpTransport`` per fetch actor (T2/T5: built once in the actor's
``__init__``), holding a urllib opener, the identity headers, the
per-request timeout, and a small thread pool — fetches are network-bound,
so threads inside the actor give the same per-worker concurrency the
reference gets from asyncio, while Ray sizes the actor pool across the
cluster. Errors never raise: each URL resolves to (body | None, err
code) and the fetch stage records misses as ``found=false`` rows (F4).

The transport speaks plain HTTP GET. Against ``sources.localhttp`` the
page URL rides in a query parameter (``/page?url=...``); pointed at a
real host (``page_param=None``) it requests the URL itself — the
production seam, unchanged client code.
"""

from __future__ import annotations

import socket
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from urllib.parse import quote


def _parse_retry_after(value: str | None) -> float | None:
    """``Retry-After`` header -> seconds (RFC 9110 §10.2.3: either a
    non-negative integer delay or an HTTP-date). Unparseable -> None.
    Dates in the past clamp to 0 (retry immediately)."""
    if not value:
        return None
    v = value.strip()
    if v.isdigit():
        return float(v)
    from email.utils import parsedate_to_datetime

    try:
        dt = parsedate_to_datetime(v)
    except (TypeError, ValueError):
        return None
    import time as _time
    from datetime import timezone

    if dt.tzinfo is None:
        # RFC 9110 HTTP-dates are always GMT; parsedate_to_datetime
        # yields a naive datetime for unknown zone tokens, and a naive
        # .timestamp() would skew by the host's UTC offset.
        dt = dt.replace(tzinfo=timezone.utc)
    return max(0.0, dt.timestamp() - _time.time())


class HttpTransport:
    def __init__(self, base_url: str | None = None, *,
                 headers: dict[str, str] | None = None,
                 timeout_s: float = 5.0, retries: int = 1,
                 concurrency: int = 16, page_param: str = "url",
                 max_per_host: int | None = None,
                 accept_gzip: bool = True,
                 max_body_bytes: int | None = None):
        self.base_url = base_url.rstrip("/") if base_url else None
        self.headers = dict(headers or {})
        self.headers.setdefault("User-Agent", "siren-ray/0.3")
        # bandwidth: advertise gzip and transparently decode it — HTML
        # compresses 3-10x, so at crawl scale the wire bytes matter
        # more than the decode CPU. urllib does NOT auto-decompress, so
        # _fetch_one_raw inflates Content-Encoding: gzip bodies itself;
        # a body the server claims is gzip but isn't -> "bad_gzip"
        # error row (F4 discipline), never an exception.
        if accept_gzip:
            self.headers.setdefault("Accept-Encoding", "gzip")
        self.timeout_s = float(timeout_s)
        self.retries = max(0, int(retries))
        # response-size cap (wire bytes, pre-decompression): a crawler
        # streaming 10^10 URLs cannot let one runaway response pin a
        # worker's heap — bodies past the cap become recorded
        # "too_large" error rows (F4), the Content-Length header short-
        # circuits before any body bytes when the server declares the
        # size, and at most cap+1 bytes are ever read. None = uncapped.
        self._max_body = (int(max_body_bytes)
                          if max_body_bytes is not None else None)
        self.page_param = page_param
        self._opener = urllib.request.build_opener()
        self._pool = ThreadPoolExecutor(max_workers=max(1, concurrency))
        # socket-level politeness: at most max_per_host GETs in flight
        # against one origin regardless of pool width (round quotas
        # bound fetches per ROUND; this bounds simultaneous connections
        # — the Heritrix one-connection-per-queue discipline, relaxed
        # to N). None = uncapped.
        self._max_per_host = (int(max_per_host)
                              if max_per_host is not None else None)
        self._host_sems: dict[str, object] = {}
        self._sems_lock = None
        if self._max_per_host is not None:
            import threading

            self._sems_lock = threading.Lock()

    def _host_sem(self, url: str):
        import threading

        from ..util import host_of

        h = host_of(url)
        with self._sems_lock:
            sem = self._host_sems.get(h)
            if sem is None:
                sem = threading.Semaphore(self._max_per_host)
                self._host_sems[h] = sem
            return sem

    def _request_url(self, url: str) -> str:
        if self.base_url is None or self.page_param is None:
            return url
        return f"{self.base_url}/page?{self.page_param}={quote(url, safe='')}"

    def _page_url_of(self, request_url: str) -> str:
        """Final request URL -> the page URL it denotes (inverts
        ``_request_url``: in page_param mode the page rides in the
        query string; in direct mode they are the same thing)."""
        if self.base_url is None or self.page_param is None:
            return request_url
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(request_url).query)
        vals = q.get(self.page_param)
        return vals[0] if vals else request_url

    def _fetch_one(
        self, url: str, etag: str | None = None
    ) -> tuple[bytes | None, str | None, str | None, str | None]:
        if self._max_per_host is None:
            return self._fetch_one_raw(url, etag)
        with self._host_sem(url):
            return self._fetch_one_raw(url, etag)

    def _fetch_one_raw(
        self, url: str, etag: str | None = None
    ) -> tuple[bytes | None, str | None, str | None, str | None,
               str | None, float | None]:
        """One GET -> (body, err, etag, final_url, x_robots_tag,
        retry_after_s). With ``etag`` the request is a conditional GET
        (``If-None-Match``); a 304 comes back as
        (None, "not_modified", etag, url, None, None) — NOT an error
        family, the caller carries prior content forward. A 200
        returns the response's own ``ETag`` (None if the server sends
        none), the URL the opener LANDED on after following any
        301/302 chain — the canonical alias for URL dedup — and the
        ``X-Robots-Tag`` header value(s) (repeated headers joined with
        a newline so the parser can reset agent scope per header; None
        when absent). A 429/503 carrying ``Retry-After`` surfaces the
        parsed delay seconds in the last slot — the server-directed
        politeness signal the scheduler folds into host backoff."""
        headers = self.headers
        if etag:
            headers = dict(self.headers)
            headers["If-None-Match"] = etag
        req = urllib.request.Request(self._request_url(url),
                                     headers=headers)
        last_err = "unknown"
        for _ in range(self.retries + 1):
            try:
                with self._opener.open(req, timeout=self.timeout_s) as resp:
                    if self._max_body is not None:
                        cl = resp.headers.get("Content-Length")
                        if cl and cl.isdigit() and int(cl) > self._max_body:
                            return None, "too_large", None, None, None, None
                        body = resp.read(self._max_body + 1)
                        if len(body) > self._max_body:
                            return None, "too_large", None, None, None, None
                    else:
                        body = resp.read()
                    enc = (resp.headers.get("Content-Encoding") or "").lower()
                    if enc in ("gzip", "x-gzip"):
                        import gzip as _gz
                        import zlib as _zl

                        try:
                            if self._max_body is not None:
                                # bounded inflate: a gzip bomb must not
                                # materialize past the cap
                                z = _zl.decompressobj(wbits=31)
                                body = z.decompress(body,
                                                    self._max_body + 1)
                                if not (len(body) > self._max_body
                                        or z.unconsumed_tail):
                                    body += z.flush()
                                if (len(body) > self._max_body
                                        or z.unconsumed_tail):
                                    return (None, "too_large", None,
                                            None, None, None)
                            else:
                                body = _gz.decompress(body)
                        except (OSError, _zl.error):
                            return None, "bad_gzip", None, None, None, None
                    xr_all = resp.headers.get_all("X-Robots-Tag")
                    return (body, None, resp.headers.get("ETag"),
                            self._page_url_of(resp.geturl()),
                            "\n".join(xr_all) if xr_all else None, None)
            except urllib.error.HTTPError as e:
                if e.code == 304:
                    # revalidated: content unchanged, keep the validator
                    return None, "not_modified", (
                        e.headers.get("ETag") or etag), url, None, None
                if e.code in (429, 503):
                    # server-directed politeness (RFC 9110 §10.2.3):
                    # surface Retry-After so the scheduler can back the
                    # host off
                    ra = _parse_retry_after(e.headers.get("Retry-After"))
                    return None, f"http_{e.code}", None, None, None, ra
                # a definitive server answer: do not retry
                return None, f"http_{e.code}", None, None, None, None
            except (urllib.error.URLError, socket.timeout, TimeoutError) as e:
                reason = getattr(e, "reason", e)
                last_err = ("timeout"
                            if isinstance(reason, (socket.timeout,
                                                   TimeoutError))
                            or isinstance(e, (socket.timeout, TimeoutError))
                            else f"conn_{type(reason).__name__}")
            except OSError as e:
                last_err = f"os_{type(e).__name__}"
        return None, last_err, None, None, None, None

    def fetch_many(
        self, urls: list[str]
    ) -> tuple[list[bytes | None], list[str | None]]:
        """Order-preserving concurrent GETs; never raises."""
        results = list(self._pool.map(self._fetch_one, urls))
        return [r[0] for r in results], [r[1] for r in results]

    def fetch_many_timed(
        self, urls: list[str]
    ) -> tuple[list[bytes | None], list[str | None], list[float],
               list[float | None]]:
        """`fetch_many` + per-URL wall latency in ms (feeds adaptive
        per-host politeness: delay ~ k x observed response time) + the
        per-URL ``Retry-After`` seconds when a 429/503 carried one
        (feeds server-directed host backoff)."""
        import time

        def _timed(url):
            t0 = time.perf_counter()
            r = self._fetch_one(url)
            return r, (time.perf_counter() - t0) * 1000.0

        results = list(self._pool.map(_timed, urls))
        return ([r[0][0] for r in results],
                [r[0][1] for r in results],
                [r[1] for r in results],
                [r[0][5] for r in results])

    def fetch_many_conditional(
        self, urls: list[str], etags: list[str | None]
    ) -> tuple[list[bytes | None], list[str | None], list[str | None]]:
        """Order-preserving concurrent conditional GETs (If-None-Match
        per URL; None etag = plain GET). Returns (bodies, errs, etags):
        a revalidation hit is (None, "not_modified", <etag>); a fresh
        body is (bytes, None, <new etag>). Never raises."""
        results = list(self._pool.map(self._fetch_one, urls, etags))
        return ([r[0] for r in results],
                [r[1] for r in results],
                [r[2] for r in results])

    def fetch_many_with_meta(
        self, urls: list[str]
    ) -> tuple[list[bytes | None], list[str | None], list[str | None]]:
        """Order-preserving concurrent GETs that also surface each
        response's ``X-Robots-Tag`` header (None when absent) — the
        HTTP-level REP control that applies to non-HTML payloads a
        ``<meta>`` tag can't reach. Feed the values to
        ``stages.maincontent.parse_x_robots_tag`` and union with the
        page's robots-meta flags. Never raises."""
        results = list(self._pool.map(self._fetch_one, urls))
        return ([r[0] for r in results],
                [r[1] for r in results],
                [r[4] for r in results])

    def fetch_many_resolved(
        self, urls: list[str]
    ) -> tuple[list[bytes | None], list[str | None], list[str | None]]:
        """Order-preserving concurrent GETs that also report the FINAL
        page URL after redirect chains (None on error). A url that
        redirects a→b→c returns c's body and final_url=c — the
        canonical-alias edge (url, final_url) feeds URL dedup so alias
        families collapse to one document. Never raises; redirect
        loops surface as the opener's loop-guard error."""
        results = list(self._pool.map(self._fetch_one, urls))
        return ([r[0] for r in results],
                [r[1] for r in results],
                [r[3] for r in results])

    def close(self) -> None:
        self._pool.shutdown(wait=False)
