"""Live-HTTP fetch seam (F3 identity headers, F5 timeouts): real socket
GETs against a localhost server fronting the same Parquet pages corpus.
The invariant: fetching over HTTP is observationally identical to the
corpus join — same extracted rows, same error recording — so the crawl
engine's conformance guarantees carry over to a live deployment."""

import os

import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from siren_ray.sources.localhttp import CorpusHttpServer, load_pages_map
from siren_ray.stages.fetch import FetchExtract
from siren_ray.stages.transport import HttpTransport

UA = {"User-Agent": "siren-ray-test/1.0"}


@pytest.fixture(scope="module")
def pages(corpus_sf0001):
    return load_pages_map(os.path.join(corpus_sf0001, "pages"))


def _batch(urls):
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "depth": pa.array([0] * len(urls), pa.int32()),
    })


def test_transport_headers_required(pages):
    """Server enforces exact identity headers: right UA fetches, wrong
    UA is 403 (recorded, not raised)."""
    url = next(iter(pages))
    with CorpusHttpServer(pages, require_headers=UA) as srv:
        good = HttpTransport(srv.base_url, headers=UA)
        bodies, errs = good.fetch_many([url])
        assert bodies[0] == pages[url] and errs[0] is None
        bad = HttpTransport(srv.base_url,
                            headers={"User-Agent": "other/0.0"})
        bodies, errs = bad.fetch_many([url])
        assert bodies[0] is None and errs[0] == "http_403"


def test_transport_miss_and_timeout(pages):
    url = next(iter(pages))
    missing = "https://nowhere.example.org/404"
    with CorpusHttpServer(pages, slow_urls={url: 2.0}) as srv:
        tr = HttpTransport(srv.base_url, timeout_s=0.3, retries=0)
        bodies, errs = tr.fetch_many([missing, url])
        assert bodies[0] is None and errs[0] == "http_404"
        assert bodies[1] is None and errs[1] == "timeout"


def test_transport_gzip_negotiation(pages):
    """Content-Encoding: gzip over live sockets — bodies come back
    byte-identical while the wire carries the compressed size; a
    client that opts out gets identity and pays full bytes."""
    import gzip as _gz

    urls = sorted(pages)[:8]
    raw_total = sum(len(pages[u]) for u in urls)
    with CorpusHttpServer(pages, gzip=True) as srv:
        # generous timeout + retries=0: a retry after a under-load
        # timeout would double-count server body_bytes/n_gzip and break
        # the exact byte-ledger asserts below (seen flaky at 5s/1retry
        # during a full parallel suite run)
        tr = HttpTransport(srv.base_url, timeout_s=60, retries=0)
        bodies, errs = tr.fetch_many(urls)
        assert errs == [None] * len(urls)
        assert bodies == [pages[u] for u in urls]  # transparent decode
        assert srv.n_gzip == len(urls)
        assert srv.body_bytes < raw_total  # bandwidth actually saved
        gz_bytes = srv.body_bytes

        plain = HttpTransport(srv.base_url, accept_gzip=False,
                              timeout_s=60, retries=0)
        bodies2, errs2 = plain.fetch_many(urls)
        assert errs2 == [None] * len(urls)
        assert bodies2 == [pages[u] for u in urls]
        assert srv.n_gzip == len(urls)  # no new gzip responses
        assert srv.body_bytes == gz_bytes + raw_total
    # a server that claims gzip but sends garbage -> bad_gzip error
    # row, never an exception (F4 discipline)
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class _Lying(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            payload = b"not actually gzip"
            self.send_response(200)
            self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Lying)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        host, port = httpd.server_address[:2]
        tr = HttpTransport(f"http://{host}:{port}", retries=0)
        bodies, errs = tr.fetch_many(["https://x.example.org/a"])
        assert bodies == [None] and errs == ["bad_gzip"]
    finally:
        httpd.shutdown()
        httpd.server_close()
    assert _gz.decompress(_gz.compress(b"p", mtime=0)) == b"p"


def test_http_fetch_extract_matches_corpus_join(pages, ray_session):
    """FetchExtract(mode=http) == FetchExtract(mode=broadcast) on a
    mixed hit/miss batch: byte-identical extracted rows, identical
    error recording."""
    urls = sorted(pages)[:64] + ["https://nowhere.example.org/miss"]
    table = pa.table({
        "url": pa.array(sorted(pages), pa.string()),
        "html": pa.array([pages[u] for u in sorted(pages)], pa.binary()),
    })
    ref = FetchExtract(pages_ref=table)
    out_ref = ref(_batch(urls))
    with CorpusHttpServer(pages) as srv:
        http = FetchExtract(http_base=srv.base_url, http_headers=UA)
        out_http = http(_batch(urls))
    assert out_ref.schema == out_http.schema
    assert out_ref.equals(out_http)


def test_http_timeout_recorded_as_error_row(pages, ray_session):
    urls = sorted(pages)[:8]
    slow = urls[3]
    with CorpusHttpServer(pages, slow_urls={slow: 2.0}) as srv:
        fx = FetchExtract(http_base=srv.base_url, http_timeout_s=0.3)
        out = fx(_batch(urls))
    found = dict(zip(out["url"].to_pylist(), out["found"].to_pylist()))
    assert found[slow] is False
    assert sum(found.values()) == len(urls) - 1


def test_crawl_over_http_matches_broadcast(corpus_sf0001, pages,
                                           tmp_path, ray_session):
    """Full crawl with fetch_mode='http' (actors in other processes
    GETting a driver-hosted server) reproduces the broadcast-join crawl
    order exactly."""
    from siren_ray.pipelines.frontier import (
        CrawlConfig, read_crawl_order, run_crawl,
    )

    params = dict(budget_per_round=50, round_ms=1000, max_rounds=6,
                  max_depth=6)
    ref_cfg = CrawlConfig(
        corpus_dir=corpus_sf0001, out_dir=str(tmp_path / "ref"),
        fetch_mode="broadcast", scheduler="driver", **params,
    )
    run_crawl(ref_cfg)
    with CorpusHttpServer(pages, require_headers=UA) as srv:
        http_cfg = CrawlConfig(
            corpus_dir=corpus_sf0001, out_dir=str(tmp_path / "http"),
            fetch_mode="http", http_base=srv.base_url, http_headers=UA,
            scheduler="driver", **params,
        )
        run_crawl(http_cfg)

    def order(out_dir):
        t = read_crawl_order(out_dir)
        return list(zip(t["round"].to_pylist(), t["url"].to_pylist(),
                        t["seq"].to_pylist()))

    assert order(ref_cfg.out_dir) == order(http_cfg.out_dir)
    ref_txt = pads.dataset(os.path.join(ref_cfg.out_dir, "extracted"),
                           partitioning="hive").to_table(
        columns=["url", "text"])
    http_txt = pads.dataset(os.path.join(http_cfg.out_dir, "extracted"),
                            partitioning="hive").to_table(
        columns=["url", "text"])
    a = dict(zip(ref_txt["url"].to_pylist(), ref_txt["text"].to_pylist()))
    b = dict(zip(http_txt["url"].to_pylist(), http_txt["text"].to_pylist()))
    assert a == b


def test_conditional_get_revalidation(pages, ray_session):
    """Full ETag cycle over live sockets: cycle 1 (no validators) is
    all fresh 200s; cycle 2 with stored etags is all 304 — ZERO body
    bytes on the wire — and text carries forward byte-identically;
    after one page changes server-side, cycle 3 refetches exactly that
    page and its text reflects the new content."""
    import ray.data as rd

    from siren_ray.stages.extract import classify_url, extract_one
    from siren_ray.stages.revalidate import revalidate_dataset

    # article pages (ld+json kind): extraction yields real text, and a
    # same-kind donor body parses under any ld url
    lds = [u for u in sorted(pages) if classify_url(u) == "ld"][:25]
    urls, donor = lds[:24], lds[24]
    live = {u: pages[u] for u in urls}
    with CorpusHttpServer(live, etags=True) as srv:
        prior = rd.from_items([{"url": u} for u in urls])
        c1 = revalidate_dataset(
            prior, http_base=srv.base_url, concurrency=2).to_pandas()
        assert set(c1.status) == {"fresh"}
        assert c1.etag.notna().all()
        base_200 = srv.n_200
        assert base_200 == len(urls) and srv.n_304 == 0

        snap1 = rd.from_items([
            {"url": r.url, "etag": r.etag, "prior_text": r.text}
            for r in c1.itertuples()])
        c2 = revalidate_dataset(
            snap1, http_base=srv.base_url, concurrency=2).to_pandas()
        assert set(c2.status) == {"not_modified"}
        assert srv.n_200 == base_200  # no body was re-sent
        assert srv.n_304 == len(urls)
        m1 = c1.set_index("url").text
        m2 = c2.set_index("url").text
        assert m2.equals(m1)  # byte-identical carry-forward

        changed = urls[3]
        live[changed] = pages[donor]  # same kind, different content
        want_text = extract_one(changed, pages[donor])["text"]
        assert want_text and want_text != m1[changed]
        snap2 = rd.from_items([
            {"url": r.url, "etag": r.etag, "prior_text": r.text}
            for r in c2.itertuples()])
        c3 = revalidate_dataset(
            snap2, http_base=srv.base_url, concurrency=2).to_pandas()
        by = c3.set_index("url")
        assert by.loc[changed, "status"] == "fresh"
        assert by.loc[changed, "text"] == want_text  # re-extracted
        assert (by.drop(index=changed).status == "not_modified").all()
        assert srv.n_200 == base_200 + 1  # exactly one body refetched


def test_conditional_get_error_keeps_prior(pages):
    """A transient error during revalidation must not erase the prior
    document: status=error, prior text retained, etag retained."""
    import pyarrow as pa

    from siren_ray.stages.revalidate import RevalidateFetch

    url = sorted(pages)[0]
    with CorpusHttpServer({url: pages[url]}, etags=True) as srv:
        stage = RevalidateFetch(http_base=srv.base_url,
                                http_timeout_s=1.0, http_retries=0)
        batch = pa.table({
            "url": pa.array([url, "https://nowhere.example.org/gone"]),
            "etag": pa.array(["\"bogus\"", "\"kept\""]),
            "prior_text": pa.array(["old A", "old B"]),
        })
        out = stage(batch).to_pandas().set_index("url")
        # bogus etag mismatches -> fresh refetch
        assert out.loc[url, "status"] == "fresh"
        gone = out.loc["https://nowhere.example.org/gone"]
        assert gone.status == "error" and gone.err == "http_404"
        assert gone.text == "old B" and gone.etag == "\"kept\""


def test_redirect_resolution_collapses_aliases(pages, ray_session):
    """301 chains over live sockets: alias urls land on the canonical
    page (body served, final_url = chain end); a redirect loop is
    recorded as an error row, never a hang; dedup on final_url
    collapses the alias family to one document."""
    import ray.data as rd

    from siren_ray.stages.dedup import dedup_exact
    from siren_ray.stages.redirects import resolve_redirects

    urls = sorted(pages)[:4]
    canon, direct = urls[0], urls[1]
    a1 = "https://alias.example.org/one"
    a2 = "https://alias.example.org/two"
    loop = "https://alias.example.org/loop"
    with CorpusHttpServer(
        {u: pages[u] for u in urls},
        redirects={a1: a2, a2: canon, loop: loop},
    ) as srv:
        ds = rd.from_items([{"url": u}
                            for u in (a1, a2, canon, direct, loop)])
        out = resolve_redirects(
            ds, http_base=srv.base_url, concurrency=2,
            http_retries=0).to_pandas().set_index("url")
        assert out.loc[a1, "final_url"] == canon      # 2-hop chain
        assert out.loc[a2, "final_url"] == canon
        assert bool(out.loc[a1, "redirected"]) is True
        assert out.loc[canon, "final_url"] == canon
        assert bool(out.loc[canon, "redirected"]) is False
        assert bool(out.loc[a1, "found"]) is True
        assert not out.loc[loop, "found"] and out.loc[loop, "err"]
        assert srv.n_301 >= 3

        # alias family (a1, a2, canon) -> ONE canonical document
        resolved = rd.from_items([
            {"url": u, "final_url": f}
            for u, f in out.final_url.dropna().items()])
        kept = dedup_exact(resolved, "final_url", "url").to_pandas()
        assert (kept.final_url == canon).sum() == 1
        assert len(kept) == 2  # canon family + direct


def test_crawl_live_robots_matches_corpus(corpus_sf0001, pages, tmp_path,
                                          ray_session):
    """robots_mode='http': the crawler discovers per-host robots.txt
    over live sockets (one GET per new host, 404 = unrestricted) and
    reproduces the corpus-robots crawl exactly — order AND
    robots-skipped accounting — because render∘parse is identity on
    the politeness model."""
    import json

    import pyarrow.parquet as pq

    from siren_ray.pipelines.frontier import (
        CrawlConfig, read_crawl_order, run_crawl,
    )
    from siren_ray.stages.robotstxt import render_robots_txt

    rob = pq.read_table(
        os.path.join(corpus_sf0001, "robots.parquet")).to_pylist()
    assert rob, "corpus must carry robots entries for this test"
    pages2 = dict(pages)
    for row in rob:
        pages2[f"https://{row['host']}/robots.txt"] = render_robots_txt(
            row["disallow_prefixes"], row["crawl_delay_ms"]).encode()

    params = dict(budget_per_round=50, round_ms=1000, max_rounds=5,
                  max_depth=6, scheduler="driver", fetch_mode="http")

    def metrics(out_dir):
        with open(os.path.join(out_dir, "metrics.jsonl")) as f:
            return [json.loads(line) for line in f]

    with CorpusHttpServer(pages2) as srv:
        ref_out = str(tmp_path / "ref")
        run_crawl(CrawlConfig(
            corpus_dir=corpus_sf0001, out_dir=ref_out,
            http_base=srv.base_url, robots_mode="corpus", **params))
        got_out = str(tmp_path / "live")
        run_crawl(CrawlConfig(
            corpus_dir=corpus_sf0001, out_dir=got_out,
            http_base=srv.base_url, robots_mode="http", **params))
        # the distributed scheduler takes a different robots path
        # (host-partial collection off materialized candidates)
        dist_out = str(tmp_path / "live_dist")
        dist_params = dict(params, scheduler="distributed")
        run_crawl(CrawlConfig(
            corpus_dir=corpus_sf0001, out_dir=dist_out,
            http_base=srv.base_url, robots_mode="http", **dist_params))

    def order(d):
        t = read_crawl_order(d)
        return list(zip(t["round"].to_pylist(), t["url"].to_pylist(),
                        t["seq"].to_pylist()))

    assert order(got_out) == order(ref_out)
    assert order(dist_out) == order(ref_out)
    ref_m, got_m = metrics(ref_out), metrics(got_out)
    assert [m.get("robots_skipped") for m in got_m] == \
        [m.get("robots_skipped") for m in ref_m]
    # robots genuinely bit during the run (not a vacuous pass)
    assert sum(m.get("robots_skipped") or 0 for m in ref_m) > 0


def test_adaptive_politeness_throttles_slow_host(corpus_sf0001, pages,
                                                 tmp_path, ray_session):
    """Heritrix-style adaptive politeness: with adaptive_politeness=True
    a host whose responses are slow (40 ms artificial latency) gets its
    per-round quota tightened to ~round_ms / (k x observed EWMA) after
    the first round that measures it; the same crawl without the flag
    fetches the host at full budget."""
    from siren_ray.pipelines.frontier import (
        CrawlConfig, read_crawl_order, run_crawl,
    )
    from siren_ray.util import host_of

    params = dict(budget_per_round=250, round_ms=1000, max_rounds=4,
                  max_depth=6, fetch_mode="http", http_headers=UA,
                  scheduler="driver")

    def per_round_counts(out_dir, host):
        t = read_crawl_order(out_dir)
        counts = {}
        for r, u in zip(t["round"].to_pylist(), t["url"].to_pylist()):
            if host_of(u) == host:
                counts[r] = counts.get(r, 0) + 1
        return counts

    # pick the busiest host of an unthrottled crawl as the slow one
    with CorpusHttpServer(pages, require_headers=UA) as srv:
        base_cfg = CrawlConfig(
            corpus_dir=corpus_sf0001, out_dir=str(tmp_path / "base"),
            http_base=srv.base_url, **params)
        run_crawl(base_cfg)
    t = read_crawl_order(base_cfg.out_dir)
    by_host = {}
    for u in t["url"].to_pylist():
        by_host[host_of(u)] = by_host.get(host_of(u), 0) + 1
    slow_host = max(by_host, key=by_host.get)
    base_counts = per_round_counts(base_cfg.out_dir, slow_host)
    assert max(base_counts.values()) > 15  # meaningful baseline volume

    slow = {u: 0.06 for u in pages if host_of(u) == slow_host}
    with CorpusHttpServer(pages, require_headers=UA,
                          slow_urls=slow) as srv:
        ad_cfg = CrawlConfig(
            corpus_dir=corpus_sf0001, out_dir=str(tmp_path / "adaptive"),
            http_base=srv.base_url, adaptive_politeness=True,
            adaptive_k=2.0, **params)
        run_crawl(ad_cfg)
    ad_counts = per_round_counts(ad_cfg.out_dir, slow_host)
    # rounds AFTER the first latency observation are quota-limited:
    # quota <= round_ms / (k * 60ms) = 8; allow headroom to 11 so an
    # unusually fast window (EWMA ~ the raw sleep) cannot flake the test
    later = {r: c for r, c in ad_counts.items() if r >= 2}
    assert later, f"slow host never reappeared: {ad_counts}"
    assert max(later.values()) <= 11, (ad_counts, base_counts)
    # and the slow host still makes progress each round it appears
    assert min(later.values()) >= 1
    # other hosts are untouched: the adaptive crawl keeps fetching far
    # beyond the slow host's tightened quota in the same rounds
    tt = read_crawl_order(ad_cfg.out_dir)
    rounds = {}
    for r in tt["round"].to_pylist():
        rounds[r] = rounds.get(r, 0) + 1
    assert max(rounds[r] for r in later) > 3 * max(later.values())


def test_per_host_connection_cap(pages):
    """Socket-level politeness: with max_per_host=2 the server never
    observes more than 2 simultaneous in-flight requests for one host,
    even though the transport pool is 16 wide — and an uncapped
    transport on the same workload does exceed 2 (the cap, not the
    pool, is what binds)."""
    from siren_ray.util import host_of

    by_host = {}
    for u in pages:
        by_host.setdefault(host_of(u), []).append(u)
    host, urls = max(by_host.items(), key=lambda kv: len(kv[1]))
    urls = sorted(urls)[:24]
    slow = {u: 0.05 for u in urls}  # hold sockets open long enough

    with CorpusHttpServer(pages, slow_urls=slow) as srv:
        un = HttpTransport(srv.base_url, concurrency=16)
        bodies, errs = un.fetch_many(urls)
        assert all(e is None for e in errs)
        uncapped_peak = srv.max_inflight[host]

    with CorpusHttpServer(pages, slow_urls=slow) as srv:
        capped = HttpTransport(srv.base_url, concurrency=16,
                               max_per_host=2)
        bodies, errs = capped.fetch_many(urls)
        assert all(e is None for e in errs)
        assert bodies == [pages[u] for u in urls]
        assert srv.max_inflight[host] <= 2
    assert uncapped_peak > 2


def test_per_host_cap_does_not_serialize_across_hosts(pages):
    """The cap is per host: two hosts fetch concurrently even at
    max_per_host=1 (total wall ~max of the two hosts, not the sum)."""
    import time as _t

    from siren_ray.util import host_of

    by_host = {}
    for u in pages:
        by_host.setdefault(host_of(u), []).append(u)
    picks = sorted(by_host, key=lambda h: -len(by_host[h]))[:2]
    urls = sorted(by_host[picks[0]])[:4] + sorted(by_host[picks[1]])[:4]
    slow = {u: 0.1 for u in urls}
    with CorpusHttpServer(pages, slow_urls=slow) as srv:
        tr = HttpTransport(srv.base_url, concurrency=16, max_per_host=1)
        t0 = _t.perf_counter()
        _, errs = tr.fetch_many(urls)
        wall = _t.perf_counter() - t0
        assert all(e is None for e in errs)
        assert srv.max_inflight[picks[0]] <= 1
        assert srv.max_inflight[picks[1]] <= 1
    # serialized-per-host lower bound is 4*0.1 per host; fully serial
    # across BOTH hosts would be >=0.8 — concurrent hosts stay under
    assert 0.4 <= wall < 0.75


def test_x_robots_tag_over_live_sockets(pages):
    """X-Robots-Tag surfaces through the transport: a single header, a
    REPEATED header (values newline-joined so scope resets per header),
    and no header (None) — parsed flags union correctly."""
    from siren_ray.stages.maincontent import parse_x_robots_tag

    urls = sorted(pages)[:3]
    xr = {urls[0]: "noindex, nofollow",
          urls[1]: ["otherbot: noindex", "noarchive"]}
    with CorpusHttpServer(pages, xrobots=xr) as srv:
        tr = HttpTransport(srv.base_url, retries=0)
        bodies, errs, tags = tr.fetch_many_with_meta(urls)
        assert all(e is None for e in errs)
        assert [b == pages[u] for b, u in zip(bodies, urls)] == [True] * 3
        assert tags[0] == "noindex, nofollow"
        assert tags[1] == "otherbot: noindex\nnoarchive"
        assert tags[2] is None
    f0 = parse_x_robots_tag(tags[0])
    assert f0["noindex"] and f0["nofollow"] and not f0["noarchive"]
    # the second header's unscoped noarchive applies; otherbot's
    # noindex does NOT leak across the header boundary
    f1 = parse_x_robots_tag(tags[1])
    assert f1 == {"noindex": False, "nofollow": False,
                  "noarchive": True, "nosnippet": False}
    assert parse_x_robots_tag(tags[1], agent="otherbot")["noindex"]
    assert not any(parse_x_robots_tag(tags[2]).values())


def test_max_body_bytes_cap(pages):
    """Response-size cap: an over-cap body (declared via
    Content-Length) becomes a recorded `too_large` error row, an
    under-cap body passes byte-identical, and a gzip response whose
    INFLATED size exceeds the cap is rejected by the bounded inflate
    (decompression-bomb guard) even though its wire size is tiny."""
    big_url = "https://big.example.org/huge"
    bomb_url = "https://big.example.org/bomb"
    small = sorted(pages)[0]
    served = dict(pages)
    served[big_url] = b"x" * 300_000
    served[bomb_url] = b"y" * 300_000  # ~300x compressible
    with CorpusHttpServer(served) as srv:
        tr = HttpTransport(srv.base_url, retries=0,
                           max_body_bytes=100_000, accept_gzip=False)
        bodies, errs = tr.fetch_many([big_url, small])
        assert bodies[0] is None and errs[0] == "too_large"
        assert bodies[1] == pages[small] and errs[1] is None
    with CorpusHttpServer(served, gzip=True) as srv:
        tr = HttpTransport(srv.base_url, retries=0,
                           max_body_bytes=100_000)
        bodies, errs = tr.fetch_many([bomb_url, small])
        assert bodies[0] is None and errs[0] == "too_large"
        assert bodies[1] == pages[small] and errs[1] is None
        assert srv.n_gzip >= 1  # the bomb really came compressed
