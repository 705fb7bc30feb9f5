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
