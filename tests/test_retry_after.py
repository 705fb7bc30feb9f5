"""Server-directed politeness: RFC 9110 §10.2.3 ``Retry-After`` on
429/503. Covers the header parse (integer and HTTP-date forms), the
live-socket transport surface, the driver scheduler's quota-0 deferral
(candidates re-appear after the window, never dropped), and the
distributed scheduler path (backoff_hosts in the quota stage + the
per-row retry_after_s column channel out of map_batches actors)."""

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from siren_ray.sources.localhttp import CorpusHttpServer
from siren_ray.stages.transport import HttpTransport, _parse_retry_after


# ---------------------------------------------------------------------------
# header parse (pure function, no sockets)
# ---------------------------------------------------------------------------

def test_parse_retry_after_integer_form():
    assert _parse_retry_after("120") == 120.0
    assert _parse_retry_after("0") == 0.0
    assert _parse_retry_after(" 7 ") == 7.0


def test_parse_retry_after_http_date_form():
    from email.utils import formatdate

    # a GMT HTTP-date ~60s in the future -> ~60s delay
    future = formatdate(time.time() + 60, usegmt=True)
    got = _parse_retry_after(future)
    assert got is not None and 55.0 < got < 65.0
    # a date in the past clamps to 0 (retry immediately), never negative
    past = formatdate(time.time() - 3600, usegmt=True)
    assert _parse_retry_after(past) == 0.0


def test_parse_retry_after_naive_date_is_utc():
    """RFC 9110 HTTP-dates are always GMT; a date whose zone token
    parsedate_to_datetime can't map (naive result) must be treated as
    UTC, not host-local time (ADVICE r4: a naive .timestamp() skews the
    window by the host's UTC offset)."""
    from email.utils import formatdate

    # formatdate(..., usegmt=False) emits "-0000", which
    # parsedate_to_datetime returns as a NAIVE datetime
    future = formatdate(time.time() + 60, usegmt=False)
    got = _parse_retry_after(future)
    assert got is not None and 55.0 < got < 65.0


def test_parse_retry_after_garbage():
    assert _parse_retry_after(None) is None
    assert _parse_retry_after("") is None
    assert _parse_retry_after("soon") is None
    assert _parse_retry_after("-5") is None  # not integer-form per RFC


# ---------------------------------------------------------------------------
# live-socket transport surface
# ---------------------------------------------------------------------------

def _pages(host_urls):
    return {u: f'<div class="searchcontent"></div>'.encode()
            for u in host_urls}


def test_transport_surfaces_retry_after_live():
    """fetch_many_timed returns the parsed Retry-After seconds for
    429/503 responses (integer AND HTTP-date forms), None elsewhere;
    the throttled URL is a recorded error row, never an exception."""
    from email.utils import formatdate

    u_ok = "https://h.test/search/ok"
    u_429 = "https://h.test/search/throttled"
    u_503 = "https://h.test/search/unavailable"
    pages = _pages([u_ok, u_429, u_503])
    date_form = formatdate(time.time() + 30, usegmt=True)
    with CorpusHttpServer(pages, retry_after_urls={
        u_429: (429, "9"),
        u_503: (503, date_form),
    }) as srv:
        tr = HttpTransport(srv.base_url, retries=0)
        bodies, errs, ms, ras = tr.fetch_many_timed([u_ok, u_429, u_503])
        assert errs == [None, "http_429", "http_503"]
        assert bodies[0] == pages[u_ok]
        assert bodies[1] is None and bodies[2] is None
        assert ras[0] is None
        assert ras[1] == 9.0
        assert ras[2] is not None and 25.0 < ras[2] < 35.0
        assert srv.n_throttled == 2
        # the throttle fires ONCE: a refetch serves normally
        bodies2, errs2, _, ras2 = tr.fetch_many_timed([u_429])
        assert errs2 == [None] and bodies2[0] == pages[u_429]
        assert ras2 == [None]


def test_gzip_too_large_in_timed_path():
    """Regression (ADVICE r4 high): the bounded-inflate 'too_large'
    branch returned a 5-tuple, so fetch_many_timed (which indexes
    r[0][5]) crashed with IndexError on any gzip response inflating
    past http_max_body_bytes — the live-HTTP crawl's common over-cap
    path with Accept-Encoding: gzip on by default."""
    bomb = "https://big.test/search/bomb"
    ok = "https://big.test/search/ok"
    pages = {bomb: b"y" * 300_000, ok: b"<div></div>"}
    with CorpusHttpServer(pages, gzip=True) as srv:
        tr = HttpTransport(srv.base_url, retries=0,
                           max_body_bytes=100_000)  # accept_gzip default
        bodies, errs, ms, ras = tr.fetch_many_timed([bomb, ok])
        assert bodies[0] is None and errs[0] == "too_large"
        assert ras[0] is None
        assert bodies[1] == pages[ok] and errs[1] is None
        assert srv.n_gzip >= 1  # the bomb really came compressed


def test_fetch_emit_retry_after_column(ray_session):
    """The distributed scheduler's signal channel: with
    emit_retry_after=True the FetchExtract output carries a per-row
    retry_after_s column — set on the throttled URL, null elsewhere —
    that survives the stage's hit/miss row reordering."""
    from siren_ray.stages.fetch import FetchExtract

    u_ok = "https://h.test/search/ok"
    u_429 = "https://h.test/search/throttled"
    pages = _pages([u_ok, u_429])
    with CorpusHttpServer(pages,
                          retry_after_urls={u_429: (429, "5")}) as srv:
        fx = FetchExtract(http_base=srv.base_url)
        batch = pa.table({
            "url": pa.array([u_ok, u_429], pa.string()),
            "depth": pa.array([0, 0], pa.int32()),
        })
        out = fx(batch, round_no=0, emit_retry_after=True)
    assert "retry_after_s" in out.column_names
    by = dict(zip(out["url"].to_pylist(),
                  out["retry_after_s"].to_pylist()))
    assert by[u_429] == 5.0
    assert by[u_ok] is None
    found = dict(zip(out["url"].to_pylist(), out["found"].to_pylist()))
    assert found[u_429] is False and found[u_ok] is True
    # without the flag the column is absent (corpus-mode schema parity)
    with CorpusHttpServer(pages) as srv:
        fx = FetchExtract(http_base=srv.base_url)
        out2 = fx(batch, round_no=0)
    assert "retry_after_s" not in out2.column_names


# ---------------------------------------------------------------------------
# scheduler math (no sockets)
# ---------------------------------------------------------------------------

def test_backoff_quota_zero_then_restores():
    """_merge_retry_after + _effective_quota: quota 0 inside the
    window, restored (and the entry pruned) after; longest wait wins;
    hostile headers cap at 1h."""
    from siren_ray.pipelines.frontier import CrawlConfig, _Crawl

    c = object.__new__(_Crawl)
    c.cfg = CrawlConfig(corpus_dir="/n", out_dir="/tmp/x", round_ms=1000)
    c.robots = {"slow.org": ([], 100)}
    c.host_lat_ewma = {}
    c.host_backoff_until = {}

    c._merge_retry_after([{"h.test": 60.0}, {"h.test": 5.0}])
    assert c._effective_quota("h.test") == 0
    # longest wait won: deadline ~60s out, not ~5s
    assert c.host_backoff_until["h.test"] - time.time() > 50
    # other hosts unaffected
    assert c._effective_quota("slow.org") == 10
    # hostile header caps at 1h
    c._merge_retry_after([{"evil.test": 10_000_000.0}])
    assert c.host_backoff_until["evil.test"] - time.time() <= 3600.5
    # window expiry restores the quota and prunes the entry
    c.host_backoff_until["h.test"] = time.time() - 0.01
    assert c._effective_quota("h.test") > 1 << 40
    assert "h.test" not in c.host_backoff_until
    # _active_backoff_hosts prunes expired entries the same way
    c.host_backoff_until["gone.test"] = time.time() - 0.01
    assert c._active_backoff_hosts() == frozenset({"evil.test"})
    assert "gone.test" not in c.host_backoff_until


def test_backoff_hosts_in_quota_stages(ray_session):
    """Distributed quota stages defer a backed-off host's rows
    (in_quota=False) while other hosts are untouched — both the
    default partitioned stage and the legacy per-host rank."""
    import ray.data as rd

    from siren_ray.stages.politeness import (
        host_quota_partitioned,
        host_quota_rank,
    )

    rows = pd.DataFrame({
        "url": [f"https://{h}/p{i}" for h in ("a.test", "b.test")
                for i in range(6)],
        "host": ["a.test"] * 6 + ["b.test"] * 6,
        "path": [f"/p{i}" for i in range(6)] * 2,
        "priority": [1.0] * 12,
        "depth": [1] * 12,
        "seq": [f"{i:06d}" for i in range(12)],
    })
    ds = rd.from_pandas(rows).repartition(4)
    got = host_quota_partitioned(
        ds, {}, 1000, backoff_hosts=frozenset({"a.test"})
    ).to_pandas()
    assert len(got) == 12  # deferred, never dropped
    by_host = got.groupby("host")["in_quota"].sum()
    assert by_host["a.test"] == 0
    assert by_host["b.test"] == 6
    # legacy per-host rank path
    a = host_quota_rank(rows[rows.host == "a.test"].copy(), {}, 1000,
                        backoff_hosts={"a.test"})
    assert not a["in_quota"].any() and len(a) == 6
    b = host_quota_rank(rows[rows.host == "b.test"].copy(), {}, 1000,
                        backoff_hosts={"a.test"})
    assert b["in_quota"].all()


# ---------------------------------------------------------------------------
# crawl conformance over live sockets
# ---------------------------------------------------------------------------

def _link_page(urls) -> bytes:
    body = "".join(f'<a href="{u}">x</a>' for u in urls)
    return f'<div class="searchcontent">{body}</div>'.encode()


def _mini_crawl_fixture(tmp_path):
    """Two-host link graph of 'search'-kind pages. a.test/p1 is the
    429-throttled URL; g2/g3 (children of p2/p3) are the candidates
    the backoff must defer-but-never-drop."""
    def u(host, name):
        return f"https://{host}/search/{name}"

    pages = {}
    for host, s, c, g in (("a.test", "p0", "p", "g"),
                          ("b.test", "q0", "q", "h")):
        kids = [u(host, f"{c}{k}") for k in (1, 2, 3)]
        pages[u(host, s)] = _link_page(kids)
        for k in (1, 2, 3):
            pages[u(host, f"{c}{k}")] = _link_page([u(host, f"{g}{k}")])
            pages[u(host, f"{g}{k}")] = _link_page([])
    corpus = tmp_path / "corpus"
    os.makedirs(corpus, exist_ok=True)
    seeds = pa.table({
        "url": pa.array([u("a.test", "p0"), u("b.test", "q0")]),
        "priority": pa.array([1.0, 1.0], pa.float64()),
        "seed_id": pa.array([0, 1], pa.int64()),
    })
    pq.write_table(seeds, os.path.join(corpus, "seeds.parquet"))
    robots = pa.table({
        "host": pa.array([], pa.string()),
        "disallow_prefixes": pa.array([], pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([], pa.int64()),
    })
    pq.write_table(robots, os.path.join(corpus, "robots.parquet"))
    return str(corpus), pages


def _extracted_df(out_dir):
    return pads.dataset(os.path.join(out_dir, "extracted"),
                        partitioning="hive").to_table(
        columns=["url", "found", "round"]).to_pandas()


def test_crawl_retry_after_deferral_driver(tmp_path, ray_session):
    """Driver-scheduler conformance: a 429 w/ Retry-After backs the
    host off — its later candidates DEFER through spin rounds (selected
    0, deferred > 0) and are fetched after the window, never dropped."""
    from siren_ray.pipelines.frontier import CrawlConfig, run_crawl

    corpus, pages = _mini_crawl_fixture(tmp_path)
    throttled = "https://a.test/search/p1"
    with CorpusHttpServer(
        pages, retry_after_urls={throttled: (429, "2")}
    ) as srv:
        cfg = CrawlConfig(
            corpus_dir=corpus, out_dir=str(tmp_path / "out"),
            budget_per_round=None, max_rounds=800, max_depth=6,
            scheduler="driver", fetch_mode="http",
            http_base=srv.base_url, ckpt_every=0,
        )
        res = run_crawl(cfg)
        assert srv.n_throttled == 1
    df = _extracted_df(cfg.out_dir).set_index("url")
    # the throttled fetch itself is a recorded error row (F4)
    assert df.loc[throttled, "found"] == False  # noqa: E712
    # b.test's tree finished undisturbed at rounds 0/1/2
    for name, r in (("q0", 0), ("q1", 1), ("h1", 2)):
        row = df.loc[f"https://b.test/search/{name}"]
        assert row["found"] == True and row["round"] == r  # noqa: E712
    # deferral-not-drop: g2/g3 (children of p2/p3, candidates from
    # round 2 on) were deferred past the 2s window, then fetched
    for name in ("g2", "g3"):
        row = df.loc[f"https://a.test/search/{name}"]
        assert row["found"] == True  # noqa: E712
        assert row["round"] > 2  # later than the undisturbed b.test tier
    # spin rounds existed where everything pending was deferred
    spins = [m for m in res.metrics
             if m["selected"] == 0 and m["deferred"] > 0]
    assert spins, "no deferral spin rounds recorded"
    # g1 is unreachable (its only parent p1 errored) — not a drop
    assert "https://a.test/search/g1" not in df.index


def test_crawl_retry_after_deferral_distributed(tmp_path, ray_session):
    """Distributed-scheduler conformance (ADVICE r4 medium: the backoff
    used to be driver-path-only): with a long Retry-After window the
    backed-off host's candidates sit in the FRONTIER at max_rounds —
    deferred every distributed round, never fetched, never dropped."""
    from siren_ray.pipelines.frontier import CrawlConfig, run_crawl

    corpus, pages = _mini_crawl_fixture(tmp_path)
    throttled = "https://a.test/search/p1"
    with CorpusHttpServer(
        pages, retry_after_urls={throttled: (429, "3600")}
    ) as srv:
        cfg = CrawlConfig(
            corpus_dir=corpus, out_dir=str(tmp_path / "out"),
            budget_per_round=None, max_rounds=5, max_depth=6,
            scheduler="distributed", fetch_mode="http",
            http_base=srv.base_url, fetch_concurrency=2, ckpt_every=0,
        )
        res = run_crawl(cfg)
        assert srv.n_throttled == 1
    assert all(m["scheduler"] == "distributed" for m in res.metrics)
    df = _extracted_df(cfg.out_dir).set_index("url")
    assert df.loc[throttled, "found"] == False  # noqa: E712
    # b.test's whole tree completed; a.test's g2/g3 never fetched
    assert df.loc["https://b.test/search/h3", "found"] == True  # noqa: E712
    for name in ("g2", "g3"):
        assert f"https://a.test/search/{name}" not in df.index
    # ... but they are still DEFERRED in the final frontier checkpoint
    fdir = os.path.join(cfg.out_dir, "frontier")
    last = sorted(os.listdir(fdir))[-1]
    pending = set(pads.dataset(os.path.join(fdir, last)).to_table(
        columns=["url"])["url"].to_pylist())
    assert {"https://a.test/search/g2",
            "https://a.test/search/g3"} <= pending
    # distributed rounds kept deferring them
    tail = [m for m in res.metrics if m["round"] >= 2]
    assert tail and all(m["deferred"] >= 2 for m in tail)


def test_adaptive_politeness_distributed(tmp_path, ray_session):
    """ADVICE-class gap: adaptive politeness used to be driver-path
    only. On the distributed (fused) scheduler a slow host's observed
    latency must tighten its per-round quota: with ~250 ms pages,
    round_ms=1000 and k=2 the effective quota is 1-2, so the slow
    host's 8 children spread over several rounds while the fast host
    finishes in one."""
    from siren_ray.pipelines.frontier import CrawlConfig, run_crawl

    def u(host, name):
        return f"https://{host}/search/{name}"

    pages, slow = {}, {}
    for host in ("slow.test", "fast.test"):
        kids = [u(host, f"c{k}") for k in range(8)]
        pages[u(host, "s0")] = _link_page_kids(kids)
        for k in kids:
            pages[k] = _link_page_kids([])
    for url in pages:
        if url.startswith("https://slow.test"):
            slow[url] = 0.25
    corpus = tmp_path / "corpus"
    os.makedirs(corpus, exist_ok=True)
    pq.write_table(pa.table({
        "url": pa.array([u("slow.test", "s0"), u("fast.test", "s0")]),
        "priority": pa.array([1.0, 1.0], pa.float64()),
        "seed_id": pa.array([0, 1], pa.int64()),
    }), os.path.join(corpus, "seeds.parquet"))
    pq.write_table(pa.table({
        "host": pa.array([], pa.string()),
        "disallow_prefixes": pa.array([], pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([], pa.int64()),
    }), os.path.join(corpus, "robots.parquet"))

    with CorpusHttpServer(pages, slow_urls=slow) as srv:
        cfg = CrawlConfig(
            corpus_dir=str(corpus), out_dir=str(tmp_path / "out"),
            budget_per_round=None, round_ms=1000, max_rounds=10,
            max_depth=4, scheduler="distributed", fetch_mode="http",
            http_base=srv.base_url, fetch_concurrency=2,
            adaptive_politeness=True, adaptive_k=2.0, ckpt_every=0,
        )
        res = run_crawl(cfg)
    df = _extracted_df(cfg.out_dir)
    df["host"] = df["url"].str.split("/").str[2]
    per_round = df[df["found"]].groupby(["host", "round"]).size()
    # fast host: all 8 children in round 1
    assert per_round.get(("fast.test", 1), 0) == 8
    # slow host: round-1+ selections throttled to the adaptive quota
    slow_rounds = per_round.loc["slow.test"].drop(index=0)
    assert (slow_rounds <= 2).all(), dict(slow_rounds)
    assert slow_rounds.sum() == 8  # throttled, never dropped
    assert len(slow_rounds) >= 3  # spread over several rounds
    assert res.total_errors == 0


def _link_page_kids(urls) -> bytes:
    body = "".join(f'<a href="{u}">x</a>' for u in urls)
    return f'<div class="searchcontent">{body}</div>'.encode()
