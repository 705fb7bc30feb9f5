"""Crawl-engine conformance vs the single-threaded simulator:
same crawl order, same URL-seen set, byte-identical extracted text
(BASELINE.md correctness invariant; SURVEY.md §5c)."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from siren_ray.pipelines.frontier import (
    CrawlConfig,
    read_crawl_order,
    run_crawl,
)
from siren_ray.pipelines.simulator import simulate_crawl
from siren_ray.util import hash_strings


PARAMS = dict(budget_per_round=50, round_ms=1000, max_rounds=12, max_depth=6)


@pytest.fixture(scope="module")
def sim(corpus_sf0001):
    return simulate_crawl(corpus_sf0001, **PARAMS)


@pytest.fixture(scope="module")
def engine(corpus_sf0001, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl"))
    cfg = CrawlConfig(
        corpus_dir=corpus_sf0001,
        out_dir=out,
        fetch_mode="broadcast",
        scheduler="driver",
        **PARAMS,
    )
    return run_crawl(cfg)


def _engine_order(engine):
    t = read_crawl_order(engine.out_dir)
    return list(
        zip(t["round"].to_pylist(), t["url"].to_pylist(), t["seq"].to_pylist())
    )


def test_crawl_order_matches_simulator(engine, sim):
    sim_order = [(r, url, seq) for (r, _rank, url, _p, seq, _f) in sim.crawl_order]
    assert _engine_order(engine) == sim_order


def test_seen_set_matches_simulator(engine, sim, corpus_sf0001):
    # engine seen checkpoint = shard fingerprints of the marker's round dir
    ckpt_root = os.path.join(engine.out_dir, "seen_ckpt")
    with open(os.path.join(ckpt_root, "ROUND")) as f:
        seen_dir = os.path.join(ckpt_root, f"r{int(f.read()):05d}")
    parts = [
        pads.dataset(os.path.join(seen_dir, f)).to_table()["fingerprint"].to_numpy()
        for f in sorted(os.listdir(seen_dir))
        if f.endswith(".parquet")
    ]
    engine_seen = set(np.concatenate(parts).tolist())
    assert engine_seen == {h & 0xFFFFFFFFFFFFFFFF for h in sim.seen_hashes}


def test_extracted_text_byte_identical_to_golden(engine, corpus_sf0001):
    ext = pads.dataset(
        os.path.join(engine.out_dir, "extracted"), partitioning="hive"
    ).to_table(columns=["url", "text", "found", "parse_ok"])
    golden = pads.dataset(
        os.path.join(corpus_sf0001, "pages"), partitioning="hive"
    ).to_table(columns=["url", "text"])
    gold = dict(zip(golden["url"].to_pylist(), golden["text"].to_pylist()))
    n_checked = 0
    for url, text, found, ok in zip(
        ext["url"].to_pylist(),
        ext["text"].to_pylist(),
        ext["found"].to_pylist(),
        ext["parse_ok"].to_pylist(),
    ):
        if found and ok:
            assert text == gold[url], url
            n_checked += 1
    assert n_checked > 100


def test_errors_and_robots_recorded(engine, sim):
    assert engine.total_errors == len(sim.errors)
    total_robots = sum(m["robots_skipped"] for m in engine.metrics)
    assert total_robots == len(sim.robots_skipped)


def test_metrics_lineage_complete(engine):
    assert len(engine.metrics) == engine.rounds
    for m in engine.metrics:
        assert m["selected"] <= 50  # politeness budget honored
        assert m["seen_size"] >= m["selected"]


def test_work_stealing_order_invariant(corpus_sf0001, tmp_path_factory,
                                       sim):
    """Chunk-to-actor reassignment (work_stealing=True) must not change
    crawl order or the fetched set: order is (priority, seq)-derived,
    results are indexed by chunk, never by actor."""
    out = str(tmp_path_factory.mktemp("crawl_steal"))
    cfg = CrawlConfig(
        corpus_dir=corpus_sf0001, out_dir=out, fetch_mode="bucketed",
        budget_per_round=50, round_ms=1000, max_rounds=12, max_depth=6,
        fetch_concurrency=4, fetch_batch_size=16, work_stealing=True,
    )
    run_crawl(cfg)
    t = read_crawl_order(out)
    got = list(
        zip(t["round"].to_pylist(), t["url"].to_pylist(), t["seq"].to_pylist())
    )
    sim_order = [(r, url, seq) for (r, _rank, url, _p, seq, _f) in sim.crawl_order]
    assert got == sim_order


def test_resume_from_checkpoint(corpus_sf0001, tmp_path_factory, sim):
    """Run 3 rounds, then resume to completion -> same crawl order."""
    out = str(tmp_path_factory.mktemp("crawl_resume"))
    cfg1 = CrawlConfig(
        corpus_dir=corpus_sf0001, out_dir=out, fetch_mode="broadcast",
        budget_per_round=50, round_ms=1000, max_rounds=3, max_depth=6,
    )
    res1 = run_crawl(cfg1)
    assert res1.rounds == 3
    cfg2 = CrawlConfig(
        corpus_dir=corpus_sf0001, out_dir=out, fetch_mode="broadcast",
        budget_per_round=50, round_ms=1000, max_rounds=12, max_depth=6,
        resume=True,
    )
    res2 = run_crawl(cfg2)
    t = read_crawl_order(out)
    got = list(
        zip(t["round"].to_pylist(), t["url"].to_pylist(), t["seq"].to_pylist())
    )
    sim_order = [(r, url, seq) for (r, _rank, url, _p, seq, _f) in sim.crawl_order]
    assert got == sim_order


def test_resume_clears_interrupted_round_parts(corpus_sf0001,
                                               tmp_path_factory, sim):
    """A crash mid-round leaves partial parquet parts in the round's
    extracted/ and next-frontier dirs (Ray writes UUID part names and
    never overwrites). Resume must clear them, or counts and crawl order
    are corrupted by stale + re-run rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("crawl_crashmid"))
    base = dict(corpus_dir=corpus_sf0001, out_dir=out,
                fetch_mode="broadcast", budget_per_round=50, round_ms=1000,
                max_depth=6, scheduler="distributed")
    run_crawl(CrawlConfig(max_rounds=3, **base))
    junk = pa.table({"url": ["https://stale.example/x"], "priority": [9.9],
                     "seq": ["zzz"], "round": [3], "found": [True]})
    for d in (os.path.join(out, "extracted", "r00003"),
              os.path.join(out, "frontier", "r00004")):
        os.makedirs(d, exist_ok=True)
        pq.write_table(junk, os.path.join(d, "stale-uuid-part.parquet"))
    run_crawl(CrawlConfig(max_rounds=12, resume=True, **base))
    t = read_crawl_order(out)
    got = list(
        zip(t["round"].to_pylist(), t["url"].to_pylist(), t["seq"].to_pylist())
    )
    sim_order = [(r, url, seq) for (r, _rank, url, _p, seq, _f) in sim.crawl_order]
    assert got == sim_order
    assert "https://stale.example/x" not in {u for _, u, _s in got}


def test_bucketed_fetch_same_order(corpus_sf0001, tmp_path_factory, sim):
    out = str(tmp_path_factory.mktemp("crawl_bucketed"))
    cfg = CrawlConfig(
        corpus_dir=corpus_sf0001, out_dir=out, fetch_mode="bucketed",
        scheduler="driver", **PARAMS,
    )
    engine = run_crawl(cfg)
    sim_order = [(r, url, seq) for (r, _rank, url, _p, seq, _f) in sim.crawl_order]
    assert _engine_order(engine) == sim_order


def test_distributed_salted_matches_simulator(
    corpus_sf0001, tmp_path_factory, sim
):
    """Salted host-quota shuffle must not change scheduling decisions."""
    out = str(tmp_path_factory.mktemp("crawl_salted"))
    cfg = CrawlConfig(
        corpus_dir=corpus_sf0001, out_dir=out, fetch_mode="broadcast",
        scheduler="distributed", budget_per_round=50, round_ms=1000,
        max_rounds=3, max_depth=6, salt_hosts=4,
    )
    engine = run_crawl(cfg)
    sim_order = [
        (r, url, seq)
        for (r, _rank, url, _p, seq, _f) in sim.crawl_order
        if r < 3
    ]
    assert _engine_order(engine) == sim_order


def test_distributed_scheduler_matches_simulator(
    corpus_sf0001, tmp_path_factory, sim
):
    """The fully-distributed scheduling path (url/host shuffles,
    sort+limit budget) must equal the driver path and the simulator.
    Shorter run: distributed rounds carry fixed Ray-execution overhead."""
    out = str(tmp_path_factory.mktemp("crawl_dist"))
    cfg = CrawlConfig(
        corpus_dir=corpus_sf0001, out_dir=out, fetch_mode="broadcast",
        scheduler="distributed", budget_per_round=50, round_ms=1000,
        max_rounds=4, max_depth=6,
    )
    engine = run_crawl(cfg)
    sim_order = [
        (r, url, seq)
        for (r, _rank, url, _p, seq, _f) in sim.crawl_order
        if r < 4
    ]
    assert _engine_order(engine) == sim_order


def test_fused_open_budget_matches_driver(corpus_sf0001,
                                          tmp_path_factory):
    """budget_per_round=None routes the distributed scheduler through
    the FUSED round (quota output streams straight into the fetch
    execution; seen-marking, counters, link explode and the
    next-frontier write all ride one materialized output). It must
    equal the driver scheduler row-for-row — crawl order, extracted
    text, and every per-round counter."""
    import pyarrow.dataset as pads

    outs, orders, mets = {}, {}, {}
    for sched in ("driver", "distributed"):
        out = str(tmp_path_factory.mktemp(f"crawl_fused_{sched}"))
        outs[sched] = out
        res = run_crawl(CrawlConfig(
            corpus_dir=corpus_sf0001, out_dir=out,
            budget_per_round=None, round_ms=1000, max_rounds=4,
            max_depth=6, fetch_mode="broadcast", scheduler=sched,
            fetch_concurrency=2, ckpt_every=0,
        ))
        t = read_crawl_order(out)
        orders[sched] = list(zip(t["round"].to_pylist(),
                                 t["url"].to_pylist(),
                                 t["seq"].to_pylist(),
                                 t["found"].to_pylist()))
        mets[sched] = [
            (m["round"], m["candidates"], m["robots_skipped"],
             m["selected"], m["deferred"], m["fetch_errors"],
             m["parse_ok"], m["next_frontier"]) for m in res.metrics]
    assert orders["driver"] == orders["distributed"]
    assert mets["driver"] == mets["distributed"]
    texts = {}
    for sched, out in outs.items():
        t = pads.dataset(os.path.join(out, "extracted")).to_table(
            columns=["url", "text"])
        texts[sched] = dict(zip(t["url"].to_pylist(),
                                t["text"].to_pylist()))
    assert texts["driver"] == texts["distributed"]


def test_hash_determinism():
    a = hash_strings(["https://x/1", "https://x/2"])
    b = hash_strings(["https://x/1", "https://x/2"])
    assert (a == b).all() and a.dtype == np.uint64


def test_crawl_survives_actor_kill(ray_session, tmp_path):
    """Killing a fetch actor between rounds must not change the crawl:
    the actor restarts (max_restarts), rebuilds its derived state, and
    the run stays conformant with an undisturbed run."""
    import ray

    from siren_ray.corpus import ensure_corpus
    from siren_ray.pipelines.frontier import (CrawlConfig, _Crawl,
                                              read_crawl_order)

    corpus = ensure_corpus(0.001)

    def run(out_dir, kill: bool):
        cfg = CrawlConfig(corpus_dir=corpus, out_dir=str(out_dir),
                          budget_per_round=50, max_rounds=6,
                          scheduler="driver", fetch_concurrency=2)
        eng = _Crawl(cfg)
        if kill:
            pool = eng._fetch_pool()
            # warm it so the kill hits a live process, then kill hard
            ray.get(pool[0].__ray_ready__.remote())
            ray.kill(pool[0], no_restart=False)
        res = eng.run()
        return res, read_crawl_order(str(out_dir))

    res_a, order_a = run(tmp_path / "a", kill=False)
    res_b, order_b = run(tmp_path / "b", kill=True)
    assert res_a.total_fetched == res_b.total_fetched
    assert res_a.seen_size == res_b.seen_size
    assert order_a.equals(order_b)


# --- crawler-trap filtering (CrawlConfig.trap_filter) ---------------------

def test_explode_links_trap_filter_drops_trap_children():
    import pyarrow as pa

    from siren_ray.pipelines.frontier import _explode_links

    batch = pa.table({
        "url": ["https://h.example.org/page"],
        "depth": pa.array([0], pa.int32()),
        "priority": pa.array([1.0], pa.float64()),
        "seq": ["000001"],
        "links": [[
            "https://h.example.org/ok/one",
            "https://h.example.org/a/b/a/b/a/b/loop",      # segment trap
            "https://h.example.org/x?a=1&b=2&c=3&d=4&e=5&f=6&g=7",
            "https://h.example.org/ok/two",
        ]],
    })
    out = _explode_links(batch, decay=0.5, max_depth=8, trap_filter=True)
    urls = out["url"].to_pylist()
    assert urls == ["https://h.example.org/ok/one",
                    "https://h.example.org/ok/two"]
    # seq assignment is computed BEFORE the trap drop, so surviving
    # children keep their original link indices (determinism contract)
    assert out["seq"].to_pylist() == ["00000100000", "00000100003"]
    # off by default: nothing dropped
    off = _explode_links(batch, decay=0.5, max_depth=8)
    assert off.num_rows == 4


def test_crawl_trap_filter_invariant_on_clean_corpus(
        corpus_sf0001, tmp_path_factory, sim):
    """The synthetic corpus has no trap URLs, so trap_filter=True must
    leave the crawl byte-identical to the simulator (same invariance
    contract as canonicalize on a canonical corpus)."""
    out = str(tmp_path_factory.mktemp("crawl_trap"))
    run_crawl(CrawlConfig(
        corpus_dir=corpus_sf0001, out_dir=out, fetch_mode="broadcast",
        scheduler="driver", trap_filter=True, **PARAMS,
    ))
    t = read_crawl_order(out)
    eng = list(zip(t["round"].to_pylist(), t["url"].to_pylist(),
                   t["seq"].to_pylist()))
    sim_order = [(r, url, seq) for (r, _rk, url, _p, seq, _f)
                 in sim.crawl_order]
    assert eng == sim_order


def test_bucket_assignment_cache_discipline():
    """_make_chunks invariants that keep per-actor LRU bucket caches
    warm (the cold-re-read forensics fix): (1) no actor is handed more
    distinct buckets in one round than its cache capacity — an
    over-capacity round thrashes 100% every later round; (2) buckets
    whose round carries less than one full chunk of rows never change
    owner — a move costs the new owner a cold bucket read the tiny
    balance gain can't repay; (3) the assignment is deterministic."""
    import pyarrow as pa
    from types import SimpleNamespace

    from siren_ray.pipelines.frontier import CrawlConfig, _Crawl

    cfg = CrawlConfig(
        corpus_dir="/nonexistent", out_dir="/nonexistent",
        fetch_mode="bucketed", fetch_batch_size=64, num_buckets=32,
        cache_buckets=3,
    )
    pool = 4
    owned = -(-cfg.num_buckets // pool) + 1  # engine's sizing rule
    cap = max(cfg.cache_buckets, owned)

    def fake():
        return SimpleNamespace(
            cfg=cfg, _bucket_owner={}, _cache_cap=cap)

    def actor_buckets(chunks):
        per = {}
        for tbl, a in chunks:
            bs = (hash_strings(tbl["url"].to_pylist())
                  % cfg.num_buckets).astype(int)
            per.setdefault(a, set()).update(bs.tolist())
        return per

    # bulk round: skewed row counts (one hot bucket) over many urls
    urls = [f"http://h{i % cfg.num_buckets}.ex/p{i}" for i in range(4000)]
    sel = pa.table({"url": urls})
    st = fake()
    chunks = _Crawl._make_chunks(st, sel, pool)
    # exactly-once coverage
    got = sorted(u for tbl, _ in chunks for u in tbl["url"].to_pylist())
    assert got == sorted(urls)
    per = actor_buckets(chunks)
    assert all(len(bs) <= cap for bs in per.values()), per
    owners_bulk = dict(st._bucket_owner)

    # tail round: a handful of rows per bucket -> ownership frozen
    tail = pa.table({"url": urls[:: 97]})  # ~41 rows spread over buckets
    chunks2 = _Crawl._make_chunks(st, tail, pool)
    assert st._owner_moves == 0
    for b, a in st._bucket_owner.items():
        if b in owners_bulk:
            assert a == owners_bulk[b], (b, a, owners_bulk[b])
    per2 = actor_buckets(chunks2)
    assert all(len(bs) <= cap for bs in per2.values())

    # determinism: a fresh state reproduces the bulk assignment exactly
    st3 = fake()
    chunks3 = _Crawl._make_chunks(st3, sel, pool)
    assert st3._bucket_owner == owners_bulk
    assert [(a, t["url"].to_pylist()) for t, a in chunks3] == [
        (a, t["url"].to_pylist()) for t, a in chunks]


def test_fetch_or_pass_task_passthrough_alignment(corpus_sf0001,
                                                  ray_session):
    """The fused round's passthrough: deferred/robots-bad rows ride the
    fetch stage null-aligned — schema matches the fetched rows, the
    _state tag survives, FRONTIER_COLS stay intact, and an all-deferred
    batch works."""
    import pyarrow as pa

    from siren_ray.stages.fetch import broadcast_pages, fetch_or_pass_task
    from siren_ray.util import hosts_of, paths_of

    import pyarrow.dataset as pads

    pages_dir = os.path.join(corpus_sf0001, "pages")
    t = pads.dataset(pages_dir, partitioning="hive").to_table(
        columns=["url"])
    urls = t["url"].to_pylist()[:6]
    states = ["f", "d", "f", "b", "d", "f"]

    def _batch(urls, states):
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts_of(urls), pa.string()),
            "path": pa.array(paths_of(urls), pa.string()),
            "priority": pa.array([1.0] * len(urls), pa.float64()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "seq": pa.array([f"{i:06d}" for i in range(len(urls))],
                            pa.string()),
            "_state": pa.array(states, pa.string()),
        })

    ref = broadcast_pages(pages_dir)
    out = fetch_or_pass_task(_batch(urls, states), round_no=3,
                             pages_ref=ref)
    assert out.num_rows == 6
    by = {u: s for u, s in zip(out["url"].to_pylist(),
                               out["_state"].to_pylist())}
    assert by == dict(zip(urls, states))
    df = out.to_pandas().set_index("url")
    for u, s in zip(urls, states):
        if s == "f":
            assert df.loc[u, "found"] == True  # noqa: E712
            assert df.loc[u, "round"] == 3
        else:
            import pandas as pd

            assert pd.isna(df.loc[u, "text"])  # null-aligned extract cols
            # frontier cols intact for the deferred union
            assert df.loc[u, "seq"] is not None
    # all-passthrough batch: no fetch rows at all
    out2 = fetch_or_pass_task(_batch(urls[:2], ["d", "b"]), round_no=3,
                              pages_ref=ref)
    assert out2.num_rows == 2
    assert set(out2["_state"].to_pylist()) == {"d", "b"}
    assert out2.schema.names == out.schema.names


def test_fused_resume_clears_interrupted_round_parts(corpus_sf0001,
                                                     tmp_path_factory):
    """The fused open-budget round writes extracted AND next-frontier
    parts incrementally inside one execution; a crash mid-round leaves
    partial parts in BOTH dirs. Resume must clear them (both dirs are
    rm-tree'd at round start) so re-run rounds can't mix stale rows
    with fresh ones."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ref_out = str(tmp_path_factory.mktemp("fused_resume_ref"))
    base = dict(corpus_dir=corpus_sf0001, fetch_mode="broadcast",
                budget_per_round=None, round_ms=1000, max_depth=6,
                scheduler="distributed", ckpt_every=1)
    run_crawl(CrawlConfig(out_dir=ref_out, max_rounds=6, **base))
    want = read_crawl_order(ref_out)
    want_rows = list(zip(want["round"].to_pylist(),
                         want["url"].to_pylist(),
                         want["seq"].to_pylist()))

    out = str(tmp_path_factory.mktemp("fused_resume"))
    run_crawl(CrawlConfig(out_dir=out, max_rounds=3, **base))
    junk = pa.table({"url": ["https://stale.example/x"], "priority": [9.9],
                     "seq": ["zzz"], "round": [3], "found": [True]})
    for d in (os.path.join(out, "extracted", "r00003"),
              os.path.join(out, "frontier", "r00004")):
        os.makedirs(d, exist_ok=True)
        pq.write_table(junk, os.path.join(d, "stale-uuid-part.parquet"))
    run_crawl(CrawlConfig(out_dir=out, max_rounds=6, resume=True, **base))
    got = read_crawl_order(out)
    got_rows = list(zip(got["round"].to_pylist(),
                        got["url"].to_pylist(),
                        got["seq"].to_pylist()))
    assert got_rows == want_rows
    assert "https://stale.example/x" not in {u for _, u, _s in got_rows}


def test_auto_scheduler_mixed_rounds_match_driver(corpus_sf0001,
                                                  tmp_path_factory):
    """scheduler='auto' with a small driver_threshold alternates
    driver and distributed rounds within ONE crawl. This exercises the
    seen-set facade's cross-path ordering: a driver round's async adds
    must be fenced before a distributed round's direct shard reads,
    and a later driver round's contains must see distributed rounds'
    direct writes (mark_external_writes). The mixed run must equal a
    pure driver run row-for-row."""
    outs, orders = {}, {}
    for label, kw in (
        ("driver", dict(scheduler="driver")),
        ("mixed", dict(scheduler="auto", driver_threshold=300)),
    ):
        out = str(tmp_path_factory.mktemp(f"crawl_mixed_{label}"))
        outs[label] = out
        res = run_crawl(CrawlConfig(
            corpus_dir=corpus_sf0001, out_dir=out,
            budget_per_round=None, round_ms=1000, max_rounds=5,
            max_depth=6, fetch_mode="broadcast", fetch_concurrency=2,
            ckpt_every=0, **kw,
        ))
        if label == "mixed":
            scheds = [m["scheduler"] for m in res.metrics]
            assert "driver" in scheds and "distributed" in scheds, scheds
        t = read_crawl_order(out)
        orders[label] = list(zip(t["round"].to_pylist(),
                                 t["url"].to_pylist(),
                                 t["seq"].to_pylist(),
                                 t["found"].to_pylist()))
    assert orders["driver"] == orders["mixed"]
