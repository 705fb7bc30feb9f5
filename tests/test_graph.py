"""Distributed PageRank vs a dense numpy reference."""

import numpy as np
import pandas as pd
import pytest


def _reference_pagerank(n, edges, d=0.85, iters=200):
    """Dense power iteration with dangling redistribution."""
    outdeg = np.zeros(n)
    for s, _t in edges:
        outdeg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.full(n, (1.0 - d) / n)
        new += d * r[outdeg == 0].sum() / n
        for s, t in edges:
            new[t] += d * r[s] / outdeg[s]
        r = new
    return r


def _run(edges, n, ray_session, **kw):
    import ray.data as rd

    import pyarrow as pa

    from siren_ray.stages.graph import pagerank

    edf = pd.DataFrame({"src": [e[0] for e in edges],
                        "dst": [e[1] for e in edges]})
    eds = rd.from_pandas(edf.astype("int64")).repartition(4)
    nds = rd.from_arrow(pa.table({"id": pa.array(range(n), pa.int64())}))
    out = pagerank(eds, nds.repartition(2), **kw).to_pandas()
    return out.sort_values("id")["rank"].to_numpy()


def test_pagerank_matches_dense_reference(ray_session):
    import warnings

    rng = np.random.RandomState(21)
    n = 120
    edges = list({(int(rng.randint(n)), int(rng.randint(n)))
                  for _ in range(600)})
    edges = [e for e in edges if e[0] != e[1]]
    # tight tol needs ln(tol)/ln(d) ~ 170 iterations; max_iters must
    # clear it so the run CONVERGES (asserted: no RuntimeWarning)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got = _run(edges, n, ray_session, max_iters=250, tol=1e-12,
                   num_partitions=8)
    want = _reference_pagerank(n, edges)
    assert np.abs(got - want).max() < 1e-9
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_converges_at_defaults(ray_session):
    """The published defaults must meet their own convergence criterion
    (r3's 30 iters @ 1e-9 could not; VERDICT r3 #3)."""
    import warnings

    rng = np.random.RandomState(5)
    n = 200
    edges = list({(int(rng.randint(n)), int(rng.randint(n)))
                  for _ in range(1500)})
    edges = [e for e in edges if e[0] != e[1]]
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got = _run(edges, n, ray_session, num_partitions=8)
    assert abs(got.sum() - 1.0) < 1e-6


def test_pagerank_star_graph_sink_dominates(ray_session):
    import warnings

    # 0..9 all point at 10 (a sink). The sink must out-rank everyone,
    # and its dangling mass must be redistributed (ranks sum to 1).
    edges = [(i, 10) for i in range(10)]
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got = _run(edges, 11, ray_session, num_partitions=4)
    assert np.argmax(got) == 10
    assert abs(got.sum() - 1.0) < 1e-9
    # spokes are symmetric
    assert np.allclose(got[:10], got[0])


def test_pagerank_rejects_unknown_endpoint(ray_session):
    with pytest.raises(Exception, match="absent from nodes_ds"):
        _run([(0, 1), (1, 5)], 2, ray_session, num_partitions=4)


def _reference_hits(n, edges, iters=300):
    """Dense HITS power iteration, auth-then-hub with L2 normalization
    each half-step (same order as the engine)."""
    A = np.zeros((n, n))
    for s, t in edges:
        A[s, t] += 1.0
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(iters):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    return h, a


def _run_hits(edges, n, ray_session, **kw):
    import ray.data as rd

    import pyarrow as pa

    from siren_ray.stages.graph import hits

    edf = pd.DataFrame({"src": [e[0] for e in edges],
                        "dst": [e[1] for e in edges]})
    eds = rd.from_pandas(edf.astype("int64")).repartition(4)
    nds = rd.from_arrow(pa.table({"id": pa.array(range(n), pa.int64())}))
    out = hits(eds, nds.repartition(2), **kw).to_pandas()
    out = out.sort_values("id")
    return out["hub"].to_numpy(), out["authority"].to_numpy()


def test_hits_matches_dense_reference(ray_session):
    import warnings

    rng = np.random.RandomState(33)
    n = 100
    edges = list({(int(rng.randint(n)), int(rng.randint(n)))
                  for _ in range(500)})
    edges = [e for e in edges if e[0] != e[1]]
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        hub, auth = _run_hits(edges, n, ray_session, max_iters=400,
                              tol=1e-12, num_partitions=8)
    want_h, want_a = _reference_hits(n, edges)
    assert np.abs(hub - want_h).max() < 1e-8
    assert np.abs(auth - want_a).max() < 1e-8
    assert abs(np.linalg.norm(hub) - 1.0) < 1e-9
    assert abs(np.linalg.norm(auth) - 1.0) < 1e-9


def test_hits_converges_at_defaults(ray_session):
    import warnings

    rng = np.random.RandomState(11)
    n = 150
    edges = list({(int(rng.randint(n)), int(rng.randint(n)))
                  for _ in range(900)})
    edges = [e for e in edges if e[0] != e[1]]
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        hub, auth = _run_hits(edges, n, ray_session, num_partitions=8)
    assert abs(np.linalg.norm(hub) - 1.0) < 1e-6


def test_hits_bipartite_hubs_vs_authorities(ray_session):
    """Pure hubs (0..4) fan out to pure authorities (5..9): hub mass
    must sit entirely on the left, authority mass on the right."""
    import warnings

    edges = [(i, 5 + ((i + j) % 5)) for i in range(5) for j in range(3)]
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        hub, auth = _run_hits(edges, 10, ray_session, num_partitions=4)
    assert hub[:5].min() > 0.1 and np.abs(hub[5:]).max() < 1e-12
    assert auth[5:].min() > 0.1 and np.abs(auth[:5]).max() < 1e-12


def test_hits_no_edges_uniform(ray_session):
    hub, auth = _run_hits([], 4, ray_session, num_partitions=4)
    assert np.allclose(hub, 0.5) and np.allclose(auth, 0.5)


def test_q_hits_converges_at_defaults_on_testdata(ray_session):
    """The PUBLISHED query must meet its own convergence criterion on
    its own input (the r3 pagerank lesson, VERDICT r3 #3)."""
    import warnings

    import __ray_entry__ as entrymod

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = entrymod.queries()["hits"]("/root/testdata/sf0.001")
    assert len(out) == 20
    assert (out["authority"] > 0).all()


def test_hits_rejects_unknown_endpoint(ray_session):
    import pytest as _pt

    with _pt.raises(Exception, match="absent from nodes_ds"):
        _run_hits([(0, 1), (1, 7)], 2, ray_session, num_partitions=4)


def test_crawl_pagerank_reprioritized_seeds_conformance(
        ray_session, corpus_sf0001, tmp_path_factory):
    """The full frontier-prioritization loop: crawl -> PageRank over the
    discovered link graph -> seeds reprioritized by rank -> recrawl.
    The recrawl must (a) follow the new priorities and (b) stay
    conformant with the simulator given the same seeds."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from siren_ray.pipelines.frontier import (
        CrawlConfig, read_crawl_order, run_crawl)
    from siren_ray.pipelines.simulator import simulate_crawl
    from siren_ray.stages.graph import crawl_pagerank, reprioritize_seeds

    params = dict(budget_per_round=50, round_ms=1000, max_rounds=4,
                  max_depth=4)
    out1 = str(tmp_path_factory.mktemp("crawl_pr1"))
    res1 = run_crawl(CrawlConfig(corpus_dir=corpus_sf0001, out_dir=out1,
                                 scheduler="driver", **params))
    extracted = rd.read_parquet(res1.extracted_path)

    ranks = crawl_pagerank(extracted).materialize()
    rdf = ranks.to_pandas()
    assert abs(rdf["rank"].sum() - 1.0) < 1e-6
    assert rdf["url"].is_unique

    seeds = pq.read_table(os.path.join(corpus_sf0001, "seeds.parquet"))
    new_seeds = reprioritize_seeds(seeds, ranks, by="host")
    assert new_seeds.column_names == seeds.column_names
    old_pri = seeds["priority"].to_numpy(zero_copy_only=False)
    new_pri = new_seeds["priority"].to_numpy(zero_copy_only=False)
    # reprioritization is non-trivial: the seed ORDER actually changes
    assert list(np.argsort(-old_pri, kind="stable")) != list(
        np.argsort(-new_pri, kind="stable"))
    # every crawled seed's host accumulated real rank mass (> default 0)
    crawled = set(
        read_crawl_order(out1)["url"].to_pylist())
    for u, p in zip(new_seeds["url"].to_pylist(), new_pri):
        if u in crawled:
            assert p > 0.0
    # by="url": entry-point seeds have no inbound links, so crawled
    # seeds all tie at the base rank — the documented reason host-level
    # aggregation is the default
    url_pri = reprioritize_seeds(seeds, ranks, by="url")[
        "priority"].to_numpy(zero_copy_only=False)
    tied = {p for u, p in zip(new_seeds["url"].to_pylist(), url_pri)
            if u in crawled}
    assert len(tied) == 1 and tied.pop() > 0.0

    seeds_path = os.path.join(str(tmp_path_factory.mktemp("seeds")),
                              "seeds_pr.parquet")
    pq.write_table(new_seeds, seeds_path)

    out2 = str(tmp_path_factory.mktemp("crawl_pr2"))
    run_crawl(CrawlConfig(corpus_dir=corpus_sf0001, out_dir=out2,
                          scheduler="driver", seeds_path=seeds_path,
                          **params))
    sim = simulate_crawl(corpus_sf0001, seeds_path=seeds_path, **params)
    t = read_crawl_order(out2)
    engine_order = list(zip(t["round"].to_pylist(), t["url"].to_pylist(),
                            t["seq"].to_pylist()))
    sim_order = [(r, url, seq)
                 for (r, _rank, url, _p, seq, _f) in sim.crawl_order]
    assert engine_order == sim_order
    # and the recrawl's round-0 fetch order differs from the original
    t1 = read_crawl_order(out1)
    r0_new = [u for r, u, _ in engine_order if r == 0]
    r0_old = [u for r, u in zip(t1["round"].to_pylist(),
                                t1["url"].to_pylist()) if r == 0]
    assert r0_new != r0_old


def test_resolve_chains_semantics(ray_session):
    """Pointer doubling resolves multi-hop chains to the terminal,
    implicit dst-only nodes are terminals, cycles (incl. self-loops)
    come back resolved=false, and a conflicting redirect raises."""
    import ray.data as rd

    from siren_ray.stages.graph import resolve_chains

    edges = rd.from_items([
        {"src": "a", "dst": "b"},
        {"src": "b", "dst": "c"},
        {"src": "c", "dst": None},       # explicit terminal
        {"src": "e", "dst": "f"},        # f: implicit terminal
        {"src": "x", "dst": "y"},        # 2-cycle
        {"src": "y", "dst": "x"},
        {"src": "z", "dst": "z"},        # self-loop
    ]).repartition(3)
    out = resolve_chains(edges, num_partitions=4,
                         max_rounds=8).to_pandas().set_index("url")
    assert len(out) == 8
    assert out.loc["a", "final_url"] == "c" and out.loc["a", "hops"] == 2
    assert out.loc["b", "final_url"] == "c" and out.loc["b", "hops"] == 1
    assert out.loc["c", "hops"] == 0 and out.loc["c", "final_url"] == "c"
    assert out.loc["e", "final_url"] == "f" and out.loc["f", "hops"] == 0
    for cyc in ("x", "y", "z"):
        assert not out.loc[cyc, "resolved"]
        assert out.loc[cyc, "final_url"] is None
        assert pd.isna(out.loc[cyc, "hops"])

    with pytest.raises(Exception, match="conflicting dst"):
        resolve_chains(rd.from_items([
            {"src": "a", "dst": "b"}, {"src": "a", "dst": "c"},
            {"src": "b", "dst": None}, {"src": "c", "dst": None},
        ]), num_partitions=2).to_pandas()


def test_resolve_chains_long_chain_logarithmic_rounds(ray_session):
    """A 300-hop chain resolves inside max_rounds=9 (2^9 = 512 >= 300):
    doubling, not per-hop stepping."""
    import ray.data as rd

    from siren_ray.stages.graph import resolve_chains

    n = 300
    edges = rd.from_items(
        [{"src": f"u{i:04d}", "dst": f"u{i + 1:04d}"} for i in range(n)]
        + [{"src": f"u{n:04d}", "dst": None}]).repartition(4)
    out = resolve_chains(edges, num_partitions=4,
                         max_rounds=9).to_pandas().set_index("url")
    assert bool(out.resolved.all())
    assert out.loc["u0000", "final_url"] == f"u{n:04d}"
    assert out.loc["u0000", "hops"] == n
    assert sorted(out.hops) == list(range(n + 1))


def test_canonicalize_seeds_crawl_conformance(corpus_sf0001, tmp_path,
                                              ray_session):
    """An alias-polluted seed list (2-hop redirect chains, two seeds
    landing on ONE canonical page) canonicalized through
    resolve_chains + canonicalize_seeds crawls IDENTICALLY to the
    clean seed list the aliases denote — so alias spellings can never
    double-fetch a page or perturb crawl order."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from siren_ray.pipelines.frontier import (
        CrawlConfig, read_crawl_order, run_crawl,
    )
    from siren_ray.stages.graph import canonicalize_seeds, resolve_chains

    seeds = pq.read_table(
        os.path.join(corpus_sf0001, "seeds.parquet")).to_pandas()
    seeds = seeds.sort_values("seed_id").reset_index(drop=True)
    urls = list(seeds.url)

    # pollute: seed 0 -> 2-hop alias chain, seed 1 -> 1-hop alias,
    # plus an EXTRA duplicate seed whose alias lands on seed 2's url
    aliased = seeds.copy()
    aliased.loc[0, "url"] = "https://alias.example/a0"
    aliased.loc[1, "url"] = "https://alias.example/b0"
    extra = seeds.iloc[[2]].copy()
    extra["url"] = ["https://alias.example/c0"]
    extra["seed_id"] = [int(seeds.seed_id.max()) + 1]
    aliased = __import__("pandas").concat(
        [aliased, extra], ignore_index=True)
    edges = rd.from_items([
        {"src": "https://alias.example/a0",
         "dst": "https://alias.example/a1"},
        {"src": "https://alias.example/a1", "dst": urls[0]},
        {"src": "https://alias.example/b0", "dst": urls[1]},
        {"src": "https://alias.example/c0", "dst": urls[2]},
    ])
    chains = resolve_chains(edges, num_partitions=4)
    canon = canonicalize_seeds(
        rd.from_pandas(aliased), chains, num_partitions=4,
    ).to_pandas().sort_values("seed_id").reset_index(drop=True)

    # the duplicate alias family collapsed first-wins by seed_id
    assert list(canon.url) == urls
    assert list(canon.seed_id) == list(seeds.seed_id)

    params = dict(budget_per_round=50, round_ms=1000, max_rounds=4,
                  max_depth=6, scheduler="driver")
    ref_out = str(tmp_path / "ref")
    run_crawl(CrawlConfig(corpus_dir=corpus_sf0001, out_dir=ref_out,
                          **params))
    canon_path = str(tmp_path / "seeds_canon.parquet")
    pq.write_table(
        pa.Table.from_pandas(canon[["url", "priority", "seed_id"]],
                             preserve_index=False), canon_path)
    got_out = str(tmp_path / "canon")
    run_crawl(CrawlConfig(corpus_dir=corpus_sf0001, out_dir=got_out,
                          seeds_path=canon_path, **params))

    def order(d):
        t = read_crawl_order(d)
        return list(zip(t["round"].to_pylist(), t["url"].to_pylist(),
                        t["seq"].to_pylist()))

    assert order(got_out) == order(ref_out)
