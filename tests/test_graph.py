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
    rng = np.random.RandomState(21)
    n = 120
    edges = list({(int(rng.randint(n)), int(rng.randint(n)))
                  for _ in range(600)})
    edges = [e for e in edges if e[0] != e[1]]
    got = _run(edges, n, ray_session, max_iters=100, tol=1e-12,
               num_partitions=8)
    want = _reference_pagerank(n, edges)
    assert np.abs(got - want).max() < 1e-9
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_star_graph_sink_dominates(ray_session):
    # 0..9 all point at 10 (a sink). The sink must out-rank everyone,
    # and its dangling mass must be redistributed (ranks sum to 1).
    edges = [(i, 10) for i in range(10)]
    got = _run(edges, 11, ray_session, num_partitions=4)
    assert np.argmax(got) == 10
    assert abs(got.sum() - 1.0) < 1e-9
    # spokes are symmetric
    assert np.allclose(got[:10], got[0])


def test_pagerank_rejects_unknown_endpoint(ray_session):
    with pytest.raises(Exception, match="absent from nodes_ds"):
        _run([(0, 1), (1, 5)], 2, ray_session, num_partitions=4)
