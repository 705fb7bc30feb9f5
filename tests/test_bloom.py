"""Distributed Bloom filter: no false negatives, bounded false
positives, chunked OR-merge correctness, screen semantics."""
import numpy as np
import pandas as pd

import ray.data as rd

from siren_ray.stages.bloom import (bloom_contains, bloom_screen,
                                    build_bloom)


def _strings(prefix, n):
    return [f"{prefix}-{i}" for i in range(n)]


def test_bloom_no_false_negatives_and_fp_bound(ray_session):
    base = _strings("base", 3000)
    ds = rd.from_pandas(pd.DataFrame({"v": base})).repartition(7)
    bloom = build_bloom(ds, "v", n_bits_log2=16, k=4)  # ~21.8 bits/elem

    # every built value reports present — structural, not probabilistic
    assert bloom_contains(bloom, np.asarray(base, object)).all()

    # FP rate on disjoint probes within 3x the analytic estimate
    probes = np.asarray(_strings("new", 20000), object)
    fp = bloom_contains(bloom, probes).mean()
    m, k, n = 1 << 16, 4, len(base)
    analytic = (1 - np.exp(-k * n / m)) ** k
    assert fp <= 3 * analytic + 1e-9, (fp, analytic)


def test_bloom_chunked_merge_matches_single_partition(ray_session):
    # n_bits > chunk size forces the multi-chunk groupby merge path;
    # a 1-block build is the ground truth for the 9-block one
    vals = _strings("x", 5000)
    df = pd.DataFrame({"v": vals})
    many = build_bloom(rd.from_pandas(df).repartition(9), "v",
                       n_bits_log2=22, k=3)
    one = build_bloom(rd.from_pandas(df), "v", n_bits_log2=22, k=3)
    assert np.array_equal(many["words"], one["words"])
    assert many["n_chunks"] == 4  # 2^22 bits / 2^20-bit chunks


def test_bloom_screen_new_and_seen(ray_session):
    base = rd.from_pandas(pd.DataFrame({"v": _strings("a", 500)}))
    bloom = build_bloom(base, "v", n_bits_log2=16, k=4)
    inc = pd.DataFrame({
        "v": _strings("a", 250) + _strings("b", 40),  # 250 seen, 40 new
        "id": np.arange(290, dtype="int64"),
    })
    new = bloom_screen(rd.from_pandas(inc).repartition(3), bloom,
                       "v", keep="new").to_pandas()
    # no false negatives: nothing from the base family survives
    assert not new["v"].str.startswith("a").any()
    # the surviving set is exactly the new family minus (rare) FPs
    assert set(new["v"]) <= set(_strings("b", 40))
    assert len(new) >= 38  # FP slack; analytic FP here is ~2e-7

    seen = bloom_screen(rd.from_pandas(inc), bloom, "v",
                        keep="seen").to_pandas()
    assert set(seen["v"]) | set(new["v"]) == set(inc["v"])
    assert set(seen["v"]) & set(new["v"]) == set()


def test_bloom_union_merge_and_empty(ray_session):
    a = build_bloom(rd.from_pandas(pd.DataFrame({"v": _strings("a", 99)})),
                    "v", n_bits_log2=14, k=4)
    b = build_bloom(rd.from_pandas(pd.DataFrame({"v": _strings("b", 99)})),
                    "v", n_bits_log2=14, k=4)
    both = dict(a, words=a["words"] | b["words"])
    probes = np.asarray(_strings("a", 99) + _strings("b", 99), object)
    assert bloom_contains(both, probes).all()
    assert bloom_contains(a, np.asarray([], object)).shape == (0,)
