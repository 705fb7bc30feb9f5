"""Politeness scheduling: quota spec + salted-shuffle equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from siren_ray.stages.politeness import (
    UNLIMITED,
    host_quota,
    host_quota_partitioned,
    host_quota_rank,
    is_disallowed,
    salted_host_quota,
)

ROBOTS = {
    "hot.example.org": (["/private/"], 100),  # quota = round_ms/100
    "slow.example.org": ([], 1000),
    "blocked.example.org": (["/"], 0),
}


def test_host_quota():
    assert host_quota(ROBOTS, "hot.example.org", 1000) == 10
    assert host_quota(ROBOTS, "slow.example.org", 1000) == 1
    assert host_quota(ROBOTS, "unknown.example.org", 1000) == UNLIMITED
    assert host_quota(ROBOTS, "blocked.example.org", 1000) == UNLIMITED


def test_is_disallowed():
    assert is_disallowed(ROBOTS, "hot.example.org", "/private/x")
    assert not is_disallowed(ROBOTS, "hot.example.org", "/public/x")
    assert is_disallowed(ROBOTS, "blocked.example.org", "/anything")
    assert not is_disallowed(ROBOTS, "unknown.example.org", "/x")


def _frontier_df(n_hot=500, n_cold=50, seed=3):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_hot):
        rows.append(("hot.example.org", f"/a/{i}", float(rng.rand()), i))
    for i in range(n_cold):
        rows.append((f"cold{i % 7}.example.org", f"/c/{i}",
                     float(rng.rand()), n_hot + i))
    df = pd.DataFrame(rows, columns=["host", "path", "priority", "_i"])
    df["url"] = "https://" + df["host"] + df["path"]
    df["seq"] = [f"{i:08d}" for i in df["_i"]]
    df["depth"] = np.int32(1)
    df["robots_ok"] = [
        not is_disallowed(ROBOTS, h, p) for h, p in zip(df["host"], df["path"])
    ]
    return df.drop(columns=["_i"])


def test_host_quota_rank_spec():
    df = _frontier_df()
    hot = df[df.host == "hot.example.org"]
    ranked = host_quota_rank(hot, ROBOTS, 1000)
    assert int(ranked["in_quota"].sum()) == 10  # quota honored
    # winners are exactly the top-10 by (priority DESC, seq ASC)
    top = hot.sort_values(["priority", "seq"], ascending=[False, True]).head(10)
    assert set(ranked[ranked.in_quota]["url"]) == set(top["url"])


def test_salted_host_quota_equivalence(ray_session):
    import ray.data as rd

    df = _frontier_df(n_hot=800, n_cold=120)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    plain = (
        ds.groupby("host")
        .map_groups(
            host_quota_rank,
            fn_kwargs={"robots": ROBOTS, "round_ms": 1000},
            batch_format="pandas",
        )
        .to_pandas()
    )
    salted = salted_host_quota(ds, ROBOTS, 1000, num_salts=8).to_pandas()
    key = lambda d: set(zip(d["url"], d["in_quota"].astype(bool)))
    assert len(salted) == len(plain) == len(df)
    assert key(salted) == key(plain)


def test_host_quota_partitioned_equivalence(ray_session):
    """The DEFAULT distributed quota stage (vectorized, salted, with
    unlimited-host bypass) must assign the exact same in_quota flags as
    the per-host reference ranking."""
    import ray.data as rd

    df = _frontier_df(n_hot=800, n_cold=120)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    plain = (
        ds.groupby("host")
        .map_groups(
            host_quota_rank,
            fn_kwargs={"robots": ROBOTS, "round_ms": 1000},
            batch_format="pandas",
        )
        .to_pandas()
    )
    for num_salts in (1, 4):
        got = host_quota_partitioned(
            ds.materialize(), ROBOTS, 1000,
            num_salts=num_salts, num_buckets=8,
        ).to_pandas()
        key = lambda d: set(zip(d["url"], d["in_quota"].astype(bool)))
        assert len(got) == len(plain) == len(df)
        assert key(got) == key(plain)


def test_host_quota_partitioned_skew_stress(ray_session):
    """VERDICT r3 'done' bar: 90% of a 1M-row frontier on ONE limited
    host must schedule correctly through the salted default path (no
    single group ever holds the hot host whole) and match the
    driver-computed spec exactly."""
    import ray.data as rd

    n = 1_000_000
    n_hot = int(n * 0.9)
    rng = np.random.RandomState(11)
    hosts = np.where(
        np.arange(n) < n_hot,
        "hot.example.org",
        pd.Series(np.arange(n) % 97).map(
            lambda i: f"cold{i}.example.org").to_numpy(dtype=object),
    )
    paths = np.char.add("/p/", np.arange(n).astype(str))
    df = pd.DataFrame({
        "host": hosts,
        "path": paths,
        "priority": rng.rand(n),
        "seq": np.char.zfill(np.arange(n).astype(str), 9),
    })
    df["url"] = "https://" + df["host"] + df["path"]
    df["robots_ok"] = ~(
        (df["host"] == "hot.example.org")
        & df["path"].str.startswith("/private/")
    )
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(32).materialize()
    got = host_quota_partitioned(
        ds, ROBOTS, 1000, num_salts=8, num_buckets=32
    ).to_pandas()
    assert len(got) == n
    # driver-computed spec: per host, top-quota by (priority DESC, seq)
    exp = df.sort_values(["priority", "seq"], ascending=[False, True],
                         kind="mergesort")
    rank = exp.groupby("host", sort=False).cumcount()
    quotas = exp["host"].map(
        lambda h: host_quota(ROBOTS, h, 1000)).to_numpy()
    exp_in = pd.Series(rank.to_numpy() < quotas, index=exp.index)
    want = set(exp.loc[exp_in, "url"])
    assert set(got.loc[got["in_quota"].astype(bool), "url"]) == want
    # the hot host got exactly its quota (10), not its 900k rows
    hot_in = got[(got["host"] == "hot.example.org")
                 & got["in_quota"].astype(bool)]
    assert len(hot_in) == 10


def test_adaptive_quota_math():
    """_effective_quota / _merge_latency: EWMA folding and the
    max(robots, k x latency) delay rule, without sockets."""
    from siren_ray.pipelines.frontier import CrawlConfig, _Crawl

    cfg = CrawlConfig(corpus_dir="/nonexistent", out_dir="/tmp/x",
                      round_ms=1000, adaptive_politeness=True,
                      adaptive_k=2.0, adaptive_alpha=0.5)
    c = object.__new__(_Crawl)  # skip __init__ (needs a corpus)
    c.cfg = cfg
    c.robots = {"slow.org": ([], 100)}  # robots delay 100ms -> quota 10
    c.host_lat_ewma = {}
    c.host_backoff_until = {}

    # no observations: robots quota only; unknown host unlimited
    assert c._effective_quota("slow.org") == 10
    assert c._effective_quota("fast.org") > 1 << 40

    # one round of observations: 200ms avg on fast.org
    c._merge_latency([{"fast.org": (4, 800.0)}, {"fast.org": (4, 800.0)}])
    assert c.host_lat_ewma["fast.org"] == 200.0
    # k=2 -> effective delay 400ms -> 2 fetches/round
    assert c._effective_quota("fast.org") == 2

    # latency can only TIGHTEN a robots quota, never widen it
    c._merge_latency([{"slow.org": (10, 10.0)}])  # 1ms avg
    assert c._effective_quota("slow.org") == 10
    c._merge_latency([{"slow.org": (1, 10_000.0)}])  # spike to ~5s EWMA
    assert c._effective_quota("slow.org") == 1

    # EWMA folds: fast.org improves to 0ms-ish -> quota relaxes
    for _ in range(6):
        c._merge_latency([{"fast.org": (10, 10.0)}])
    assert c._effective_quota("fast.org") >= 100

    # adaptive off: latency ignored entirely
    c.cfg = CrawlConfig(corpus_dir="/n", out_dir="/tmp/x",
                        round_ms=1000, adaptive_politeness=False)
    assert c._effective_quota("fast.org") > 1 << 40
