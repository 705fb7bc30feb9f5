"""Politeness: robots.txt-style filtering and per-host fetch budgets.

The reference enforces only a single global concurrency cap
(``OptionalSemaphore(max_concurrency=50)``, /root/reference/siren/core/
http.py:58-89, config.toml:10) and has no robots handling (SURVEY.md §4).
The north rule adds per-host politeness, so this module defines the
deterministic scheduling spec shared by the Ray engine and the
single-threaded conformance simulator (pipelines/simulator.py):

Per crawl round, after within-round URL dedup and seen-filtering:

1. robots filter — a candidate whose URL path starts with any of its
   host's ``disallow_prefixes`` is skipped (recorded, and marked seen so
   it is never retried).
2. per-host quota — host h may fetch at most
   ``quota(h) = round_ms // crawl_delay_ms(h)`` URLs per round
   (unlimited when the host has no robots entry or delay 0); within a
   host, candidates rank by (priority DESC, seq ASC).
3. global budget — at most ``budget_per_round`` fetches per round,
   taken in (priority DESC, seq ASC) order from the per-host survivors.
   This reproduces the reference's global budget of 50 as the
   conformance mode.

Rows over quota/budget are deferred to the next round unchanged. The
selected set equals a sequential greedy walk of the global priority
order with per-host quotas — so the engine can compute it as
(per-host head(quota)) then (global sort + limit(budget)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

UNLIMITED = 1 << 62


def load_robots(path: str) -> dict[str, tuple[list[str], int]]:
    """robots.parquet -> {host: (disallow_prefixes, crawl_delay_ms)}."""
    t = pq.read_table(path)
    out: dict[str, tuple[list[str], int]] = {}
    for host, prefixes, delay in zip(
        t["host"].to_pylist(),
        t["disallow_prefixes"].to_pylist(),
        t["crawl_delay_ms"].to_pylist(),
    ):
        out[host] = (list(prefixes or []), int(delay))
    return out


def host_quota(robots: dict, host: str, round_ms: int) -> int:
    entry = robots.get(host)
    if entry is None:
        return UNLIMITED
    delay = entry[1]
    if delay <= 0:
        return UNLIMITED
    return max(1, round_ms // delay)


def is_disallowed(robots: dict, host: str, path: str) -> bool:
    entry = robots.get(host)
    if entry is None:
        return False
    return any(path.startswith(p) for p in entry[0])


def robots_ok_mask(robots: dict, hosts, paths) -> np.ndarray:
    """Vectorized robots check: True where (host, path) is allowed.

    Rows whose host has no robots entry (the common case) never touch
    Python per-row code; restricted hosts are handled one host at a
    time with vectorized ``str.startswith`` per disallow prefix —
    O(restricted_hosts x prefixes) kernel calls instead of one Python
    call per frontier row (this sits on the serial driver-scheduling
    path, where per-row cost divides scaling efficiency at width).
    """
    hosts = np.asarray(hosts, dtype=object)
    ok = np.ones(len(hosts), dtype=bool)
    if not robots or not len(hosts):
        return ok
    # one factorize + one stable argsort give every host's row indices
    # in a single pass (O(rows log rows)), instead of re-scanning the
    # hosts array once per restricted host
    codes, uniques = pd.factorize(hosts, sort=False)
    restricted = [(i, robots[h][0]) for i, h in enumerate(uniques)
                  if robots.get(h) and robots[h][0]]
    if not restricted:
        return ok
    order = np.argsort(codes, kind="stable")
    bounds = np.searchsorted(codes[order], np.arange(len(uniques) + 1))
    paths_s = pd.Series(np.asarray(paths, dtype=object))
    for i, prefixes in restricted:
        idx = order[bounds[i]:bounds[i + 1]]
        if not len(idx):
            continue
        p = paths_s.iloc[idx]
        bad = np.zeros(len(idx), dtype=bool)
        for pref in prefixes:
            bad |= p.str.startswith(pref).to_numpy(dtype=bool)
        ok[idx[bad]] = False
    return ok


def robots_filter_batch(batch: pa.Table, robots: dict) -> pa.Table:
    """Adds a boolean ``robots_ok`` column (expects url/host/path columns)."""
    ok = robots_ok_mask(robots, batch["host"].to_pylist(),
                        batch["path"].to_pylist())
    return batch.append_column("robots_ok", pa.array(ok))


def salted_host_quota(ds, robots: dict, round_ms: int, num_salts: int = 8):
    """Two-phase skew-safe variant of the per-host quota stage.

    News-site frontiers are Zipf-skewed by host (SURVEY.md §4 "Skew"):
    a single hot host's candidates can dwarf every other group in a
    plain ``groupby(host)``. Phase 1 shuffles on the salted key
    ``(host, hash(url) % num_salts)`` and keeps only each salted run's
    top-``quota(h)`` rows — any row in a host's global top-quota is
    necessarily in its salted run's top-quota, so no winner is lost.
    Phase 2 merges the capped runs per host (input now bounded by
    ``quota * num_salts`` rows per host) and assigns the exact
    ``in_quota`` flags. Results are identical to ``host_quota_rank``
    (tested), with the hot-host group shrunk by ~num_salts.
    """
    import pyarrow as pa

    from ..util import hash_strings

    def _add_salt(t: pa.Table) -> pa.Table:
        salts = (hash_strings(t["url"].to_pylist()) % num_salts).astype("int64")
        key = [f"{h}#{s}" for h, s in zip(t["host"].to_pylist(), salts)]
        return t.append_column("salt_key", pa.array(key, pa.string()))

    def _phase1(df: pd.DataFrame) -> pd.DataFrame:
        # rows beyond a salted run's top-quota can't be in the host's
        # global top-quota -> definitely over quota (deferred), and they
        # skip the phase-2 host shuffle entirely
        host = df["host"].iloc[0]
        q = min(host_quota(robots, host, round_ms), 1 << 30)
        ok = (
            df["robots_ok"].to_numpy(dtype=bool)
            if "robots_ok" in df.columns
            else np.ones(len(df), dtype=bool)
        )
        dfo = df[ok].sort_values(["priority", "seq"],
                                 ascending=[False, True], kind="mergesort")
        passed = dfo.head(q).assign(salt_pass=True)
        rejected = dfo.iloc[q:].assign(salt_pass=False)
        bad = df[~ok].assign(salt_pass=False)
        return pd.concat([passed, rejected, bad])

    salted = ds.map_batches(_add_salt, batch_format="pyarrow")
    phase1 = salted.groupby("salt_key").map_groups(
        _phase1, batch_format="pandas"
    ).materialize()
    passed = phase1.map_batches(
        lambda t: t.filter(t["salt_pass"]), batch_format="pyarrow"
    )
    ranked = passed.groupby("host").map_groups(
        host_quota_rank, fn_kwargs={"robots": robots, "round_ms": round_ms},
        batch_format="pandas",
    )
    def _fail(t: pa.Table) -> pa.Table:
        ft = t.filter(pa.compute.invert(t["salt_pass"]))
        return ft.append_column(
            "in_quota", pa.array([False] * ft.num_rows, pa.bool_())
        )

    failed = phase1.map_batches(_fail, batch_format="pyarrow")
    return ranked.union(failed).map_batches(
        lambda t: t.drop_columns(["salt_key", "salt_pass"]),
        batch_format="pyarrow",
    )


def host_quota_rank(df: pd.DataFrame, robots: dict, round_ms: int) -> pd.DataFrame:
    """map_groups fn (grouped by host): rank rows by (-priority, seq) and
    mark the first quota(h) as within-quota.

    Only robots-allowed rows consume quota slots (robots skip precedes the
    quota stage in the scheduling spec); disallowed rows get
    ``in_quota=False``.
    """
    if df.empty:
        return df
    host = df["host"].iloc[0]
    q = host_quota(robots, host, round_ms)
    df = df.sort_values(["priority", "seq"], ascending=[False, True], kind="mergesort")
    ok = (
        df["robots_ok"].to_numpy(dtype=bool)
        if "robots_ok" in df.columns
        else np.ones(len(df), dtype=bool)
    )
    rank = np.where(ok, np.cumsum(ok) - 1, np.int64(1 << 60))
    df = df.assign(in_quota=rank < q)
    return df
