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


def robots_filter_batch(batch: pa.Table, robots: dict) -> pa.Table:
    """Adds a boolean ``robots_ok`` column (expects url/host/path columns)."""
    hosts = batch["host"].to_pylist()
    paths = batch["path"].to_pylist()
    ok = np.fromiter(
        (not is_disallowed(robots, h, p) for h, p in zip(hosts, paths)),
        dtype=bool,
        count=len(hosts),
    )
    return batch.append_column("robots_ok", pa.array(ok))


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
