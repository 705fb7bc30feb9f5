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


def host_quota_partitioned(ds, robots: dict, round_ms: int, *,
                           num_salts: int = 8, num_buckets: int = 32,
                           backoff_hosts: frozenset | set | None = None,
                           quota_overrides: dict | None = None):
    """Skew-safe, fully vectorized per-host quota stage — the distributed
    scheduler's DEFAULT (``CrawlConfig.salt_hosts="auto"``).

    Same output rows/columns as :func:`host_quota_rank` over the same
    input (conformance-tested vs the simulator and the legacy stage),
    with three scale properties the ``groupby("host").map_groups`` path
    lacks on a Zipf-skewed 10^10-URL frontier (SURVEY.md §4 "Skew"):

    1. UNLIMITED-HOST BYPASS: hosts with no robots entry (or delay 0)
       have quota=UNLIMITED, so ``in_quota == robots_ok`` needs no
       ranking — those rows (the vast majority of a web frontier) take
       a MAP-ONLY path and never enter a shuffle at all.
    2. SALTED two-phase ranking for the limited minority: phase 1
       shuffles on ``hash(host, url-salt) % num_buckets`` and caps each
       salted run at quota(host) — a row outside its salted run's
       top-quota cannot be in the host's global top-quota, so no winner
       is lost — then phase 2 re-shuffles only the survivors
       (<= quota * num_salts rows per host) on ``hash(host)`` and
       assigns exact ranks. A hot host spreads over ``num_salts``
       partitions instead of landing in one group; size ``num_salts``
       to cluster parallelism.
    3. NO PER-KEY ``map_groups``: both phases group on a coarse int
       bucket and rank ALL their hosts in ONE C-level pandas pass
       (sort + grouped cumsum), never one Python call per host.

    The input is consumed twice (unlimited/limited split) — pass a
    materialized dataset.

    ``backoff_hosts`` (server-directed Retry-After backoff, RFC 9110
    §10.2.3): hosts inside an active 429/503 backoff window get quota 0
    this round — their rows come back ``in_quota=False`` (deferred,
    never dropped), exactly matching the driver scheduler's
    ``_effective_quota``. Host-cardinality state, shipped by value like
    the robots table.
    """
    from ..util import hash_strings

    limited = {
        h: max(1, round_ms // e[1])
        for h, e in robots.items()
        if e is not None and e[1] > 0
    }
    if backoff_hosts:
        # quota 0 routes a backed-off host through the salted path even
        # when it has no robots entry; _rank_pass's `rank < 0` is
        # vacuously false, so every row defers
        limited.update({h: 0 for h in backoff_hosts})
    if quota_overrides:
        # driver-computed per-host effective quotas (adaptive
        # politeness EWMA tightening, possibly folded with backoff) —
        # the same host-cardinality shipping as the robots table
        limited.update({h: int(q) for h, q in quota_overrides.items()})
    _HELPERS = ("_salt", "_pk1", "_pk2", "_q", "_ok", "salt_pass")

    def _base_cols(t: pa.Table) -> list[str]:
        return [c for c in t.column_names
                if c not in _HELPERS and c != "in_quota"]

    def _ok_mask(t: pa.Table) -> np.ndarray:
        if "robots_ok" in t.column_names:
            return np.asarray(t["robots_ok"], dtype=bool)
        return np.ones(t.num_rows, dtype=bool)

    def _mark_unlimited(t: pa.Table) -> pa.Table:
        if limited:
            keep = ~pd.Series(t["host"].to_pylist()).isin(limited).to_numpy()
            t = t.filter(pa.array(keep))
        t = t.append_column("in_quota", pa.array(_ok_mask(t)))
        return t.select(_base_cols(t) + ["in_quota"])

    if limited:
        # multi-pass operator contract (CLAUDE.md): the unlimited/
        # limited split consumes the input twice — pin it HERE rather
        # than trusting every caller to pre-materialize
        from ..util import pin_for_multipass

        ds = pin_for_multipass(ds)
    unlim = ds.map_batches(_mark_unlimited, batch_format="pyarrow")
    if not limited:
        return unlim

    _GOLDEN = np.uint64(0x9E3779B97F4A7C15)

    def _salt_and_bucket(t: pa.Table) -> pa.Table:
        keep = pd.Series(t["host"].to_pylist()).isin(limited).to_numpy()
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return t.append_column("_salt", pa.array([], pa.int64())) \
                    .append_column("_pk1", pa.array([], pa.int64()))
        hh = hash_strings(t["host"].to_pylist())
        salt = (hash_strings(t["url"].to_pylist())
                % np.uint64(max(1, num_salts)))
        pk1 = ((hh + salt * _GOLDEN) % np.uint64(num_buckets)).astype(np.int64)
        t = t.append_column("_salt", pa.array(salt.astype(np.int64)))
        return t.append_column("_pk1", pa.array(pk1))

    def _rank_pass(df: pd.DataFrame, group_cols: list[str],
                   out_col: str) -> pd.DataFrame:
        # ONE vectorized pass ranks every (group) run in the partition:
        # sort by (group, priority DESC, seq ASC), grouped cumsum of the
        # robots-ok indicator = per-run rank among ok rows
        df = df.sort_values(group_cols + ["priority", "seq"],
                            ascending=[True] * len(group_cols) + [False, True],
                            kind="mergesort")
        rank = df.groupby(group_cols, sort=False)["_ok"].cumsum().to_numpy() - 1
        df[out_col] = df["_ok"].to_numpy(dtype=bool) & (
            rank < df["_q"].to_numpy())
        return df

    def _phase1(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(_q=pd.Series(dtype=np.int64),
                             _ok=pd.Series(dtype=bool),
                             salt_pass=pd.Series(dtype=bool))
        df = df.assign(
            _q=df["host"].map(limited).to_numpy(dtype=np.int64),
            _ok=(df["robots_ok"].to_numpy(dtype=bool)
                 if "robots_ok" in df.columns
                 else np.ones(len(df), dtype=bool)),
        )
        return _rank_pass(df, ["host", "_salt"], "salt_pass")

    lim = (
        ds.map_batches(_salt_and_bucket, batch_format="pyarrow")
        .groupby("_pk1")
        .map_groups(_phase1, batch_format="pandas")
        .materialize()  # consumed twice: survivors + capped-out rows
    )
    if lim.count() == 0:  # metadata on materialized: free. Rounds with
        return unlim      # no limited-host rows skip phase 2 entirely.

    def _rebucket(t: pa.Table) -> pa.Table:
        t = t.filter(t["salt_pass"].combine_chunks())
        pk2 = (hash_strings(t["host"].to_pylist())
               % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("_pk2", pa.array(pk2))

    def _phase2(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(in_quota=pd.Series(dtype=bool))
        return _rank_pass(df, ["host"], "in_quota")

    ranked = (
        lim.map_batches(_rebucket, batch_format="pyarrow")
        .groupby("_pk2")
        .map_groups(_phase2, batch_format="pandas")
    )

    def _capped_out(t: pa.Table) -> pa.Table:
        # beyond a salted run's top-quota -> definitely over host quota
        t = t.filter(pa.compute.invert(t["salt_pass"].combine_chunks()))
        t = t.append_column(
            "in_quota", pa.array(np.zeros(t.num_rows, dtype=bool)))
        return t.select(_base_cols(t) + ["in_quota"])

    def _strip(t: pa.Table) -> pa.Table:
        return t.select(_base_cols(t) + ["in_quota"])

    return unlim.union(
        ranked.map_batches(_strip, batch_format="pyarrow"),
        lim.map_batches(_capped_out, batch_format="pyarrow"),
    )


def host_quota_rank(df: pd.DataFrame, robots: dict, round_ms: int,
                    backoff_hosts: frozenset | set | None = None,
                    quota_overrides: dict | None = None
                    ) -> pd.DataFrame:
    """map_groups fn (grouped by host): rank rows by (-priority, seq) and
    mark the first quota(h) as within-quota.

    Only robots-allowed rows consume quota slots (robots skip precedes the
    quota stage in the scheduling spec); disallowed rows get
    ``in_quota=False``. A host inside an active Retry-After backoff
    window (``backoff_hosts``) gets quota 0 — all rows defer; a
    ``quota_overrides`` entry (adaptive-politeness tightening) replaces
    the robots-derived quota outright.
    """
    if df.empty:
        return df
    host = df["host"].iloc[0]
    if quota_overrides and host in quota_overrides:
        q = int(quota_overrides[host])
    elif backoff_hosts and host in backoff_hosts:
        q = 0
    else:
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
