"""The crawl engine: URL frontier + fetch scheduler on Ray Data.

North-rule core. Each crawl round is one bounded execution:

    frontier -> dedup(url) -> seen-filter -> robots -> per-host quota
             -> global priority budget -> mark-seen -> fetch+extract
             -> (write extracted parquet, round-partitioned)
             -> explode links -> union(deferred) -> next frontier checkpoint

Deterministic ordering: every frontier row carries a unique ``seq`` string
(seed ``{seed_id:06d}``, child ``parent_seq + {link_idx:05d}``); scheduling
order is (priority DESC, seq ASC), invariant under execution parallelism —
conformance tests compare the engine at different ``num_cpus`` against the
single-threaded simulator (pipelines/simulator.py). The reference's
completion-order nondeterminism (asyncio ``as_completed``, SURVEY.md §2.5
D6/§7) is deliberately replaced by this total order.

Two interchangeable schedulers producing IDENTICAL results (tested):

- ``distributed``: scheduling runs as Dataset ops — dedup shuffles on
  ``url``, the quota stage shuffles on ``host``, the budget is a
  sort+limit top-G. The 10^10-frontier path: no driver materialization;
  shuffles move scheduling columns only (html/text never enters one).
- ``driver``: when a round's frontier fits comfortably in driver memory
  (scheduling columns only — ~60 bytes/row), the same spec is computed
  vectorized in pandas in milliseconds, avoiding ~8 small Ray executions
  of fixed overhead per round. Fetch+extract (the actual work) is a
  distributed actor-pool ``map_batches`` in both modes.

``auto`` picks driver below ``driver_threshold`` rows, else distributed.

Checkpoint/resume: per-round Parquet for the next frontier plus seen-set
shard checkpoints; ``resume=True`` continues after the last completed
round (metrics.jsonl = completion log + per-round lineage record).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..state.seen import SeenSet, seen_add_batch, seen_contains_filter
from ..stages.fetch import FetchExtract, FetchExtractActor, broadcast_pages
from ..stages.politeness import (
    host_quota,
    host_quota_rank,
    load_robots,
    robots_filter_batch,
    robots_ok_mask,
)
from ..util import hash_strings, hosts_of, paths_of

FRONTIER_COLS = ["url", "host", "path", "priority", "depth", "seq"]



@dataclass
class CrawlConfig:
    corpus_dir: str
    out_dir: str
    budget_per_round: int | None = 50  # reference max_concurrency (config.toml:10)
    round_ms: int = 1000
    priority_decay: float = 0.5
    max_depth: int = 8
    max_rounds: int = 100
    num_seen_shards: int = 8
    fetch_mode: str = "broadcast"  # "broadcast" | "bucketed" | "http"
    http_base: str | None = None   # fetch_mode="http": live server base URL
    http_headers: dict | None = None
    http_timeout_s: float = 5.0
    http_max_per_host: int | None = None  # socket-level politeness cap
    http_max_body_bytes: int | None = None  # response-size cap ->
    # "too_large" recorded error rows (incl. bounded gzip inflate)
    robots_mode: str = "corpus"  # "corpus" (robots.parquet) | "http"
    # (live GET https://host/robots.txt per new host, RFC 9309 subset)
    fetch_concurrency: int = 4
    fetch_batch_size: int = 1024
    cache_buckets: int = 8
    num_buckets: int = 128
    scheduler: str = "auto"  # "auto" | "driver" | "distributed"
    driver_threshold: int = 2_000_000  # frontier rows
    resume: bool = False
    canonicalize: bool = False  # URL canonicalization before the seen-set
    trap_filter: bool = False  # drop crawler-trap child URLs pre-seen-set
    seeds_path: str | None = None  # override corpus seeds.parquet (e.g.
    # pagerank-reprioritized seeds from stages.graph.reprioritize_seeds)
    enrich_text: bool = False  # inline quality/lang-id/fingerprint stage
    ckpt_every: int = 1  # seen-set checkpoint cadence (0 = final only)
    work_stealing: bool = False  # driver-mode fetch: idle actors steal
    # queued chunks from the longest queue (affinity-first). Default
    # OFF, for two measured reasons. (1) Stealing converts fetch-stage
    # idle into cold-bucket-read busy (interleaved A/B at sf0.1/8cpus:
    # util 0.69 -> 0.83 but busy core-s +12-38%, wall within position
    # noise both ways) — the thief re-reads partitions the victim had
    # cached. (2) Stealing requires throttled feeding (2 chunks in
    # flight per actor, driver refeeds on completion), and actors that
    # idle in sub-chunk gaps get their pages reclaimed on this host —
    # each refeed re-faults the working set (busy 208 -> 516 core-s at
    # 30 actors). The default path submits every queue upfront, so
    # actors run back-to-back. Flag kept for clusters where bucket
    # reads are cheap and memory is stable; measure with metrics'
    # n_chunks/busy_max_chunk.
    # distributed host-quota stage: "auto" (default) = the skew-safe
    # vectorized salted two-phase shuffle with unlimited-host bypass
    # (politeness.host_quota_partitioned, num_salts=8); an int N>0 uses
    # N salts; 0 = the legacy unsalted groupby(host) path (conformance
    # reference only — unsafe on a Zipf-skewed frontier)
    salt_hosts: int | str = "auto"
    # adaptive per-host politeness (live-HTTP mode): effective
    # crawl-delay(h) = max(robots delay, adaptive_k x EWMA of observed
    # response latency) — slow hosts self-throttle like Heritrix's
    # adaptive politeness; corpus modes have no latency signal, so the
    # flag is a no-op there
    adaptive_politeness: bool = False
    adaptive_k: float = 2.0
    adaptive_alpha: float = 0.5  # EWMA weight of the newest round
    # seen-set storage: "exact" (64-bit fingerprints, 13-27 B/entry, no
    # false positives) or "compact" (cuckoo-style 32-bit tags,
    # ~6.7 B/entry, fp ~1e-9/query — a false positive silently drops
    # one URL forever, so compact is the explicit 10^10-URL opt-in; see
    # BASELINE.md "Seen-set memory")
    seen_mode: str = "exact"

    @property
    def pages_dir(self) -> str:
        return os.path.join(self.corpus_dir, "pages")


@dataclass
class CrawlResult:
    out_dir: str
    rounds: int
    total_fetched: int
    total_errors: int
    seen_size: int
    metrics: list[dict] = field(default_factory=list)

    @property
    def extracted_path(self) -> str:
        return os.path.join(self.out_dir, "extracted")


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------

def _filter(ds, fn):
    """Vectorized dataset filter: fn(pa.Table) -> boolean mask."""
    return ds.map_batches(
        lambda t: t.filter(pa.array(fn(t))), batch_format="pyarrow"
    )


_URL_DEDUP_PARTITIONS = 64


def _dedup_urls_distributed(ds):
    """Within-round URL dedup: keep the (priority DESC, seq ASC) winner
    per url (D1/D2 semantics, mirror.py:106-108 / ht.py:233-247).

    Hash-partitions on a coarse bucket of the url and dedups each
    partition VECTORIZED — one pandas call per partition, never per url
    (per-key ``map_groups`` with group sizes ~1-2 is pure scheduler
    overhead at frontier scale)."""

    def _bucket(t: pa.Table) -> pa.Table:
        pk = (hash_strings(t["url"].to_pylist())
              % _URL_DEDUP_PARTITIONS).astype(np.int64)
        return t.append_column("_pk", pa.array(pk))

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "priority", "seq"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.drop_duplicates("url", keep="first")
        return df.drop(columns=["_pk"]).reset_index(drop=True)

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_dedup, batch_format="pandas")
    )


def _empty_frontier() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "priority": pa.array([], pa.float64()),
            "depth": pa.array([], pa.int32()),
            "seq": pa.array([], pa.string()),
        }
    )


def _explode_links(batch: pa.Table, decay: float, max_depth: int,
                   canonicalize: bool = False,
                   trap_filter: bool = False) -> pa.Table:
    """links list<string> -> child frontier rows.

    Fully vectorized: Arrow ``list_flatten``/``list_parent_indices`` for
    the explode, numpy for the per-child index, one ``binary_join`` for
    the ``parent_seq + {idx:05d}`` seq assignment — no Python loop over
    rows or links in this hot path. ``canonicalize`` routes child URLs
    through :func:`..functions.urlnorm.canonicalize_urls` (vectorized
    already-canonical screen; only the flagged minority pays the exact
    parse) BEFORE the seen-set ever sees them — variant spellings of one
    page collapse pre-fetch instead of costing a fetch each."""
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return _empty_frontier()
    depth = batch["depth"].to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = pc.list_value_length(batch["links"]).to_numpy(
        zero_copy_only=False)
    lengths = np.nan_to_num(lengths.astype("float64")).astype(np.int64)
    mask = (lengths > 0) & (depth + 1 <= max_depth)
    if not mask.any():
        return _empty_frontier()
    sub = batch.filter(pa.array(mask)).combine_chunks()
    links = sub["links"].combine_chunks()
    flat = pc.list_flatten(links)
    parent = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
    sub_lengths = lengths[mask]
    starts = np.concatenate(([0], np.cumsum(sub_lengths)[:-1]))
    child_idx = np.arange(len(parent)) - np.repeat(starts, sub_lengths)
    pri = sub["priority"].to_numpy(zero_copy_only=False)[parent] * decay
    dep = (sub["depth"].to_numpy(zero_copy_only=False).astype(np.int64)
           [parent] + 1).astype(np.int32)
    parent_seq = pc.take(sub["seq"].combine_chunks(), pa.array(parent))
    # astype(str) sizes to the widest value; zfill(5) == f"{idx:05d}"
    idx_str = pa.array(np.char.zfill(child_idx.astype(str), 5))
    seqs = pc.binary_join_element_wise(parent_seq, idx_str, "")
    if canonicalize:
        from ..functions.urlnorm import canonicalize_urls

        flat = canonicalize_urls(pc.cast(flat, pa.string()))
    if trap_filter:
        # frontier hygiene: drop crawler-trap child URLs (calendar
        # loops, parameter explosions, over-deep paths) BEFORE the
        # seen-set / fetch ever see them — on a 10^10-URL frontier an
        # unchecked trap host multiplies without bound. Vectorized
        # (urlnorm.url_trap_signals); drops are logged, never silent.
        from ..functions.urlnorm import url_trap_signals

        keep = pc.invert(
            url_trap_signals(pc.cast(flat, pa.string()))["is_trap"]
            .combine_chunks())
        n_drop = len(flat) - int(pc.sum(keep).as_py() or 0)
        if n_drop:
            import logging

            logging.getLogger(__name__).info(
                "trap_filter: dropped %d trap child links", n_drop)
            keep_np = keep.to_numpy(zero_copy_only=False)
            flat = flat.filter(keep)
            pri = pri[keep_np]
            dep = dep[keep_np]
            seqs = seqs.filter(keep)
    urls = flat.to_pylist()
    return pa.table(
        {
            "url": pc.cast(flat, pa.string()),
            "host": pa.array(hosts_of(urls), pa.string()),
            "path": pa.array(paths_of(urls), pa.string()),
            "priority": pa.array(pri, pa.float64()),
            "depth": pa.array(dep, pa.int32()),
            "seq": pc.cast(seqs, pa.string()),
        }
    )


def seeds_to_frontier(seeds: pa.Table, canonicalize: bool = False) -> pa.Table:
    if canonicalize:
        from ..functions.urlnorm import canonicalize_urls

        seeds = seeds.set_column(
            seeds.column_names.index("url"), "url",
            canonicalize_urls(seeds["url"].cast(pa.string())),
        )
    urls = seeds["url"].to_pylist()
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts_of(urls), pa.string()),
            "path": pa.array(paths_of(urls), pa.string()),
            "priority": pa.compute.cast(seeds["priority"], pa.float64()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "seq": pa.array(
                [f"{int(s):06d}" for s in seeds["seed_id"].to_pylist()],
                pa.string(),
            ),
        }
    )


def _round_dir(base: str, r: int) -> str:
    # NOT key=value naming: hive inference must not invent columns
    return os.path.join(base, f"r{r:05d}")


# --------------------------------------------------------------------------
# the crawl loop
# --------------------------------------------------------------------------

class _Crawl:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        if cfg.robots_mode == "http":
            # live-deployment robots discovery: GET /robots.txt once per
            # NEW host through the fetch transport (lazily, as hosts
            # first appear in a round's candidates); a missing file is
            # the conventional "unrestricted". Robots state is
            # driver-held either way (same as corpus mode), so live
            # discovery adds no new scaling term — one GET per distinct
            # host over the whole crawl.
            if not cfg.http_base:
                raise ValueError(
                    "robots_mode='http' requires http_base")
            self.robots = {}
            self._robots_probed: set[str] = set()
            self._robots_transport = None
        else:
            self.robots = load_robots(
                os.path.join(cfg.corpus_dir, "robots.parquet"))
        self.seen = SeenSet(cfg.num_seen_shards, mode=cfg.seen_mode)
        # adaptive politeness EWMA: one float per OBSERVED host,
        # driver-held like the robots table (politeness state shares
        # that scale assumption: rules/latency are per-host, orders of
        # magnitude smaller than the frontier; shard with the robots
        # state if host cardinality ever outgrows the driver)
        self.host_lat_ewma: dict[str, float] = {}
        # server-directed backoff (RFC 9110 Retry-After on 429/503):
        # host -> wall-clock deadline before which its quota is 0.
        # Driver-held like the EWMA (same per-host scale assumption);
        # live-HTTP only — corpus modes never produce the signal.
        self.host_backoff_until: dict[str, float] = {}
        self.frontier_dir = os.path.join(cfg.out_dir, "frontier")
        self.extracted_dir = os.path.join(cfg.out_dir, "extracted")
        self.seen_ckpt_dir = os.path.join(cfg.out_dir, "seen_ckpt")
        self.metrics_path = os.path.join(cfg.out_dir, "metrics.jsonl")
        if cfg.fetch_mode == "broadcast":
            self.fetch_kwargs = {"pages_ref": broadcast_pages(cfg.pages_dir)}
        elif cfg.fetch_mode == "http":
            # live-HTTP fetch (F3/F5): actors GET each url over a real
            # socket instead of joining the corpus; headers/timeouts are
            # per-actor transport state
            self.fetch_kwargs = {
                "http_base": cfg.http_base,
                "http_headers": cfg.http_headers,
                "http_timeout_s": cfg.http_timeout_s,
                "http_max_per_host": cfg.http_max_per_host,
                "http_max_body_bytes": cfg.http_max_body_bytes,
            }
        else:
            # bucket-aligned routing -> each actor owns ~num_buckets/pool
            # buckets; size the LRU cache to hold them all
            owned = -(-cfg.num_buckets // max(1, cfg.fetch_concurrency)) + 1
            self._cache_cap = max(cfg.cache_buckets, owned)
            self.fetch_kwargs = {
                "pages_dir": cfg.pages_dir,
                "num_buckets": cfg.num_buckets,
                "cache_buckets": self._cache_cap,
            }
        self.fetch_kwargs["enrich"] = cfg.enrich_text
        self._seen_kwargs = {
            "shards": self.seen.shards,
            "num_shards": cfg.num_seen_shards,
        }
        self._pool: list | None = None  # persistent fetch actors (driver mode)
        self._bucket_owner: dict[int, int] = {}  # bucket -> last actor
        self._next_frontier: pa.Table | None = None  # in-memory round handoff
        spawn_eagerly = cfg.scheduler == "driver"
        if cfg.scheduler == "auto" and not cfg.resume:
            # peek round 0's frontier size from Parquet metadata (free):
            # spawn the driver-path fetch pool eagerly ONLY when round 0
            # will actually take the driver path, so an all-distributed
            # auto run never holds an idle warm actor pool for its whole
            # life (ADVICE r3). Eager warmup matters when it IS the
            # driver path: worker startup overlaps driver-side setup
            # instead of serializing into round 0.
            try:
                seeds_p = cfg.seeds_path or os.path.join(
                    cfg.corpus_dir, "seeds.parquet")
                spawn_eagerly = (
                    pq.read_metadata(seeds_p).num_rows <= cfg.driver_threshold
                )
            except Exception:
                spawn_eagerly = True
        if spawn_eagerly:
            # Fire-and-forget: never ray.get here.
            for a in self._fetch_pool():
                a.__ray_ready__.remote()
        for s in self.seen.shards:
            s.size.remote()

    _WORKER_ENV = {
        "env_vars": {
            # one actor = one core; pthread OpenBLAS ignores the
            # OMP_NUM_THREADS Ray sets and must be clamped pre-import
            "OPENBLAS_NUM_THREADS": "1",
            "MKL_NUM_THREADS": "1",
            "OMP_NUM_THREADS": "1",
            "NUMEXPR_NUM_THREADS": "1",
        }
    }

    def _fetch_pool(self) -> list:
        if self._pool is None:
            # max_restarts/max_task_retries: a crashed fetch worker is
            # rebuilt (state is derived, not unique: caches refill, the
            # transport reopens) and its in-flight chunk re-executes —
            # process() is deterministic per chunk and its side effects
            # are idempotent (part file overwritten at the same path,
            # seen-set test_and_set), so at-least-once is safe. On a
            # 256-node cluster losing workers is routine, not
            # exceptional. Broadcast mode passes pages_ref (ObjectRef)
            # as a ctor arg — Ray warns restarts need it alive; the
            # engine pins it in self.fetch_kwargs for its lifetime, so
            # restarts during a run always find it
            # (t:test_crawl_survives_actor_kill runs in this mode).
            self._pool = [
                FetchExtractActor.options(
                    runtime_env=self._WORKER_ENV,
                    max_restarts=2,
                    max_task_retries=2,
                ).remote(**self.fetch_kwargs)
                for _ in range(self.cfg.fetch_concurrency)
            ]
        return self._pool

    def _make_chunks(self, sel: pa.Table, pool_size: int):
        """Split the selected rows into fetch chunks.

        broadcast mode: contiguous slices, round-robin over the pool.
        bucketed mode: rows sorted by url-hash bucket, whole buckets
        LPT-assigned to actors with cache affinity, then each actor's
        segments coalesced into full-size multi-bucket chunks — each
        actor serves a stable bucket subset so its LRU bucket cache
        stays warm (the co-partitioned-join discipline) without paying
        a per-bucket task cost.
        """
        cfg = self.cfg
        n = sel.num_rows
        # adaptive chunk size: every round should spread over the whole
        # pool (~4 chunks per actor), capped by fetch_batch_size
        size = min(cfg.fetch_batch_size,
                   max(64, -(-n // (pool_size * 4))))
        if cfg.fetch_mode != "bucketed":
            return [
                (sel.slice(i, size), (i // size) % pool_size)
                for i in range(0, n, size)
            ]
        if n == 0:
            return []
        buckets = (
            hash_strings(sel["url"].to_pylist()) % cfg.num_buckets
        ).astype(np.int64)
        order = np.argsort(buckets, kind="stable")
        sel = sel.take(pa.array(order))
        buckets = buckets[order]
        # bucket-boundary segmentation without a per-row Python loop
        # (this runs on the serial driver path every round)
        starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        ends = np.r_[starts[1:], n]
        counts = ends - starts
        bids = buckets[starts]
        # LPT greedy over THIS round's per-bucket row counts, with
        # affinity preference: the static bucket*pool//num_buckets map
        # left some actors a whole extra bucket (128 buckets over 30
        # actors = 4 vs 5), a structural ~25% load skew that showed up
        # 1:1 as fetch-stage straggler wall (measured util 0.61-0.64 at
        # sf0.1). Buckets go largest-first to the least-loaded actor,
        # except the previous owner keeps a bucket whenever its load is
        # within one fair chunk of the minimum — so assignments stay
        # cache-stable across rounds (bucket-read io is ~2% of fetch
        # busy-time, so occasional ownership moves cost little;
        # imbalance costs 1:1 wall). Deterministic: fixed iteration
        # order, integer loads.
        order2 = np.lexsort((bids, -counts))
        loads = np.zeros(pool_size, dtype=np.int64)
        assign = np.empty(len(bids), dtype=np.int64)
        slack = max(int(size), n // (pool_size * 8))
        # A move evicts the bucket from its owner's warm LRU: the new
        # owner pays a ~0.1s cold Parquet read (measured; read_s /
        # read_misses in metrics.jsonl), while the balance gain is at
        # most counts[k] rows x ~1 ms. Only rebalance buckets carrying
        # at least a full chunk of THIS round's rows — tail rounds
        # (tiny per-bucket counts) freeze ownership entirely, which
        # cut their cold re-reads from ~26-28/round to ~0.
        move_min = int(size)
        self._owner_moves = 0
        # CAPACITY CAP: an actor reading more distinct buckets in one
        # round than its LRU holds thrashes — the in-bucket-order scan
        # evicts exactly what the next segment needs, so EVERY access
        # cold-misses, every round, forever (measured: one actor at 19
        # buckets vs a 17-entry cache re-read ~26 buckets/round). Total
        # capacity pool*cache_cap > num_buckets by construction
        # (cache_cap >= ceil(num_buckets/pool)+1), so an eligible actor
        # always exists; a forced move costs ONE cold read and is warm
        # thereafter.
        cap = getattr(self, "_cache_cap", len(bids) + 1)
        nown = np.zeros(pool_size, dtype=np.int64)
        for k in order2:
            b = int(bids[k])
            elig = np.flatnonzero(nown < cap)
            if not len(elig):
                elig = np.arange(pool_size)
            a = int(elig[np.argmin(loads[elig])])
            prev = self._bucket_owner.get(b)
            if prev is not None and nown[prev] < cap and (
                loads[prev] <= loads[a] + slack
                or int(counts[k]) < move_min
            ):
                a = prev
            if prev is not None and a != prev:
                self._owner_moves += 1
            assign[k] = a
            loads[a] += int(counts[k])
            nown[a] += 1
            self._bucket_owner[b] = a
        # COALESCE each actor's bucket segments into full chunks.
        # Bucket-boundary chunks paid a fixed task cost (dispatch,
        # plasma ship, a per-chunk parquet part) per SEGMENT: a
        # 1,132-row tail round scattered over ~128 buckets issued ~128
        # nine-row tasks — measured fetch-stage utilization 0.23-0.42
        # on such rounds, and even full rounds emitted a runt chunk per
        # bucket. _lookup_bucketed sorts rows by bucket inside the
        # chunk, so a multi-bucket chunk reads identically; crawl order
        # is (priority, seq)-derived and unaffected by chunk shape
        # (conformance suites prove it). Segments stay in ascending
        # bucket order within an actor, so LRU locality is preserved.
        chunks = []
        for a in range(pool_size):
            segs = np.flatnonzero(assign == a)
            if not len(segs):
                continue
            idx = np.concatenate(
                [np.arange(int(starts[k]), int(ends[k])) for k in segs]
            )
            rows = sel.take(pa.array(idx))
            for i in range(0, len(idx), size):
                chunks.append((rows.slice(i, size), a))
        return chunks

    def _ensure_robots(self, hosts) -> None:
        """robots_mode='http': GET /robots.txt for hosts not yet
        probed (batched through one driver-side transport, errors
        swallowed — a 404/unreachable host gets no entry, i.e.
        unrestricted). No-op in corpus mode."""
        if self.cfg.robots_mode != "http":
            return
        new = sorted({h for h in hosts if h} - self._robots_probed)
        if not new:
            return
        if self._robots_transport is None:
            from ..stages.transport import HttpTransport

            self._robots_transport = HttpTransport(
                self.cfg.http_base, headers=self.cfg.http_headers,
                timeout_s=self.cfg.http_timeout_s, concurrency=16,
            )
        from ..stages.robotstxt import robots_from_http

        self.robots.update(
            robots_from_http(new, self._robots_transport))
        self._robots_probed.update(new)

    # -- round scheduling, driver mode ------------------------------------
    def _schedule_driver(self, frontier: pa.Table):
        cfg = self.cfg
        df = frontier.to_pandas()
        n_frontier = len(df)
        df = df.sort_values(["priority", "seq"], ascending=[False, True],
                            kind="mergesort")
        df = df.drop_duplicates("url", keep="first")
        unseen = ~self.seen.contains(df["url"].to_numpy())
        df = df[unseen]
        n_cand = len(df)
        self._ensure_robots(df["host"].unique())
        rob_ok = robots_ok_mask(self.robots, df["host"].to_numpy(),
                                df["path"].to_numpy())
        robots_bad = df[~rob_ok]
        df = df[rob_ok]
        quotas = {
            h: self._effective_quota(h)
            for h in df["host"].unique()
        }
        host_rank = df.groupby("host", sort=False).cumcount().to_numpy()
        in_quota = host_rank < df["host"].map(quotas).to_numpy()
        over_quota = df[~in_quota]
        eligible = df[in_quota]
        if cfg.budget_per_round is not None:
            selected = eligible.head(cfg.budget_per_round)
            over_budget = eligible.iloc[cfg.budget_per_round:]
        else:
            selected = eligible
            over_budget = eligible.iloc[0:0]
        if len(robots_bad):
            self.seen.add(robots_bad["url"].to_numpy())
        if len(selected):
            self.seen.add(selected["url"].to_numpy())
        deferred = pd.concat([over_quota, over_budget])
        sel_tbl = pa.Table.from_pandas(selected.reset_index(drop=True),
                                       preserve_index=False)
        def_tbl = pa.Table.from_pandas(deferred.reset_index(drop=True),
                                       preserve_index=False)
        return n_frontier, n_cand, len(robots_bad), sel_tbl, def_tbl

    def _merge_latency(self, per_actor) -> None:
        """Fold each actor's drained {host: (n, sum_ms)} into the
        crawl-lifetime EWMA (newest round weighted ``adaptive_alpha``)."""
        alpha = self.cfg.adaptive_alpha
        agg: dict[str, list] = {}
        for stats in per_actor:
            if not stats:
                continue
            for h, (n, s) in stats.items():
                cur = agg.setdefault(h, [0, 0.0])
                cur[0] += n
                cur[1] += s
        for h, (n, s) in agg.items():
            obs = s / max(n, 1)
            prev = self.host_lat_ewma.get(h)
            self.host_lat_ewma[h] = (obs if prev is None
                                     else alpha * obs + (1 - alpha) * prev)

    def _merge_retry_after(self, per_actor) -> None:
        """Fold each actor's drained {host: retry_after_s} into the
        backoff deadlines. A host's deadline only extends (the longest
        requested wait wins); delays cap at 1 h so a hostile header
        can't park a host forever (the Heritrix-style sanity cap)."""
        now = time.time()
        for stats in per_actor:
            if not stats:
                continue
            for h, ra in stats.items():
                until = now + min(float(ra), 3600.0)
                if until > self.host_backoff_until.get(h, 0.0):
                    self.host_backoff_until[h] = until

    def _fold_retry_after(self, fetched):
        """Fold the per-row live-HTTP politeness columns (the
        distributed schedulers' signal channel out of map_batches
        actors) into driver state — ``retry_after_s`` -> host backoff
        deadlines, ``fetch_ms`` -> the adaptive-politeness latency EWMA
        — then drop both columns so the extracted schema stays
        identical across scheduler modes. ONE pass, host-cardinality
        driver traffic, like the robots table."""
        adaptive = self.cfg.adaptive_politeness

        def _partial(t: pa.Table) -> pa.Table:
            mask = pc.is_valid(t["retry_after_s"])
            hit = t.filter(mask)
            if hit.num_rows:
                df = hit.select(["host", "retry_after_s"]).to_pandas()
                g = df.groupby("host", sort=False)["retry_after_s"].max()
                ra_h, ra_v = list(g.index), g.to_numpy()
            else:
                ra_h, ra_v = [], np.zeros(0)
            if adaptive:
                mt = t.filter(pc.is_valid(t["fetch_ms"]))
                if mt.num_rows:
                    mdf = mt.select(["host", "fetch_ms"]).to_pandas()
                    mg = mdf.groupby("host", sort=False)["fetch_ms"].agg(
                        ["count", "sum"])
                    lat_h = list(mg.index)
                    lat_n = mg["count"].to_numpy()
                    lat_s = mg["sum"].to_numpy()
                else:
                    lat_h, lat_n, lat_s = [], np.zeros(0), np.zeros(0)
            else:
                lat_h, lat_n, lat_s = [], np.zeros(0), np.zeros(0)
            return pa.table({
                "host": pa.array(list(ra_h) + list(lat_h), pa.string()),
                "kind": pa.array(["ra"] * len(ra_h) + ["ms"] * len(lat_h),
                                 pa.string()),
                "a": pa.array(np.concatenate([ra_v, lat_n]).astype(
                    np.float64), pa.float64()),
                "b": pa.array(np.concatenate([np.zeros(len(ra_h)),
                                              lat_s]).astype(np.float64),
                              pa.float64()),
            })

        parts = fetched.map_batches(
            _partial, batch_format="pyarrow").to_pandas()
        if len(parts):
            ra = parts[parts["kind"] == "ra"]
            if len(ra):
                # a host can appear in several batch partials: max wins
                self._merge_retry_after(
                    [ra.groupby("host")["a"].max().to_dict()])
            ms = parts[parts["kind"] == "ms"]
            if len(ms):
                g = ms.groupby("host")[["a", "b"]].sum()
                self._merge_latency([
                    {h: (int(r["a"]), float(r["b"]))
                     for h, r in g.iterrows()}])
        return fetched.drop_columns(["retry_after_s", "fetch_ms"])

    def _active_backoff_hosts(self) -> frozenset:
        """Hosts whose Retry-After backoff window is still open (expired
        entries are pruned). The distributed scheduler ships this
        host-cardinality set into the quota stage the same way it ships
        the robots table."""
        now = time.time()
        expired = [h for h, u in self.host_backoff_until.items()
                   if now >= u]
        for h in expired:
            del self.host_backoff_until[h]
        return frozenset(self.host_backoff_until)

    def _effective_quota(self, host: str) -> int:
        """Per-round fetch quota for a host: the robots crawl-delay
        quota, tightened by observed latency when adaptive politeness
        is on (effective delay = max(robots, k x EWMA ms)). A host
        inside a server-directed Retry-After window (429/503) gets
        quota 0 — its candidates defer to a later round, never drop."""
        cfg = self.cfg
        until = self.host_backoff_until.get(host)
        if until is not None:
            if time.time() < until:
                return 0
            del self.host_backoff_until[host]
        base = host_quota(self.robots, host, cfg.round_ms)
        if not cfg.adaptive_politeness:
            return base
        ewma = self.host_lat_ewma.get(host)
        if ewma is None:
            return base
        delay_ms = max(1.0, cfg.adaptive_k * ewma)
        return max(1, min(base, int(cfg.round_ms // delay_ms) or 1))

    def _run_round_driver(self, r: int, frontier: pa.Table):
        cfg = self.cfg
        t0 = time.perf_counter()
        (n_frontier, n_cand, n_robots, sel_tbl, def_tbl) = (
            self._schedule_driver(frontier)
        )
        t_sched = time.perf_counter() - t0
        n_sel = sel_tbl.num_rows
        n_err = n_parse_ok = n_links = 0
        t_fetch = 0.0
        self._n_chunks, self._busy_max = 0, 0.0
        self._read_s, self._read_misses = 0.0, 0
        self._busy_s = self._write_s = 0.0
        next_dir = _round_dir(self.frontier_dir, r + 1)
        # clear any parts left by an interrupted attempt at this round
        # (a prior distributed attempt writes UUID-named parts that the
        # deterministic part-{j} names below would not overwrite)
        shutil.rmtree(next_dir, ignore_errors=True)
        link_tbls: list[pa.Table] = []
        if n_sel:
            sel = sel_tbl.select(FRONTIER_COLS)
            pool = self._fetch_pool()
            ext_dir = _round_dir(self.extracted_dir, r)
            shutil.rmtree(ext_dir, ignore_errors=True)
            os.makedirs(ext_dir, exist_ok=True)
            t0 = time.perf_counter()
            # Dynamic dispatch with affinity-first work stealing: static
            # per-actor queues left 15-27% of fetch-stage core-time idle
            # at 8 CPUs (chunk cost varies with content, and a slow /
            # page-faulting worker can't shed load). Each actor keeps at
            # most 2 chunks in flight (its own queue first — the bucket
            # LRU affinity from _make_chunks); an idle actor steals from
            # the LONGEST remaining queue, taking that queue's TAIL so
            # the victim keeps its own cache-local prefix. Results stay
            # indexed by chunk j (part-{j} names, lrefs order), so crawl
            # order and the extracted layout are byte-identical to the
            # static dispatch (conformance suites prove it).
            chunks = self._make_chunks(sel, len(pool))
            queues: list[list[int]] = [[] for _ in pool]
            for j, (_, actor_id) in enumerate(chunks):
                queues[actor_id].append(j)
            lrefs = [None] * len(chunks)
            crefs = [None] * len(chunks)
            pending: dict = {}  # count ref -> actor

            def _submit(actor: int, j: int) -> None:
                _, l, c = pool[actor].process.options(
                    num_returns=3
                ).remote(
                    chunks[j][0], r, cfg.priority_decay, cfg.max_depth,
                    os.path.join(ext_dir, f"part-{j:05d}.parquet"),
                    canonicalize=cfg.canonicalize,
                    trap_filter=cfg.trap_filter,
                )
                lrefs[j] = l
                crefs[j] = c
                pending[c] = actor

            def _next_chunk(actor: int) -> int | None:
                if queues[actor]:
                    return queues[actor].pop(0)
                if not cfg.work_stealing:
                    return None
                victim = max(range(len(queues)),
                             key=lambda a: len(queues[a]))
                if queues[victim]:
                    return queues[victim].pop()
                return None

            if not cfg.work_stealing:
                # static affinity: submit every queue upfront so actors
                # run chunks back-to-back with no driver round-trip
                # between them. Throttled feeding (2 in flight) left
                # actors idle in sub-chunk gaps, and on this host an
                # idle actor's pages get reclaimed — each refeed then
                # re-faults the working set (busy core-s 208 -> 516 at
                # 30 actors when the 2-in-flight loop ran unstealing).
                for a in range(len(pool)):
                    for j in queues[a]:
                        _submit(a, j)
            else:
                # stealing needs slack to re-route: seed own queues
                # first (affinity), THEN let spare slots steal — so no
                # actor loses its cache-local chunks to a neighbor's
                # warm-up
                for a in range(len(pool)):
                    for _ in range(2):
                        if queues[a]:
                            _submit(a, queues[a].pop(0))
                for a in range(len(pool)):
                    while sum(1 for act in pending.values()
                              if act == a) < 2:
                        j = _next_chunk(a)
                        if j is None:
                            break
                        _submit(a, j)
                while pending:
                    done, _ = ray.wait(list(pending), num_returns=1)
                    actor = pending.pop(done[0])
                    j = _next_chunk(actor)
                    if j is not None:
                        _submit(actor, j)
            counts = ray.get(crefs)
            link_tbls = [t for t in ray.get(lrefs) if t.num_rows]
            t_fetch = time.perf_counter() - t0
            # straggler visibility: wall lower bound is the max chunk
            self._n_chunks = len(counts)
            self._busy_max = max(
                (c.get("busy_s", 0.0) for c in counts), default=0.0)
            n_err = sum(c["errors"] for c in counts)
            n_parse_ok = sum(c["parse_ok"] for c in counts)
            n_links = sum(c["links"] for c in counts)
            self._busy_s = sum(c.get("busy_s", 0.0) for c in counts)
            self._write_s = sum(c.get("write_s", 0.0) for c in counts)
            self._read_s = sum(c.get("read_s", 0.0) for c in counts)
            self._read_misses = sum(
                c.get("read_misses", 0) for c in counts)
            if cfg.adaptive_politeness:
                self._merge_latency(c.get("latency") for c in counts)
            # Retry-After obedience is unconditional politeness, not
            # an adaptive-mode option (only http mode emits the signal)
            self._merge_retry_after(
                c.get("retry_after") for c in counts)
        n_next = n_links + def_tbl.num_rows
        t0 = time.perf_counter()
        self._next_frontier = None
        if n_next:
            parts = link_tbls + (
                [def_tbl.select(FRONTIER_COLS)] if def_tbl.num_rows else []
            )
            nxt = pa.concat_tables(parts, promote_options="default")
            # in-memory handoff to the next round; Parquet checkpoint kept
            # for resume and for a potential distributed-scheduler round
            self._next_frontier = nxt
            os.makedirs(next_dir, exist_ok=True)
            pq.write_table(nxt, os.path.join(next_dir, "part-0.parquet"))
        t_frontier = time.perf_counter() - t0
        return {
            "t_sched": round(t_sched, 3),
            "t_fetch": round(t_fetch, 3),
            "t_frontier": round(t_frontier, 3),
            "busy_s": round(getattr(self, "_busy_s", 0.0), 3),
            "io_s": round(getattr(self, "_write_s", 0.0), 3),
            "read_s": round(getattr(self, "_read_s", 0.0), 3),
            "read_misses": getattr(self, "_read_misses", 0),
            "owner_moves": getattr(self, "_owner_moves", 0),
            "n_chunks": getattr(self, "_n_chunks", 0),
            "busy_max_chunk": round(getattr(self, "_busy_max", 0.0), 3),
            "frontier": n_frontier,
            "candidates": n_cand,
            "robots_skipped": n_robots,
            "selected": n_sel,
            "deferred": n_cand - n_robots - n_sel,
            "fetch_errors": n_err,
            "parse_ok": n_parse_ok,
            "next_frontier": n_next,
        }

    # -- round scheduling, distributed mode --------------------------------
    def _run_round_distributed(self, r: int, frontier_ds, frontier_n: int):
        cfg = self.cfg
        t_round0 = time.perf_counter()
        # distributed rounds read AND write the seen shards through raw
        # handles (seen_contains_filter / seen_add_batch tasks),
        # bypassing the driver facade: fence any in-flight async adds
        # from a preceding driver round (worker-submitted actor calls
        # have no ordering guarantee against them), and disable the
        # facade's empty-set fast path from here on
        self.seen.fence()
        self.seen.mark_external_writes()
        if self._pool:  # release reserved CPUs before dataset execution
            for a in self._pool:
                ray.kill(a)
            self._pool = None
        cand = _dedup_urls_distributed(frontier_ds)
        cand = cand.map_batches(
            seen_contains_filter, fn_kwargs=self._seen_kwargs,
            batch_format="pyarrow",
        )
        if cfg.robots_mode == "http":
            # live robots need this round's distinct hosts before the
            # filter can run: pin the candidates (they're consumed
            # again below) and pull per-block distinct-host partials —
            # host-cardinality driver traffic, not row-cardinality
            cand = cand.materialize()
            host_tbls = cand.map_batches(
                lambda t: pa.table({"host": pc.unique(
                    t["host"].combine_chunks())}),
                batch_format="pyarrow",
            ).to_pandas()
            self._ensure_robots(host_tbls["host"].to_numpy())
        cand = cand.map_batches(
            robots_filter_batch, fn_kwargs={"robots": self.robots},
            batch_format="pyarrow",
        )
        backoff = self._active_backoff_hosts()
        # adaptive politeness on the distributed path: per-host
        # EFFECTIVE quotas (EWMA-tightened, backoff-folded) computed
        # driver-side — host-cardinality state, shipped by value like
        # the robots table; same math the driver scheduler applies
        overrides: dict[str, int] = {}
        if cfg.adaptive_politeness:
            for h in list(self.host_lat_ewma):
                q = self._effective_quota(h)
                if q < host_quota(self.robots, h, cfg.round_ms):
                    overrides[h] = q
        if cfg.salt_hosts == 0:
            # legacy unsalted per-host groupby (conformance reference;
            # skew-unsafe — a hot host's whole frontier share lands in
            # one group)
            cand = cand.groupby("host").map_groups(
                host_quota_rank,
                fn_kwargs={"robots": self.robots, "round_ms": cfg.round_ms,
                           "backoff_hosts": backoff,
                           "quota_overrides": overrides},
                batch_format="pandas",
            )
        else:
            from ..stages.politeness import host_quota_partitioned

            num_salts = 8 if cfg.salt_hosts == "auto" else int(cfg.salt_hosts)
            # the stage pins its input itself when (and only when) the
            # robots table makes it multi-pass (unlimited-host bypass)
            cand = host_quota_partitioned(
                cand, self.robots, cfg.round_ms, num_salts=num_salts,
                backoff_hosts=backoff, quota_overrides=overrides,
            )
        if cfg.budget_per_round is None:
            # open-budget (the scale path): no global sort+limit is
            # coming, so nothing needs the candidate set materialized
            # or pre-counted — stream the quota output straight into
            # the fetch execution (VERDICT r4 #7: two fewer Dataset
            # executions of fixed cost per round)
            return self._run_round_fused(r, cand, frontier_n, t_round0)
        cand = cand.materialize()
        n_cand = cand.count()
        t_sched = time.perf_counter() - t_round0

        # ONE fused pass over the materialized candidates replaces the
        # three separate _filter(...).count() executions of earlier
        # rounds (the ~19 s/round fixed cost VERDICT r3 flagged):
        # robots-disallowed rows register in the seen set (idempotent
        # side effect, safe under task retry) and per-block counters
        # tree-reduce through Dataset.sum — no row funnel to the driver.
        seen_kwargs = self._seen_kwargs

        def _mark_and_count(t: pa.Table) -> pa.Table:
            ok = np.asarray(t["robots_ok"], dtype=bool)
            inq = np.asarray(t["in_quota"], dtype=bool)
            bad = t.filter(pa.array(~ok))
            if bad.num_rows:
                seen_add_batch(bad, **seen_kwargs)
            return pa.table({
                "n_robots": pa.array([bad.num_rows], pa.int64()),
                "n_eligible": pa.array([int((ok & inq).sum())], pa.int64()),
            })

        n_robots = n_eligible = 0
        if n_cand:
            agg = cand.map_batches(
                _mark_and_count, batch_format="pyarrow"
            ).sum(["n_robots", "n_eligible"])
            if agg:
                n_robots = int(agg["sum(n_robots)"])
                n_eligible = int(agg["sum(n_eligible)"])

        eligible = _filter(
            cand,
            lambda t: np.asarray(t["robots_ok"], bool)
            & np.asarray(t["in_quota"], bool),
        ).drop_columns(["robots_ok", "in_quota"])
        over_quota = _filter(
            cand,
            lambda t: np.asarray(t["robots_ok"], bool)
            & ~np.asarray(t["in_quota"], bool),
        ).drop_columns(["robots_ok", "in_quota"])

        deferred_parts = [over_quota]
        if cfg.budget_per_round is not None:
            if n_eligible > cfg.budget_per_round:
                selected = (
                    eligible.sort(["priority", "seq"], descending=[True, False])
                    .limit(cfg.budget_per_round)
                    .materialize()
                )
                # the selected set is BY CONSTRUCTION a prefix of the
                # (priority DESC, seq ASC) total order (seq is unique),
                # so membership reduces to a 2-value boundary threshold:
                # broadcast the last selected row's (priority, seq) and
                # the anti-join becomes two vectorized comparisons — no
                # driver-built seq set, no per-row membership probes.
                from ..util import ensure_arrow

                # walk back past empty trailing blocks: a range-
                # partitioned sort + limit can legitimately emit them,
                # and indexing row -1 of one would crash the round
                last_block = None
                for ref in reversed(selected.to_arrow_refs()):
                    cand_block = ensure_arrow(ray.get(ref))
                    if cand_block.num_rows:
                        last_block = cand_block
                        break
                assert last_block is not None  # n_eligible > budget > 0
                bound_pri = last_block["priority"][-1].as_py()
                bound_seq = last_block["seq"][-1].as_py()

                def _after_boundary(t: pa.Table) -> pa.Table:
                    import pyarrow.compute as pc

                    pri = t["priority"]
                    keep = pc.or_(
                        pc.less(pri, pa.scalar(bound_pri)),
                        pc.and_(
                            pc.equal(pri, pa.scalar(bound_pri)),
                            pc.greater(t["seq"], pa.scalar(bound_seq)),
                        ),
                    )
                    return t.filter(pc.fill_null(keep, False))

                deferred_parts.append(
                    eligible.map_batches(_after_boundary,
                                         batch_format="pyarrow")
                )
            else:
                selected = eligible
        else:
            selected = eligible

        t_fetch0 = time.perf_counter()
        marked = selected.map_batches(
            seen_add_batch, fn_kwargs=self._seen_kwargs,
            batch_format="pyarrow",
        )
        if self.fetch_kwargs.get("http_base") is not None:
            # live HTTP: per-actor transport state is real — actor pool.
            # emit_retry_after rides the 429/503 backoff signal out as a
            # per-row column (map_batches actors can't be drained like
            # the driver path's raw actors).
            fetched = marked.map_batches(
                FetchExtract,
                fn_constructor_kwargs=self.fetch_kwargs,
                fn_kwargs={"round_no": r, "emit_retry_after": True},
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                concurrency=(1, cfg.fetch_concurrency),
            ).materialize()
            fetched = self._fold_retry_after(fetched)
        else:
            # corpus modes: TASK pool with per-worker-process cached
            # lookup state (stages/fetch.py:fetch_extract_task) — a
            # fresh actor pool per round paid spin-up and lost the
            # bucket cache every round
            from ..stages.fetch import fetch_extract_task

            fetched = marked.map_batches(
                fetch_extract_task,
                fn_kwargs={"round_no": r, **self.fetch_kwargs},
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
            ).materialize()
        n_sel = fetched.count()
        t_fetch = time.perf_counter() - t_fetch0

        # Fused write+count: ONE pass over the materialized fetch output
        # writes its extracted-parquet part (deterministic name from the
        # task identity, so an at-least-once re-execution OVERWRITES its
        # own part instead of duplicating rows — the dir is cleared up
        # front, so stale parts from an interrupted attempt can't
        # accumulate either) and emits the error/parse counters that
        # used to be two more filter+count executions.
        ext_dir = _round_dir(self.extracted_dir, r)
        shutil.rmtree(ext_dir, ignore_errors=True)
        os.makedirs(ext_dir, exist_ok=True)

        def _write_and_count(t: pa.Table) -> pa.Table:
            import hashlib
            import tempfile

            found = np.asarray(t["found"], dtype=bool)
            pok = np.asarray(
                pa.compute.and_kleene(t["found"], t["parse_ok"])
                .combine_chunks().fill_null(False)
            )
            if t.num_rows:
                try:
                    tid = (ray.get_runtime_context().get_task_id()
                           or "driver")
                except Exception:
                    tid = "driver"
                # part identity = (task id, first url): replay-stable
                # (a retry on the SAME still-alive worker used to
                # continue a process-global counter and mint fresh
                # names for replayed blocks -> duplicate parts); urls
                # are round-unique, so names are distinct per block
                name = hashlib.md5(
                    f"{tid}:{t['url'][0].as_py()}".encode()
                ).hexdigest()[:16]
                # "."-prefixed tmp: a crash between mkstemp and replace
                # leaves an orphan that every Parquet reader IGNORES
                # (pyarrow dataset discovery skips '.'/'_' prefixes), so
                # an interrupted attempt can't poison the extracted dir
                fd, tmp = tempfile.mkstemp(dir=ext_dir, prefix=".tmp-")
                os.close(fd)
                pq.write_table(t, tmp)
                os.replace(tmp, os.path.join(ext_dir,
                                             f"part-{name}.parquet"))
            return pa.table({
                "n_err": pa.array([int((~found).sum())], pa.int64()),
                "n_parse_ok": pa.array([int(pok.sum())], pa.int64()),
            })

        n_err = n_parse_ok = 0
        if n_sel:
            agg = fetched.map_batches(
                _write_and_count, batch_format="pyarrow"
            ).sum(["n_err", "n_parse_ok"])
            if agg:
                n_err = int(agg["sum(n_err)"])
                n_parse_ok = int(agg["sum(n_parse_ok)"])

        nxt = fetched.map_batches(
            _explode_links,
            fn_kwargs={"decay": cfg.priority_decay,
                       "max_depth": cfg.max_depth,
                       "canonicalize": cfg.canonicalize,
                       "trap_filter": cfg.trap_filter},
            batch_format="pyarrow",
        ).select_columns(FRONTIER_COLS)
        for part in deferred_parts:
            nxt = nxt.union(part.select_columns(FRONTIER_COLS))
        # write-then-metadata-count: ONE execution (the write) instead of
        # materialize + count + write; the row count comes free from the
        # written files' Parquet metadata
        next_dir = _round_dir(self.frontier_dir, r + 1)
        shutil.rmtree(next_dir, ignore_errors=True)  # overwrite guarantee
        nxt.write_parquet(next_dir)
        try:
            n_next = pads.dataset(next_dir).count_rows()
        except FileNotFoundError:
            n_next = 0
        if n_next == 0:
            shutil.rmtree(next_dir, ignore_errors=True)
        return {
            # per-stage wall times (north-rule per-stage metrics; the
            # driver path records the analogous keys): t_sched = dedup/
            # seen/robots/quota through the candidate materialize,
            # t_fetch = the fetch-join execution, t_frontier = write+
            # counters + link explode + next-frontier write
            "t_sched": round(t_sched, 3),
            "t_fetch": round(t_fetch, 3),
            "t_frontier": round(
                time.perf_counter() - t_round0 - t_sched - t_fetch, 3),
            "frontier": frontier_n,
            "candidates": n_cand,
            "robots_skipped": n_robots,
            "selected": n_sel,
            "deferred": n_cand - n_robots - n_sel,
            "fetch_errors": n_err,
            "parse_ok": n_parse_ok,
            "next_frontier": n_next,
        }

    def _run_round_fused(self, r: int, cand, frontier_n: int,
                         t_round0: float):
        """Open-budget distributed round, FUSED: the lazy candidate
        lineage (dedup -> seen -> robots -> quota) streams directly
        into the fetch execution. A pre-fetch map tags each row's fate
        ('f' fetch / 'd' deferred / 'b' robots-bad) and registers
        robots-bad + selected rows in the seen set (idempotent, safe
        under task retry); non-fetch rows pass through the fetch stage
        null-aligned. ONE materialized output then serves the
        extracted-parquet write, every round counter, the link explode
        and the next-frontier parts — 4 Dataset executions per round
        (quota pin, quota phase 1, the fused fetch materialize, the
        write+count pass) instead of the budget path's 7 (saved: the
        candidate materialize, the counter pre-pass, and the separate
        next-frontier write — pure fixed cost). Only valid with no
        global budget: a budget needs n_eligible and a sort+limit
        BEFORE any fetch happens."""
        cfg = self.cfg
        seen_kwargs = self._seen_kwargs
        t_sched = time.perf_counter() - t_round0

        def _split_mark(t: pa.Table) -> pa.Table:
            ok = np.asarray(t["robots_ok"], dtype=bool)
            inq = np.asarray(t["in_quota"], dtype=bool)
            state = np.where(ok & inq, "f", np.where(ok, "d", "b"))
            # ONE seen-marking call for the disjoint union of selected
            # and robots-bad rows (everything except deferred) — each
            # call is a blocking fan-out over the shard actors, so two
            # serial calls doubled the per-batch marking latency
            mark = t.filter(pa.array(~ok | (ok & inq)))
            if mark.num_rows:
                seen_add_batch(mark, **seen_kwargs)
            return t.drop_columns(["robots_ok", "in_quota"]).append_column(
                "_state", pa.array(state.tolist(), pa.string()))

        t_fetch0 = time.perf_counter()
        tagged = cand.map_batches(_split_mark, batch_format="pyarrow")
        if self.fetch_kwargs.get("http_base") is not None:
            from ..stages.fetch import FetchExtractPassthrough

            fetched = tagged.map_batches(
                FetchExtractPassthrough,
                fn_constructor_kwargs=self.fetch_kwargs,
                fn_kwargs={"round_no": r, "emit_retry_after": True},
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                concurrency=(1, cfg.fetch_concurrency),
            ).materialize()
            fetched = self._fold_retry_after(fetched)
        else:
            from ..stages.fetch import fetch_or_pass_task

            fetched = tagged.map_batches(
                fetch_or_pass_task,
                fn_kwargs={"round_no": r, **self.fetch_kwargs},
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
            ).materialize()
        t_fetch = time.perf_counter() - t_fetch0

        # fused write + ALL round counters + next-frontier parts: ONE
        # pass over the materialized fetch output (same deterministic
        # part naming / atomic-replace discipline as the budget path).
        # Link explode happens per block (passthrough rows carry null
        # links and contribute nothing); deferred rows rejoin the next
        # frontier in the same part — no separate write execution.
        ext_dir = _round_dir(self.extracted_dir, r)
        shutil.rmtree(ext_dir, ignore_errors=True)
        os.makedirs(ext_dir, exist_ok=True)
        next_dir = _round_dir(self.frontier_dir, r + 1)
        shutil.rmtree(next_dir, ignore_errors=True)
        os.makedirs(next_dir, exist_ok=True)
        explode_kwargs = {"decay": cfg.priority_decay,
                          "max_depth": cfg.max_depth,
                          "canonicalize": cfg.canonicalize,
                          "trap_filter": cfg.trap_filter}

        def _atomic_part(tbl: pa.Table, out_dir: str, name: str) -> None:
            import tempfile

            fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".tmp-")
            os.close(fd)
            pq.write_table(tbl, tmp)
            os.replace(tmp, os.path.join(out_dir, f"part-{name}.parquet"))

        def _write_and_count(t: pa.Table) -> pa.Table:
            import hashlib

            st = t["_state"]
            f_mask = pc.equal(st, "f")
            f_rows = t.filter(f_mask).drop_columns(["_state"])
            n_b = int(pc.sum(pc.cast(pc.equal(st, "b"),
                                     pa.int64())).as_py() or 0)
            if t.num_rows == 0:
                return pa.table({
                    "n_cand": pa.array([0], pa.int64()),
                    "n_sel": pa.array([0], pa.int64()),
                    "n_robots": pa.array([0], pa.int64()),
                    "n_err": pa.array([0], pa.int64()),
                    "n_parse_ok": pa.array([0], pa.int64()),
                })
            try:
                tid = (ray.get_runtime_context().get_task_id()
                       or "driver")
            except Exception:
                tid = "driver"
            # replay-stable part identity (see the budget path's note):
            # (task id, first url) — no process-global counter
            name = hashlib.md5(
                f"{tid}:{t['url'][0].as_py()}".encode()).hexdigest()[:16]
            n_err = n_pok = 0
            if f_rows.num_rows:
                found = np.asarray(f_rows["found"], dtype=bool)
                pok = np.asarray(
                    pa.compute.and_kleene(f_rows["found"],
                                          f_rows["parse_ok"])
                    .combine_chunks().fill_null(False))
                n_err = int((~found).sum())
                n_pok = int(pok.sum())
                _atomic_part(f_rows, ext_dir, name)
            links = _explode_links(t, **explode_kwargs)
            defer = t.filter(pc.equal(st, "d")).select(FRONTIER_COLS)
            nxt_part = pa.concat_tables(
                [links.select(FRONTIER_COLS), defer],
                promote_options="default")
            if nxt_part.num_rows:
                _atomic_part(nxt_part, next_dir, name)
            return pa.table({
                "n_cand": pa.array([t.num_rows], pa.int64()),
                "n_sel": pa.array([f_rows.num_rows], pa.int64()),
                "n_robots": pa.array([n_b], pa.int64()),
                "n_err": pa.array([n_err], pa.int64()),
                "n_parse_ok": pa.array([n_pok], pa.int64()),
            })

        n_cand = n_sel = n_robots = n_err = n_parse_ok = 0
        agg = fetched.map_batches(
            _write_and_count, batch_format="pyarrow"
        ).sum(["n_cand", "n_sel", "n_robots", "n_err", "n_parse_ok"])
        if agg:
            n_cand = int(agg["sum(n_cand)"])
            n_sel = int(agg["sum(n_sel)"])
            n_robots = int(agg["sum(n_robots)"])
            n_err = int(agg["sum(n_err)"])
            n_parse_ok = int(agg["sum(n_parse_ok)"])
        try:
            n_next = pads.dataset(next_dir).count_rows()
        except Exception:
            n_next = 0
        if n_next == 0:
            shutil.rmtree(next_dir, ignore_errors=True)
        return {
            "t_sched": round(t_sched, 3),
            "t_fetch": round(t_fetch, 3),
            "t_frontier": round(
                time.perf_counter() - t_round0 - t_sched - t_fetch, 3),
            "frontier": frontier_n,
            "candidates": n_cand,
            "robots_skipped": n_robots,
            "selected": n_sel,
            "deferred": n_cand - n_robots - n_sel,
            "fetch_errors": n_err,
            "parse_ok": n_parse_ok,
            "next_frontier": n_next,
        }

    def _checkpoint_round(self, r: int, ckpt_marker: str) -> None:
        """Round-stamped seen checkpoint + atomic marker + GC.

        Order matters: (1) write seen_ckpt/r{r}/ completely, (2) atomically
        point the marker at it (tmp + os.replace), (3) only then delete
        older round dirs. A crash at any point leaves a marker that names
        a COMPLETE dir whose content is exactly "end of round marker"."""
        d = os.path.join(self.seen_ckpt_dir, f"r{r:05d}")
        self.seen.checkpoint(d)
        tmp = ckpt_marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(r))
        os.replace(tmp, ckpt_marker)
        for name in os.listdir(self.seen_ckpt_dir):
            if name.startswith("r") and name != f"r{r:05d}":
                shutil.rmtree(os.path.join(self.seen_ckpt_dir, name),
                              ignore_errors=True)

    # -- main loop ---------------------------------------------------------
    def run(self) -> CrawlResult:
        cfg = self.cfg
        os.makedirs(cfg.out_dir, exist_ok=True)
        metrics: list[dict] = []
        start_round = 0
        ckpt_marker = os.path.join(self.seen_ckpt_dir, "ROUND")
        if cfg.resume and os.path.exists(self.metrics_path):
            with open(self.metrics_path) as f:
                metrics = [json.loads(line) for line in f if line.strip()]
            # resume only from the last round with a seen-set checkpoint;
            # later rounds are re-run deterministically (outputs overwrite).
            # Checkpoints are ROUND-STAMPED dirs and the marker is written
            # (atomically) only after its dir is complete, so the restored
            # seen state is exactly "end of round marker" — never newer
            # (a newer seen set would silently drop re-run rounds' links).
            ckpt_round = -1
            if os.path.exists(ckpt_marker):
                with open(ckpt_marker) as f:
                    ckpt_round = int(f.read().strip())
            metrics = [m for m in metrics if m["round"] <= ckpt_round]
            # ALWAYS rewrite the filtered log — a crash before the first
            # checkpoint (ckpt_round -1, filtered list empty) used to
            # leave the stale file intact and append re-run rounds to
            # it, duplicating round records for every metrics consumer
            with open(self.metrics_path, "w") as f:
                for m in metrics:
                    f.write(json.dumps(m) + "\n")
            if metrics:
                start_round = metrics[-1]["round"] + 1
                self.seen.restore(
                    os.path.join(self.seen_ckpt_dir, f"r{ckpt_round:05d}")
                )
        else:
            for sub in ("frontier", "extracted", "seen_ckpt"):
                shutil.rmtree(os.path.join(cfg.out_dir, sub),
                              ignore_errors=True)
            if os.path.exists(self.metrics_path):
                os.remove(self.metrics_path)

        if start_round == 0:
            seeds = pq.read_table(
                cfg.seeds_path
                or os.path.join(cfg.corpus_dir, "seeds.parquet"))
            d = _round_dir(self.frontier_dir, 0)
            os.makedirs(d, exist_ok=True)
            pq.write_table(seeds_to_frontier(seeds, cfg.canonicalize),
                           os.path.join(d, "part-0.parquet"))

        total_fetched = total_errors = 0
        r = start_round
        with open(self.metrics_path, "a") as mf:
            while r < cfg.max_rounds:
                t0 = time.perf_counter()
                fdir = _round_dir(self.frontier_dir, r)
                mem = self._next_frontier
                self._next_frontier = None
                if mem is not None:
                    frontier_n = mem.num_rows
                elif os.path.exists(fdir):
                    frontier_n = pads.dataset(fdir).count_rows()
                else:
                    break
                if frontier_n == 0:
                    break
                use_driver = cfg.scheduler == "driver" or (
                    cfg.scheduler == "auto"
                    and frontier_n <= cfg.driver_threshold
                )
                if use_driver:
                    tbl = (
                        mem
                        if mem is not None
                        else pads.dataset(fdir).to_table(columns=FRONTIER_COLS)
                    )
                    rec = self._run_round_driver(r, tbl.select(FRONTIER_COLS))
                else:
                    frontier = rd.read_parquet(fdir).map_batches(
                        lambda t: t.select(FRONTIER_COLS),
                        batch_format="pyarrow",
                    )
                    rec = self._run_round_distributed(r, frontier, frontier_n)
                total_fetched += rec["selected"] - rec["fetch_errors"]
                total_errors += rec["fetch_errors"]
                rec.update(
                    round=r,
                    seen_size=self.seen.size(),
                    wall_s=round(time.perf_counter() - t0, 3),
                    scheduler="driver" if use_driver else "distributed",
                )
                metrics.append(rec)
                # metrics BEFORE checkpoint/marker: resume treats a round
                # as complete only when both exist, and the resume filter
                # keeps metrics <= marker — so a crash between the two
                # re-runs round r with a seen set that does NOT yet
                # contain round r's selections (the reverse order would
                # silently drop the round's link expansions)
                mf.write(json.dumps(rec) + "\n")
                mf.flush()
                if cfg.ckpt_every and (r + 1) % cfg.ckpt_every == 0:
                    self._checkpoint_round(r, ckpt_marker)
                r += 1
                if rec["next_frontier"] == 0:
                    break
            if r > start_round and cfg.ckpt_every != 1:
                self._checkpoint_round(r - 1, ckpt_marker)

        return CrawlResult(
            out_dir=cfg.out_dir,
            rounds=r,
            total_fetched=total_fetched,
            total_errors=total_errors,
            seen_size=self.seen.size(),
            metrics=metrics,
        )


def run_crawl(cfg: CrawlConfig) -> CrawlResult:
    return _Crawl(cfg).run()


def read_crawl_order(out_dir: str) -> pa.Table:
    """Deterministic crawl order: (round ASC, priority DESC, seq ASC)."""
    dset = pads.dataset(os.path.join(out_dir, "extracted"))
    t = dset.to_table(columns=["url", "priority", "seq", "round", "found"])
    df = t.to_pandas().sort_values(
        ["round", "priority", "seq"], ascending=[True, False, True],
        kind="mergesort",
    )
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
