"""Fetch stage: frontier ⋈ pages lookup + extraction, as an actor pool.

The reference's live ``HTTP.get`` (/root/reference/siren/core/http.py:91-114)
becomes a hash lookup against the Parquet ``pages`` corpus (SURVEY.md §1.3,
§2.2 F2): a left join of the frontier on ``url`` where misses produce
fetch-error rows instead of silently vanishing (F4 semantics, recorded).

Two physical strategies, both stateful actor pools
(``map_batches(FetchExtract, concurrency=N)``):

- **broadcast**: the (url, html) side is ``ray.put`` once by the driver;
  every actor maps it zero-copy from the local object store and builds a
  url -> row-index dict once in ``__init__``. Right choice while the
  corpus fits a node's object store (small-side broadcast join).
- **bucketed**: pages are stored hash-partitioned by
  ``bucket = hash64(url) % NUM_BUCKETS``; each actor reads only the
  bucket partitions its batch needs (Parquet partition pruning) and
  caches decoded buckets LRU-style. This is the 100 TB path: frontier
  and pages co-partitioned by url hash, so the "join" never shuffles the
  big side and each bucket is read by a bounded number of actors.

After lookup the actor runs the extraction UDF in the same batch (html
never leaves the actor — only extracted text and links flow on).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray

from ..util import hash_strings
from .extract import extract_batch

def _pin_worker_threads() -> None:
    """One actor = one core: clamp library thread pools.

    pip numpy ships pthread OpenBLAS, which ignores OMP_NUM_THREADS (the
    one Ray sets) and sizes its pool to ALL cores — N actors x N BLAS
    threads thrashed the box (6x core-time inflation at 32 actors).
    Must run before the first BLAS call in the process.
    """
    import os

    for var in ("OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "OMP_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    try:
        import ctypes

        ctypes.CDLL("libopenblas.so.0", mode=ctypes.RTLD_GLOBAL)
    except OSError:
        pass
    try:  # numpy >= 1.26 bundles openblas accessible via threadpool API
        from numpy._core import _multiarray_umath  # noqa: F401
    except ImportError:
        pass
    try:
        import numpy.linalg  # ensure BLAS loaded under the env clamp
        _ = np.dot(np.ones((2, 2), np.float32), np.ones((2, 2), np.float32))
    except Exception:
        pass
    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)


_NULL_EXTRACT_COLS: list[tuple[str, pa.DataType]] = [
    ("kind", pa.string()),
    ("parse_ok", pa.bool_()),
    ("text", pa.string()),
    ("title", pa.string()),
    ("author", pa.string()),
    ("headline", pa.string()),
    ("location", pa.string()),
    ("published_ts", pa.timestamp("us")),
    ("links", pa.list_(pa.string())),
]


# per-worker-process caches (CLAUDE.md task-pool discipline): Ray worker
# processes persist across Dataset executions, so corpus-lookup state
# cached here survives the per-round map_batches teardown that destroys
# actor instances. Bounded: one broadcast corpus, cache_buckets buckets.
_BCAST_COLS_CACHE: dict = {}
_BUCKET_CACHE: OrderedDict = OrderedDict()
_FETCH_CACHE: dict = {}


def _cached_fetch(cls, **kwargs):
    """Per-worker-process fetch-stage construction cache for TASK-pool
    use (corpus modes only — live-HTTP keeps a real per-actor
    transport). Keyed by (class, lookup identity); the heavy state
    behind it (broadcast columns / bucket LRU) is itself
    process-global, so even a key miss only pays object
    construction."""
    ref = kwargs.get("pages_ref")
    key = (
        cls.__name__,
        ref.hex() if isinstance(ref, ray.ObjectRef) else id(ref),
        kwargs.get("pages_dir"), kwargs.get("num_buckets"),
        kwargs.get("cache_buckets"), kwargs.get("enrich"),
    )
    fe = _FETCH_CACHE.get(key)
    if fe is None:
        if len(_FETCH_CACHE) > 4:
            _FETCH_CACHE.clear()
        fe = cls(**kwargs)
        _FETCH_CACHE[key] = fe
    return fe


def _cached_fetch_extract(**kwargs) -> "FetchExtract":
    return _cached_fetch(FetchExtract, **kwargs)


def fetch_raw_task(batch: pa.Table, **kwargs) -> pa.Table:
    """Task-pool lookup-only fetch (html + found, no extract) with
    per-worker cached state — the hydration stage for API-JSON
    families, CLAUDE.md task-pool discipline. Corpus modes only."""
    if kwargs.get("http_base") is not None:
        raise ValueError("fetch_raw_task: http mode needs the "
                         "FetchRaw actor pool")
    return _cached_fetch(FetchRaw, **kwargs)(batch)


def fetch_extract_task(batch: pa.Table, *, round_no: int | None = None,
                       **kwargs) -> pa.Table:
    """Task-pool fetch+extract: same semantics as the FetchExtract
    actor, but runs on the shared task pool with per-worker-process
    cached state — no actor spin-up per Dataset execution. This is the
    distributed scheduler's per-round fetch path (a new actor pool per
    round paid spin-up AND lost the bucket cache every round; measured
    ~450 URLs/s vs the driver path's ~9000/s at sf0.01). Only for
    corpus modes; live HTTP needs the per-actor transport."""
    if kwargs.get("http_base") is not None:
        raise ValueError("fetch_extract_task: http mode needs the "
                         "FetchExtract actor pool")
    return _cached_fetch_extract(**kwargs)(batch, round_no=round_no)


class FetchExtract:
    """Actor-pool callable: scheduling rows in, extracted rows out."""

    def __init__(
        self,
        *,
        pages_ref=None,
        pages_dir: str | None = None,
        num_buckets: int = 128,
        cache_buckets: int = 8,
        enrich: bool = False,
        http_base: str | None = None,
        http_headers: dict | None = None,
        http_timeout_s: float = 5.0,
        http_concurrency: int = 16,
        http_retries: int = 1,
        http_max_per_host: int | None = None,
        http_max_body_bytes: int | None = None,
    ):
        _pin_worker_threads()
        self.enrich = enrich
        self._lat_stats: dict[str, list] = {}
        self._retry_after: dict[str, float] = {}
        # bucket-read forensics: cumulative cold-read time and count,
        # drained per chunk into the round metrics (read_s / read_misses)
        self.read_s = 0.0
        self.read_misses = 0
        self.num_buckets = num_buckets
        self.cache_buckets = cache_buckets
        self.pages_dir = pages_dir
        if http_base is not None:
            # live-HTTP mode (F3/F5): one transport per actor, built once
            from .transport import HttpTransport

            self._transport = HttpTransport(
                http_base, headers=http_headers, timeout_s=http_timeout_s,
                concurrency=http_concurrency, retries=http_retries,
                max_per_host=http_max_per_host,
                max_body_bytes=http_max_body_bytes,
            )
            self._urls = None
            self._html = None
            self.mode = "http"
        elif pages_ref is not None:
            # ray auto-derefs ObjectRef args to actors; map_batches
            # fn_constructor_kwargs pass the ref through untouched.
            # The decoded (urls, html) columns are cached PER WORKER
            # PROCESS (keyed by the ref identity), so a fresh
            # FetchExtract in the same long-lived Ray worker — e.g. the
            # distributed scheduler building one per round — skips the
            # plasma map + combine_chunks instead of repaying it.
            key = (pages_ref.hex()
                   if isinstance(pages_ref, ray.ObjectRef)
                   else id(pages_ref))
            cached = _BCAST_COLS_CACHE.get(key)
            if cached is None:
                table: pa.Table = (
                    ray.get(pages_ref)
                    if isinstance(pages_ref, ray.ObjectRef)
                    else pages_ref
                )  # zero-copy from plasma either way
                cached = (table["url"].combine_chunks(),
                          table["html"].combine_chunks())
                _BCAST_COLS_CACHE.clear()  # one corpus per worker
                _BCAST_COLS_CACHE[key] = cached
            self._urls, self._html = cached
            self.mode = "broadcast"
        else:
            assert pages_dir is not None
            self._urls = None
            self._html = None
            self.mode = "bucketed"

    # -- lookup ----------------------------------------------------------
    # Both modes are hash-join probes vectorized with pc.index_in + take:
    # misses surface as NULL html values (no per-url dict probes, no
    # Python html lists — the binary payload stays in Arrow buffers).
    def _lookup_broadcast(self, url_arr: pa.Array) -> pa.Array:
        import pyarrow.compute as pc

        idx = pc.index_in(url_arr, value_set=self._urls)
        return self._html.take(idx)

    def _lookup_http(self, url_arr: pa.Array) -> pa.Array:
        """Real HTTP GETs through the per-actor transport; failures
        (4xx/5xx/timeout/conn) come back as nulls, which the fetch stage
        records as ``found=false`` rows (F4 semantics, same as a corpus
        miss). Per-URL wall latency accumulates per host for adaptive
        politeness (drained by the crawl loop each round)."""
        from ..util import host_of

        urls = url_arr.to_pylist()
        bodies, _errs, ms, ras = self._transport.fetch_many_timed(urls)
        stats = self._lat_stats
        for u, m in zip(urls, ms):
            h = host_of(u)
            cur = stats.get(h)
            if cur is None:
                stats[h] = [1, m]
            else:
                cur[0] += 1
                cur[1] += m
        self._pending_url_ras = {}
        self._pending_url_ms = dict(zip(urls, ms))
        for u, ra in zip(urls, ras):
            if ra is not None:
                h = host_of(u)
                # a host may answer several 429/503s in one chunk:
                # honor the LONGEST requested backoff
                self._retry_after[h] = max(self._retry_after.get(h, 0.0),
                                           float(ra))
                self._pending_url_ras[u] = float(ra)
        return pa.array(bodies, pa.binary())

    def drain_latency(self) -> dict[str, tuple[int, float]]:
        """{host: (n, sum_ms)} observed since the last drain."""
        out = {h: (n, s) for h, (n, s) in self._lat_stats.items()}
        self._lat_stats.clear()
        return out

    def drain_retry_after(self) -> dict[str, float]:
        """{host: max Retry-After seconds} observed since last drain —
        the 429/503 server-directed backoff signal (RFC 9110)."""
        out = dict(self._retry_after)
        self._retry_after.clear()
        return out

    def _bucket_table(self, b: int) -> tuple[pa.Array, pa.Array]:
        # PROCESS-global LRU (keyed by pages_dir too): Ray worker
        # processes are long-lived, so decoded buckets survive across
        # map_batches executions — the distributed scheduler's per-round
        # fetch no longer re-reads every bucket it touched last round.
        key = (self.pages_dir, b)
        cached = _BUCKET_CACHE.get(key)
        if cached is not None:
            _BUCKET_CACHE.move_to_end(key)
            return cached
        import time as _time

        t0 = _time.perf_counter()
        dset = pads.dataset(self.pages_dir, partitioning="hive")
        t = dset.to_table(columns=["url", "html"], filter=pads.field("bucket") == b)
        self.read_misses += 1
        self.read_s += _time.perf_counter() - t0
        entry = (t["url"].combine_chunks(), t["html"].combine_chunks())
        _BUCKET_CACHE[key] = entry
        while len(_BUCKET_CACHE) > self.cache_buckets:
            _BUCKET_CACHE.popitem(last=False)
        return entry

    def _lookup_bucketed(self, url_arr: pa.Array) -> pa.Array:
        import pyarrow.compute as pc

        urls = url_arr.to_pylist()  # needed for the deterministic hash
        buckets = (hash_strings(urls) % self.num_buckets).astype(np.int64)
        order = np.argsort(buckets, kind="stable")
        seg_vals: list[pa.Array] = []
        i = 0
        while i < len(order):
            j = i
            b = int(buckets[order[i]])
            while j < len(order) and int(buckets[order[j]]) == b:
                j += 1
            b_urls, b_html = self._bucket_table(b)
            sub = url_arr.take(pa.array(order[i:j]))
            idx = pc.index_in(sub, value_set=b_urls)
            vals = b_html.take(idx)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            seg_vals.append(vals)
            i = j
        if not seg_vals:
            return pa.nulls(0, pa.binary())
        cat = pa.concat_arrays(seg_vals)
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        return cat.take(pa.array(inv))

    def _lookup(self, url_arr: pa.Array) -> pa.Array:
        if self.mode == "broadcast":
            return self._lookup_broadcast(url_arr)
        if self.mode == "http":
            return self._lookup_http(url_arr)
        return self._lookup_bucketed(url_arr)

    # -- batch entry point ------------------------------------------------
    def __call__(self, batch: pa.Table, round_no: int | None = None,
                 emit_retry_after: bool = False) -> pa.Table:
        out = self._fetch_extract(batch)
        if round_no is not None:
            out = out.append_column(
                "round", pa.array([round_no] * out.num_rows, pa.int32())
            )
        if emit_retry_after:
            # distributed-scheduler channel for the live-HTTP politeness
            # signals: map_batches actors can't be drained by the
            # driver, so the 429/503 Retry-After seconds AND the per-URL
            # wall latency ride out as per-row columns and the crawl
            # loop folds the host-level aggregates into
            # host_backoff_until / host_lat_ewma. Keyed by url:
            # _fetch_extract reorders rows (hits then misses) and
            # 429/503 rows are always misses.
            urls_out = out["url"].to_pylist()
            pending = getattr(self, "_pending_url_ras", None) or {}
            if pending:
                col = pa.array([pending.get(u) for u in urls_out],
                               pa.float64())
                self._pending_url_ras = {}
            else:
                col = pa.nulls(out.num_rows, pa.float64())
            out = out.append_column("retry_after_s", col)
            pend_ms = getattr(self, "_pending_url_ms", None) or {}
            ms_col = (pa.array([pend_ms.get(u) for u in urls_out],
                               pa.float64())
                      if pend_ms else pa.nulls(out.num_rows, pa.float64()))
            self._pending_url_ms = {}
            out = out.append_column("fetch_ms", ms_col)
        return out

    def _fetch_extract(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return _empty_out(batch)
        url_arr = batch["url"].combine_chunks()
        html_arr = self._lookup(url_arr)
        found_arr = pc.is_valid(html_arr)
        hit = batch.filter(found_arr).append_column(
            "html", html_arr.filter(found_arr).cast(pa.binary())
        )
        extracted = extract_batch(hit)  # drops html
        if self.enrich:
            extracted = _enrich_text(extracted)
        extracted = extracted.append_column(
            "found", pa.array(np.ones(extracted.num_rows, dtype=bool))
        )
        miss = batch.filter(pa.compute.invert(found_arr))
        if miss.num_rows:
            # align miss rows to the extracted schema with typed nulls
            for field in extracted.schema:
                if field.name not in miss.column_names:
                    if field.name == "found":
                        miss = miss.append_column(
                            "found",
                            pa.array(np.zeros(miss.num_rows, dtype=bool)),
                        )
                    else:
                        miss = miss.append_column(
                            field.name, pa.nulls(miss.num_rows, field.type)
                        )
            miss = miss.select(extracted.column_names)
            return pa.concat_tables([extracted, miss], promote_options="default")
        return extracted


def _align_passthrough(rest: pa.Table, out: pa.Table) -> pa.Table:
    """Align non-fetched candidate rows to the fetch-output schema with
    typed nulls (their ``_state`` column survives; scheduling columns
    are shared), then concat — the deferred/robots-bad passthrough of
    the fused open-budget round."""
    cols = {}
    for field in out.schema:
        if field.name in rest.column_names:
            cols[field.name] = rest[field.name].cast(field.type)
        else:
            cols[field.name] = pa.nulls(rest.num_rows, field.type)
    aligned = pa.table(cols)
    return pa.concat_tables([out, aligned], promote_options="default")


def _fetch_or_pass(batch: pa.Table, fetch_fn) -> pa.Table:
    """Shared f/d/b passthrough protocol of the fused open-budget
    round: only '_state'=='f' rows reach ``fetch_fn``, the rest pass
    through null-aligned; output column order is canonicalized (the
    0-fetch empty-schema path and the hit/miss path order columns
    differently — blocks of one round must agree so the parquet parts
    and unions stay schema-stable)."""
    import pyarrow.compute as pc

    sel_mask = pc.equal(batch["_state"], "f")
    sel = batch.filter(sel_mask).drop_columns(["_state"])
    rest = batch.filter(pc.invert(sel_mask))
    out = fetch_fn(sel)
    out = out.append_column(
        "_state", pa.array(["f"] * out.num_rows, pa.string()))
    if rest.num_rows:
        out = _align_passthrough(rest, out)
    return out.select(sorted(out.column_names))


def fetch_or_pass_task(batch: pa.Table, *, round_no: int | None = None,
                       **kwargs) -> pa.Table:
    """Task-pool fetch for the FUSED open-budget distributed round:
    rows arrive pre-tagged with ``_state`` ('f' fetch / 'd' deferred /
    'b' robots-bad); only 'f' rows hit the corpus join, the rest pass
    through null-aligned. One Dataset execution replaces the candidate
    materialize + counter pre-pass + fetch chain."""
    return _fetch_or_pass(
        batch, lambda sel: fetch_extract_task(sel, round_no=round_no,
                                              **kwargs))


class FetchExtractPassthrough(FetchExtract):
    """Actor-pool variant of :func:`fetch_or_pass_task` for live-HTTP
    fused rounds (the transport needs real per-actor state)."""

    def __call__(self, batch: pa.Table, round_no: int | None = None,
                 emit_retry_after: bool = False) -> pa.Table:
        return _fetch_or_pass(
            batch,
            lambda sel: super(FetchExtractPassthrough, self).__call__(
                sel, round_no=round_no,
                emit_retry_after=emit_retry_after))


class FetchRaw(FetchExtract):
    """Lookup-only corpus join: rows out with ``html:binary`` + ``found``
    (no per-kind extraction). For pipelines whose parsing is NOT the
    generic extract flow — the API-JSON families (NewsMinute S3,
    Readwhere S7/S8/S12) and HTML search pages parsed by dedicated
    multi-record parsers (Telegraph online S4)."""

    def _fetch_extract(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "html", pa.nulls(0, pa.binary())
            ).append_column("found", pa.nulls(0, pa.bool_()))
        import pyarrow.compute as pc

        url_arr = batch["url"].combine_chunks()
        html_arr = self._lookup(url_arr)
        return batch.append_column(
            "html", html_arr.cast(pa.binary())
        ).append_column("found", pc.is_valid(html_arr))


def _enrich_text(extracted: pa.Table) -> pa.Table:
    """In-actor text analytics over freshly extracted text: quality
    scores, language ID, content fingerprint, SimHash and MinHash-band
    dedup keys. Part of the production extract stage — a training-data
    crawl computes dedup signatures inline rather than re-reading the
    corpus later."""
    from ..functions.textstats import (
        fingerprint_batch,
        lang_id_batch,
        quality_batch,
    )
    from ..stages.dedup import MinHasher, simhash_batch, word_hashes_batch

    out = fingerprint_batch(lang_id_batch(quality_batch(extracted)))
    global _MINHASHER, _SCORER
    if _MINHASHER is None:
        _MINHASHER = MinHasher(num_perm=32, bands=8, max_shingles=256)
        from ..functions.textstats import HashedNgramScorer

        _SCORER = HashedNgramScorer()
    # one tokenize+hash pass feeds BOTH signature kernels (simhash takes
    # the 512-word prefix, minhash the 260-word shingle prefix — outputs
    # are bit-identical to the per-kernel paths)
    texts = out["text"].to_pylist()
    wh = word_hashes_batch(texts, 512)
    out = simhash_batch(out, wh_list=wh)
    out = _MINHASHER(out, wh_list=wh)
    scores = _SCORER.score_batch(texts)
    return out.append_column(
        "model_score", pa.array(scores.astype("float64"))
    )


_MINHASHER = None
_SCORER = None


def _empty_out(batch: pa.Table) -> pa.Table:
    t = batch
    for name, typ in _NULL_EXTRACT_COLS:
        t = t.append_column(name, pa.nulls(0, typ))
    return t.append_column("found", pa.nulls(0, pa.bool_()))


@ray.remote
class FetchExtractActor:
    """Long-lived fetch/extract worker for the iterative round loop.

    ``map_batches`` actor pools live for one Dataset execution; a crawl
    runs many small executions (one per round), so re-creating the pool
    each round wastes startup + state-build time. This raw Ray actor
    holds the same ``FetchExtract`` state across rounds (the documented
    escape hatch: Dataset API can't express cross-execution actor
    reuse). Each call fetches+extracts one chunk and ALSO derives the
    child frontier rows and per-chunk counters, so a round needs no
    extra passes over the data.
    """

    def __init__(self, **kwargs):
        self.inner = FetchExtract(**kwargs)

    def process(self, chunk: pa.Table, round_no: int, decay: float,
                max_depth: int, out_path: str | None = None,
                canonicalize: bool = False, trap_filter: bool = False):
        """Fetch+extract one chunk; with ``out_path``, write the extracted
        rows straight to a per-chunk Parquet part (resumable
        round-partitioned layout, written where the data already is) and
        return only the child-frontier rows + counters.
        """
        import time

        import pyarrow.parquet as pq

        t0 = time.perf_counter()
        extracted = self.inner(chunk, round_no=round_no)
        from ..pipelines.frontier import _explode_links  # local import, no cycle at module load

        links = _explode_links(extracted, decay, max_depth,
                               canonicalize=canonicalize,
                               trap_filter=trap_filter)
        found = extracted["found"].to_numpy(zero_copy_only=False)
        ok = pa.compute.and_kleene(
            extracted["found"], extracted["parse_ok"]
        ).fill_null(False).to_numpy(zero_copy_only=False)
        counts = {
            "rows": extracted.num_rows,
            "errors": int((~found).sum()),
            "parse_ok": int(ok.sum()),
            "links": links.num_rows,
            "busy_s": 0.0,
            "write_s": 0.0,
            "read_s": round(self.inner.read_s, 4),
            "read_misses": self.inner.read_misses,
        }
        self.inner.read_s = 0.0
        self.inner.read_misses = 0
        counts["busy_s"] = time.perf_counter() - t0
        if self.inner.mode == "http":
            lat = self.inner.drain_latency()
            if lat:
                counts["latency"] = lat
            ra = self.inner.drain_retry_after()
            if ra:
                counts["retry_after"] = ra
        if out_path is not None:
            tw = time.perf_counter()
            pq.write_table(extracted, out_path)
            counts["write_s"] = time.perf_counter() - tw
            counts["busy_s"] = time.perf_counter() - t0
            return None, links, counts
        return extracted, links, counts


def broadcast_pages(pages_dir: str):
    """Read (url, html) of the corpus once and put it in the object store.

    Column-pruned read: only the two columns the fetch join needs leave
    storage (never the golden ``text``/``lang``).
    """
    dset = pads.dataset(pages_dir, partitioning="hive")
    table = dset.to_table(columns=["url", "html"])
    return ray.put(table.combine_chunks())
