"""Distributed Bloom-filter membership screen.

The probabilistic sibling of the exact set machinery (``state/seen.py``
sharded fingerprint tables, ``dedup.hash_semijoin``): when the "have we
seen this value" set is too large to hold exactly but a bounded
false-positive rate is acceptable, a Bloom filter answers membership
from a fixed-size bit array — the Dolma-recipe cross-snapshot dedup
screen ("drop documents whose text we already ingested") at a fraction
of the exact join's shuffle cost. No false NEGATIVES ever: a value that
IS in the build set is always flagged present, so a dedup screen can
never re-admit a known duplicate; false positives drop some genuinely
new values at the advertised rate (~``(1 - e^(-k n / m))^k``).

Scale shape:
- BUILD streams the corpus once, map-only: each batch pre-ORs its bit
  positions into per-chunk bitmaps and emits rows ONLY for chunks it
  touched (a chunk is 2^20 bits = 128 KB), so the shuffle carries
  pre-combined bitmaps bounded by the filter size — never one row per
  value. A chunk-keyed groupby OR-merges in parallel (the
  ``approx_distinct`` register-merge discipline) and the driver
  assembles exactly ``m/8`` bytes regardless of corpus block count.
- PROBE is map-only: the bit array broadcasts once via ``ray.put``
  (zero-copy shared-memory read per task on each node) and each batch
  tests all k bits vectorized.
- Sizing is the caller's contract: ~10 bits/element gives ~1% FP at
  k=4. A 10^10-URL frontier at 1% FP needs ~12 GB of bits — beyond a
  single broadcast; at that scale hash-shard the corpus FIRST (the
  ``bucket = hash64(key) % N`` layout every other operator here reuses)
  and build/probe one filter per shard, or use the exact
  ``hash_semijoin`` which co-partitions instead of broadcasting.

Hashing: one SipHash64 per value (``util.hash_strings``), split into
two 32-bit halves driving Kirsch-Mitzenmacher double hashing
``pos_i = h1 + i * h2 (mod m)`` — standard, deterministic, and
engine-independent like the rest of the dedup family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import hash_strings

_CHUNK_BITS_LOG2 = 20  # 2^20 bits = 128 KB per merge-chunk row


def _col_to_object(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return col.to_numpy(zero_copy_only=False)
    return np.asarray([str(x) for x in col.to_pylist()], dtype=object)


def _bit_positions(vals: np.ndarray, n_bits_log2: int, k: int):
    """(n, k) uint64 bit positions via double hashing; h2 forced odd so
    the k probes never collapse onto one slot."""
    h = hash_strings(vals)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    mask = np.uint64((1 << n_bits_log2) - 1)
    return (h1[:, None] + i * h2[:, None]) & mask


def build_bloom(ds, col: str, *, n_bits_log2: int = 24,
                k: int = 4) -> dict:
    """Stream ``ds[col]`` into a Bloom filter. Returns
    ``{"words": np.uint64[m/64], "n_bits_log2", "k", "n_chunks"}`` —
    a plain mergeable value (union of two filters with identical
    params = OR of their words)."""
    if n_bits_log2 < 6:
        raise ValueError("n_bits_log2 must be >= 6 (one uint64 word)")
    chunk_bits_log2 = min(n_bits_log2, _CHUNK_BITS_LOG2)
    chunk_words = 1 << (chunk_bits_log2 - 6)
    n_chunks = 1 << (n_bits_log2 - chunk_bits_log2)

    def _partial(t: pa.Table) -> pa.Table:
        vals = _col_to_object(t[col])
        if not len(vals):
            return pa.table({"chunk": pa.array([], pa.int64()),
                             "bits": pa.array([], pa.binary())})
        pos = _bit_positions(vals, n_bits_log2, k).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        # one OR-mask per distinct word (sort + reduceat), then scatter
        # into per-chunk bitmaps — no ufunc.at, no per-position Python
        order = np.argsort(word, kind="stable")
        w, b = word[order], bit[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        uw = w[starts]
        ub = np.bitwise_or.reduceat(b, starts)
        chunk = uw >> np.int64(chunk_bits_log2 - 6)
        c_starts = np.flatnonzero(
            np.r_[True, chunk[1:] != chunk[:-1]])
        c_ids = chunk[c_starts]
        bounds = np.r_[c_starts, len(uw)]
        blobs = []
        for j, cid in enumerate(c_ids):
            local = np.zeros(chunk_words, dtype=np.uint64)
            sl = slice(bounds[j], bounds[j + 1])
            local[uw[sl] - cid * chunk_words] = ub[sl]
            blobs.append(local.tobytes())
        return pa.table({"chunk": pa.array(c_ids, pa.int64()),
                         "bits": pa.array(blobs, pa.binary())})

    def _or_merge(t: pa.Table) -> pa.Table:
        stack = np.stack([np.frombuffer(b, dtype=np.uint64)
                          for b in t["bits"].to_pylist()])
        return pa.table({
            "chunk": t["chunk"].slice(0, 1),
            "bits": pa.array([np.bitwise_or.reduce(stack).tobytes()],
                             pa.binary()),
        })

    parts = (ds.map_batches(_partial, batch_format="pyarrow")
               .groupby("chunk")
               .map_groups(_or_merge, batch_format="pyarrow")
               .take_all())
    words = np.zeros(1 << (n_bits_log2 - 6), dtype=np.uint64)
    for row in parts:
        cid = int(row["chunk"])
        words[cid * chunk_words:(cid + 1) * chunk_words] |= \
            np.frombuffer(row["bits"], dtype=np.uint64)
    return {"words": words, "n_bits_log2": n_bits_log2, "k": k,
            "n_chunks": n_chunks}


def bloom_contains(bloom: dict, values) -> np.ndarray:
    """Vectorized membership test: bool array, True = possibly present
    (no false negatives), False = DEFINITELY absent."""
    vals = np.asarray(values, dtype=object)
    if not len(vals):
        return np.zeros(0, dtype=bool)
    pos = _bit_positions(vals, bloom["n_bits_log2"], bloom["k"])
    words = bloom["words"]
    hit = (words[(pos >> np.uint64(6)).astype(np.int64)]
           >> (pos & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=1)


def bloom_screen(ds, bloom: dict, col: str, *, keep: str = "new"):
    """Map-only membership filter over a Dataset column. ``keep="new"``
    keeps rows whose value is definitely NOT in the filter (the
    cross-snapshot ingest screen: known values never survive, some new
    values are dropped at the FP rate); ``keep="seen"`` keeps the
    possibly-present complement (audit mode). The bit array broadcasts
    once; each task reads it zero-copy from the object store."""
    if keep not in ("new", "seen"):
        raise ValueError(f"keep must be 'new' or 'seen', got {keep!r}")
    import ray

    words_ref = ray.put(bloom["words"])
    meta = {"n_bits_log2": bloom["n_bits_log2"], "k": bloom["k"]}

    def _screen(t: pa.Table) -> pa.Table:
        b = dict(meta, words=ray.get(words_ref))
        present = bloom_contains(b, _col_to_object(t[col]))
        mask = ~present if keep == "new" else present
        return t.filter(pa.array(mask))

    return ds.map_batches(_screen, batch_format="pyarrow")
