"""Content-defined chunking (gear rolling hash) + chunk-level dedup.

At 100 TB the crawl's raw-page store (WARC shards, re-crawled
snapshots) is full of *shifted* redundancy: a re-fetched page whose
byte stream moved by an inserted ad div shares almost everything with
its previous capture, but at different offsets. Fixed-size blocks
dedup NONE of that (every block boundary moved); content-defined
chunking places boundaries where a rolling hash of the local byte
window hits a mask, so boundaries travel WITH the content and shared
regions re-align (the LBFS/Venti/rsync idea; FastCDC is the modern
treatment). This module measures the storage-dedup factor of a corpus
under both policies — the number a 100 TB store sizes its chunk pool
by.

Gear hash: ``h_i = (h_{i-1} << 1) + GEAR[b_i]`` mod 2^64, i.e. byte
``b_j`` contributes ``GEAR[b_j] << (i-j)`` while ``i-j < 64`` — a
64-byte sliding window with one table lookup per byte. Vectorization:
the recurrence is a convolution, computed as 64 shifted-add passes
over the WHOLE flat byte buffer of a batch (numpy uint64 wraps mod
2^64 natively) — no per-byte or per-row Python. Per-doc determinism
on the flat buffer: docs are padded with 64 NUL bytes and
``GEAR[0] = 0``, so a document's hashes never see its neighbour's
bytes and chunking is independent of batch composition (NUL bytes in
real text — vanishingly rare — simply don't advance the hash).

Boundary rule: cut after position ``i`` when ``h_i & mask == 0`` with
``mask = 2^avg_bits - 1`` (expected chunk ``2^avg_bits`` bytes);
oversized runs are force-split at ``max_size`` (vectorized insertion,
no min-size pass — tiny chunks are harmless for *measurement*, and
the cut rule stays a pure function of content). Chunks tile each
document exactly, so the batch's chunk array is ONE zero-copy Arrow
BinaryArray over the unpadded flat buffer.

Scale shape: chunking is map-only; the only shuffle moves pre-combined
``(chunk_hash, len, count)`` partials (``np.unique`` per batch), which
are hash-partitioned on a coarse ``_pk`` bucket and reduced to TWO
numbers per partition — nothing proportional to corpus bytes ever
crosses the wire or lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import hash_strings

__all__ = ["cdc_chunks", "fixed_chunks", "chunk_dedup_stats"]

_WINDOW = 64
_PAD = _WINDOW


def _gear_table() -> np.ndarray:
    """Deterministic 256-entry uint64 table (splitmix64), GEAR[0]=0."""
    M = (1 << 64) - 1
    out = np.empty(256, dtype=np.uint64)
    state = 0xC0FFEE123456789A
    for i in range(256):
        state = (state + 0x9E3779B97F4A7C15) & M
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
        out[i] = z ^ (z >> 31)
    out[0] = 0  # NUL is the doc-boundary pad: contributes nothing
    return out


_GEAR = _gear_table()


def _gear_hashes(flat: np.ndarray) -> np.ndarray:
    """h[i] = sum_{k<64} GEAR[flat[i-k]] << k  (mod 2^64), vectorized."""
    n = len(flat)
    g = _GEAR[flat]
    h = g.copy()
    for k in range(1, _WINDOW):
        h[k:] += g[: n - k] << np.uint64(k)
    return h


def _doc_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 byte buffer + per-doc end offsets of a string column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = arr.cast(pa.large_binary())
    import pyarrow.compute as pc

    lens = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(
        np.int64)
    buf = b"".join(arr.to_pylist()) if arr.null_count else None
    if buf is None:
        # zero-copy path: contiguous value buffer of the binary array
        off = arr.buffers()[1]
        start = np.frombuffer(off, dtype=np.int64, count=1)[0]
        total = int(lens.sum())
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                             offset=int(start), count=total)
    else:
        data = np.frombuffer(buf, dtype=np.uint8)
    return data, np.cumsum(lens)


def cdc_chunks(t: pa.Table, *, text_col: str = "text",
               id_col: str = "doc_id", avg_bits: int = 8,
               max_size: int = 4096) -> pa.Table:
    """Chunk a batch content-defined; returns (id_col, chunk_hash,
    chunk_len) with one row per chunk."""
    import pyarrow.compute as pc

    txt = pc.coalesce(t[text_col], pa.scalar(""))
    data, ends = _doc_bytes(txt)
    n_docs = len(ends)
    total = int(ends[-1]) if n_docs else 0
    if total == 0:
        return pa.table({id_col: pa.array([], t[id_col].type),
                         "chunk_hash": pa.array([], pa.int64()),
                         "chunk_len": pa.array([], pa.int32())})
    starts = np.concatenate(([0], ends[:-1]))
    lens = ends - starts
    # padded flat buffer: doc || 64 NULs || doc || ...
    padded = np.zeros(total + n_docs * _PAD, dtype=np.uint8)
    pstarts = starts + _PAD * np.arange(n_docs, dtype=np.int64)
    idx = np.repeat(pstarts, lens) + _ranges_within(lens)
    padded[idx] = data
    h = _gear_hashes(padded)
    mask = np.uint64((1 << avg_bits) - 1)
    cand = np.flatnonzero((h & mask) == 0)
    # keep candidates inside docs, translate to unpadded coords
    doc_of = np.searchsorted(pstarts + lens, cand, side="right")
    doc_of = np.minimum(doc_of, n_docs - 1)
    inside = (cand >= pstarts[doc_of]) & (cand < pstarts[doc_of] + lens[doc_of])
    cuts = cand[inside] - _PAD * doc_of[inside]  # cut AFTER this byte
    cut_ends = cuts + 1
    # every doc ends with a forced cut; drop a candidate equal to it
    # (and the 0-end an empty leading doc contributes — zero-length
    # chunks would mis-attribute to doc 0)
    all_ends = np.union1d(cut_ends, ends)
    all_ends = all_ends[all_ends > 0]
    # force-split any run longer than max_size (vectorized insertion)
    seg_starts = np.concatenate(([0], all_ends[:-1]))
    gaps = all_ends - seg_starts
    n_ins = np.maximum((gaps - 1) // max_size, 0).astype(np.int64)
    if n_ins.sum():
        base = np.repeat(seg_starts, n_ins)
        step = (_ranges_within(n_ins) + 1) * max_size
        all_ends = np.union1d(all_ends, base + step)
    offsets = np.concatenate(([0], all_ends)).astype(np.int64)
    chunk_arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(all_ends),
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(data.tobytes())])
    hashes = hash_strings(chunk_arr.to_numpy(zero_copy_only=False))
    chunk_doc = np.searchsorted(ends, all_ends, side="left")
    ids = t[id_col].combine_chunks() if isinstance(
        t[id_col], pa.ChunkedArray) else t[id_col]
    return pa.table({
        id_col: ids.take(pa.array(chunk_doc, pa.int64())),
        "chunk_hash": pa.array(hashes.view(np.int64), pa.int64()),
        "chunk_len": pa.array(np.diff(offsets).astype(np.int32),
                              pa.int32()),
    })


def _ranges_within(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]), [0..lens[1]), ... concatenated (vectorized)."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    keep = lens > 0
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(starts[keep], lens[keep])
    return out


def fixed_chunks(t: pa.Table, *, text_col: str = "text",
                 id_col: str = "doc_id", size: int = 256) -> pa.Table:
    """Fixed-size chunking (the baseline CDC beats under shifts)."""
    import pyarrow.compute as pc

    txt = pc.coalesce(t[text_col], pa.scalar(""))
    data, ends = _doc_bytes(txt)
    n_docs = len(ends)
    if n_docs == 0 or ends[-1] == 0:
        return pa.table({id_col: pa.array([], t[id_col].type),
                         "chunk_hash": pa.array([], pa.int64()),
                         "chunk_len": pa.array([], pa.int32())})
    starts = np.concatenate(([0], ends[:-1]))
    lens = ends - starts
    n_chunks = np.maximum((lens + size - 1) // size, 0)
    base = np.repeat(starts, n_chunks)
    k = _ranges_within(n_chunks)
    c_starts = base + k * size
    c_ends = np.minimum(c_starts + size, np.repeat(ends, n_chunks))
    offsets = np.concatenate(([0], c_ends)).astype(np.int64)
    # fixed chunks also tile the flat buffer exactly
    chunk_arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(c_ends),
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(data.tobytes())])
    hashes = hash_strings(chunk_arr.to_numpy(zero_copy_only=False))
    ids = t[id_col].combine_chunks() if isinstance(
        t[id_col], pa.ChunkedArray) else t[id_col]
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
    return pa.table({
        id_col: ids.take(pa.array(doc_of, pa.int64())),
        "chunk_hash": pa.array(hashes.view(np.int64), pa.int64()),
        "chunk_len": pa.array(np.diff(offsets).astype(np.int32),
                              pa.int32()),
    })


def chunk_dedup_stats(ds, *, chunker="cdc", text_col: str = "text",
                      id_col: str = "doc_id", num_partitions: int = 16,
                      **kw):
    """Corpus-wide chunk-dedup factor under a chunking policy.

    Returns a one-row Dataset: (policy, total_chunks, unique_chunks,
    total_bytes, unique_bytes). Per-batch ``np.unique`` partials are
    hash-partitioned on ``_pk = chunk_hash % P`` and reduced to one
    partial row per partition — the driver only ever sums P tiny rows.
    """
    import pyarrow.compute as pc  # noqa: F401
    import ray.data as rd

    fn = cdc_chunks if chunker == "cdc" else fixed_chunks
    P = max(2, int(num_partitions))

    def _partial(t: pa.Table) -> pa.Table:
        c = fn(t, text_col=text_col, id_col=id_col, **kw)
        h = np.asarray(c["chunk_hash"], dtype=np.int64)
        ln = np.asarray(c["chunk_len"], dtype=np.int64)
        uh, inv, cnt = np.unique(h, return_inverse=True,
                                 return_counts=True)
        # one length per distinct hash (equal content => equal length)
        ulen = np.zeros(len(uh), dtype=np.int64)
        ulen[inv] = ln
        return pa.table({
            "chunk_hash": pa.array(uh, pa.int64()),
            "len": pa.array(ulen, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "_pk": pa.array((uh % P + P) % P, pa.int64()),
        })

    def _reduce(g: pa.Table) -> pa.Table:
        h = np.asarray(g["chunk_hash"], dtype=np.int64)
        ln = np.asarray(g["len"], dtype=np.int64)
        cnt = np.asarray(g["cnt"], dtype=np.int64)
        uh, inv = np.unique(h, return_inverse=True)
        ulen = np.zeros(len(uh), dtype=np.int64)
        ulen[inv] = ln
        return pa.table({
            "total_chunks": pa.array([int(cnt.sum())], pa.int64()),
            "unique_chunks": pa.array([len(uh)], pa.int64()),
            "total_bytes": pa.array([int((ln * cnt).sum())], pa.int64()),
            "unique_bytes": pa.array([int(ulen.sum())], pa.int64()),
        })

    partials = (ds.select_columns([id_col, text_col])
                .map_batches(_partial, batch_format="pyarrow")
                .groupby("_pk")
                .map_groups(_reduce, batch_format="pyarrow"))
    agg = partials.to_pandas().sum()
    out = pa.table({
        "policy": pa.array([chunker], pa.string()),
        "total_chunks": pa.array([int(agg["total_chunks"])], pa.int64()),
        "unique_chunks": pa.array([int(agg["unique_chunks"])], pa.int64()),
        "total_bytes": pa.array([int(agg["total_bytes"])], pa.int64()),
        "unique_bytes": pa.array([int(agg["unique_bytes"])], pa.int64()),
    })
    return rd.from_arrow(out)
