"""Sequence packing: assemble docs/chunks into fixed-token-length
training sequences (the final stage of an LLM data pipeline — after
cleaning, dedup and chunking, documents are packed into model-context-
sized rows to minimize padding).

Distributed shape: packing is bin packing; the engine packs each BLOCK
independently (map-only, embarrassingly parallel — no shuffle), using
first-fit-decreasing within the block. Block-local packing is the
standard large-scale compromise: FFD within a block wastes at most a
few percent vs a global pack (FFD <= 11/9 OPT + 1 bins), and a global
pack would serialize the corpus. Consequences, documented and tested:
output is deterministic for a fixed block layout but NOT invariant to
re-batching (same class of operator as per-partition dedup ordering);
every input row appears in exactly one sequence regardless of layout.

Oversized rows (token count > seq_len) are placed alone in their own
sequence and marked truncated (the trainer's tokenizer drops the tail);
they never poison other bins.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from siren_ray.util import hash_strings


def pack_batch(t: pa.Table, *, seq_len: int, id_col: str = "doc_id",
               token_col: str = "n_tokens") -> pa.Table:
    """One block -> packed sequences (pack_id, doc_ids, total_tokens,
    n_docs, n_pad, truncated)."""
    ids = np.asarray(t[id_col], dtype=np.int64)
    ntok = np.asarray(t[token_col], dtype=np.int64)
    # FFD: descending tokens, ascending id tie-break (deterministic)
    order = np.lexsort((ids, -ntok))
    bins_docs: list[list[int]] = []
    # preallocated state (never np.append per bin — O(bins^2)/batch);
    # truncated bins are EXCLUDED from the fit mask so a zero-token doc
    # (need=0, which fits any residual>=0) can never ride a truncated
    # sequence and acquire extra doc_ids (ADVICE r3)
    cap = len(order)
    residual = np.empty(cap, dtype=np.int64)
    trunc_arr = np.zeros(cap, dtype=bool)
    nb = 0
    for j in order:
        need = int(ntok[j])
        if need >= seq_len:
            bins_docs.append([j])
            residual[nb] = 0
            trunc_arr[nb] = need > seq_len
            nb += 1
            continue
        fit = np.flatnonzero((residual[:nb] >= need) & ~trunc_arr[:nb])
        if len(fit):
            b = int(fit[0])
            bins_docs[b].append(j)
            residual[b] -= need
        else:
            bins_docs.append([j])
            residual[nb] = seq_len - need
            nb += 1
    truncated = trunc_arr[:nb].tolist()
    pack_docs, totals, npad, trunc = [], [], [], []
    for b, docs in enumerate(bins_docs):
        d = sorted(int(ids[j]) for j in docs)
        tot = int(min(ntok[docs[0]], seq_len)) if truncated[b] else \
            int(ntok[docs].sum())
        tot = min(tot, seq_len)
        pack_docs.append(d)
        totals.append(tot)
        npad.append(seq_len - tot)
        trunc.append(bool(truncated[b]))
    pack_ids = hash_strings(
        [",".join(map(str, d)) for d in pack_docs]
    ).astype(np.int64) if pack_docs else np.empty(0, dtype=np.int64)
    return pa.table({
        "pack_id": pa.array(pack_ids, pa.int64()),
        "doc_ids": pa.array(pack_docs, pa.list_(pa.int64())),
        "total_tokens": pa.array(totals, pa.int64()),
        "n_docs": pa.array([len(d) for d in pack_docs], pa.int64()),
        "n_pad": pa.array(npad, pa.int64()),
        "truncated": pa.array(trunc, pa.bool_()),
    })


def pack_sequences(ds, *, seq_len: int = 2048, id_col: str = "doc_id",
                   token_col: str = "n_tokens", batch_size: int = 4096):
    """Dataset of (id, n_tokens) -> Dataset of packed sequences.
    Map-only; each batch packs independently (see module docstring)."""
    return ds.map_batches(
        lambda t: pack_batch(t, seq_len=seq_len, id_col=id_col,
                             token_col=token_col),
        batch_format="pyarrow", batch_size=batch_size,
    )
