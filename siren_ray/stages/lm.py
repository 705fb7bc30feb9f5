"""Hashed bigram language-model quality scoring (CCNet-style).

Web-scale curation scores every document with a small language model
trained on a trusted (or the whole) corpus and filters/buckets on
perplexity — the CCNet recipe (Wenzek et al. 2020) uses a KenLM 5-gram;
the container has no KenLM, so this is the same pipeline shape with an
add-alpha **hashed bigram** model: vocabulary and bigram space are fixed
2^uni_bits / 2^big_bits hash ranges, so the model is a pair of bounded
integer arrays (8 MB + 32 MB at the defaults) regardless of corpus size
— broadcastable via ``ray.put`` like any other small side.

Train pass (one corpus stream, no raw-token shuffle):
  per batch -> ONE ``hash_strings`` call over the batch's tokens ->
  sparse (slot, count) partials (``np.unique``), unigram and bigram
  slots disjoint by a tag bit -> shuffle-free ``repartition(P)`` +
  per-partition sparse combine (the kmeans_train two-level shape,
  ann.py:kmeans_train) -> driver folds P sparse tables into the two
  dense arrays. Driver bytes are bounded by P * distinct-slots, and
  distinct slots are bounded by the hash space, never by corpus size.

Score pass: map-only; the model rides once per actor via ``ray.put``.
Per-doc mean log P(w_i | w_{i-1}) with add-alpha smoothing over the
hashed vocab; perplexity = exp(-mean). Counts are integer sums (exact,
parallelism-independent); per-doc float reduction happens in one
``reduceat`` over that doc's own bigrams, so scores are deterministic
across batching too.

Approximations, documented: hash collisions merge counts (standard
hashed-LM trade-off), and the conditional divides by the context word's
TOTAL unigram count (including doc-final positions) rather than its
successor-bearing count — the usual cheap variant.

No reference counterpart (engine addition per the task brief's
text-analysis / model-scoring family).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from siren_ray.util import hash_strings

# odd golden-ratio multiplier: bigram key = h_prev * _MIX + h_next (uint64
# wrap intended) — same combine style as dedup.shingle_hashes
_MIX = np.uint64(0x9E3779B97F4A7C15)
_BIG_TAG = np.int64(1) << np.int64(62)  # disjoint key space for bigram slots


@dataclass
class BigramLM:
    uni: np.ndarray          # int64[2^uni_bits] token counts
    big: np.ndarray          # int64[2^big_bits] bigram counts
    uni_bits: int
    big_bits: int
    total_tokens: int


def _doc_token_hashes(texts: list[str], max_words: int | None):
    """One hash_strings call per BATCH: concatenated uint64 word hashes
    plus per-doc token counts."""
    words: list[str] = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        w = (t or "").lower().split()
        if max_words is not None and len(w) > max_words:
            w = w[:max_words]
        lens[i] = len(w)
        words.extend(w)
    if not words:
        return np.empty(0, dtype=np.uint64), lens
    return hash_strings(words).astype(np.uint64), lens


def _slots(wh: np.ndarray, lens: np.ndarray, uni_bits: int, big_bits: int):
    """(uni_slots per token, big_slots per valid bigram, bigrams-per-doc).

    Bigrams never cross document boundaries: position j pairs with j+1
    only when both fall inside the same doc.
    """
    uni = (wh & np.uint64((1 << uni_bits) - 1)).astype(np.int64)
    if len(wh) < 2:
        return uni, np.empty(0, dtype=np.int64), np.maximum(lens - 1, 0)
    pair = wh[:-1] * _MIX + wh[1:]
    ends = np.cumsum(lens)
    # positions whose successor starts the next doc (doc-final tokens)
    mask = np.ones(len(wh) - 1, dtype=bool)
    boundary = ends[:-1] - 1
    boundary = boundary[(boundary >= 0) & (boundary < len(mask))]
    mask[boundary] = False
    big = (pair[mask] & np.uint64((1 << big_bits) - 1)).astype(np.int64)
    return uni, big, np.maximum(lens - 1, 0)


def bigram_lm_train(ds, *, text_col: str = "text", uni_bits: int = 20,
                    big_bits: int = 22, max_words: int | None = None,
                    combine_partitions: int = 8) -> BigramLM:
    """One streaming pass -> BigramLM (two bounded count arrays)."""

    def _partial(t: pa.Table) -> pa.Table:
        wh, lens = _doc_token_hashes(t[text_col].to_pylist(), max_words)
        uni, big, _ = _slots(wh, lens, uni_bits, big_bits)
        keys = np.concatenate([uni, big + _BIG_TAG])
        if not len(keys):
            return pa.table({"key": pa.array([], pa.int64()),
                             "count": pa.array([], pa.int64())})
        k, c = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(k, pa.int64()),
                         "count": pa.array(c.astype(np.int64), pa.int64())})

    def _combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = np.asarray(t["key"], dtype=np.int64)
        c = np.asarray(t["count"], dtype=np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, c)
        return pa.table({"key": pa.array(uk, pa.int64()),
                         "count": pa.array(sums, pa.int64())})

    parts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .repartition(combine_partitions)
        .map_batches(_combine, batch_format="pyarrow")
    )
    uni = np.zeros(1 << uni_bits, dtype=np.int64)
    big = np.zeros(1 << big_bits, dtype=np.int64)
    for t in parts.iter_batches(batch_format="pyarrow",
                                batch_size=1 << 20):
        k = np.asarray(t["key"], dtype=np.int64)
        c = np.asarray(t["count"], dtype=np.int64)
        isbig = k >= _BIG_TAG
        np.add.at(uni, k[~isbig], c[~isbig])
        np.add.at(big, (k[isbig] - _BIG_TAG), c[isbig])
    return BigramLM(uni=uni, big=big, uni_bits=uni_bits, big_bits=big_bits,
                    total_tokens=int(uni.sum()))


def perplexity_score(ds, lm: BigramLM, *, text_col: str = "text",
                     id_col: str = "doc_id", alpha: float = 0.1,
                     max_words: int | None = None):
    """Map-only scoring: id, n_tokens, ppl (NaN — a valid float64
    value, not an Arrow null — when a doc has < 2 tokens; tests assert
    ``isnan``, and filters should use ``is_nan``, not ``is_null``)."""
    import ray

    model_ref = ray.put((lm.uni, lm.big))
    uni_bits, big_bits = lm.uni_bits, lm.big_bits
    vocab = float(1 << uni_bits)

    def _score(t: pa.Table) -> pa.Table:
        uni_cnt, big_cnt = ray.get(model_ref)
        wh, lens = _doc_token_hashes(t[text_col].to_pylist(), max_words)
        uni, big, nbig = _slots(wh, lens, uni_bits, big_bits)
        ppl = np.full(len(lens), np.nan)
        if len(big):
            # context slot = unigram slot of each bigram's FIRST word:
            # drop each doc's last token from the unigram slot stream
            ends = np.cumsum(lens)
            last_tok = ends[lens > 0] - 1
            ctx_mask = np.ones(len(wh), dtype=bool)
            ctx_mask[last_tok] = False
            ctx = uni[ctx_mask]
            logp = (np.log(big_cnt[big] + alpha)
                    - np.log(uni_cnt[ctx] + alpha * vocab))
            starts = np.concatenate([[0], np.cumsum(nbig)[:-1]])
            has = nbig > 0
            sums = np.add.reduceat(logp, starts[has]) if has.any() else \
                np.empty(0)
            ppl[has] = np.exp(-sums / nbig[has])
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(lens, pa.int64()),
            "ppl": pa.array(ppl, pa.float64()),
        })

    return ds.map_batches(_score, batch_format="pyarrow")
