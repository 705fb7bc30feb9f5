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


def importance_weights(ds, target_lm: BigramLM, raw_lm: BigramLM, *,
                       text_col: str = "text", id_col: str = "doc_id",
                       alpha: float = 0.1, per_token: bool = True,
                       max_words: int | None = None):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-doc
    ``log p_target(features) - log p_raw(features)`` over hashed
    unigram+bigram occurrences, with add-alpha smoothing inside each
    hash space. Map-only: both count models ride once per worker via
    ``ray.put``; the per-occurrence log-ratios reduce per doc in one
    ``reduceat`` (deterministic across batching, like
    :func:`perplexity_score`).

    ``per_token=True`` divides by the doc's feature count (tokens +
    bigrams) — the paper's raw sum makes long documents dominate, so
    the normalized form is the default; pass ``False`` for the paper's
    exact sum. Docs with zero features get weight 0.0 (empty feature
    product). Both models must share hash spaces.

    No reference counterpart (engine addition: the data-selection step
    a training-corpus pipeline runs between quality gates and mixture
    construction).
    """
    import ray

    if (target_lm.uni_bits, target_lm.big_bits) != \
            (raw_lm.uni_bits, raw_lm.big_bits):
        raise ValueError("importance_weights: models must share hash spaces")
    uni_bits, big_bits = raw_lm.uni_bits, raw_lm.big_bits
    # per-occurrence constant terms (denominators) fold into scalars:
    # lr(s) = log(t[s]+a) - log(r[s]+a) + [log(R_tot+aV) - log(T_tot+aV)]
    c_uni = (np.log(raw_lm.uni.sum() + alpha * (1 << uni_bits))
             - np.log(target_lm.uni.sum() + alpha * (1 << uni_bits)))
    c_big = (np.log(raw_lm.big.sum() + alpha * (1 << big_bits))
             - np.log(target_lm.big.sum() + alpha * (1 << big_bits)))
    model_ref = ray.put((target_lm.uni, target_lm.big,
                         raw_lm.uni, raw_lm.big))

    def _doc_sums(vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """reduceat per doc over a flat per-occurrence array; docs with
        zero occurrences contribute 0."""
        out = np.zeros(len(counts))
        has = counts > 0
        if has.any():
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            out[has] = np.add.reduceat(vals, starts[has])
        return out

    def _weigh(t: pa.Table) -> pa.Table:
        t_uni, t_big, r_uni, r_big = ray.get(model_ref)
        wh, lens = _doc_token_hashes(t[text_col].to_pylist(), max_words)
        uni, big, nbig = _slots(wh, lens, uni_bits, big_bits)
        lr_uni = (np.log(t_uni[uni] + alpha) - np.log(r_uni[uni] + alpha)
                  + c_uni) if len(uni) else np.empty(0)
        lr_big = (np.log(t_big[big] + alpha) - np.log(r_big[big] + alpha)
                  + c_big) if len(big) else np.empty(0)
        logw = _doc_sums(lr_uni, lens) + _doc_sums(lr_big, nbig)
        nfeat = lens + nbig
        if per_token:
            logw = np.where(nfeat > 0, logw / np.maximum(nfeat, 1), 0.0)
        return pa.table({
            id_col: t[id_col],
            "n_features": pa.array(nfeat, pa.int64()),
            "log_weight": pa.array(logw, pa.float64()),
        })

    return ds.map_batches(_weigh, batch_format="pyarrow")


def dsir_select(ds, target_ds, k: int, *, text_col: str = "text",
                id_col: str = "doc_id", uni_bits: int = 18,
                big_bits: int = 20, alpha: float = 0.1,
                temperature: float = 1.0, seed_salt: str = "",
                per_token: bool = True,
                max_words: int | None = None) -> pa.Table:
    """DSIR data selection end-to-end: train hashed bigram models on
    the raw corpus and the (small) target corpus, score every raw doc
    with :func:`importance_weights`, and draw ``k`` docs WITHOUT
    replacement with probability proportional to
    ``exp(log_weight / temperature)`` via the Gumbel-top-k trick —
    the Gumbel noise comes from md5(id) (engine-independent, the
    weighted_sample convention), so the draw is deterministic and
    reproducible across engines and parallelism.

    Scale shape: two streaming train passes (bounded models), one
    map-only weigh pass, and the sort-free mergeable
    :func:`~siren_ray.stages.relational.topk_global` selection — no
    all-to-all shuffle anywhere; the raw corpus is pinned for its two
    passes (:func:`~siren_ray.util.pin_for_multipass`). Returns an
    Arrow table (id, n_features, log_weight) of the selected rows —
    a result of size k, not a dataset.
    """
    import hashlib

    from siren_ray.stages.relational import topk_global
    from siren_ray.util import pin_for_multipass

    ds = pin_for_multipass(ds.select_columns([id_col, text_col]))
    raw_lm = bigram_lm_train(ds, text_col=text_col, uni_bits=uni_bits,
                             big_bits=big_bits, max_words=max_words)
    target_lm = bigram_lm_train(target_ds, text_col=text_col,
                                uni_bits=uni_bits, big_bits=big_bits,
                                max_words=max_words)
    weights = importance_weights(ds, target_lm, raw_lm, text_col=text_col,
                                 id_col=id_col, alpha=alpha,
                                 per_token=per_token, max_words=max_words)

    def _gumbel_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        logw = np.asarray(t["log_weight"], dtype=np.float64)
        h = np.array(
            [int(hashlib.md5(f"{seed_salt}{x}".encode()
                             ).hexdigest()[:15], 16) + 1 for x in ids],
            dtype=np.int64,
        )
        u = np.minimum(h.astype(np.float64) / float(1 << 60), 1.0 - 1e-16)
        key = logw / float(temperature) - np.log(-np.log(u))
        return t.append_column("_gkey", pa.array(key, pa.float64()))

    keyed = weights.map_batches(_gumbel_key, batch_format="pyarrow")
    out = topk_global(keyed, "_gkey", k, ascending=False, tie_col=id_col)
    return out.drop_columns(["_gkey"]) if out.num_rows else out


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
