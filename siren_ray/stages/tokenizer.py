"""Distributed BPE tokenizer: corpus-scale training + map-only apply.

Training a byte-pair-encoding vocabulary over a 100 TB corpus does NOT
stream the corpus through the merge loop — the standard recipe
(Sennrich et al. 2016; the SentencePiece / HF-tokenizers trainers do the
same) reduces the corpus to a WORD-FREQUENCY table first, because BPE
merge decisions depend only on (word, count) pairs. So the scale split
is:

  1. :func:`word_frequencies` — ONE distributed pass. Per-batch partial
     ``(word, count)`` via a vectorized value-count; hash-partition on
     the word so every word's global count completes inside exactly one
     partition; per-partition combine + LOCAL top-k prune; the driver
     merges ``P x top_k`` candidate rows. Exact: a global top-k word is
     by construction a top-k word of its own partition. Driver bytes
     are bounded by ``P x top_k``, never by corpus size.
  2. :func:`bpe_train` — the classic merge loop on that bounded table,
     driver-side (the table is vocab-shaped, not corpus-shaped).
     Incremental pair-count maintenance (only words containing the
     merged pair are touched), deterministic tie-break
     (count DESC, pair lexicographic ASC) so the merge list is a pure
     function of the word-frequency table — and therefore of the
     corpus, at any parallelism (tested).
  3. :func:`bpe_tokenize` — map-only apply. The model (merge ranks +
     vocab ids) broadcasts ONCE via ``ray.put``; per-worker-process
     model cache (task-pool idiom, dedup.py:216) plus an encoded-word
     cache that persists across batches, so each distinct word is
     BPE-merged once per worker, not once per occurrence.

No reference counterpart (the reference has no tokenizer; engine
addition per the task brief's text-analysis family — token counting
"BPE-ish" is `functions/textstats.py`; this is the real, trainable
thing).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from siren_ray.util import hash_strings

_WF_PARTITIONS = 16
END_OF_WORD = "</w>"
UNK_ID = 0


def word_frequencies(ds, *, text_col: str = "text", lowercase: bool = True,
                     top_k: int = 65536,
                     num_partitions: int = _WF_PARTITIONS) -> pa.Table:
    """Exact global top-``top_k`` (word, count) table, ordered by
    (count DESC, word ASC). One shuffle, vocabulary-sized; the pruned
    tail is logged per partition (no silent caps)."""
    P = max(2, int(num_partitions))

    def _partial(t: pa.Table) -> pa.Table:
        col = t[text_col].combine_chunks()
        if lowercase:
            col = pc.utf8_lower(col)
        words = pc.list_flatten(pc.utf8_split_whitespace(col))
        if len(words) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "count": pa.array([], pa.int64()),
                             "_pk": pa.array([], pa.int64())})
        vc = words.value_counts()
        w = vc.field("values")
        c = vc.field("counts").cast(pa.int64())
        # boundary whitespace splits to empty strings (Arrow and DuckDB
        # agree on this); an empty "word" is not a token
        keep = pc.not_equal(w, pa.scalar(""))
        w, c = w.filter(keep), c.filter(keep)
        pk = (hash_strings(w.to_numpy(zero_copy_only=False))
              % np.uint64(P)).astype(np.int64)
        return pa.table({"word": w, "count": c,
                         "_pk": pa.array(pk, pa.int64())})

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("word", sort=False)["count"].sum()
             .reset_index())
        g = g.sort_values(["count", "word"],
                          ascending=[False, True], kind="stable")
        if len(g) > top_k:
            import logging

            logging.getLogger(__name__).info(
                "word_frequencies: partition pruned %d tail words "
                "(local top_k=%d)", len(g) - top_k, top_k)
            g = g.iloc[:top_k]
        return g[["word", "count"]]

    parts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_combine, batch_format="pandas")
        .to_pandas()
    )
    parts = parts.sort_values(["count", "word"],
                              ascending=[False, True], kind="stable")
    parts = parts.iloc[:top_k].reset_index(drop=True)
    return pa.table({"word": pa.array(parts["word"], pa.string()),
                     "count": pa.array(parts["count"].to_numpy(np.int64),
                                       pa.int64())})


@dataclass
class BpeModel:
    """Merge list + symbol vocabulary. ``vocab[symbol] -> id``; id 0 is
    ``<unk>`` (characters never seen in training). ``ranks`` maps a
    symbol pair to its merge priority (lower merges first)."""
    merges: list = field(default_factory=list)   # [(sym_a, sym_b), ...]
    vocab: dict = field(default_factory=dict)    # symbol -> int id
    end_of_word: str = END_OF_WORD
    lowercase: bool = True

    @property
    def ranks(self) -> dict:
        return {pair: i for i, pair in enumerate(self.merges)}

    def encode_word(self, word: str, _ranks: dict | None = None) -> list:
        """Symbols for one word (GPT-2-style: repeatedly merge the
        lowest-rank adjacent pair, all non-overlapping occurrences per
        pass)."""
        ranks = self.ranks if _ranks is None else _ranks
        syms = list(word) + [self.end_of_word]
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (syms[i], syms[i + 1])
            if best_pair is None:
                break
            a, b = best_pair
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def decode_ids(self, ids) -> str:
        inv = {v: k for k, v in self.vocab.items()}
        text = "".join(inv.get(int(i), "") for i in ids)
        return text.replace(self.end_of_word, " ").rstrip()


def bpe_train(word_freq: pa.Table, *, vocab_size: int = 8192,
              min_pair_count: int = 2, end_of_word: str = END_OF_WORD,
              lowercase: bool = True) -> BpeModel:
    """Classic BPE merge loop over a (word, count) table.

    Driver-side BY DESIGN: the input is the bounded output of
    :func:`word_frequencies` (vocab-shaped), never the corpus. Pair
    counts are maintained incrementally — each merge touches only the
    words that contain the merged pair (indexed), so the loop is
    O(merges x affected-words), not O(merges x all-words).

    Deterministic: ties on pair count break on the lexicographically
    smallest pair; the merge list is a pure function of the input
    table. Stops at ``vocab_size`` symbols or when no pair reaches
    ``min_pair_count``.
    """
    words = word_freq["word"].to_pylist()
    counts = word_freq["count"].to_pylist()
    if end_of_word in ("", None):
        raise ValueError("bpe_train: end_of_word must be non-empty")

    seqs = [tuple(w) + (end_of_word,) for w in words]
    alphabet = sorted({s for seq in seqs for s in seq})
    vocab = {"<unk>": UNK_ID}
    for s in alphabet:
        vocab[s] = len(vocab)

    # pair -> total count; pair -> set of word indices containing it
    pair_counts: dict = {}
    pair_words: dict = {}
    for wi, (seq, c) in enumerate(zip(seqs, counts)):
        for j in range(len(seq) - 1):
            p = (seq[j], seq[j + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)

    merges: list = []
    while len(vocab) < vocab_size and pair_counts:
        # max count, lexicographically-smallest pair among ties
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        # tie-break must be SMALLEST pair: max() picks largest, so
        # re-scan the tied set (tiny) for the lexicographic minimum
        top = best[1]
        if top < min_pair_count:
            break
        pair = min(p for p, c in pair_counts.items() if c == top)
        a, b = pair
        new_sym = a + b
        merges.append(pair)
        if new_sym not in vocab:
            vocab[new_sym] = len(vocab)

        affected = pair_words.pop(pair, set())
        pair_counts.pop(pair, None)
        for wi in affected:
            seq, c = seqs[wi], counts[wi]
            # remove this word's old adjacencies
            for j in range(len(seq) - 1):
                p = (seq[j], seq[j + 1])
                if p == pair:
                    continue
                n = pair_counts.get(p)
                if n is not None:
                    n -= c
                    if n <= 0:
                        pair_counts.pop(p, None)
                    else:
                        pair_counts[p] = n
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        pair_words.pop(p, None)
            # rewrite the word with the pair merged (non-overlapping,
            # left to right — matches encode_word)
            out, j = [], 0
            while j < len(seq):
                if (j < len(seq) - 1 and seq[j] == a
                        and seq[j + 1] == b):
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seq = tuple(out)
            seqs[wi] = seq
            # add the new adjacencies back
            for j in range(len(seq) - 1):
                p = (seq[j], seq[j + 1])
                if p == pair:
                    continue
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)

    return BpeModel(merges=merges, vocab=vocab, end_of_word=end_of_word,
                    lowercase=lowercase)


# per-worker-process cache (task-pool idiom, dedup.py:216): the model
# is fetched from plasma once per worker, and each distinct WORD is
# BPE-merged once per worker — both persist across batches. The word
# cache lives INSIDE the entry: nested map_batches functions are
# cloudpickled by value (their referenced globals are snapshotted), so
# only this module-level accessor — pickled by reference — may touch
# the real module dict.
_MODEL_CACHE: dict = {}
_WORD_CACHE_MAX = 1 << 20  # ~1M distinct words per worker, then reset


def _worker_state(model_ref):
    """(model, ranks, word_cache) for this worker process."""
    import ray

    key = model_ref.hex() if hasattr(model_ref, "hex") else id(model_ref)
    got = _MODEL_CACHE.get(key)
    if got is None:
        model = ray.get(model_ref)
        got = _MODEL_CACHE[key] = (model, model.ranks, {})
    return got


def bpe_tokenize(ds, model_or_ref, *, text_col: str = "text",
                 id_col: str = "doc_id", include_ids: bool = True):
    """Map-only BPE apply: (id, n_bpe_tokens[, token_ids list<int32>]).

    The model broadcasts once (``ray.put``); per batch, each DISTINCT
    word is encoded once through the per-worker cache and the result
    expands back to token streams with numpy repeats — the Python merge
    loop runs per new distinct word, never per occurrence. Unknown
    symbols map to ``<unk>`` (id 0).
    """
    import ray

    model_ref = (model_or_ref if isinstance(model_or_ref, ray.ObjectRef)
                 else ray.put(model_or_ref))

    def _apply(t: pa.Table) -> pa.Table:
        model, ranks, cache = _worker_state(model_ref)
        if len(cache) > _WORD_CACHE_MAX:
            cache.clear()
        vocab = model.vocab
        col = t[text_col].combine_chunks()
        if model.lowercase:
            col = pc.utf8_lower(col)
        lists = pc.utf8_split_whitespace(col)
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False)
        if len(flat):
            mask = flat != ""
            flat, parents = flat[mask], parents[mask]
        n_words = np.bincount(parents, minlength=t.num_rows).astype(
            np.int64)
        uniq, inv = np.unique(flat, return_inverse=True) if len(flat) \
            else (np.empty(0, dtype=object), np.empty(0, dtype=np.int64))
        enc = []
        for w in uniq:
            ids = cache.get(w)
            if ids is None:
                syms = model.encode_word(w, ranks)
                ids = np.fromiter(
                    (vocab.get(s, UNK_ID) for s in syms),
                    dtype=np.int32, count=len(syms))
                cache[w] = ids
            enc.append(ids)
        tok_per_word = (np.fromiter((len(e) for e in enc), dtype=np.int64,
                                    count=len(enc))[inv]
                        if len(enc) else np.empty(0, dtype=np.int64))
        # tokens per doc = sum over its words
        ends = np.cumsum(n_words)
        starts = ends - n_words
        cum = np.concatenate([[0], np.cumsum(tok_per_word)])
        n_tokens = cum[ends] - cum[starts]
        cols = {
            id_col: t[id_col],
            "n_bpe_tokens": pa.array(n_tokens, pa.int64()),
        }
        if include_ids:
            if len(enc):
                all_ids = np.concatenate([enc[i] for i in inv]) \
                    if len(inv) else np.empty(0, dtype=np.int32)
            else:
                all_ids = np.empty(0, dtype=np.int32)
            offsets = np.concatenate([[0], cum[ends]]).astype(np.int32)
            cols["token_ids"] = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(all_ids, pa.int32()))
        return pa.table(cols)

    return ds.map_batches(_apply, batch_format="pyarrow")
