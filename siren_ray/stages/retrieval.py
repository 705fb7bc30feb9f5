"""Lexical ranked retrieval (BM25) over a document Dataset.

The text-search sibling of the ANN operators in ``stages/ann.py``:
score every document against a small set of keyword queries with BM25
and return the top-k doc ids per query. The LLM-data use case is
targeted corpus carving — "pull the best k documents about X out of
100 TB" — where an inverted index doesn't exist yet and one streaming
pass must do.

Scale shape:
- Pass 1 (corpus stats) streams once: per-batch partial (doc count,
  total length) plus per-query-term document frequencies — query terms
  are a driver-small set, so the partials are a handful of integers per
  batch; nothing shuffles.
- Pass 2 (scoring) broadcasts the term table (ids + idf) once, scores
  each batch vectorized (term membership via ``searchsorted`` against
  the sorted term-hash array, tf via one fused (row, term) bincount),
  and prunes to <= k rows per (batch, query) BEFORE anything moves —
  the final merge sees at most k x n_queries x n_blocks tiny rows.

No shuffle of text, no inverted index materialization, no Python
per-row loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import hash_strings


def _term_table(queries: list[str]):
    """(query_id, term) pairs + the sorted unique term-hash array."""
    qids, terms = [], []
    for qi, q in enumerate(queries):
        for w in q.split(" "):
            if w:
                qids.append(qi)
                terms.append(w)
    qids = np.asarray(qids, dtype=np.int64)
    th = hash_strings(terms)
    uniq = np.unique(th)
    return qids, terms, th, uniq


def bm25_topk(docs_ds, queries: list[str], *, id_col: str = "doc_id",
              text_col: str = "text", k: int = 10, k1: float = 1.2,
              b: float = 0.75, pin_input: bool = True):
    """Top-``k`` documents per query under BM25 (idf =
    ``ln((N - df + 0.5) / (df + 0.5) + 1)``, the positive Robertson
    variant). Documents matching no query term never appear. Returns a
    pandas DataFrame of (query_id, doc_id) ordered by
    (query_id, score DESC, doc_id ASC) — ids only, like
    ``ann.brute_topk``, so the result is float-rounding-robust and
    oracle-comparable; ties break on doc_id.

    Term identity is SipHash64 of the exact token (same collision
    argument as the dedup family: one false term match per
    ~2^64/|vocab| corpora).
    """
    import ray

    qids, _terms, th, uniq = _term_table(queries)
    n_queries = len(queries)
    if not len(th):
        return pd.DataFrame({"query_id": np.empty(0, np.int64),
                             "doc_id": np.empty(0, np.int64)})

    uniq_ref = ray.put(uniq)

    def _split(t: pa.Table):
        txt = pc.coalesce(t[text_col], pa.scalar(""))
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lst = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(lst)
        parents = pc.list_parent_indices(lst).to_numpy(
            zero_copy_only=False)
        wh = hash_strings(flat.to_numpy(zero_copy_only=False))
        return parents, wh

    def _stats_partial(t: pa.Table) -> pa.Table:
        parents, wh = _split(t)
        want = ray.get(uniq_ref)
        dl = np.bincount(parents, minlength=t.num_rows)
        pos = np.searchsorted(want, wh)
        pos_c = np.minimum(pos, len(want) - 1)
        hit = want[pos_c] == wh
        # df partial: distinct (doc, term) pairs per batch
        fused = parents[hit].astype(np.int64) * len(want) + pos_c[hit]
        df_part = np.bincount(np.unique(fused) % len(want),
                              minlength=len(want))
        return pa.table({
            "term_idx": pa.array(np.arange(len(want) + 1), pa.int64()),
            # row len(want) carries (n_docs, total_len) in two columns
            "df": pa.array(np.concatenate(
                [df_part, [t.num_rows]]).astype(np.int64), pa.int64()),
            "total_len": pa.array(np.concatenate(
                [np.zeros(len(want), np.int64), [int(dl.sum())]]),
                pa.int64()),
        })

    from ..util import pin_for_multipass

    # two passes (corpus stats, then scoring): pin the projected input
    docs_ds = pin_for_multipass(docs_ds, enabled=pin_input)
    stats = (docs_ds.map_batches(_stats_partial, batch_format="pyarrow")
             .groupby("term_idx").sum(["df", "total_len"]).to_pandas()
             .sort_values("term_idx"))
    df_vec = stats["sum(df)"].to_numpy(np.int64)[:len(uniq)]
    n_docs = int(stats["sum(df)"].to_numpy(np.int64)[len(uniq)])
    avgdl = (float(stats["sum(total_len)"].to_numpy(np.int64)[len(uniq)])
             / max(n_docs, 1))
    idf = np.log((n_docs - df_vec + 0.5) / (df_vec + 0.5) + 1.0)

    # per-query term index lists into `uniq` (deduped: a term repeated
    # inside one query counts once, matching the SQL/tf-join semantics)
    q_term_idx = [
        np.unique(np.searchsorted(uniq, th[qids == qi]))
        for qi in range(n_queries)
    ]
    bundle_ref = ray.put((uniq, idf, q_term_idx, float(avgdl)))

    class _Score:
        def __init__(self):
            (self.uniq, self.idf, self.q_term_idx,
             self.avgdl) = ray.get(bundle_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            parents, wh = _split(t)
            dl = np.bincount(parents, minlength=t.num_rows).astype(
                np.float64)
            pos = np.searchsorted(self.uniq, wh)
            pos_c = np.minimum(pos, len(self.uniq) - 1)
            hit = self.uniq[pos_c] == wh
            n_terms = len(self.uniq)
            fused = parents[hit].astype(np.int64) * n_terms + pos_c[hit]
            tf_flat = np.bincount(fused,
                                  minlength=t.num_rows * n_terms)
            tf = tf_flat.reshape(t.num_rows, n_terms).astype(np.float64)
            denom = tf + k1 * (1.0 - b + b * (dl / self.avgdl))[:, None]
            with np.errstate(invalid="ignore"):
                contrib = np.where(
                    tf > 0.0,
                    self.idf[None, :] * tf * (k1 + 1.0) / denom, 0.0)
            ids = np.asarray(t[id_col], dtype=np.int64)
            out_q, out_id, out_s = [], [], []
            for qi, tidx in enumerate(self.q_term_idx):
                score = contrib[:, tidx].sum(axis=1)
                nz = np.flatnonzero(score > 0.0)
                if not len(nz):
                    continue
                if len(nz) > k:
                    # per-batch prune: top-k by (score DESC, id ASC)
                    o = np.lexsort((ids[nz], -score[nz]))[:k]
                    nz = nz[o]
                out_q.append(np.full(len(nz), qi, np.int64))
                out_id.append(ids[nz])
                out_s.append(score[nz])
            if not out_q:
                return pa.table({
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                })
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            })

    cand = docs_ds.map_batches(_Score, batch_format="pyarrow",
                               concurrency=(1, 8)).to_pandas()
    if cand.empty:
        return pd.DataFrame({"query_id": np.empty(0, np.int64),
                             "doc_id": np.empty(0, np.int64)})
    cand = cand.sort_values(["query_id", "score", "doc_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
    top = cand.groupby("query_id", sort=True).head(k)
    return top[["query_id", "doc_id"]].reset_index(drop=True)
