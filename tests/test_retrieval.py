"""BM25 ranked retrieval vs a naive Python reference."""
import math

import numpy as np
import pandas as pd

import ray.data as rd

from siren_ray.stages.retrieval import bm25_topk


def _naive_bm25(texts, queries, k=10, k1=1.2, b=0.75):
    docs = [t.split(" ") for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    out = []
    for qi, q in enumerate(queries):
        terms = sorted(set(w for w in q.split(" ") if w))
        scored = []
        for di, d in enumerate(docs):
            s = 0.0
            for w in terms:
                tf = d.count(w)
                if not tf:
                    continue
                df = sum(1 for dd in docs if w in dd)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(d) / avgdl))
            if s > 0.0:
                scored.append((s, di))
        scored.sort(key=lambda x: (-x[0], x[1]))
        out.extend((qi, di) for _s, di in scored[:k])
    return out


def test_bm25_matches_naive_reference(ray_session):
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(20)] + ["apple", "banana", "cherry"]
    texts = [" ".join(vocab[rng.randint(len(vocab))]
                      for _ in range(rng.randint(5, 60)))
             for _ in range(120)]
    queries = ["apple banana", "cherry", "w0 w1 w2"]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts})
    got = bm25_topk(rd.from_pandas(docs).repartition(5), queries, k=7)
    want = _naive_bm25(texts, queries, k=7)
    assert list(zip(got["query_id"], got["doc_id"])) == want


def test_bm25_no_match_and_duplicate_terms(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["x x x y", "y", "z", "x"],
    })
    # duplicated term in one query counts once (SQL tf-join semantics)
    got = bm25_topk(rd.from_pandas(docs), ["x x", "missingword"], k=10)
    got_x = got[got["query_id"] == 0]["doc_id"].tolist()
    want = _naive_bm25(docs["text"].tolist(), ["x"], k=10)
    assert got_x == [d for _q, d in want]
    assert (got["query_id"] == 1).sum() == 0


# ---------------------------------------------------------------------------
# Materialized inverted index (stages/invindex.py)


def _naive_postings(texts, terms):
    want = set()
    for di, t in enumerate(texts):
        words = t.split(" ")
        for w in set(words) & set(terms):
            want.add((w, di, words.count(w)))
    return want


def test_inverted_index_build_and_pruned_lookup(ray_session, tmp_path):
    from siren_ray.stages.invindex import (build_inverted_index,
                                           lookup_postings)

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(30)] + ["apple", "banana"]
    texts = [" ".join(vocab[rng.randint(len(vocab))]
                      for _ in range(rng.randint(3, 40)))
             for _ in range(90)]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts})
    idx = build_inverted_index(rd.from_pandas(docs).repartition(4),
                               str(tmp_path / "idx"), num_buckets=16)

    terms = ["apple", "w3", "w17"]
    ds, info = lookup_postings(idx, terms)
    df = ds.to_pandas()  # ONE execution: per-column to_pandas() calls
    # would re-run the read with unstable row order and misalign tuples
    got = set(zip(df["word"], df["doc_id"], df["tf"]))
    assert got == _naive_postings(texts, terms)
    # pruning proof: only the probe terms' hash buckets are opened
    assert 0 < info["buckets_read"] <= len(terms) < info["num_buckets"]


def test_inverted_index_absent_term_and_empty_text(ray_session, tmp_path):
    from siren_ray.stages.invindex import (build_inverted_index,
                                           lookup_postings)

    docs = pd.DataFrame({"doc_id": np.arange(3, dtype="int64"),
                         "text": ["a b a", "", "b"]})
    idx = build_inverted_index(rd.from_pandas(docs),
                               str(tmp_path / "idx"), num_buckets=8)
    ds, _ = lookup_postings(idx, ["a"])
    df = ds.to_pandas()
    assert set(zip(df["doc_id"], df["tf"])) == {(0, 2)}
    ds2, _ = lookup_postings(idx, ["nosuchword"])
    assert ds2.count() == 0
