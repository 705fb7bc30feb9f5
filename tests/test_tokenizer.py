"""BPE tokenizer: exact word counts, deterministic merges, apply."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts, nparts=4):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(nparts)


def test_word_frequencies_exact_and_parallelism_invariant(ray_session):
    from siren_ray.stages.tokenizer import word_frequencies

    texts = ["the cat sat on the mat", "the dog ATE the cat",
             "a mat a cat a hat", ""] * 7
    want = {}
    for t in texts:
        for w in t.lower().split():
            want[w] = want.get(w, 0) + 1
    got1 = word_frequencies(_docs_ds(texts, 1), top_k=1000)
    got8 = word_frequencies(_docs_ds(texts, 8), top_k=1000)
    assert got1.equals(got8)  # parallelism-invariant, byte-for-byte
    got = dict(zip(got1["word"].to_pylist(), got1["count"].to_pylist()))
    assert got == want
    # ordering contract: count DESC then word ASC
    rows = list(zip(got1["count"].to_pylist(), got1["word"].to_pylist()))
    assert rows == sorted(rows, key=lambda r: (-r[0], r[1]))


def test_word_frequencies_topk_is_exact(ray_session):
    from siren_ray.stages.tokenizer import word_frequencies

    # 30 words with distinct counts spread over partitions: top-5 must
    # be the true global top-5 even though each partition prunes locally
    texts = []
    for i in range(30):
        texts.extend([f"w{i:02d}"] * (i + 1))
    got = word_frequencies(_docs_ds(texts, 8), top_k=5,
                           num_partitions=4)
    assert got["word"].to_pylist() == ["w29", "w28", "w27", "w26", "w25"]
    assert got["count"].to_pylist() == [30, 29, 28, 27, 26]


def test_bpe_train_hand_example():
    """Sennrich-style corpus: the merge order is hand-derivable."""
    from siren_ray.stages.tokenizer import bpe_train

    wf = pa.table({
        "word": pa.array(["low", "lower", "newest", "widest"]),
        "count": pa.array([5, 2, 6, 3], pa.int64()),
    })
    m = bpe_train(wf, vocab_size=1000, min_pair_count=2)
    assert m.merges[:5] == [("e", "s"), ("es", "t"), ("est", "</w>"),
                            ("l", "o"), ("lo", "w")]
    # vocab ids: 0=<unk>, then sorted alphabet, then merges in order
    assert m.vocab["<unk>"] == 0
    alpha = sorted(set("lowernewstwid") | {"</w>"})
    for i, s in enumerate(alpha):
        assert m.vocab[s] == 1 + i
    assert m.vocab["es"] == 1 + len(alpha)


def test_bpe_train_deterministic_and_bounded():
    from siren_ray.stages.tokenizer import bpe_train

    wf = pa.table({
        "word": pa.array([f"tok{i}xyz" for i in range(50)]),
        "count": pa.array([50 - i for i in range(50)], pa.int64()),
    })
    a = bpe_train(wf, vocab_size=40)
    b = bpe_train(wf, vocab_size=40)
    assert a.merges == b.merges
    assert len(a.vocab) <= 40


def test_encode_word_matches_merge_semantics():
    from siren_ray.stages.tokenizer import bpe_train

    wf = pa.table({"word": pa.array(["aaab"]),
                   "count": pa.array([10], pa.int64())})
    m = bpe_train(wf, vocab_size=1000, min_pair_count=2)
    # (a,a) count 2 -> merged non-overlapping left-to-right: aa, a, b
    assert ("a", "a") in m.merges
    assert m.encode_word("aaaa")[:2] == ["aa", "aa"]


def test_bpe_tokenize_roundtrip_and_batch_invariance(ray_session):
    from siren_ray.stages.tokenizer import (bpe_tokenize, bpe_train,
                                            word_frequencies)

    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown cat sleeps", "lazy lazy dog dog dog",
             "jumps over the moon"] * 5
    ds1 = _docs_ds(texts, 1)
    ds8 = _docs_ds(texts, 8)
    wf = word_frequencies(ds1, top_k=1000)
    model = bpe_train(wf, vocab_size=64, min_pair_count=2)

    out1 = bpe_tokenize(ds1, model).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    out8 = bpe_tokenize(ds8, model).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert (out1["n_bpe_tokens"] == out8["n_bpe_tokens"]).all()
    for a, b in zip(out1["token_ids"], out8["token_ids"]):
        assert list(a) == list(b)
    # lossless: ids decode back to the lowercased normalized text
    for i, ids in enumerate(out1["token_ids"]):
        want = " ".join(texts[i].lower().split())
        assert model.decode_ids(ids) == want
    # n_bpe_tokens is exactly the emitted id-list length
    assert (out1["n_bpe_tokens"]
            == out1["token_ids"].map(len)).all()


def test_bpe_tokenize_unknown_chars_map_to_unk(ray_session):
    from siren_ray.stages.tokenizer import UNK_ID, bpe_train

    wf = pa.table({"word": pa.array(["abc"]),
                   "count": pa.array([5], pa.int64())})
    m = bpe_train(wf, vocab_size=10, min_pair_count=10)  # no merges
    import ray.data as rd

    from siren_ray.stages.tokenizer import bpe_tokenize

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["abc xyz"], pa.string()),
    }))
    out = bpe_tokenize(ds, m).to_pandas()
    ids = list(out["token_ids"][0])
    # 'x','y','z' unseen -> UNK; 'a','b','c' and </w> known
    assert ids.count(UNK_ID) == 3
    assert out["n_bpe_tokens"][0] == 8  # 3+</w> + 3+</w>


def test_more_merges_never_lengthen_tokenization(ray_session):
    from siren_ray.stages.tokenizer import (bpe_tokenize, bpe_train,
                                            word_frequencies)

    texts = ["hello world hello there world wide web"] * 10
    ds = _docs_ds(texts, 2)
    wf = word_frequencies(ds, top_k=100)
    small = bpe_train(wf, vocab_size=30, min_pair_count=2)
    big = bpe_train(wf, vocab_size=200, min_pair_count=2)
    assert small.merges == big.merges[:len(small.merges)]  # nested
    n_small = bpe_tokenize(ds, small).to_pandas()["n_bpe_tokens"].sum()
    n_big = bpe_tokenize(ds, big).to_pandas()["n_bpe_tokens"].sum()
    assert n_big <= n_small


def test_bpe_end_to_end_documents(ray_session):
    import ray.data as rd

    from siren_ray.stages.tokenizer import (bpe_tokenize, bpe_train,
                                            word_frequencies)

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    wf = word_frequencies(docs, top_k=5000)
    model = bpe_train(wf, vocab_size=512)
    out = bpe_tokenize(docs, model, include_ids=False).to_pandas()
    assert len(out) == docs.count()
    assert (out["n_bpe_tokens"] > 0).all()
    # BPE at vocab 512 must compress vs character count but stay at
    # least one token per word
    joined = docs.to_pandas()
    nw = joined["text"].str.split().str.len()
    merged = out.merge(joined[["doc_id"]].assign(n_words=nw), on="doc_id")
    assert (merged["n_bpe_tokens"] >= merged["n_words"]).all()
