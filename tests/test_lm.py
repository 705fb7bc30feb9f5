"""Hashed bigram LM (stages/lm.py): exact-count training vs a naive
reference, parallelism invariance, and perplexity semantics."""

import numpy as np
import pytest
import ray.data as rd

from siren_ray.stages.lm import (BigramLM, _MIX, bigram_lm_train,
                                 perplexity_score)
from siren_ray.util import hash_strings

DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat and the dog",
    "one",
    "",
    "the the the the",
]
UNI_BITS, BIG_BITS = 12, 14


def _naive_model() -> BigramLM:
    uni = np.zeros(1 << UNI_BITS, dtype=np.int64)
    big = np.zeros(1 << BIG_BITS, dtype=np.int64)
    for d in DOCS:
        words = d.lower().split()
        if not words:
            continue
        wh = hash_strings(words).astype(np.uint64)
        for h in wh:
            uni[int(h) & ((1 << UNI_BITS) - 1)] += 1
        for a, b in zip(wh[:-1], wh[1:]):
            # big-int arithmetic then explicit mod 2^64: same wrap the
            # vectorized engine path does, without the scalar-overflow
            # RuntimeWarning noise
            key = ((int(a) * int(_MIX) + int(b)) % (1 << 64)) \
                & ((1 << BIG_BITS) - 1)
            big[key] += 1
    return BigramLM(uni=uni, big=big, uni_bits=UNI_BITS, big_bits=BIG_BITS,
                    total_tokens=int(uni.sum()))


def _ds(parallelism: int):
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(DOCS)],
        override_num_blocks=parallelism,
    )


@pytest.fixture(scope="module")
def trained():
    return bigram_lm_train(_ds(3), uni_bits=UNI_BITS, big_bits=BIG_BITS,
                           combine_partitions=2)


def test_train_matches_naive_reference(trained):
    ref = _naive_model()
    assert np.array_equal(trained.uni, ref.uni)
    assert np.array_equal(trained.big, ref.big)
    assert trained.total_tokens == ref.total_tokens == 22


def test_train_parallelism_invariant(trained):
    wide = bigram_lm_train(_ds(6), uni_bits=UNI_BITS, big_bits=BIG_BITS,
                           combine_partitions=4)
    assert np.array_equal(trained.uni, wide.uni)
    assert np.array_equal(trained.big, wide.big)


def test_perplexity_semantics(trained):
    score_docs = [
        {"doc_id": 0, "text": "the cat sat on the mat"},   # in-domain
        {"doc_id": 1, "text": "zq xv bnploc wrtk jjqzx aa"},  # gibberish
        {"doc_id": 2, "text": "one"},                      # 1 token
        {"doc_id": 3, "text": ""},                         # empty
    ]
    out = (perplexity_score(rd.from_items(score_docs), trained)
           .to_pandas().set_index("doc_id"))
    assert out.loc[0, "ppl"] < out.loc[1, "ppl"]
    assert out.loc[0, "ppl"] >= 1.0
    assert np.isnan(out.loc[2, "ppl"]) and out.loc[2, "n_tokens"] == 1
    assert np.isnan(out.loc[3, "ppl"]) and out.loc[3, "n_tokens"] == 0


def test_score_batch_invariant(trained):
    """Per-doc scores must not depend on how docs are batched."""
    items = [{"doc_id": i, "text": t} for i, t in enumerate(DOCS)]
    a = (perplexity_score(rd.from_items(items, override_num_blocks=1),
                          trained).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (perplexity_score(rd.from_items(items, override_num_blocks=6),
                          trained).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
