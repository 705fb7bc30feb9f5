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


IN_DOMAIN = [
    "python code function return class import module def",
    "function class method import python code module loop",
    "code python import def function return module class",
]
OUT_DOMAIN = [
    "recipe butter flour sugar oven bake cake sweet",
    "garden flower soil water sunlight grow plant seed",
    "football match goal score team player league win",
]


def _naive_weights(docs, target, raw, alpha, per_token):
    """Direct per-doc DSIR log-ratio from the model arrays."""
    out = []
    vu, vb = 1 << target.uni_bits, 1 << target.big_bits
    cu = (np.log(raw.uni.sum() + alpha * vu)
          - np.log(target.uni.sum() + alpha * vu))
    cb = (np.log(raw.big.sum() + alpha * vb)
          - np.log(target.big.sum() + alpha * vb))
    for d in docs:
        words = d.lower().split()
        s = 0.0
        nfeat = len(words) + max(len(words) - 1, 0)
        if words:
            wh = hash_strings(words).astype(np.uint64)
            for h in wh:
                slot = int(h) & (vu - 1)
                s += (np.log(target.uni[slot] + alpha)
                      - np.log(raw.uni[slot] + alpha) + cu)
            for a, b in zip(wh[:-1], wh[1:]):
                slot = ((int(a) * int(_MIX) + int(b)) % (1 << 64)) & (vb - 1)
                s += (np.log(target.big[slot] + alpha)
                      - np.log(raw.big[slot] + alpha) + cb)
        out.append(s / nfeat if (per_token and nfeat) else s)
    return np.array(out)


def test_importance_weights_matches_naive_reference():
    from siren_ray.stages.lm import importance_weights

    raw_docs = IN_DOMAIN + OUT_DOMAIN + ["one", ""]
    target = bigram_lm_train(
        rd.from_items([{"text": t} for t in IN_DOMAIN]),
        uni_bits=UNI_BITS, big_bits=BIG_BITS)
    raw = bigram_lm_train(
        rd.from_items([{"text": t} for t in raw_docs]),
        uni_bits=UNI_BITS, big_bits=BIG_BITS)
    for per_token in (True, False):
        got = (importance_weights(
            rd.from_items([{"doc_id": i, "text": t}
                           for i, t in enumerate(raw_docs)],
                          override_num_blocks=3),
            target, raw, alpha=0.1, per_token=per_token)
            .to_pandas().sort_values("doc_id"))
        ref = _naive_weights(raw_docs, target, raw, 0.1, per_token)
        np.testing.assert_allclose(got["log_weight"].to_numpy(), ref,
                                   rtol=1e-10, atol=1e-12)
    # zero-feature doc: weight exactly 0 in both modes
    assert got.iloc[-1]["log_weight"] == 0.0
    # in-domain docs outweigh out-domain docs under the target model
    w = got.set_index("doc_id")["log_weight"]
    assert w[:3].min() > w[3:6].max()


def test_importance_weights_rejects_mismatched_spaces():
    from siren_ray.stages.lm import importance_weights

    a = bigram_lm_train(rd.from_items([{"text": "x y"}]),
                        uni_bits=10, big_bits=12)
    b = bigram_lm_train(rd.from_items([{"text": "x y"}]),
                        uni_bits=11, big_bits=12)
    with pytest.raises(ValueError):
        importance_weights(rd.from_items([{"doc_id": 0, "text": "x"}]),
                           a, b)


def test_dsir_select_skews_to_target_and_is_deterministic():
    from siren_ray.stages.lm import dsir_select

    # raw corpus: 6 in-domain + 18 out-domain docs
    raw_docs = [(i, IN_DOMAIN[i % 3]) for i in range(6)] + \
               [(100 + i, OUT_DOMAIN[i % 3]) for i in range(18)]
    items = [{"doc_id": i, "text": t} for i, t in raw_docs]
    target_ds = rd.from_items([{"text": t} for t in IN_DOMAIN])

    def _run(blocks):
        return dsir_select(
            rd.from_items(items, override_num_blocks=blocks),
            target_ds, 6, uni_bits=UNI_BITS, big_bits=BIG_BITS,
            temperature=0.05).to_pandas().sort_values("doc_id")

    a, b = _run(2), _run(5)
    assert len(a) == 6
    # deterministic and partitioning-invariant
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # at low temperature the selection is weight-dominated: the six
    # in-domain docs (ids < 100) win
    assert (a["doc_id"] < 100).all()
    # a different salt re-randomizes the Gumbel draw but k stays exact
    c = dsir_select(rd.from_items(items), target_ds, 6,
                    uni_bits=UNI_BITS, big_bits=BIG_BITS,
                    temperature=0.05, seed_salt="s2")
    assert c.num_rows == 6


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
