"""Model-based quality classifier (stages/classifier.py): distributed
full-batch logistic regression must separate separable data, match the
single-array numpy reference, and be invariant to repartitioning."""

import numpy as np
import pytest


def _synthetic(n=300, seed=3):
    rng = np.random.RandomState(seed)
    texts, labels = [], []
    good = ["insight", "analysis", "report", "study", "evidence"]
    bad = ["zzspam", "clickzz", "buyzz", "winzz", "freezz"]
    for i in range(n):
        y = i % 2
        vocab = good if y else bad
        words = [vocab[rng.randint(len(vocab))] for _ in range(30)]
        words += [f"noise{rng.randint(50)}" for _ in range(10)]
        texts.append(" ".join(words))
        labels.append(y)
    return texts, np.array(labels, dtype=np.int64)


@pytest.fixture(scope="module")
def trained(ray_session):
    import ray.data as rd

    from siren_ray.stages.classifier import train_quality_classifier

    texts, labels = _synthetic()
    ds = rd.from_items(
        [{"text": t, "label": int(y)} for t, y in zip(texts, labels)],
        override_num_blocks=4,
    )
    model = train_quality_classifier(ds, label_col="label", dim=128,
                                     epochs=30)  # auto -> newton
    return texts, labels, model


def test_separates_separable_data(trained, ray_session):
    import ray.data as rd

    from siren_ray.stages.classifier import score_quality

    texts, labels, model = trained
    scored = score_quality(
        rd.from_items([{"doc_id": i, "text": t}
                       for i, t in enumerate(texts)]),
        model,
    ).to_pandas().sort_values("doc_id")
    pred = (scored["quality_prob"].to_numpy() >= 0.5).astype(int)
    acc = (pred == labels).mean()
    assert acc >= 0.95, acc
    assert model.final_loss < 0.5


def test_newton_matches_numpy_reference_in_few_passes(trained):
    from siren_ray.stages.classifier import train_reference_newton

    texts, labels, model = trained
    w_ref, b_ref = train_reference_newton(texts, labels, dim=128,
                                          epochs=30)
    # identical math, different summation order (per-block partials);
    # Newton solves amplify association noise, hence the looser atol
    assert np.allclose(model.weights, w_ref, atol=1e-6)
    assert abs(model.bias - b_ref) < 1e-6
    # the whole point of IRLS: convergence in a handful of FULL-CORPUS
    # passes (GD needs tens for the same loss)
    assert model.epochs_run <= 12, model.epochs_run


def test_gd_matches_numpy_reference(ray_session):
    import ray.data as rd

    from siren_ray.stages.classifier import (train_quality_classifier,
                                             train_reference_numpy)

    texts, labels = _synthetic()
    ds = rd.from_items(
        [{"text": t, "label": int(y)} for t, y in zip(texts, labels)],
        override_num_blocks=4,
    )
    model = train_quality_classifier(ds, label_col="label", dim=128,
                                     epochs=30, method="gd")
    w_ref, b_ref = train_reference_numpy(texts, labels, dim=128, epochs=30)
    # identical math, different summation order (per-block partials)
    assert np.allclose(model.weights, w_ref, atol=1e-8)
    assert abs(model.bias - b_ref) < 1e-8


def test_invariant_to_repartitioning(trained, ray_session):
    import ray.data as rd

    from siren_ray.stages.classifier import train_quality_classifier

    texts, labels, model = trained
    ds = rd.from_items(
        [{"text": t, "label": int(y)} for t, y in zip(texts, labels)],
        override_num_blocks=13,
    )
    model13 = train_quality_classifier(ds, label_col="label", dim=128,
                                       epochs=30)
    assert np.allclose(model.weights, model13.weights, atol=1e-6)
    assert abs(model.bias - model13.bias) < 1e-6


def test_line_repetition_matches_naive_reference():
    """Gopher repetition counts vs a per-doc Python reference."""
    import pyarrow as pa

    from siren_ray.functions.textstats import line_repetition_batch

    texts = ["a\nb\na\nccc", "x", "", "dup\ndup\ndup\nuniq\n",
             "один\nодин\nдва"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = line_repetition_batch(t).to_pydict()
    for i, txt in enumerate(texts):
        lines = txt.split("\n")
        from collections import Counter

        c = Counter(lines)
        assert got["n_lines"][i] == len(lines)
        assert got["n_distinct_lines"][i] == len(c)
        assert got["dup_line_chars"][i] == sum(
            n * len(line) for line, n in c.items() if n > 1)


def test_gopher_rules_match_naive_reference():
    """Word / top-n-gram signals vs a per-doc Python reference
    (includes the overlapping-repeat case: 'foo bar foo bar foo' holds
    the 3-gram 'foo bar foo' TWICE)."""
    from collections import Counter

    import pyarrow as pa

    from siren_ray.functions.textstats import _STOPWORDS, gopher_rules_batch

    texts = [
        "- item one\n* item two\nplain...\nfoo bar foo bar foo baz",
        "the and of fox 123",
        "",
        "  \t- dash\nend… \nx",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = gopher_rules_batch(t).to_pydict()
    for i, txt in enumerate(texts):
        words = txt.lower().split()
        assert got["n_words"][i] == len(words)
        assert got["n_alpha_words"][i] == sum(
            any(c.isalpha() and c.isascii() for c in w) for w in words)
        assert got["n_stopword_hits"][i] == sum(
            w in _STOPWORDS for w in words)
        for k, colname in ((2, "top2gram_chars"), (3, "top3gram_chars"),
                           (4, "top4gram_chars")):
            grams = Counter(
                tuple(words[j:j + k]) for j in range(len(words) - k + 1))
            if not grams:
                assert got[colname][i] == 0
                continue
            cmax = max(grams.values())
            chars = max(
                c * (sum(map(len, g)) + k - 1)
                for g, c in grams.items() if c == cmax)
            assert got[colname][i] == chars, (i, k)
        lines = txt.split("\n")
        assert got["n_lines"][i] == len(lines)
        assert got["n_bullet_lines"][i] == sum(
            ln.lstrip(" \t").startswith(("-", "*", "•")) for ln in lines)
        assert got["n_ellipsis_lines"][i] == sum(
            ln.rstrip(" \t").endswith(("...", "…")) for ln in lines)


def test_dup_ngram_chars_match_naive_reference():
    """Positional-union duplicate-n-gram coverage vs a per-doc Python
    reference — includes overlapping occurrences ('a b a b a b a'
    holds 'a b a b a' at starts 0 and 2, union = all 7 words) and a
    clean two-occurrence 5-gram."""
    import pyarrow as pa

    from siren_ray.functions.textstats import dup_ngram_chars_batch

    texts = [
        "one two three four five x one two three four five y",
        "a b a b a b a",
        "all words distinct here nothing repeats at all ever",
        "",
        "w1 w2 w3 w4 w5 w6 w1 w2 w3 w4 w5 w6",  # dup 5 AND 6-gram
    ]

    def ref(words, k):
        grams: dict = {}
        for j in range(len(words) - k + 1):
            grams.setdefault(tuple(words[j:j + k]), []).append(j)
        covered: set = set()
        for pos in grams.values():
            if len(pos) >= 2:
                for s in pos:
                    covered.update(range(s, s + k))
        return sum(len(words[i]) for i in covered)

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = dup_ngram_chars_batch(t).to_pydict()
    for i, txt in enumerate(texts):
        words = txt.lower().split()
        assert got["word_chars"][i] == sum(map(len, words))
        for k in (5, 6, 7, 8, 9, 10):
            assert got[f"dup{k}gram_chars"][i] == ref(words, k), (i, k)
