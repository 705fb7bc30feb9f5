"""Unit tests for the vectorized open-addressing seen-set store.

Semantics contract (unchanged from the Python-set shards it replaced):
test_and_set returns True exactly at the FIRST occurrence of each
previously-unseen fingerprint; contains/add are idempotent; dump/restore
round-trips exact fingerprints (conformance tests compare them to the
simulator's hashes).
"""

import numpy as np

from siren_ray.state.seen import FingerprintTable


def _ref_test_and_set(ref: set, batch) -> np.ndarray:
    out = np.empty(len(batch), bool)
    for j, h in enumerate(batch):
        h = int(h) or 1  # table remaps fingerprint 0 -> 1
        out[j] = h not in ref
        ref.add(h)
    return out


def test_test_and_set_matches_set_reference():
    rng = np.random.default_rng(7)
    t = FingerprintTable(16)  # tiny: force many growths
    ref: set = set()
    for _ in range(50):
        batch = rng.integers(0, 3000, size=int(rng.integers(1, 400)),
                             dtype=np.uint64)
        got = t.test_and_set(batch)
        exp = _ref_test_and_set(ref, batch)
        assert (got == exp).all()
    assert len(t) == len(ref)
    assert set(t.dump().tolist()) == ref


def test_contains_and_add():
    rng = np.random.default_rng(11)
    t = FingerprintTable()
    a = rng.integers(1, 1 << 60, size=5000, dtype=np.uint64)
    assert t.add(a) == len(np.unique(a))
    assert t.add(a) == 0  # idempotent
    assert t.contains(a).all()
    b = a + np.uint64(1 << 61)  # disjoint
    assert not t.contains(b).any()


def test_duplicates_within_one_call_first_wins():
    t = FingerprintTable()
    batch = np.array([5, 5, 7, 5, 7, 9], dtype=np.uint64)
    out = t.test_and_set(batch)
    assert out.tolist() == [True, False, True, False, False, True]
    assert not t.test_and_set(batch).any()


def test_zero_fingerprint_remapped():
    t = FingerprintTable()
    out = t.test_and_set(np.array([0, 1, 0], dtype=np.uint64))
    # 0 remaps to 1, so 0 and 1 are the same fingerprint
    assert out.tolist() == [True, False, False]
    assert len(t) == 1


def test_growth_preserves_members():
    rng = np.random.default_rng(3)
    t = FingerprintTable(16)
    all_h = rng.integers(1, 1 << 62, size=20000, dtype=np.uint64)
    for i in range(0, len(all_h), 700):
        t.add(all_h[i:i + 700])
    assert t.contains(all_h).all()
    # load factor stays <= 0.6
    assert len(t) * 5 <= len(t._table) * 3 + 5
