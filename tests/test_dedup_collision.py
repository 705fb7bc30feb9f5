"""Planted LSH band collision: a LOW-Jaccard pair engineered to share a
full minhash band (the false-candidate class that makes unverified
removal silent data loss). The default remove_near_duplicates must keep
both docs (verify_jaccard="auto" screens the pair out); the unverified
path must remove one — proving the collision is real AND the screen is
what saves it (VERDICT r3 'done' bar for scale-safe defaults)."""

import numpy as np
import pytest

from siren_ray.stages.dedup import (
    _minhash_params,
    jaccard,
    minhash_signature,
)

NUM_PERM, BANDS, K = 64, 16, 5
ROWS = NUM_PERM // BANDS


def _words(rng, n, prefix):
    return [f"{prefix}{rng.randint(10**9)}x{i}" for i in range(n)]


def _plant_collision():
    """Find (deterministically) a doc B sharing band 0's four argmin
    shingles with doc A, padded with junk that never undercuts those
    minima under perms 0..3, while jaccard(A, B) < 0.4."""
    a_params, b_params = _minhash_params(NUM_PERM)
    rng = np.random.RandomState(1234)
    words_a = _words(rng, 120, "wa")
    text_a = " ".join(words_a)
    sig_a = minhash_signature(text_a, a_params, b_params, k=K)

    # the k-word windows whose shingles minimize perms 0..ROWS-1
    from siren_ray.stages.dedup import shingle_hashes

    sh = shingle_hashes(text_a, K)
    h = sh >> np.uint64(32)
    windows = []
    for p in range(ROWS):
        vals = (a_params[p] * h + b_params[p]) % np.uint64((1 << 61) - 1)
        j = int(np.argmin(vals))
        windows.append(words_a[j:j + K])

    for attempt in range(200):
        junk = _words(np.random.RandomState(5000 + attempt), 60, "jb")
        parts = []
        for w, pad in zip(windows, (junk[:15], junk[15:30], junk[30:45],
                                    junk[45:])):
            parts.extend(w)
            parts.extend(pad)
        text_b = " ".join(parts)
        sig_b = minhash_signature(text_b, a_params, b_params, k=K)
        if (sig_b[:ROWS] == sig_a[:ROWS]).all() and \
                jaccard(text_a, text_b, K) < 0.4:
            return text_a, text_b
    raise AssertionError("collision construction failed in 200 attempts")


@pytest.fixture(scope="module")
def planted():
    return _plant_collision()


def test_band_collision_is_a_real_lsh_candidate(ray_session, planted):
    import ray.data as rd

    from siren_ray.stages.dedup import minhash_duplicate_pairs

    text_a, text_b = planted
    rng = np.random.RandomState(7)
    docs = [{"doc_id": 0, "text": text_a}, {"doc_id": 1, "text": text_b}]
    docs += [{"doc_id": 2 + i, "text": " ".join(_words(rng, 80, f"f{i}"))}
             for i in range(20)]
    pairs = minhash_duplicate_pairs(
        rd.from_items(docs), "doc_id",
        num_perm=NUM_PERM, bands=BANDS, k=K,
    ).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got  # the planted band collision proposes the pair


def test_default_removal_rejects_band_collision(ray_session, planted):
    import ray.data as rd

    from siren_ray.stages.dedup import remove_near_duplicates

    text_a, text_b = planted
    rng = np.random.RandomState(8)
    docs = [{"doc_id": 0, "text": text_a}, {"doc_id": 1, "text": text_b}]
    docs += [{"doc_id": 2 + i, "text": " ".join(_words(rng, 80, f"g{i}"))}
             for i in range(20)]
    ds = rd.from_items(docs)

    # DEFAULTS (method="auto", verify_jaccard="auto"): the true-Jaccard
    # screen rejects the collision; nothing is removed
    kept = remove_near_duplicates(ds, "doc_id").to_pandas()
    assert set(kept["doc_id"]) == set(range(22))

    # unverified path removes on the band coincidence alone — proving
    # the screen (not luck) is what protected the data above
    kept_raw = remove_near_duplicates(
        ds, "doc_id", verify_jaccard=None).to_pandas()
    assert set(kept_raw["doc_id"]) == set(range(22)) - {1}


def test_incremental_ingest_default_args_resolve_auto(ray_session):
    """Regression: verify_jaccard="auto" (the default) must resolve to
    the LSH design-point float before reaching the numpy comparison —
    the operator crashed on default args when only the signature was
    changed (r4 review finding)."""
    import ray.data as rd

    from siren_ray.stages.dedup import incremental_ingest_neardup

    base = rd.from_items([{"doc_id": i,
                           "text": f"base doc {i} " + "alpha beta " * 20}
                          for i in range(5)])
    inc = rd.from_items([{"doc_id": 10 + i,
                          "text": f"inc doc {i} " + "gamma delta " * 20}
                         for i in range(5)])
    out = incremental_ingest_neardup(base, inc, id_col="doc_id").to_pandas()
    assert set(out["doc_id"]) == {10, 11, 12, 13, 14}
