"""CompactFingerprintTable (`state/seen.py`): the cuckoo-style 32-bit
tag seen filter (SURVEY §1.3 compact mode). Invariants: NO false
negatives ever (bucket overflow spills to an exact stash), bounded
false positives (~slots x 2^-32 per query at initial width), quotient
resize preserves membership, checkpoint/restore round-trips, and a
crawl in compact mode is order-identical to exact mode at test scale."""

import numpy as np
import pytest

from siren_ray.state.seen import CompactFingerprintTable, FingerprintTable


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 1 << 63, size=n, dtype=np.uint64)


def test_no_false_negatives_basic():
    t = CompactFingerprintTable(1 << 10)
    h = _hashes(400)
    assert not t.contains(h).any()
    added = t.add(h)
    assert added == len(np.unique(h))
    assert t.contains(h).all()
    # unrelated hashes almost surely absent
    other = _hashes(400, seed=1)
    assert t.contains(other).sum() <= 1


def test_test_and_set_first_wins():
    t = CompactFingerprintTable(1 << 10)
    h = np.array([5, 7, 5, 9, 7, 5], dtype=np.uint64)
    got = t.test_and_set(h)
    # first occurrence of each distinct hash wins
    assert got.tolist() == [True, True, False, True, False, False]
    assert not t.test_and_set(h).any()
    assert len(t) == 3


def test_growth_preserves_membership():
    t = CompactFingerprintTable(1 << 8)  # tiny: forces several doublings
    h = _hashes(20_000)
    t.add(h)
    assert t.contains(h).all()  # no false negatives across resizes
    assert len(t) == len(np.unique(h))
    # footprint: 6.7 B/entry at the 0.6 load ceiling, 13.3 right after
    # a doubling — half the exact table's 13-27 B/entry at every phase
    assert t.nbytes() / len(t) < 14.0


def test_false_positive_rate_bounded():
    t = CompactFingerprintTable(1 << 18)
    t.add(_hashes(100_000))
    probes = _hashes(1_000_000, seed=42)
    fp = int(t.contains(probes).sum())
    # expected ~ 1e6 * (slots_checked * 2^-32) ≈ 0.001; allow slack for
    # genuine overlap between the two random draws
    assert fp <= 5


def test_bucket_overflow_stash_is_exact():
    # every insert lands in bucket 0 (hashes ≡ 0 mod nb): 8 slots fill,
    # the rest overflow to the exact stash — membership must stay exact
    t = CompactFingerprintTable(1 << 10)
    nb = 1 << t._nb_bits
    h = (np.arange(1, 33, dtype=np.uint64) * np.uint64(nb))
    t.add(h)
    assert t.contains(h).all()
    assert len(t) == 32
    absent = (np.arange(100, 120, dtype=np.uint64) * np.uint64(nb))
    assert not t.contains(absent).any()


def test_zero_tag_entries_survive_resize():
    """Regression: a fingerprint whose 32-bit tag field is all zero
    used to be remapped to the sentinel 1 at insert, which corrupted
    the bucket-promotion bit at resize — the entry migrated to bucket
    b|2^nb while lookups probed b: a false negative, the one thing the
    structure promises never to produce. Zero-tag entries now live in
    the exact stash and transform correctly through doublings."""
    t = CompactFingerprintTable(1 << 8)
    nb_bits = t._nb_bits
    # tag field [nb_bits, nb_bits+32) all zero; bucket bits + high bits set
    specials = np.array(
        [5 | (1 << (nb_bits + 34)),
         3 | (7 << (nb_bits + 32)),
         (1 << nb_bits - 1) | (1 << 63)], dtype=np.uint64)
    t.add(specials)
    assert t.contains(specials).all()
    # force several doublings
    t.add(_hashes(20_000, seed=11))
    assert t.contains(specials).all(), "zero-tag entry lost at resize"
    # tag-1 entries exercise the adjacent transform case
    tag1 = np.array([9 | (1 << t._nb_bits)], dtype=np.uint64)
    t.add(tag1)
    t.add(_hashes(30_000, seed=12))
    assert t.contains(tag1).all()
    assert t.contains(specials).all()


def test_growth_budget_exhaustion_raises():
    t = CompactFingerprintTable(1 << 8)
    t._tag_bits = 16  # simulate a table that has spent its budget
    with pytest.raises(RuntimeError, match="fp budget"):
        t._maybe_grow(1 << 12)


def test_state_roundtrip():
    t = CompactFingerprintTable(1 << 8)
    h = _hashes(5_000)
    t.add(h)
    idx, tags, stash, nb_bits, tag_bits = t.state_arrays()
    r = CompactFingerprintTable.from_state(idx, tags, stash, nb_bits,
                                           tag_bits, len(t))
    assert len(r) == len(t)
    assert r.contains(h).all()
    assert not r.contains(_hashes(1000, seed=9)).any()


def test_shard_checkpoint_restore_compact(ray_session, tmp_path):
    import ray

    from siren_ray.state.seen import SeenShard

    shard = SeenShard.remote("compact", 1 << 8)
    h = _hashes(3_000)
    ray.get(shard.add.remote(h))
    p = str(tmp_path / "shard.parquet")
    ray.get(shard.checkpoint.remote(p))
    fresh = SeenShard.remote("exact")  # restore flips it to compact
    ray.get(fresh.restore.remote(p))
    assert ray.get(fresh.contains.remote(h)).all()
    assert ray.get(fresh.size.remote()) == len(np.unique(h))
    assert not ray.get(fresh.contains.remote(_hashes(500, seed=3))).any()


def test_crawl_compact_matches_exact(corpus_sf0001, tmp_path, ray_session):
    """At test scale (thousands of URLs, fp ~1e-9/query) a compact-mode
    crawl must be order-identical to exact mode."""
    from siren_ray.pipelines.frontier import (CrawlConfig,
                                              read_crawl_order, run_crawl)

    orders = {}
    for mode in ("exact", "compact"):
        out = str(tmp_path / mode)
        run_crawl(CrawlConfig(
            corpus_dir=corpus_sf0001, out_dir=out, budget_per_round=50,
            round_ms=1000, max_rounds=4, max_depth=6,
            fetch_mode="broadcast", scheduler="driver",
            seen_mode=mode, ckpt_every=0,
        ))
        t = read_crawl_order(out)
        orders[mode] = list(zip(t["round"].to_pylist(),
                                t["url"].to_pylist(),
                                t["seq"].to_pylist()))
    assert orders["exact"] == orders["compact"]


def test_matches_exact_reference_randomized():
    """Property check: compact and exact tables agree on every
    membership answer over interleaved add/contains traffic (modulo
    the fp class, which at these sizes is ~impossible to hit)."""
    rng = np.random.default_rng(7)
    compact = CompactFingerprintTable(1 << 8)
    exact = FingerprintTable(1 << 8)
    universe = rng.integers(1, 1 << 62, size=5_000, dtype=np.uint64)
    for _ in range(20):
        batch = rng.choice(universe, size=500)
        got_c = compact.test_and_set(batch.copy())
        got_e = exact.test_and_set(batch.copy())
        assert (got_c == got_e).all()
    assert len(compact) == len(exact)
