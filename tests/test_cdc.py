"""Content-defined chunking (stages/cdc.py): boundary determinism,
shift resilience vs fixed-size chunks, and the distributed dedup-stats
reduction."""

import numpy as np
import pyarrow as pa
import pytest

from siren_ray.stages.cdc import cdc_chunks, chunk_dedup_stats, fixed_chunks


def _rng_text(seed: int, n: int) -> str:
    rng = np.random.default_rng(seed)
    return "".join(
        chr(c) for c in rng.integers(ord("a"), ord("z") + 1, size=n))


def _tbl(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_chunks_tile_each_doc_exactly():
    texts = [_rng_text(i, 2000 + 137 * i) for i in range(5)]
    out = cdc_chunks(_tbl(texts), avg_bits=7)
    df = out.to_pandas()
    per_doc = df.groupby("doc_id")["chunk_len"].sum()
    for i, txt in enumerate(texts):
        assert per_doc[i] == len(txt.encode())


def test_batch_composition_independence():
    """A doc's boundaries/hashes must not depend on its batch
    neighbours (the NUL-pad isolation contract)."""
    texts = [_rng_text(100 + i, 3000) for i in range(4)]
    together = cdc_chunks(_tbl(texts), avg_bits=7).to_pandas()
    for i, txt in enumerate(texts):
        alone = cdc_chunks(_tbl([txt], ids=[i]), avg_bits=7).to_pandas()
        got = together[together.doc_id == i].reset_index(drop=True)
        assert list(got.chunk_hash) == list(alone.chunk_hash)
        assert list(got.chunk_len) == list(alone.chunk_len)


def test_shift_resilience_beats_fixed():
    """Insert bytes at the front of a doc: CDC re-aligns (most chunk
    hashes shared), fixed-size chunking shares ~nothing."""
    base = _rng_text(7, 20000)
    shifted = "zzzzz" + base
    t = _tbl([base, shifted])

    cdc = cdc_chunks(t, avg_bits=7).to_pandas()
    a = set(cdc[cdc.doc_id == 0].chunk_hash)
    b = set(cdc[cdc.doc_id == 1].chunk_hash)
    cdc_shared = len(a & b) / len(a)

    fx = fixed_chunks(t, size=128).to_pandas()
    fa = set(fx[fx.doc_id == 0].chunk_hash)
    fb = set(fx[fx.doc_id == 1].chunk_hash)
    fixed_shared = len(fa & fb) / len(fa)

    assert cdc_shared > 0.8
    assert fixed_shared < 0.1
    assert cdc_shared > fixed_shared + 0.5


def test_max_size_force_split():
    # a constant run never hits the mask naturally -> force splits
    t = _tbl(["a" * 10000])
    out = cdc_chunks(t, avg_bits=10, max_size=512).to_pandas()
    assert out.chunk_len.max() <= 512
    assert out.chunk_len.sum() == 10000


def test_empty_and_null_docs():
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["", None, "hello world " * 50],
                                   pa.string())})
    out = cdc_chunks(t, avg_bits=6).to_pandas()
    assert set(out.doc_id) == {2}
    assert out.chunk_len.sum() == len("hello world " * 50)
    fx = fixed_chunks(t, size=64).to_pandas()
    assert set(fx.doc_id) == {2}


def test_fixed_chunks_tile():
    texts = [_rng_text(i, 1000 + i) for i in range(3)]
    out = fixed_chunks(_tbl(texts), size=300).to_pandas()
    for i, txt in enumerate(texts):
        lens = list(out[out.doc_id == i].chunk_len)
        assert sum(lens) == len(txt.encode())
        assert all(ln <= 300 for ln in lens)
        assert all(ln == 300 for ln in lens[:-1])


@pytest.mark.usefixtures("ray_session")
def test_chunk_dedup_stats_matches_local():
    """The partitioned (hash,len,count) reduction must equal a local
    single-pass computation on the same table."""
    import ray.data as rd

    texts = [_rng_text(i, 4000) for i in range(6)]
    texts += texts[:3]  # planted exact duplicates
    t = _tbl(texts)
    ds = rd.from_arrow(t).repartition(4)

    got = chunk_dedup_stats(ds, chunker="cdc", avg_bits=7,
                            num_partitions=5).to_pandas().iloc[0]

    local = cdc_chunks(t, avg_bits=7).to_pandas()
    uniq = local.drop_duplicates("chunk_hash")
    assert got["total_chunks"] == len(local)
    assert got["unique_chunks"] == len(uniq)
    assert got["total_bytes"] == local.chunk_len.sum()
    assert got["unique_bytes"] == uniq.chunk_len.sum()
    # the planted dups must actually dedup
    assert got["unique_bytes"] < got["total_bytes"]


@pytest.mark.usefixtures("ray_session")
def test_chunk_dedup_cdc_beats_fixed_on_shifted_corpus():
    """A corpus of shifted re-crawls: CDC's unique_bytes is far below
    fixed-size chunking's on the same data."""
    import ray.data as rd

    base = [_rng_text(i, 15000) for i in range(4)]
    shifted = [_rng_text(1000 + i, 30) + b for i, b in enumerate(base)]
    t = _tbl(base + shifted)
    ds = rd.from_arrow(t).repartition(3)

    cdc = chunk_dedup_stats(ds, chunker="cdc",
                            avg_bits=7).to_pandas().iloc[0]
    fx = chunk_dedup_stats(ds, chunker="fixed",
                           size=128).to_pandas().iloc[0]
    assert cdc["total_bytes"] == fx["total_bytes"]
    assert cdc["unique_bytes"] < 0.75 * fx["unique_bytes"]
