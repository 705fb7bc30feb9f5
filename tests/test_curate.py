"""Dataset-assembly operators: deterministic split, per-domain cap,
export shuffle, semantic dedup (the oracle gate in test_queries.py
covers exact SQL parity for the md5-based three; these are the
edge/keep-rule unit tests)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from siren_ray.stages.relational import (
    dataset_split,
    group_cap,
    shuffle_shards,
)


def test_dataset_split_deterministic_and_total(ray_session):
    docs = pd.DataFrame({"doc_id": np.arange(400, dtype="int64")})
    out = dataset_split(rd.from_pandas(docs).repartition(3)).to_pandas()
    assert len(out) == 400
    assert set(out["split"].unique()) <= {"train", "val", "test"}
    # pure function of the id: a re-run maps every id identically
    again = dataset_split(rd.from_pandas(docs)).to_pandas()
    merged = out.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()
    # salt changes the permutation
    salted = dataset_split(rd.from_pandas(docs), salt="v2").to_pandas()
    m2 = out.merge(salted, on="doc_id", suffixes=("_a", "_b"))
    assert (m2["split_a"] != m2["split_b"]).any()


def test_dataset_split_fraction_validation(ray_session):
    with pytest.raises(ValueError, match="sum to 1"):
        dataset_split(rd.range(4), id_col="id",
                      fractions=(("train", 0.5), ("val", 0.1)))


def test_group_cap_small_groups_survive(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(30, dtype="int64"),
        "host": ["big"] * 25 + ["tiny"] * 5,
    })
    out = group_cap(rd.from_pandas(df).repartition(4), group_col="host",
                    id_col="doc_id", k=10).to_pandas()
    sizes = out.groupby("host").size().to_dict()
    assert sizes == {"big": 10, "tiny": 5}
    # deterministic: same winners on a re-run with different blocking
    out2 = group_cap(rd.from_pandas(df).repartition(2), group_col="host",
                     id_col="doc_id", k=10).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_shuffle_shards_is_a_permutation(ray_session):
    docs = pd.DataFrame({"doc_id": np.arange(257, dtype="int64")})
    out = shuffle_shards(rd.from_pandas(docs).repartition(3),
                         num_shards=4).to_pandas()
    assert len(out) == 257
    assert sorted(out["doc_id"]) == list(range(257))
    for _, g in out.groupby("shard"):
        # positions are a dense 1..|shard| ranking
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))
    # not the identity layout, and salt re-permutes
    salted = shuffle_shards(rd.from_pandas(docs), num_shards=4,
                            salt="x").to_pandas()
    m = out.merge(salted, on="doc_id", suffixes=("_a", "_b"))
    assert ((m["shard_a"] != m["shard_b"]) | (m["pos_a"] != m["pos_b"])).any()


def test_semantic_dedup_planted_pairs(ray_session):
    """Each planted near-identical pair loses exactly one member; the
    kept member is the pair's least-centroid-similar one (SemDeDup
    keep-rule) and non-duplicated points all survive."""
    from siren_ray.stages.dedup import semantic_dedup

    rng = np.random.default_rng(0)
    base = rng.normal(size=(60, 16)).astype(np.float32)
    dup = base[:10] + rng.normal(scale=1e-3, size=(10, 16)).astype(
        np.float32)
    X = np.vstack([base, dup])
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(70), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in X],
                              pa.list_(pa.float32())),
    })).repartition(3)
    kept = set(semantic_dedup(emb, n_clusters=4, threshold=0.99)
               .to_pandas()["vec_id"])
    assert len(kept) == 60
    for i in range(10):
        # exactly one survivor per planted pair
        assert (i in kept) != (60 + i in kept)
    assert set(range(10, 60)) <= kept


def test_semantic_dedup_no_duplicates_is_identity(ray_session):
    from siren_ray.stages.dedup import semantic_dedup

    rng = np.random.default_rng(1)
    X = rng.normal(size=(50, 8)).astype(np.float32)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in X],
                              pa.list_(pa.float32())),
    }))
    kept = semantic_dedup(emb, n_clusters=4, threshold=0.999)
    assert sorted(kept.to_pandas()["vec_id"]) == list(range(50))


def test_corpus_pipeline_lineage_funnel(ray_session):
    """Flagship crawl->corpus composite: stage order is fixed and the
    doc funnel is monotone non-increasing until packing (which re-rows
    into fixed-length sequences)."""
    import __ray_entry__ as entrymod

    t = entrymod.queries()["corpus_pipeline"]("/root/testdata/sf0.001")
    stages = t["stage"].to_pylist()
    rows = t["rows"].to_pylist()
    assert stages == ["crawled", "extracted", "lang_quality_gated",
                      "c4_repetition_gated", "paragraph_deduped",
                      "neardup_removed", "packed_sequences"]
    # every doc-level stage only ever removes rows
    assert (rows[0] >= rows[1] >= rows[2] >= rows[3] >= rows[4]
            >= rows[5] > 0)
    assert rows[6] > 0
