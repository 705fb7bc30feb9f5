"""Parquet shard compaction (stages/compact.py): row preservation,
partition isolation, idempotence/resume, deterministic identity."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from siren_ray.stages.compact import compact_parquet, plan_compaction

BASE = "/tmp/siren_ray_test_compact"


def _write_shards(root, leaf, n_shards, rows_per_shard, start=0):
    d = os.path.join(root, leaf)
    os.makedirs(d, exist_ok=True)
    for s in range(n_shards):
        lo = start + s * rows_per_shard
        t = pa.table({"id": pa.array(range(lo, lo + rows_per_shard),
                                     pa.int64()),
                      "v": pa.array([f"x{j}" for j in
                                     range(lo, lo + rows_per_shard)])})
        pq.write_table(t, os.path.join(d, f"part-{s:04d}.parquet"))


def _all_ids(root):
    ids = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                ids.extend(pq.read_table(
                    os.path.join(dirpath, f))["id"].to_pylist())
    return sorted(ids)


def _n_files(root):
    return sum(f.endswith(".parquet") for _, _, fs in os.walk(root)
               for f in fs)


def test_plan_is_deterministic_and_partition_safe():
    shutil.rmtree(BASE, ignore_errors=True)
    _write_shards(BASE, "bucket=0", 6, 10, start=0)
    _write_shards(BASE, "bucket=1", 4, 10, start=1000)
    p1 = plan_compaction(BASE, target_mb=1)
    p2 = plan_compaction(BASE, target_mb=1)
    assert p1 == p2
    for b in p1:
        leaves = {os.path.dirname(m) for m in b["members"]}
        assert len(leaves) == 1  # bins never span partitions


@pytest.mark.usefixtures("ray_session")
def test_compact_preserves_rows_and_reduces_files():
    shutil.rmtree(BASE, ignore_errors=True)
    _write_shards(BASE, "bucket=0", 8, 25, start=0)
    _write_shards(BASE, "bucket=1", 5, 25, start=5000)
    before_ids = _all_ids(BASE)
    before_files = _n_files(BASE)

    manifest = compact_parquet(BASE, target_mb=64,
                               delete_source=True).to_pandas()
    assert (~manifest.skipped).all()
    assert manifest.n_rows.sum() == len(before_ids)
    assert _all_ids(BASE) == before_ids  # row multiset preserved
    assert _n_files(BASE) < before_files
    # hive layout preserved: outputs live inside their partition dirs
    for f in manifest.out_file:
        assert "bucket=" in f and os.path.basename(f).startswith(
            "compacted-")


@pytest.mark.usefixtures("ray_session")
def test_rerun_is_idempotent_and_resumable():
    shutil.rmtree(BASE, ignore_errors=True)
    _write_shards(BASE, "bucket=0", 6, 20)
    m1 = compact_parquet(BASE, target_mb=64,
                         delete_source=False).to_pandas()
    ids_after = _all_ids(BASE)
    # second run over the same (un-deleted) inputs: same plan, same
    # names, every bin detected as finished
    m2 = compact_parquet(BASE, target_mb=64,
                         delete_source=False).to_pandas()
    assert sorted(m1.out_file) == sorted(m2.out_file)
    assert m2.skipped.all()
    assert _all_ids(BASE) == ids_after
    # resume: drop one output, re-run recreates exactly it
    victim = m1.out_file.iloc[0]
    os.remove(victim)
    m3 = compact_parquet(BASE, target_mb=64,
                         delete_source=False).to_pandas()
    redone = m3[~m3.skipped]
    assert list(redone.out_file) == [victim]
    assert _all_ids(BASE) == ids_after


@pytest.mark.usefixtures("ray_session")
def test_big_files_left_alone():
    shutil.rmtree(BASE, ignore_errors=True)
    _write_shards(BASE, "bucket=0", 1, 50)  # single file: no bin
    plan = plan_compaction(BASE, target_mb=64)
    assert plan == []
    m = compact_parquet(BASE, target_mb=64).to_pandas()
    assert len(m) == 0
    assert _n_files(BASE) == 1
