"""Sharded URL-seen set: actor-pool test-and-set with Parquet checkpoints.

North-rule component: "sharded cuckoo-filter URL-seen set ... in actor
pools". Each shard is a Ray actor owning a disjoint hash range
(``hash64(url) % num_shards``), so membership tests and adds are
shard-local and the resulting seen SET is independent of execution
parallelism (SURVEY.md §7 "Seen-filter atomicity across parallelism
levels"). Reference semantics being reproduced: pre-fetch dedup sets
(``done: set[str]``, /root/reference/siren/scrapers/epaper/ht.py:233-247)
and exact URL dedup (online/mirror.py:33-39,106-108).

Fingerprints are 64-bit SipHash values (util.hash_strings); like a cuckoo
filter this stores fingerprints rather than keys (collision probability
2^-64 per pair — negligible at 10^10 URLs the design point calls for,
where shards would also subdivide by hash range across nodes).

Checkpoint/restore: each shard dumps its fingerprint array to one Parquet
file (``seen/shard={i}.parquet``); resume rebuilds shards from those files.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..util import hash_strings


@ray.remote(num_cpus=0)
class SeenShard:
    """One hash-range shard of the URL-seen set."""

    def __init__(self) -> None:
        self._set: set[int] = set()

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        s = self._set
        return np.fromiter((int(h) in s for h in hashes), dtype=bool,
                           count=len(hashes))

    def add(self, hashes: np.ndarray) -> int:
        """Add fingerprints; returns number newly added."""
        before = len(self._set)
        self._set.update(int(h) for h in hashes)
        return len(self._set) - before

    def test_and_set(self, hashes: np.ndarray) -> np.ndarray:
        """Atomic per-shard test-and-set: True where the hash was unseen.

        Within one call, duplicate hashes: first occurrence wins.
        """
        s = self._set
        out = np.empty(len(hashes), dtype=bool)
        for i, h in enumerate(hashes):
            h = int(h)
            if h in s:
                out[i] = False
            else:
                s.add(h)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self._set)

    def dump(self) -> np.ndarray:
        return np.fromiter(self._set, dtype=np.uint64, count=len(self._set))

    def checkpoint(self, path: str) -> int:
        arr = self.dump()
        pq.write_table(pa.table({"fingerprint": pa.array(arr, pa.uint64())}), path)
        return len(arr)

    def restore(self, path: str) -> int:
        t = pq.read_table(path)
        self._set = set(t["fingerprint"].to_numpy().tolist())
        return len(self._set)


class SeenSet:
    """Driver-side facade over the shard actors."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [SeenShard.remote() for _ in range(num_shards)]

    def _split(self, hashes: np.ndarray):
        shard_ids = (hashes % self.num_shards).astype(np.int64)
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                yield s, idx

    def contains(self, urls) -> np.ndarray:
        hashes = hash_strings(urls)
        out = np.zeros(len(hashes), dtype=bool)
        parts = list(self._split(hashes))
        refs = [self.shards[s].contains.remote(hashes[idx]) for s, idx in parts]
        for (s, idx), mask in zip(parts, ray.get(refs)):
            out[idx] = mask
        return out

    def add(self, urls) -> int:
        hashes = hash_strings(urls)
        refs = [self.shards[s].add.remote(hashes[idx])
                for s, idx in self._split(hashes)]
        return sum(ray.get(refs))

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def dump_sorted(self) -> np.ndarray:
        arrs = ray.get([s.dump.remote() for s in self.shards])
        return np.sort(np.concatenate(arrs)) if arrs else np.array([], np.uint64)

    def checkpoint(self, directory: str) -> None:
        import shutil

        shutil.rmtree(directory, ignore_errors=True)  # overwrite cleanly
        os.makedirs(directory, exist_ok=True)
        ray.get([
            s.checkpoint.remote(os.path.join(directory, f"shard={i}.parquet"))
            for i, s in enumerate(self.shards)
        ])

    def restore(self, directory: str) -> None:
        ray.get([
            s.restore.remote(os.path.join(directory, f"shard={i}.parquet"))
            for i, s in enumerate(self.shards)
        ])


def seen_contains_filter(batch: pa.Table, *, shards: list, num_shards: int,
                         url_col: str = "url") -> pa.Table:
    """Stateless map_batches fn: drop rows whose url is already seen.

    Shard actor handles pickle into plain tasks — no per-execution actor
    pool spin-up. Used inside a round AFTER within-round dedup, so
    results don't depend on batch order.
    """
    if batch.num_rows == 0:
        return batch
    urls = batch[url_col].to_pylist()
    hashes = hash_strings(urls)
    shard_ids = (hashes % num_shards).astype(np.int64)
    seen = np.zeros(len(urls), dtype=bool)
    parts = []
    refs = []
    for s in range(num_shards):
        idx = np.nonzero(shard_ids == s)[0]
        if len(idx):
            parts.append(idx)
            refs.append(shards[s].contains.remote(hashes[idx]))
    for idx, mask in zip(parts, ray.get(refs) if refs else []):
        seen[idx] = mask
    return batch.filter(pa.array(~seen))


def seen_add_batch(batch: pa.Table, *, shards: list, num_shards: int,
                   url_col: str = "url") -> pa.Table:
    """Stateless map_batches passthrough registering urls in the shards."""
    if batch.num_rows:
        hashes = hash_strings(batch[url_col].to_pylist())
        shard_ids = (hashes % num_shards).astype(np.int64)
        refs = []
        for s in range(num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                refs.append(shards[s].add.remote(hashes[idx]))
        ray.get(refs)
    return batch


class SeenContainsFilter:
    """Class form of :func:`seen_contains_filter` (actor-pool variant)."""

    def __init__(self, shards: list, num_shards: int, url_col: str = "url"):
        self.shards = shards
        self.num_shards = num_shards
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return seen_contains_filter(
            batch, shards=self.shards, num_shards=self.num_shards,
            url_col=self.url_col,
        )
