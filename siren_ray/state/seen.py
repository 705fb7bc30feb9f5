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

Storage is a numpy open-addressing table (uint64 slots, linear probing,
load factor ≤0.6 → **13–27 bytes/entry** at steady state vs ~70 B/entry
for a Python ``set[int]``), with every probe round vectorized over the whole
batch — no per-hash Python dispatch. Slot 0 is the empty sentinel; a true
fingerprint of 0 is remapped to 1 (probability 2^-64 per URL — the same
negligible class as a fingerprint collision).

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


class FingerprintTable:
    """Vectorized open-addressing set of uint64 fingerprints.

    Linear probing over a power-of-two uint64 array; 0 marks an empty
    slot (fingerprint 0 is remapped to 1 on the way in). All operations
    are vectorized per probe round — expected O(1) rounds at load ≤0.6.
    Plain object (no Ray) so it is unit-testable and reusable.
    """

    __slots__ = ("_table", "_mask", "_size")

    def __init__(self, initial_capacity: int = 1 << 14):
        cap = 1 << max(4, int(initial_capacity - 1).bit_length())
        self._table = np.zeros(cap, dtype=np.uint64)
        self._mask = np.uint64(cap - 1)
        self._size = 0

    @staticmethod
    def _norm(hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        if (h == 0).any():
            h = h.copy()
            h[h == 0] = 1
        return h

    def _lookup(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership for normalized, not-necessarily-unique h."""
        out = np.zeros(len(h), dtype=bool)
        if not len(h):
            return out
        table, mask = self._table, self._mask
        active = np.arange(len(h))
        slots = h & mask
        vals = h
        while len(active):
            got = table[slots]
            found = got == vals
            out[active[found]] = True
            cont = ~(found | (got == 0))
            active = active[cont]
            slots = (slots[cont] + np.uint64(1)) & mask
            vals = vals[cont]
        return out

    def _insert_unique_absent(self, h: np.ndarray) -> None:
        """Insert hashes known to be unique and absent (no growth check)."""
        table, mask = self._table, self._mask
        pending = h
        slots = pending & mask
        while len(pending):
            got = table[slots]
            is_empty = got == 0
            winners_mask = np.zeros(len(pending), dtype=bool)
            if is_empty.any():
                idx = np.nonzero(is_empty)[0]
                # first pending per contested empty slot claims it
                _, first = np.unique(slots[idx], return_index=True)
                winners = idx[first]
                table[slots[winners]] = pending[winners]
                winners_mask[winners] = True
            remain = ~winners_mask
            pending = pending[remain]
            slots = slots[remain]
            occupied = got[remain] != 0
            # occupied slots advance now; contest losers re-read (now
            # occupied) and advance next round — guarantees progress.
            slots[occupied] = (slots[occupied] + np.uint64(1)) & mask

    def _maybe_grow(self, incoming: int) -> None:
        # grow past load 0.6: expected linear-probe cost ~1.75 reads,
        # steady-state footprint 13–27 B/entry (vs ~70 B for set[int])
        while (self._size + incoming) * 5 > len(self._table) * 3:
            old = self._table[self._table != 0]
            cap = len(self._table) * 2
            self._table = np.zeros(cap, dtype=np.uint64)
            self._mask = np.uint64(cap - 1)
            self._insert_unique_absent(old)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self._lookup(self._norm(hashes))

    def test_and_set(self, hashes: np.ndarray) -> np.ndarray:
        """True where the hash was unseen; first duplicate in-call wins."""
        h = self._norm(hashes)
        uniq, first_idx = np.unique(h, return_index=True)
        present = self._lookup(uniq)
        new = uniq[~present]
        if len(new):
            self._maybe_grow(len(new))
            self._insert_unique_absent(new)
            self._size += len(new)
        out = np.zeros(len(h), dtype=bool)
        out[first_idx[~present]] = True
        return out

    def add(self, hashes: np.ndarray) -> int:
        h = self._norm(hashes)
        uniq = np.unique(h)
        new = uniq[~self._lookup(uniq)]
        if len(new):
            self._maybe_grow(len(new))
            self._insert_unique_absent(new)
            self._size += len(new)
        return len(new)

    def __len__(self) -> int:
        return self._size

    def dump(self) -> np.ndarray:
        return self._table[self._table != 0]

    def nbytes(self) -> int:
        return self._table.nbytes


@ray.remote(num_cpus=0)
class SeenShard:
    """One hash-range shard of the URL-seen set."""

    def __init__(self) -> None:
        self._t = FingerprintTable()

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self._t.contains(hashes)

    def add(self, hashes: np.ndarray) -> int:
        """Add fingerprints; returns number newly added."""
        return self._t.add(hashes)

    def test_and_set(self, hashes: np.ndarray) -> np.ndarray:
        """Atomic per-shard test-and-set: True where the hash was unseen.

        Within one call, duplicate hashes: first occurrence wins.
        """
        return self._t.test_and_set(hashes)

    def size(self) -> int:
        return len(self._t)

    def dump(self) -> np.ndarray:
        return self._t.dump()

    def checkpoint(self, path: str) -> int:
        arr = self.dump()
        pq.write_table(pa.table({"fingerprint": pa.array(arr, pa.uint64())}), path)
        return len(arr)

    def restore(self, path: str) -> int:
        t = pq.read_table(path)
        arr = t["fingerprint"].to_numpy()
        self._t = FingerprintTable(initial_capacity=max(16, len(arr) * 2))
        self._t.add(arr)
        return len(self._t)


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
