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


class CompactFingerprintTable:
    """Cuckoo-style COMPACT seen filter: 32-bit tags in 8-slot buckets
    (6.7 B/entry at the 0.6 load ceiling, 13.3 right after a doubling —
    half the exact table's 13-27 B/entry at every phase), the SURVEY
    §1.3 compact-filter mode with an explicit false-positive budget.

    Layout: ``cap`` uint32 slots = ``cap/8`` buckets of 8. For a 64-bit
    fingerprint ``h``: bucket = low ``log2(nb)`` bits, stored tag = the
    NEXT 32 bits (quotienting — the bucket index itself carries
    ``log2(nb)`` discriminating bits, so total discrimination is
    ``32 + log2(nb)`` bits). A full bucket overflows into a small EXACT
    side table (full 64-bit fingerprints), so membership NEVER
    false-negatives; a false POSITIVE needs another URL agreeing on
    bucket AND tag — ~``slots_checked x 2^-tag_bits`` ≈ 1e-9 per query
    at the initial width. Resize doubles the bucket count by promoting
    the tag's low bit into the bucket index (the quotient-filter trick);
    each doubling costs one tag bit, so fp doubles per grow — size
    ``initial_capacity`` near the expected population and the budget
    holds. The false-drop consequence is documented in BASELINE.md: a
    crawl false-positive means one URL silently never fetched, which is
    why EXACT is the default and compact is the 10^10-URL opt-in.
    """

    __slots__ = ("_table", "_nb_bits", "_tag_bits", "_size", "_stash")

    _BUCKET = 8

    def __init__(self, initial_capacity: int = 1 << 14,
                 tag_bits: int = 32):
        cap = 1 << max(7, int(initial_capacity - 1).bit_length())
        self._nb_bits = int(cap // self._BUCKET - 1).bit_length()
        nb = 1 << self._nb_bits
        self._table = np.zeros(nb * self._BUCKET, dtype=np.uint32)
        self._tag_bits = min(32, int(tag_bits))
        self._size = 0
        self._stash = FingerprintTable(1 << 6)

    # -- key derivation ---------------------------------------------------
    # Tags are stored UNREMAPPED: a true tag of 0 (probability
    # 2^-tag_bits per entry) cannot share the table's 0-is-empty
    # sentinel, so such entries route to the exact stash instead.
    # (The earlier 0->1 remap silently corrupted the bucket-promotion
    # bit at resize — a zero-tag entry migrated to bucket b|2^nb while
    # lookups probed b: a reproducible false negative, the one thing
    # this structure promises never to do.)
    def _keys(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = np.asarray(hashes, dtype=np.uint64)
        b = (h & np.uint64((1 << self._nb_bits) - 1)).astype(np.int64)
        t = ((h >> np.uint64(self._nb_bits))
             & np.uint64((1 << self._tag_bits) - 1)).astype(np.uint32)
        return b, t

    def _synth(self, b: np.ndarray, t: np.ndarray) -> np.ndarray:
        """Canonical 64-bit encoding of the filter identity (bucket,
        tag) — the stash key. Keying the stash on (b, t) rather than
        the raw fingerprint keeps stash semantics identical to the
        table's (same fp class) and lets a resize transform stash
        entries alongside table entries without the original hash."""
        return (b.astype(np.uint64)
                | (t.astype(np.uint64) << np.uint64(self._nb_bits)))

    def _lookup_bt(self, b: np.ndarray, t: np.ndarray) -> np.ndarray:
        rows = self._table.reshape(-1, self._BUCKET)[b]
        # a zero tag never lives in the table (it would alias the empty
        # sentinel) — suppress the trivially-true empty-slot match and
        # let the stash answer for those queries
        out = (rows == t[:, None]).any(axis=1) & (t != 0)
        if len(self._stash):
            miss = ~out
            if miss.any():
                out[np.nonzero(miss)[0]] = self._stash.contains(
                    self._synth(b[miss], t[miss]))
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        if not len(h):
            return np.zeros(0, dtype=bool)
        return self._lookup_bt(*self._keys(h))

    def _insert_unique_absent(self, b: np.ndarray,
                              t: np.ndarray) -> None:
        """Insert (bucket, tag) pairs known unique and absent; bounded
        8-round probing within the bucket, leftovers -> exact stash
        keyed by the canonical (bucket, tag) encoding. Zero-tag pairs
        go straight to the stash (the table's 0 means empty)."""
        zero = t == 0
        if zero.any():
            self._stash.add(self._synth(b[zero], t[zero]))
            b, t = b[~zero], t[~zero]
        table = self._table
        slots = b * self._BUCKET
        pending = np.arange(len(b))
        probe = 0
        while len(pending) and probe < self._BUCKET:
            s = slots[pending] + probe
            got = table[s]
            is_empty = got == 0
            winners_mask = np.zeros(len(pending), dtype=bool)
            if is_empty.any():
                idx = np.nonzero(is_empty)[0]
                _, first = np.unique(s[idx], return_index=True)
                winners = idx[first]
                table[s[winners]] = t[pending[winners]]
                winners_mask[winners] = True
            pending = pending[~winners_mask]
            probe += 1
        if len(pending):
            self._stash.add(self._synth(b[pending], t[pending]))

    def test_and_set(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        if not len(h):
            return np.zeros(0, dtype=bool)
        b, t = self._keys(h)
        # in-batch dedup on the filter identity; _synth is injective at
        # any geometry (b occupies the low nb_bits, t the next tag_bits)
        _, first_idx = np.unique(self._synth(b, t), return_index=True)
        present = self._lookup_bt(b[first_idx], t[first_idx])
        new = ~present
        if new.any():
            self._maybe_grow(int(new.sum()))
            b, t = self._keys(h)  # re-derive under (possibly) new geometry
            self._insert_unique_absent(b[first_idx][new],
                                       t[first_idx][new])
            self._size += int(new.sum())
        out = np.zeros(len(h), dtype=bool)
        out[first_idx[new]] = True
        return out

    def add(self, hashes: np.ndarray) -> int:
        before = self._size
        self.test_and_set(hashes)
        return self._size - before

    def _maybe_grow(self, incoming: int) -> None:
        # same 0.6 load ceiling as the exact table; each doubling
        # promotes one tag bit into the bucket index (fp x2 per grow)
        while (self._size + incoming) * 5 > self._table.size * 3:
            if self._tag_bits <= 16:
                raise RuntimeError(
                    "CompactFingerprintTable: growth would drop tag "
                    "width below 16 bits (fp budget exhausted) — size "
                    "initial_capacity for the expected population")
            old = self._table.reshape(-1, self._BUCKET)
            nb = 1 << self._nb_bits
            occ_b, occ_j = np.nonzero(old != 0)
            tags = old[occ_b, occ_j].astype(np.uint64)
            new_b = occ_b.astype(np.int64) | (
                (tags & np.uint64(1)).astype(np.int64) << self._nb_bits)
            new_t = (tags >> np.uint64(1)).astype(np.uint32)
            # stash entries transform the same way: decode the TRUE
            # (b, t) from the canonical encoding under the OLD geometry
            # (tags are stored unremapped, so the decoded low bit is the
            # genuine bucket-promotion bit); entries whose new tag is 0
            # re-stash via _insert_unique_absent's zero-tag route
            stash_syn = self._stash.dump()
            sb = (stash_syn & np.uint64(nb - 1)).astype(np.int64)
            st = (stash_syn >> np.uint64(self._nb_bits)).astype(np.uint64)
            s_new_b = sb | ((st & np.uint64(1)).astype(np.int64)
                            << self._nb_bits)
            s_new_t = (st >> np.uint64(1)).astype(np.uint32)
            self._nb_bits += 1
            self._tag_bits -= 1
            self._table = np.zeros(2 * nb * self._BUCKET, dtype=np.uint32)
            self._stash = FingerprintTable(1 << 6)
            all_b = np.concatenate([new_b, s_new_b])
            all_t = np.concatenate([new_t, s_new_t])
            # the 0-tag remap can merge transformed entries (old tags 1
            # and 3 at one bucket both land on tag 1): dedup before the
            # unique-and-absent insert
            syn = self._synth(all_b, all_t)
            _, uniq_idx = np.unique(syn, return_index=True)
            all_b, all_t = all_b[uniq_idx], all_t[uniq_idx]
            order = np.argsort(all_b, kind="stable")
            self._insert_unique_absent(all_b[order], all_t[order])

    def __len__(self) -> int:
        return self._size

    def nbytes(self) -> int:
        return self._table.nbytes + self._stash.nbytes()

    def state_arrays(self) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                    int, int]:
        """(slot_idx, tag, stash_fingerprints, nb_bits, tag_bits) —
        checkpoint payload; zeros omitted."""
        idx = np.nonzero(self._table)[0].astype(np.uint64)
        return (idx, self._table[idx.astype(np.int64)].astype(np.uint64),
                self._stash.dump(), self._nb_bits, self._tag_bits)

    @classmethod
    def from_state(cls, idx: np.ndarray, tags: np.ndarray,
                   stash: np.ndarray, nb_bits: int, tag_bits: int,
                   size: int) -> "CompactFingerprintTable":
        t = cls.__new__(cls)
        t._nb_bits = int(nb_bits)
        t._tag_bits = int(tag_bits)
        t._table = np.zeros((1 << t._nb_bits) * cls._BUCKET,
                            dtype=np.uint32)
        t._table[idx.astype(np.int64)] = tags.astype(np.uint32)
        t._stash = FingerprintTable(max(16, len(stash) * 2))
        if len(stash):
            t._stash.add(stash)
        t._size = int(size)
        return t


@ray.remote(num_cpus=0)
class SeenShard:
    """One hash-range shard of the URL-seen set."""

    def __init__(self, mode: str = "exact",
                 initial_capacity: int = 1 << 14) -> None:
        self._mode = mode
        self._t = (CompactFingerprintTable(initial_capacity)
                   if mode == "compact"
                   else FingerprintTable(initial_capacity))

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
        """Exact mode: the stored 64-bit fingerprints. Compact mode:
        the canonical (bucket, tag) encodings — the filter's whole
        identity (original fingerprints are not recoverable by
        design)."""
        if self._mode == "compact":
            idx, tags, stash, _, _ = self._t.state_arrays()
            b = (idx // CompactFingerprintTable._BUCKET).astype(np.int64)
            syn = self._t._synth(b, tags.astype(np.uint32))
            return np.concatenate([syn, stash])
        return self._t.dump()

    def checkpoint(self, path: str) -> int:
        if self._mode == "compact":
            idx, tags, stash, nb_bits, tag_bits = self._t.state_arrays()
            meta = np.array([3, nb_bits, tag_bits, len(self._t)],
                            dtype=np.uint64)
            kind = np.concatenate([
                np.zeros(len(idx), np.int8),
                np.ones(len(stash), np.int8),
                np.full(1, 2, np.int8),
            ])
            a = np.concatenate([idx, stash, meta[:1]])
            b = np.concatenate([tags, np.zeros(len(stash), np.uint64),
                                meta[1:2] | (meta[2:3] << np.uint64(8))
                                | (meta[3:4] << np.uint64(16))])
            pq.write_table(pa.table({
                "kind": pa.array(kind, pa.int8()),
                "a": pa.array(a, pa.uint64()),
                "b": pa.array(b, pa.uint64()),
            }), path)
            return int(len(self._t))
        arr = self.dump()
        pq.write_table(pa.table({"fingerprint": pa.array(arr, pa.uint64())}), path)
        return len(arr)

    def restore(self, path: str) -> int:
        t = pq.read_table(path)
        if "kind" in t.column_names:  # compact checkpoint
            kind = t["kind"].to_numpy()
            a = t["a"].to_numpy()
            b = t["b"].to_numpy()
            meta_b = int(b[kind == 2][0])
            nb_bits = meta_b & 0xFF
            tag_bits = (meta_b >> 8) & 0xFF
            size = meta_b >> 16
            self._mode = "compact"
            self._t = CompactFingerprintTable.from_state(
                a[kind == 0], b[kind == 0], a[kind == 1],
                nb_bits, tag_bits, size)
            return len(self._t)
        arr = t["fingerprint"].to_numpy()
        self._mode = "exact"
        self._t = FingerprintTable(initial_capacity=max(16, len(arr) * 2))
        self._t.add(arr)
        return len(self._t)


class SeenSet:
    """Driver-side facade over the shard actors.

    ``mode="compact"`` swaps the per-shard exact table for the
    cuckoo-style 32-bit-tag filter (~6.7 B/entry, fp ~1e-9/query at
    initial width) — the SURVEY §1.3 10^10-URL opt-in; exact remains
    the default because a crawl false-positive silently drops a URL
    forever (see BASELINE.md "Seen-set memory")."""

    def __init__(self, num_shards: int = 8, mode: str = "exact",
                 initial_capacity: int = 1 << 14):
        self.num_shards = num_shards
        self.mode = mode
        self.shards = [SeenShard.remote(mode, initial_capacity)
                       for _ in range(num_shards)]
        # async-add machinery (driver-facade only): add() fires shard
        # RPCs without blocking — the scheduling path stops paying the
        # add round-trip, and round 0 of a fresh crawl stops paying the
        # shard-actor STARTUP wait (contains() on a provably-empty set
        # short-circuits, so seen-shard startup overlaps fetch-pool
        # startup instead of serializing before it). Every read fences
        # first, so read-your-writes ordering is unchanged. The
        # distributed rounds write through raw shard handles and bypass
        # this facade — the crawl loop calls mark_external_writes()
        # before running one, which permanently disables the
        # empty-set fast path.
        self._pending: list = []
        self._dirty = False

    def fence(self) -> None:
        """Block until every in-flight async add has landed. Callers
        that are about to read the shard actors OUTSIDE this facade
        (the distributed rounds' seen_contains_filter tasks) must fence
        first — worker-submitted actor calls have no ordering guarantee
        against the driver's pending adds."""
        if self._pending:
            ray.get(self._pending)
            self._pending.clear()

    _fence = fence

    def mark_external_writes(self) -> None:
        """Shard state may change outside this facade (distributed
        rounds' seen_add_batch tasks): the empty-set contains()
        fast path is no longer sound."""
        self._dirty = True

    def _split(self, hashes: np.ndarray):
        shard_ids = (hashes % self.num_shards).astype(np.int64)
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                yield s, idx

    def contains(self, urls) -> np.ndarray:
        hashes = hash_strings(urls)
        out = np.zeros(len(hashes), dtype=bool)
        if not self._dirty:
            # nothing has ever been added through any channel: the
            # answer is all-False without touching the shard actors
            # (round 0 of a fresh crawl — skips the startup wait)
            return out
        self._fence()
        parts = list(self._split(hashes))
        refs = [self.shards[s].contains.remote(hashes[idx]) for s, idx in parts]
        for (s, idx), mask in zip(parts, ray.get(refs)):
            out[idx] = mask
        return out

    def add(self, urls) -> None:
        """Fire-and-forget registration; any subsequent read through
        this facade fences on the in-flight RPCs first."""
        hashes = hash_strings(urls)
        self._pending.extend(
            self.shards[s].add.remote(hashes[idx])
            for s, idx in self._split(hashes))
        self._dirty = True

    def size(self) -> int:
        self._fence()
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def dump_sorted(self) -> np.ndarray:
        self._fence()
        arrs = ray.get([s.dump.remote() for s in self.shards])
        return np.sort(np.concatenate(arrs)) if arrs else np.array([], np.uint64)

    def checkpoint(self, directory: str) -> None:
        import shutil

        self._fence()
        shutil.rmtree(directory, ignore_errors=True)  # overwrite cleanly
        os.makedirs(directory, exist_ok=True)
        ray.get([
            s.checkpoint.remote(os.path.join(directory, f"shard={i}.parquet"))
            for i, s in enumerate(self.shards)
        ])

    def restore(self, directory: str) -> None:
        self._fence()
        ray.get([
            s.restore.remote(os.path.join(directory, f"shard={i}.parquet"))
            for i, s in enumerate(self.shards)
        ])
        self._dirty = True


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
