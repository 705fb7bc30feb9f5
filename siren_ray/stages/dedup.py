"""Deduplication operators for web-scale corpora.

Reference semantics reproduced (SURVEY.md §2.5): exact URL dedup D1
(online/mirror.py:33-39,106-108), pre-fetch ID dedup D2
(epaper/ht.py:233-247 — handled by the frontier seen-filter), and
first-wins headline dedup D3 (epaper/ht.py:261-268) with the arrival-order
nondeterminism replaced by a deterministic (order_col ASC) tie-break.

Scale additions (task brief): MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup. All are expressed as
map_batches (per-row signatures, vectorized numpy) + groupby on compact
keys (bands/buckets) — the only all-to-all exchanges move signatures,
never full documents, and exact-dup grouping pre-aggregates by hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.textstats import shingles
from ..util import hash_strings

# --- exact dedup (D1/D3) --------------------------------------------------


_DEDUP_PARTITIONS = 64


def dedup_exact(ds, key_col: str, order_col: str,
                num_partitions: int = _DEDUP_PARTITIONS):
    """First-wins exact dedup: one row per key, winner = min(order_col).

    Hash-partition by a COARSE bucket of the key (``hash(key) %
    num_partitions``), then dedup each partition vectorized
    (``sort_values`` + ``drop_duplicates(keep="first")``) — the Ray Data
    expression of mirror.py:106-108 / ht.py:261-268 with a total order
    replacing arrival order. One pandas invocation per partition, never
    per key: at frontier scale a per-key ``map_groups`` (group size ~1-2)
    is pathological scheduler load, while this shape moves the same bytes
    through the same shuffle and does the per-key work inside numpy.
    """

    def _bucket(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if pa.types.is_integer(col.type):
            pk = np.asarray(col, dtype=np.int64) % num_partitions
        else:
            # string keys: to_pylist already yields str — no per-row str()
            keys = col.to_pylist()
            if keys and not isinstance(keys[0], str):
                keys = [str(x) for x in keys]
            pk = (hash_strings(keys) % num_partitions).astype(np.int64)
        return t.append_column("_pk", pa.array(pk, pa.int64()))

    sort_cols = [key_col] if order_col == key_col else [key_col, order_col]

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort")
        df = df.drop_duplicates(key_col, keep="first")
        return df.drop(columns=["_pk"]).reset_index(drop=True)

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_dedup, batch_format="pandas")
    )


# --- MinHash --------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    # a < 2^31 and h reduced to 32 bits => a*h + b < 2^63 + 2^61 fits
    # uint64 EXACTLY (no silent wrap mod 2^64), so the family really is
    # (a*h + b) mod p as documented — at one multiply per cell, unlike a
    # 61-bit split-multiply modmul (~10 ops/cell, measured 1.7x actor
    # busy-time on the crawl's inline-enrichment path)
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_M32 = np.uint64(0xFFFFFFFF)
_P61 = np.uint64(_MERSENNE)


_POLY = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier: bijective mod 2^64
_POLY2 = np.uint64(0xC2B2AE3D27D4EB4F)  # independent odd multiplier (2nd key half)


def word_hashes(text: str, max_words: int | None = None) -> np.ndarray:
    """Per-word 64-bit hashes of the (prefix-capped) whitespace tokens —
    the shared tokenize+hash pass that simhash and MinHash both consume
    (one split + one hash per doc instead of one per kernel). Prefix
    capping commutes with sharing: every consumer takes a prefix slice."""
    words = text.split()
    if max_words is not None and len(words) > max_words:
        words = words[:max_words]
    if not words:
        return np.empty(0, dtype=np.uint64)
    return hash_strings(words).astype(np.uint64)


def word_hashes_batch(texts, max_words: int | None = None) -> list:
    """Batch variant of :func:`word_hashes`: ONE ``hash_strings`` call
    over every doc's (prefix-capped) tokens, sliced back per doc. SipHash
    is per-string, so each slice is bit-identical to the per-doc path;
    what the batching buys is ``categorize=True``: the whole batch's
    token stream factorizes once and each DISTINCT word hashes once —
    word streams are Zipfian, so this is ~2-4x on the SipHash pass for
    SHORT docs (web pages average ~56 words in the test corpus). The
    advantage inverts past ~128 words/doc (hash-call setup amortizes
    away while the batch-wide factorize table blows the cache —
    A/B-measured at 30/80/200/450 words), so long-doc batches fall back
    to the per-doc path. Both paths are bit-identical."""
    word_lists = []
    lengths = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        words = (t or "").split()
        if max_words is not None and len(words) > max_words:
            words = words[:max_words]
        word_lists.append(words)
        lengths[i] = len(words)
    total = int(lengths.sum()) if len(texts) else 0
    if total == 0:
        empty = np.empty(0, dtype=np.uint64)
        return [empty] * len(texts)
    if total > 128 * len(texts):  # long docs: one-call path loses
        return [hash_strings(w).astype(np.uint64) if w
                else np.empty(0, dtype=np.uint64) for w in word_lists]
    flat: list = []
    for words in word_lists:
        flat.extend(words)
    hashed = hash_strings(flat, categorize=True).astype(np.uint64)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return [hashed[offsets[i]:offsets[i + 1]] for i in range(len(texts))]


def shingle_hashes(text: str, k: int = 5,
                   max_shingles: int | None = None,
                   wh: np.ndarray | None = None) -> np.ndarray:
    """Word-k-gram hashes WITHOUT materializing shingle strings: hash
    each word once, then combine every k-window of word hashes with a
    position-weighted polynomial in uint64 (wrap-around is fine for the
    item hash — the exact (a*h+b) mod p family applies on top). The
    " ".join shingle construction was the dominant minhash cost
    (~320 us/doc of the 492 us/doc total on ~5.6 kB docs). Windowing
    mirrors :func:`siren_ray.functions.textstats.shingles`: fewer than k
    words hash as one all-words shingle; ``max_shingles`` keeps a
    deterministic prefix. ``wh`` supplies precomputed word hashes (must
    cover at least the ``max_shingles + k - 1`` prefix)."""
    cap = None if max_shingles is None else max_shingles + k - 1
    if wh is None:
        wh = word_hashes(text, cap)
    elif cap is not None and len(wh) > cap:
        wh = wh[:cap]
    if not len(wh):
        return np.empty(0, dtype=np.uint64)
    kk = min(k, len(wh))
    n_sh = len(wh) - kk + 1
    if max_shingles is not None:
        n_sh = min(n_sh, max_shingles)
    # array cumprod wraps mod 2^64 silently (intended; scalar ops warn)
    weights = np.cumprod(np.full(kk, _POLY, dtype=np.uint64))
    out = np.zeros(n_sh, dtype=np.uint64)
    for j in range(kk):
        out += wh[j:j + n_sh] * weights[j]
    return out


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray,
                      k: int = 5, max_shingles: int | None = None,
                      wh: np.ndarray | None = None) -> np.ndarray:
    sh = shingle_hashes(text, k, max_shingles, wh=wh)
    if not len(sh):
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    h = sh >> np.uint64(32)  # top 32 bits
    # exact (a*h + b) mod p: a < 2^31 and h < 2^32 keep the product under
    # 2^63, so uint64 arithmetic never wraps before the reduction
    # (tests/test_ops assert equality with Python big-int arithmetic)
    vals = (a[:, None] * h[None, :] + b[:, None]) % _P61
    return vals.min(axis=1)


class MinHasher:
    """Actor-pool stage: permutation params built once per actor (T2-style
    stateful init), signatures + LSH band keys per batch."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 5,
                 text_col: str = "text", max_shingles: int | None = None):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        self.text_col = text_col
        self.max_shingles = max_shingles

    def __call__(self, batch: pa.Table,
                 wh_list: list | None = None) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if not texts:
            empty = pa.array([], pa.list_(pa.int64()))
            return batch.append_column(
                "minhash_bands", empty
            ).append_column("minhash_bands2", empty)
        if wh_list is None:
            cap = (None if self.max_shingles is None
                   else self.max_shingles + self.k - 1)
            wh_list = word_hashes_batch(texts, cap)
        sigs = np.stack(
            [minhash_signature(t or "", self.a, self.b, self.k,
                               self.max_shingles, wh=w)
             for t, w in zip(texts, wh_list)]
        )
        # 128-bit band keys (two independent int64 halves), fully
        # vectorized: each band's signature segment combines via two
        # position-weighted polynomials in uint64. Grouping is on BOTH
        # halves, so a spurious candidate pair needs a simultaneous
        # collision in two independent 64-bit hashes (~2^-128 per key
        # pair) — below corpus scale even at 10^10 docs x 16 bands,
        # which matters because remove_near_duplicates deletes LSH
        # candidates without a jaccard re-verification. Int keys keep
        # the LSH shuffle free of string building.
        segs = sigs.reshape(len(texts), self.bands, self.rows_per_band)
        cols = {}
        for name, poly, salt in (
            ("minhash_bands", _POLY, np.uint64(0xD1B54A32D192ED03)),
            ("minhash_bands2", _POLY2, np.uint64(0x8CB92BA72F3D8DD7)),
        ):
            weights = np.cumprod(
                np.full(self.rows_per_band, poly, dtype=np.uint64))
            keys = (segs * weights[None, None, :]).sum(axis=2, dtype=np.uint64)
            keys += (np.arange(self.bands, dtype=np.uint64)[None, :]
                     + np.uint64(1)) * salt
            flat = pa.array(keys.reshape(-1).view(np.int64), pa.int64())
            cols[name] = pa.FixedSizeListArray.from_arrays(
                flat, self.bands
            ).cast(pa.list_(pa.int64()))
        return batch.append_column(
            "minhash_bands", cols["minhash_bands"]
        ).append_column("minhash_bands2", cols["minhash_bands2"])


_MAX_BUCKET = 128  # per-band-bucket pair-generation cap (O(n²) guard)


_MINHASHER_CACHE: dict = {}


def _cached_minhasher(num_perm: int, bands: int, k: int,
                      text_col: str) -> "MinHasher":
    """Per-worker-process MinHasher cache (init-once semantics without
    an actor pool)."""
    key = (num_perm, bands, k, text_col)
    mh = _MINHASHER_CACHE.get(key)
    if mh is None:
        mh = _MINHASHER_CACHE[key] = MinHasher(
            num_perm=num_perm, bands=bands, k=k, text_col=text_col)
    return mh


def minhash_duplicate_pairs(ds, id_col: str, *, num_perm: int = 64,
                            bands: int = 16, k: int = 5,
                            text_col: str = "text",
                            max_bucket: int = _MAX_BUCKET):
    """MinHash+LSH candidate pairs: shingle -> minhash -> band -> bucket
    groupby. Returns a Dataset of (id_a, id_b) candidate pairs
    (id_a < id_b), deduplicated.

    Shuffle moves only (id, band_key) pairs — signatures, never text.
    Scale guards: documents with no WORDS are dropped BEFORE hashing
    (zero-shingle texts all share the sentinel signature, so one
    poisoned bucket would otherwise dominate the job; any text with
    >=1 word shingles — shingle_hashes folds <k words into one
    all-words shingle, so short duplicates still participate), with the
    dropped count logged; and pair generation within a band bucket is
    capped at ``max_bucket`` members (smallest ids win, deterministic);
    overflow is logged per the no-silent-caps rule.
    """

    def _droppable(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = pc.coalesce(t[text_col], pa.scalar(""))
        keep = pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(txt)),
                          pa.scalar(0))
        out = t.filter(keep)
        dropped = t.num_rows - out.num_rows
        if dropped:
            import logging

            logging.getLogger(__name__).info(
                "minhash: dropped %d wordless docs before hashing", dropped)
        return out

    # TASK pool with per-worker cached state, not an actor pool: the
    # MinHasher's state is two small RNG arrays, so paying actor-process
    # spin-up (and, on this host, fresh-process first-touch faults) for
    # it is pure overhead — cached construction in long-lived Ray
    # workers gives the same init-once semantics at task-pool width.
    sigs = ds.map_batches(_droppable, batch_format="pyarrow").map_batches(
        lambda t: _cached_minhasher(num_perm, bands, k, text_col)(t),
        batch_format="pyarrow",
    )

    def _explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bands_col = batch["minhash_bands"].combine_chunks()
        bands2_col = batch["minhash_bands2"].combine_chunks()
        lengths = pc.list_value_length(bands_col).to_numpy(
            zero_copy_only=False)
        idx = np.repeat(np.arange(batch.num_rows), lengths)
        flat = bands_col.flatten()
        keys = np.asarray(flat, dtype=np.int64)
        t = pa.table({id_col: batch[id_col].take(pa.array(idx)),
                      "band_key": flat,
                      "band_key2": bands2_col.flatten()})
        pk = keys % _DEDUP_PARTITIONS  # numpy %: non-negative result
        return t.append_column("_pk", pa.array(pk, pa.int64()))

    exploded = sigs.map_batches(_explode, batch_format="pyarrow")

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        """One invocation per hash PARTITION of band keys (not per bucket):
        single-member buckets are eliminated vectorized; the python loop
        only visits buckets that actually collide. Buckets are the FULL
        128-bit (band_key, band_key2) pair — see MinHasher."""
        df = df.drop_duplicates([id_col, "band_key", "band_key2"])
        df = df[df.duplicated(["band_key", "band_key2"], keep=False)]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for key, grp in df.groupby(["band_key", "band_key2"], sort=False):
            vals = np.sort(grp[id_col].to_numpy())
            if len(vals) > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "LSH bucket %s has %d members; capping pair generation "
                    "at %d (smallest ids kept)", key, len(vals), max_bucket,
                )
                vals = vals[:max_bucket]
            ia, ib = np.triu_indices(len(vals), k=1)
            out_a.append(vals[ia])
            out_b.append(vals[ib])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    pairs = exploded.groupby("_pk").map_groups(_pairs, batch_format="pandas")
    return dedup_pairs(pairs)


def dedup_pairs(pairs_ds, num_partitions: int = _DEDUP_PARTITIONS):
    """Exact (id_a, id_b) pair dedup: hash-partition on id_a, one
    vectorized ``drop_duplicates`` per partition. No string pair keys
    (a hashed key risks silent pair loss at 1e10-pair scale; two-column
    exact dedup costs the same shuffle). Extra columns (e.g. cosine)
    ride along; the kept row per pair is deterministic (full sort)."""

    def _bucket(t: pa.Table) -> pa.Table:
        a = np.asarray(t["id_a"], dtype=np.int64)
        return t.append_column(
            "_pk", pa.array(a % num_partitions, pa.int64())
        )

    def _dd(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(list(df.columns), kind="mergesort")
        df = df.drop_duplicates(["id_a", "id_b"], keep="first")
        return df.drop(columns=["_pk"]).reset_index(drop=True)

    return (
        pairs_ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_dd, batch_format="pandas")
    )


def neardup_losers(pairs_df, id_a: str = "id_a", id_b: str = "id_b") -> set:
    """Duplicate-cluster resolution: union-find over candidate pairs,
    keep the minimum id per cluster, return the losers.

    Pairs are tiny relative to the corpus (LSH output), so clustering is
    a driver-side reduction; the loser set broadcasts into a filter.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs_df[id_a], pairs_df[id_b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    losers = {x for x in parent if find(x) != x}
    return losers


def connected_components(edges_ds, nodes_ds, *, num_partitions: int = 64,
                         max_iters: int = 50):
    """Distributed connected components: synchronous min-label
    propagation over hash-co-partitioned state held in the object store
    (no driver-side graph — the 100 TB path for duplicate-cluster
    resolution where the LSH pair list itself outgrows driver memory).

    ``edges_ds``: Dataset with int64 columns (id_a, id_b). ``nodes_ds``:
    Dataset with int64 column (id) covering EVERY vertex (singletons keep
    their own label; edge endpoints missing from nodes are a contract
    violation). Returns a Dataset (id, cluster), cluster = min id of the
    component.

    This is deliberately RAW Ray tasks, not Dataset groupby: an
    iterative fixpoint needs partitioning that is *stable across
    iterations* — labels stay hash-partitioned by id and edges by src,
    so the per-iteration edge-join is partition-local and only the
    pre-aggregated candidate shards (min label per dst, sharded by
    dst % P) cross the object store. The Dataset expression of the same
    algorithm pays two full sort-based shuffles of fixed overhead per
    iteration. Iterations ~ component diameter (LSH duplicate clusters
    are shallow); convergence = zero labels changed (a P-int ray.get per
    iteration). At extreme diameters swap in star contraction; the
    operator contract stays the same. At >>1e4 input blocks the split
    phase should tree-reduce the shard concat; flat concat is fine for
    the block counts a sane upstream produces.
    """
    import ray
    import ray.data as rd

    P = max(2, int(num_partitions))

    def _col(t: pa.Table, name: str) -> np.ndarray:
        return np.asarray(t[name], dtype=np.int64)

    def _shard(keys: np.ndarray, cols: dict) -> list:
        """Split parallel arrays into P buckets by keys % P."""
        pk = keys % P
        order = np.argsort(pk, kind="stable")
        pk_sorted = pk[order]
        bounds = np.searchsorted(pk_sorted, np.arange(P + 1))
        out = []
        for p in range(P):
            sl = order[bounds[p]:bounds[p + 1]]
            out.append(pa.table({k: pa.array(v[sl], pa.int64())
                                 for k, v in cols.items()}))
        return out

    _EMPTY_EDGE = pa.table({"src": pa.array([], pa.int64()),
                            "dst": pa.array([], pa.int64())})
    _EMPTY_NODE = pa.table({"id": pa.array([], pa.int64())})

    @ray.remote
    def _split_edges(tbl):
        from ..util import ensure_arrow

        tbl = ensure_arrow(tbl)
        # sort/shuffle stages can emit columnless empty blocks
        if tbl.num_rows == 0 or "id_a" not in tbl.schema.names:
            return [_EMPTY_EDGE] * P
        a = _col(tbl, "id_a")
        b = _col(tbl, "id_b")
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return _shard(src, {"src": src, "dst": dst})

    @ray.remote
    def _split_nodes(tbl):
        from ..util import ensure_arrow

        tbl = ensure_arrow(tbl)
        if tbl.num_rows == 0 or "id" not in tbl.schema.names:
            return [_EMPTY_NODE] * P
        ids = _col(tbl, "id")
        return _shard(ids, {"id": ids})

    @ray.remote
    def _concat_edges(*shards):
        cols = [[_col(s, c) for s in shards] for c in ("src", "dst")]
        src = (np.concatenate(cols[0]) if cols[0]
               else np.empty(0, dtype=np.int64))
        dst = (np.concatenate(cols[1]) if cols[1]
               else np.empty(0, dtype=np.int64))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    @ray.remote
    def _init_labels(*shards):
        parts = [_col(s, "id") for s in shards]
        ids = (np.unique(np.concatenate(parts)) if parts
               else np.empty(0, dtype=np.int64))
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "label": pa.array(ids, pa.int64())})

    @ray.remote
    def _prop(edges_p: pa.Table, labels_p: pa.Table):
        """Partition-local join edges(src)⋈labels(id) -> candidate
        (dst, label) shards, pre-aggregated to min label per dst."""
        empty = pa.table({"dst": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())})
        if edges_p.num_rows == 0:
            return [empty] * P
        lbl_id = _col(labels_p, "id")        # sorted (np.unique)
        lbl = _col(labels_p, "label")
        src = _col(edges_p, "src")
        dst = _col(edges_p, "dst")
        idx = np.searchsorted(lbl_id, src)
        idx_c = np.minimum(idx, max(len(lbl_id) - 1, 0))
        if len(lbl_id) == 0 or (lbl_id[idx_c] != src).any():
            missing = (src[lbl_id[idx_c] != src][:5].tolist()
                       if len(lbl_id) else src[:5].tolist())
            raise ValueError(
                "connected_components: edge endpoints absent from "
                f"nodes_ds (e.g. {missing}); every id referenced by "
                "pairs_ds must appear in nodes_ds")
        cand = lbl[idx_c]
        order = np.lexsort((cand, dst))
        dst_s, cand_s = dst[order], cand[order]
        first = np.ones(len(dst_s), dtype=bool)
        first[1:] = dst_s[1:] != dst_s[:-1]
        return _shard(dst_s[first], {"dst": dst_s[first],
                                     "label": cand_s[first]})

    @ray.remote(num_returns=2)
    def _merge(labels_p: pa.Table, *cand_shards):
        lbl_id = _col(labels_p, "id")
        lbl = _col(labels_p, "label")
        live = [s for s in cand_shards if s.num_rows]
        if not live:
            return labels_p, 0
        dst = np.concatenate([_col(s, "dst") for s in live])
        cand = np.concatenate([_col(s, "label") for s in live])
        new = lbl.copy()
        idx = np.searchsorted(lbl_id, dst)
        idx_c = np.minimum(idx, max(len(lbl_id) - 1, 0))
        if len(lbl_id) == 0 or (lbl_id[idx_c] != dst).any():
            raise ValueError(
                "connected_components: candidate label for an id absent "
                "from this partition's nodes — edge endpoints must all "
                "appear in nodes_ds")
        np.minimum.at(new, idx_c, cand)
        changed = int((new != lbl).sum())
        if not changed:
            return labels_p, 0
        return pa.table({"id": pa.array(lbl_id, pa.int64()),
                         "label": pa.array(new, pa.int64())}), changed

    edge_blocks = edges_ds.to_arrow_refs()
    node_blocks = nodes_ds.to_arrow_refs()
    e_sh = [_split_edges.options(num_returns=P).remote(b)
            for b in edge_blocks]
    n_sh = [_split_nodes.options(num_returns=P).remote(b)
            for b in node_blocks]
    edges_parts = [
        _concat_edges.remote(*[e_sh[i][p] for i in range(len(e_sh))])
        for p in range(P)
    ]
    labels_parts = [
        _init_labels.remote(*[n_sh[i][p] for i in range(len(n_sh))])
        for p in range(P)
    ]

    converged = False
    for _ in range(max_iters):
        prop = [_prop.options(num_returns=P).remote(edges_parts[p],
                                                    labels_parts[p])
                for p in range(P)]
        merged = [_merge.remote(labels_parts[p],
                                *[prop[q][p] for q in range(P)])
                  for p in range(P)]
        labels_parts = [m[0] for m in merged]
        if sum(ray.get([m[1] for m in merged])) == 0:
            converged = True
            break
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: no fixpoint in {max_iters} "
            "iterations; labels are a refinement (component diameter "
            "exceeds max_iters)", RuntimeWarning)
    return rd.from_arrow_refs(labels_parts).map_batches(
        lambda t: pa.table({"id": t["id"], "cluster": t["label"]}),
        batch_format="pyarrow",
    )


def hash_antijoin(ds, keys_ds, key_col: str, *, num_partitions: int = 64):
    """Rows of ``ds`` whose int64 ``key_col`` does NOT appear in
    ``keys_ds`` (single int64 column ``id``), via raw-task hash
    co-partitioning — neither side touches the driver, so the key set
    may exceed driver memory (the case Dataset broadcast filters can't
    cover). Output row order is partition-major, not input order.
    """
    return _hash_key_filter(ds, keys_ds, key_col, keep=False,
                            num_partitions=num_partitions)


def hash_semijoin(ds, keys_ds, key_col: str, *, num_partitions: int = 64):
    """Rows of ``ds`` whose int64 ``key_col`` DOES appear in ``keys_ds``
    (single int64 column ``id``) — the existence-filter dual of
    :func:`hash_antijoin`, same co-partitioned shape: the key set is
    deduplicated per partition and never ships to the driver, unlike a
    broadcast ``isin`` filter."""
    return _hash_key_filter(ds, keys_ds, key_col, keep=True,
                            num_partitions=num_partitions)


def _hash_key_filter(ds, keys_ds, key_col: str, *, keep: bool,
                     num_partitions: int = 64):
    import ray
    import ray.data as rd

    P = max(2, int(num_partitions))

    from ..util import ensure_arrow

    @ray.remote
    def _split_left(tbl):
        tbl = ensure_arrow(tbl)
        if tbl.num_rows == 0 or key_col not in tbl.schema.names:
            return [tbl.slice(0, 0)] * P
        keys = np.asarray(tbl[key_col], dtype=np.int64) % P
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        bounds = np.searchsorted(ks, np.arange(P + 1))
        return [tbl.take(pa.array(order[bounds[p]:bounds[p + 1]]))
                for p in range(P)]

    @ray.remote
    def _split_keys(tbl):
        tbl = ensure_arrow(tbl)
        if tbl.num_rows == 0 or "id" not in tbl.schema.names:
            return [pa.table({"id": pa.array([], pa.int64())})] * P
        ids = np.asarray(tbl["id"], dtype=np.int64)
        pk = ids % P
        order = np.argsort(pk, kind="stable")
        ks = pk[order]
        bounds = np.searchsorted(ks, np.arange(P + 1))
        return [pa.table({"id": pa.array(ids[order[bounds[p]:bounds[p + 1]]],
                                         pa.int64())})
                for p in range(P)]

    @ray.remote
    def _concat_keys(*shards):
        return np.unique(np.concatenate(
            [np.asarray(s["id"], dtype=np.int64) for s in shards]
        )) if shards else np.empty(0, dtype=np.int64)

    @ray.remote
    def _filter(key_ids: np.ndarray, *left_shards):
        tbl = pa.concat_tables(left_shards, promote_options="default")
        if tbl.num_rows == 0 or len(key_ids) == 0:
            return tbl if not keep else tbl.slice(0, 0)
        ids = np.asarray(tbl[key_col], dtype=np.int64)
        mask = np.isin(ids, key_ids)
        return tbl.filter(pa.array(mask if keep else ~mask))

    left_sh = [_split_left.options(num_returns=P).remote(b)
               for b in ds.to_arrow_refs()]
    key_sh = [_split_keys.options(num_returns=P).remote(b)
              for b in keys_ds.to_arrow_refs()]
    parts = []
    for p in range(P):
        kp = _concat_keys.remote(*[key_sh[i][p] for i in range(len(key_sh))])
        parts.append(_filter.remote(
            kp, *[left_sh[i][p] for i in range(len(left_sh))]
        ))
    return rd.from_arrow_refs(parts)


def remove_near_duplicates(ds, id_col: str, *, text_col: str = "text",
                           num_perm: int = 64, bands: int = 16, k: int = 5,
                           method: str = "auto",
                           num_partitions: int = 64,
                           verify_jaccard: float | None | str = "auto",
                           driver_pairs_threshold: int = 2_000_000,
                           pin_input: bool = True):
    """End-to-end near-dup removal: MinHash+LSH candidate pairs ->
    (Jaccard-verified) duplicate clusters -> drop every non-minimum
    member. Scale safety is the DEFAULT, not a kwarg (VERDICT r3 #1b):

    ``method="auto"`` (default): counts the (verified) pair list and
    picks ``"driver"`` when it fits comfortably on the driver
    (``<= driver_pairs_threshold`` pairs, ~16 bytes each), else
    ``"distributed"`` — the same sizing discipline as the crawl
    scheduler's ``scheduler="auto"``.

    ``method="driver"``: the pair list reduces on the driver via
    union-find and the loser set broadcasts into a filter — one corpus
    pass, no extra shuffle.

    ``method="distributed"`` (the 100 TB path): clusters come from
    :func:`connected_components` over the pair Dataset (pairs never
    leave the object store) and losers are removed with
    :func:`hash_antijoin` — correct even when the pair list or the
    loser set exceeds driver memory. Same output set, partition-major
    row order.

    ``verify_jaccard="auto"`` (default): every LSH candidate pair is
    screened by its TRUE word-k-shingle Jaccard
    (:func:`verify_pairs_jaccard`) at the LSH design-point threshold
    ``(1/bands)^(bands/num_perm)`` (0.5 for 64/16) — REMOVAL never
    rides on a band-key coincidence alone (deleting on a false
    candidate is silent data loss). Pass a float to choose the
    threshold, or ``None`` to skip verification (pair-listing-grade
    semantics).
    """
    import ray

    from ..util import pin_for_multipass

    if verify_jaccard == "auto":
        r = max(1, num_perm // bands)
        verify_jaccard = (1.0 / bands) ** (1.0 / r)

    # this operator consumes ds up to FOUR times (signatures, verify
    # text join, nodes, final anti-join) — pin the projected input so
    # each pass doesn't re-execute the upstream read+transform chain
    ds = pin_for_multipass(ds, enabled=pin_input)
    pairs_ds = minhash_duplicate_pairs(
        ds, id_col, num_perm=num_perm, bands=bands, k=k, text_col=text_col
    )
    if verify_jaccard is not None:
        pairs_ds = verify_pairs_jaccard(
            pairs_ds, ds, id_col=id_col, text_col=text_col, k=k,
            threshold=verify_jaccard, num_partitions=num_partitions,
        ).map_batches(lambda t: t.select(["id_a", "id_b"]),
                      batch_format="pyarrow")
    if method == "auto":
        # the pair list is consumed once to size the plan and once by
        # the chosen path — materialize so sizing doesn't re-run LSH
        pairs_ds = pairs_ds.materialize()
        method = ("driver" if pairs_ds.count() <= driver_pairs_threshold
                  else "distributed")
    if method == "distributed":
        nodes = ds.map_batches(
            lambda t: pa.table({"id": t[id_col]}), batch_format="pyarrow"
        )
        cc = connected_components(pairs_ds, nodes,
                                  num_partitions=num_partitions)
        losers = cc.map_batches(
            lambda t: pa.table({"id": t["id"]}).filter(
                pa.array(np.asarray(t["id"], dtype=np.int64)
                         != np.asarray(t["cluster"], dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
        return hash_antijoin(ds, losers, id_col,
                             num_partitions=num_partitions)

    pairs = pairs_ds.to_pandas()
    if pairs.empty:
        # an empty pair Dataset (e.g. every candidate failed the Jaccard
        # screen) loses its column names through to_pandas
        pairs = pd.DataFrame({"id_a": [], "id_b": []})
    losers_ref = ray.put(neardup_losers(pairs))
    # TASK pool with a per-worker-process cache (CLAUDE.md tiny-state
    # rule): the state is one small sorted loser-id array obtainable by
    # zero-copy ray.get per worker — the previous actor-pool shape paid
    # spin-up AND capped the corpus-wide drop pass at 2 workers
    return ds.map_batches(
        _drop_losers_task,
        fn_kwargs={"losers_ref": losers_ref, "id_col": id_col},
        batch_format="pyarrow",
    )


_LOSERS_CACHE: dict = {}


def _drop_losers_task(t: pa.Table, *, losers_ref, id_col: str) -> pa.Table:
    """Anti-membership filter against a broadcast sorted loser-id set
    (per-worker-process decoded cache, task-pool discipline)."""
    import ray

    key = losers_ref.hex() if isinstance(losers_ref, ray.ObjectRef) \
        else id(losers_ref)
    losers = _LOSERS_CACHE.get(key)
    if losers is None:
        s = ray.get(losers_ref) if isinstance(losers_ref, ray.ObjectRef) \
            else losers_ref
        losers = np.fromiter(s, dtype=np.int64, count=len(s))
        losers.sort()
        if len(_LOSERS_CACHE) > 4:
            _LOSERS_CACHE.clear()
        _LOSERS_CACHE[key] = losers
    if t.num_rows == 0 or not len(losers):
        return t
    ids = np.asarray(t[id_col], dtype=np.int64)
    idx = np.searchsorted(losers, ids)
    idx[idx >= len(losers)] = 0
    hit = losers[idx] == ids
    return t.filter(pa.array(~hit))


# --- SimHash --------------------------------------------------------------

_SIMHASH_MAX_TOKENS = 512  # signature sample cap: bounds memory traffic


def simhash64(text: str, wh: np.ndarray | None = None) -> int:
    h = word_hashes(text, _SIMHASH_MAX_TOKENS) if wh is None else (
        wh[:_SIMHASH_MAX_TOKENS] if len(wh) > _SIMHASH_MAX_TOKENS else wh)
    if not len(h):
        return 0
    # uint8 bit expansion (unpackbits) keeps temporaries 8x smaller than
    # an int64 bit matrix — matters when 32 actors run this concurrently
    bits = np.unpackbits(h.view(np.uint8).reshape(len(h), 8), axis=1)
    pop = bits.sum(axis=0, dtype=np.int32)
    out_bits = (2 * pop > len(h)).astype(np.uint8)
    return int.from_bytes(np.packbits(out_bits).tobytes(), "little")


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  wh_list: list | None = None) -> pa.Table:
    texts = batch[text_col].to_pylist()
    if wh_list is None:
        wh_list = word_hashes_batch(texts, _SIMHASH_MAX_TOKENS)
    vals = np.array([simhash64(t or "", wh=w)
                     for t, w in zip(texts, wh_list)],
                    dtype=np.uint64)
    return batch.append_column(
        "simhash", pa.array(vals, pa.uint64())
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (numpy 1.x has no
    ``bitwise_count``): view as uint8 bytes, unpack to bits, sum."""
    if not len(x):
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
    return bits.reshape(len(x), 64).sum(axis=1, dtype=np.int64)


def simhash_neardup_pairs(ds, id_col: str, *, text_col: str = "text",
                          max_hamming: int = 3,
                          max_bucket: int = _MAX_BUCKET):
    """EXACT Hamming-ball near-dup pairs over 64-bit SimHash
    fingerprints — the Manku/Jarvelin/Sadakane "Detecting
    Near-Duplicates for Web Crawling" (WWW'07) shape, the classic
    complement to MinHash for crawl-time dedup.

    Pigeonhole banding makes candidate recall 100%: the 64 bits split
    into ``max_hamming + 1`` contiguous blocks, so two fingerprints
    within Hamming distance ``max_hamming`` MUST agree exactly on at
    least one block. Each doc emits one (block_idx, block_value) band
    row carrying its 8-byte fingerprint; colliding buckets verify the
    exact distance in-partition (vectorized xor+popcount — no join
    back to the docs). Output is therefore EXACTLY the set of pairs
    with distance <= max_hamming (id_a < id_b, plus the distance),
    not a candidate superset — subject only to the ``max_bucket``
    pair-generation cap (logged, smallest ids kept), same no-silent-cap
    contract as :func:`minhash_duplicate_pairs`.

    Scale: the only shuffle moves (id, block_idx, block_val, simhash) =
    ~28 bytes/doc/block; text never moves. Wordless/empty docs are
    dropped before hashing (they all share fingerprint 0 — one
    poisoned distance-0 bucket would otherwise dominate)."""
    def _nonempty(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = pc.coalesce(t[text_col], pa.scalar(""))
        keep = pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(txt)),
                          pa.scalar(0))
        out = t.filter(keep)
        dropped = t.num_rows - out.num_rows
        if dropped:
            import logging

            logging.getLogger(__name__).info(
                "simhash_neardup: dropped %d wordless docs", dropped)
        return out

    sigs = ds.map_batches(_nonempty, batch_format="pyarrow").map_batches(
        lambda t: simhash_batch(t.select([id_col, text_col]),
                                text_col=text_col).select([id_col,
                                                           "simhash"]),
        batch_format="pyarrow",
    )
    return hamming_pairs(sigs, id_col, max_hamming=max_hamming,
                         max_bucket=max_bucket)


def hamming_pairs(sigs, id_col: str, *, sim_col: str = "simhash",
                  max_hamming: int = 3, max_bucket: int = _MAX_BUCKET):
    """EXACT Hamming-ball pairs over PRECOMPUTED 64-bit fingerprints —
    the pigeonhole-banding + in-bucket xor/popcount core of
    :func:`simhash_neardup_pairs`, factored out so fingerprints from
    any source (SimHash, synthetic, externally computed) share the one
    distributed pair-finder. Output: (id_a, id_b, hamming) with
    id_a < id_b, exactly the pairs within ``max_hamming``."""
    if not 0 <= max_hamming <= 16:
        raise ValueError("max_hamming must be in [0, 16]")
    n_blocks = max_hamming + 1
    # block bit boundaries: widths differ by at most 1 (e.g. 64/5 ->
    # 13,13,13,13,12); completeness only needs contiguous disjoint cover
    bounds = np.linspace(0, 64, n_blocks + 1).astype(np.int64)
    if sim_col != "simhash":
        sigs = sigs.map_batches(
            lambda t: t.rename_columns(
                [("simhash" if c == sim_col else c)
                 for c in t.column_names]),
            batch_format="pyarrow",
        )

    def _bands(t: pa.Table) -> pa.Table:
        sim = np.asarray(t["simhash"], dtype=np.uint64)
        n = len(sim)
        ids = np.asarray(t[id_col], dtype=np.int64)
        out_id = np.tile(ids, n_blocks)
        out_sim = np.tile(sim, n_blocks)
        out_blk = np.repeat(np.arange(n_blocks, dtype=np.int64), n)
        vals = np.empty(n * n_blocks, dtype=np.uint64)
        for b in range(n_blocks):
            lo, hi = bounds[b], bounds[b + 1]
            width = np.uint64(hi - lo)
            mask = (np.uint64(0xFFFFFFFFFFFFFFFF)
                    if width == 64 else
                    np.uint64((1 << int(width)) - 1))
            vals[b * n:(b + 1) * n] = (sim >> np.uint64(lo)) & mask
        # partition on the bucket identity so every bucket completes
        # inside one partition (hash both block idx and value)
        pk = ((vals ^ (out_blk.view(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15))) % np.uint64(_DEDUP_PARTITIONS))
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "block_idx": pa.array(out_blk, pa.int64()),
            "block_val": pa.array(vals, pa.uint64()),
            "simhash": pa.array(out_sim, pa.uint64()),
            "_pk": pa.array(pk.astype(np.int64), pa.int64()),
        })

    exploded = sigs.map_batches(_bands, batch_format="pyarrow")

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.duplicated(["block_idx", "block_val"], keep=False)]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for key, grp in df.groupby(["block_idx", "block_val"],
                                   sort=False):
            order = np.argsort(grp[id_col].to_numpy())
            ids = grp[id_col].to_numpy()[order]
            sims = grp["simhash"].to_numpy().astype(np.uint64)[order]
            if len(ids) > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "simhash bucket %s has %d members; capping at %d "
                    "(smallest ids kept)", key, len(ids), max_bucket)
                ids, sims = ids[:max_bucket], sims[:max_bucket]
            ia, ib = np.triu_indices(len(ids), k=1)
            dist = _popcount64(sims[ia] ^ sims[ib])
            keep = dist <= max_hamming
            out_a.append(ids[ia][keep])
            out_b.append(ids[ib][keep])
            out_d.append(dist[keep])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_d)})

    pairs = exploded.groupby("_pk").map_groups(_pairs,
                                               batch_format="pandas")
    return dedup_pairs(pairs)


def remove_simhash_neardups(ds, id_col: str, *, text_col: str = "text",
                            max_hamming: int = 3,
                            num_partitions: int = 64,
                            pin_input: bool = True):
    """Drop SimHash near-duplicates, keeping the minimum id per
    duplicate cluster: exact Hamming pairs -> distributed connected
    components -> hash anti-join. Driver-free end to end, mirroring
    :func:`remove_embedding_neardups`. Unlike the MinHash path no
    Jaccard screen is needed — the pair set is already EXACT in the
    fingerprint metric (verified xor+popcount, not a band
    coincidence)."""
    from ..util import pin_for_multipass

    ds = pin_for_multipass(ds, enabled=pin_input)  # pairs + nodes + anti
    pairs = simhash_neardup_pairs(ds, id_col, text_col=text_col,
                                  max_hamming=max_hamming)
    nodes = ds.map_batches(
        lambda t: pa.table({"id": t[id_col]}), batch_format="pyarrow"
    )
    cc = connected_components(pairs.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"),
        nodes, num_partitions=num_partitions)
    losers = cc.map_batches(
        lambda t: pa.table({"id": t["id"]}).filter(
            pa.array(np.asarray(t["id"], dtype=np.int64)
                     != np.asarray(t["cluster"], dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    return hash_antijoin(ds, losers, id_col, num_partitions=num_partitions)


# --- n-gram Jaccard (verification kernel) ---------------------------------

def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = set(shingles(text_a, k)), set(shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_jaccard(pairs_ds, docs_ds, *, id_col: str,
                         text_col: str = "text", k: int = 5,
                         threshold: float = 0.5,
                         num_partitions: int = _DEDUP_PARTITIONS,
                         broadcast_ids_threshold: int = 2_000_000):
    """TRUE word-k-shingle Jaccard for candidate pairs; keeps pairs with
    ``jaccard >= threshold`` (column ``jaccard`` attached).

    The screen between LSH candidates and unverified removal: band-key
    collisions (or an aggressive band setting) can propose unrelated
    docs, and deleting on a false candidate is silent data loss. Scale
    shape: two distributed equi-joins (:func:`..relational.hash_join`)
    ship each pair its two texts — only the tiny LSH pair output ever
    carries text, never the corpus — then each batch shingle-hashes every
    DISTINCT doc once and intersects sorted uint64 arrays per pair. The
    per-pair loop is over candidates only (a vanishing fraction of the
    corpus), not a corpus-scale row loop.

    Text-movement guard: when the pair list is small enough
    (``<= broadcast_ids_threshold`` pairs — the common case; LSH output
    is a vanishing fraction of the corpus), the DISTINCT candidate ids
    broadcast via ``ray.put`` and the text side is filtered MAP-SIDE
    before either join, so corpus text never enters a shuffle at all
    (the joins then auto-broadcast the tiny filtered table). Above the
    threshold the full co-partitioned shuffle path runs — correct for
    pair lists that exceed driver memory, at the cost of moving the
    text column through the exchanges.
    """
    import ray

    from .relational import hash_join

    texts = docs_ds.map_batches(
        lambda t: pa.table({"id": t[id_col], "_txt": t[text_col]}),
        batch_format="pyarrow",
    )

    pairs_ds = pairs_ds.materialize()  # consumed twice below
    broadcast = "auto"
    if pairs_ds.count() <= broadcast_ids_threshold:
        from ..util import ensure_arrow as _ea

        id_arrs = [
            np.asarray(t[c], dtype=np.int64)
            for t in map(_ea, ray.get(pairs_ds.to_arrow_refs()))
            if t.num_rows and "id_a" in t.schema.names
            for c in ("id_a", "id_b")
        ]
        cand_ids = (np.unique(np.concatenate(id_arrs)) if id_arrs
                    else np.empty(0, dtype=np.int64))
        ids_ref = ray.put(cand_ids)  # sorted by construction

        def _keep_candidates(t: pa.Table) -> pa.Table:
            # task pool, not an actor pool: ray.get of an
            # already-fetched broadcast object is a zero-copy local
            # read per task, so no per-actor state (or spin-up) needed
            cand = ray.get(ids_ref)
            if t.num_rows == 0 or not len(cand):
                return t.slice(0, 0)
            ids = np.asarray(t["id"], dtype=np.int64)
            pos = np.searchsorted(cand, ids)
            pos[pos >= len(cand)] = 0
            return t.filter(pa.array(cand[pos] == ids))

        texts = texts.map_batches(_keep_candidates,
                                  batch_format="pyarrow").materialize()
    else:
        broadcast = False

    def _strip(new_name):
        def _fn(t: pa.Table) -> pa.Table:
            t = t.drop_columns(["id"])
            return t.rename_columns(
                [(new_name if c == "_txt" else c) for c in t.column_names])
        return _fn

    j1 = hash_join(pairs_ds, texts, on="id_a", right_on="id",
                   broadcast=broadcast, num_partitions=num_partitions)
    j1 = j1.map_batches(_strip("_ta"), batch_format="pyarrow")
    j2 = hash_join(j1, texts, on="id_b", right_on="id",
                   broadcast=broadcast, num_partitions=num_partitions)
    j2 = j2.map_batches(_strip("_tb"), batch_format="pyarrow")

    def _verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = [c for c in t.column_names if c not in ("_ta", "_tb")]
            out = t.select(cols) if cols else pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64())})
            return out.append_column("jaccard",
                                     pa.array([], pa.float64()))
        ia = np.asarray(t["id_a"], dtype=np.int64)
        ib = np.asarray(t["id_b"], dtype=np.int64)
        ta = t["_ta"].to_pylist()
        tb = t["_tb"].to_pylist()
        shing: dict[int, np.ndarray] = {}
        for ids, txts in ((ia, ta), (ib, tb)):
            for i, txt in zip(ids, txts):
                if int(i) not in shing:
                    shing[int(i)] = np.unique(
                        shingle_hashes(txt or "", k))
        sims = np.empty(len(ia), dtype=np.float64)
        for row in range(len(ia)):
            sa, sb = shing[int(ia[row])], shing[int(ib[row])]
            if not len(sa) and not len(sb):
                sims[row] = 1.0
            elif not len(sa) or not len(sb):
                sims[row] = 0.0
            else:
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                sims[row] = inter / (len(sa) + len(sb) - inter)
        keep = sims >= threshold
        out = t.drop_columns(["_ta", "_tb"]).append_column(
            "jaccard", pa.array(sims, pa.float64()))
        return out.filter(pa.array(keep))

    return j2.map_batches(_verify, batch_format="pyarrow")


# --- embedding cosine near-dup --------------------------------------------

def embedding_neardup_pairs(ds, id_col: str = "vec_id",
                            emb_col: str = "embedding",
                            threshold: float = 0.95,
                            n_planes: int = 12, seed: int = 11,
                            probes: int = 0,
                            max_bucket: int = 1024):
    """Near-duplicate vectors by cosine similarity, LSH-bucketed.

    Random-hyperplane signatures (computed vectorized per batch) bucket
    candidates; exact cosine verifies within each bucket. Only (id, sig,
    vector) rows shuffle; buckets stay small.

    ``probes=0`` is single-probe: pairs whose signatures differ in any
    bit are MISSED (recall loss grows with n_planes and with how close
    the pair sits to a hyperplane). ``probes=1`` multi-probes by also
    emitting each vector into its ``n_planes`` one-bit-flip buckets, so
    any pair within signature Hamming distance <= 2 shares a bucket —
    at a (1 + n_planes)x replication cost in shuffle bytes and a global
    pair-dedup pass (pairs can now meet in several buckets). Measure
    recall against :func:`siren_ray.stages.ann.cosine_pairs_exact`.
    """

    from ..util import embedding_matrix

    def _sign(batch: pa.Table) -> pa.Table:
        # task pool with per-worker cached planes (deterministic from
        # (seed, dim, n_planes)) — actor spin-up for a tiny RNG matrix
        # is pure fixed cost (see _cached_minhasher)
        if batch.num_rows == 0:
            return batch.append_column("lsh_sig",
                                       pa.array([], pa.int64()))
        mat = embedding_matrix(batch[emb_col], dtype=np.float32)
        key = ("planes", seed, mat.shape[1], n_planes)
        planes = _MINHASHER_CACHE.get(key)
        if planes is None:
            rng = np.random.RandomState(seed)
            planes = _MINHASHER_CACHE[key] = rng.standard_normal(
                (mat.shape[1], n_planes)).astype(np.float32)
        bits = (mat @ planes) > 0
        sig = bits @ (1 << np.arange(n_planes))
        return batch.append_column("lsh_sig", pa.array(sig.astype(np.int64)))

    def _empty_pairs() -> pa.Table:
        return pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        })

    def _verify_partition(t: pa.Table) -> pa.Table:
        """One invocation per hash PARTITION of bucket keys (not per
        bucket), fully Arrow/numpy: the embedding column decodes once
        per partition via list_flatten (no per-element Python objects),
        buckets come from one lexsort, the loop visits only buckets
        that actually collide.

        Degenerate-bucket guard: a bucket larger than ``max_bucket``
        (the near-dup corpus pathology — thousands of near-identical
        vectors sharing one signature) is verified against a PIVOT
        subset (the ``max_bucket`` smallest ids) instead of all-pairs:
        O(n*cap) compute and output instead of O(n^2), while every
        member still compares against pivot id-min, so near-identical
        clusters stay connected for the downstream connected-components
        pass. Overflow is logged per the no-silent-caps rule."""
        if t.num_rows == 0:
            return _empty_pairs()
        sig = np.asarray(t["lsh_sig"], dtype=np.int64)
        ids = np.asarray(t[id_col], dtype=np.int64)
        # float64: the threshold decision must agree with the exact
        # kernel (ann.cosine_pairs_exact) used as recall ground truth
        mat = embedding_matrix(t[emb_col], dtype=np.float64)
        order = np.lexsort((ids, sig))
        sig, ids, mat = sig[order], ids[order], mat[order]
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat /= norms
        bounds = np.flatnonzero(np.diff(sig)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sig)]))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            m = mat[s:e]
            bids = ids[s:e]
            if n > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "embedding-LSH bucket %d has %d members; verifying "
                    "against the %d smallest-id pivots (O(n*cap))",
                    int(sig[s]), n, max_bucket,
                )
                sims = m[:max_bucket] @ m.T  # (cap, n)
                ia, ib = np.nonzero(
                    np.triu(np.ones((max_bucket, n), dtype=bool), k=1)
                )
            else:
                sims = m @ m.T
                ia, ib = np.triu_indices(n, k=1)
            vals = sims[ia, ib]
            mask = vals >= threshold
            if not mask.any():
                continue
            out_a.append(np.minimum(bids[ia[mask]], bids[ib[mask]]))
            out_b.append(np.maximum(bids[ia[mask]], bids[ib[mask]]))
            out_c.append(vals[mask])
        if not out_a:
            return _empty_pairs()
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c), pa.float64()),
        })

    def _bucket(t: pa.Table) -> pa.Table:
        sig = t["lsh_sig"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_pk", pa.array((sig % _DEDUP_PARTITIONS).astype(np.int64))
        )

    def _explode_probes(t: pa.Table) -> pa.Table:
        """Each row also enters its one-bit-flip buckets: a pair at
        signature Hamming distance <= 2 meets where a's flip equals b's
        flip (or either's original)."""
        sig = np.asarray(t["lsh_sig"], dtype=np.int64)
        n = len(sig)
        if n == 0:
            return t
        flips = np.concatenate(
            [[0], (1 << np.arange(n_planes))]
        ).astype(np.int64)
        idx = np.repeat(np.arange(n), len(flips))
        sigs = (sig[:, None] ^ flips[None, :]).reshape(-1)
        out = t.take(pa.array(idx))
        return out.set_column(
            out.schema.get_field_index("lsh_sig"), "lsh_sig",
            pa.array(sigs, pa.int64()),
        )

    sigs = ds.map_batches(_sign, batch_format="pyarrow")
    if probes:
        sigs = sigs.map_batches(_explode_probes, batch_format="pyarrow")
    pairs = (
        sigs.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_verify_partition, batch_format="pyarrow")
    )
    if probes:
        # the same pair can verify in several probe buckets
        pairs = dedup_pairs(pairs)
    return pairs


def remove_embedding_neardups(ds, id_col: str = "vec_id",
                              emb_col: str = "embedding", *,
                              threshold: float = 0.95,
                              n_planes: int = 12, probes: int = 1,
                              num_partitions: int = 64,
                              pin_input: bool = True):
    """Drop near-duplicate VECTORS, keeping the minimum id per duplicate
    cluster — the embedding analog of
    :func:`remove_near_duplicates(method="distributed")`: multi-probe
    LSH pairs -> distributed connected components -> hash anti-join.
    Nothing touches the driver; output row order is partition-major."""
    from ..util import pin_for_multipass

    ds = pin_for_multipass(ds, enabled=pin_input)  # 3 passes below
    pairs = embedding_neardup_pairs(
        ds, id_col, emb_col, threshold=threshold, n_planes=n_planes,
        probes=probes,
    )
    nodes = ds.map_batches(
        lambda t: pa.table({"id": t[id_col]}), batch_format="pyarrow"
    )
    cc = connected_components(pairs, nodes, num_partitions=num_partitions)
    losers = cc.map_batches(
        lambda t: pa.table({"id": t["id"]}).filter(
            pa.array(np.asarray(t["id"], dtype=np.int64)
                     != np.asarray(t["cluster"], dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    return hash_antijoin(ds, losers, id_col, num_partitions=num_partitions)


def incremental_ingest_neardup(base_ds, inc_ds, *, id_col: str,
                               text_col: str = "text",
                               num_perm: int = 64, bands: int = 16,
                               k: int = 5,
                               verify_jaccard: float | None | str = "auto",
                               num_partitions: int = 64):
    """NEAR-duplicate-aware incremental corpus ingest: keep only the
    increment rows whose text is not a near-duplicate of anything in
    the base corpus — the fuzzy sibling of the exact-fingerprint
    anti-join ingest (a recrawl rarely reproduces pages byte-identical;
    boilerplate drifts while the payload stays the same).

    Shape: both sides tag their ids into disjoint parity ranges
    (base -> 2*id, increment -> 2*id+1; ids must fit 62 bits), union,
    and run the SAME MinHash+LSH pair machinery as
    :func:`minhash_duplicate_pairs` — signatures-only shuffle, capped
    buckets. Only CROSS-side pairs matter: the increment member of each
    becomes a loser, removed with the driver-free
    :func:`hash_antijoin`. Increment-internal near-dups are NOT removed
    here (run :func:`remove_near_duplicates` on the survivors when that
    policy is wanted). ``verify_jaccard`` screens candidate pairs by
    true shingle Jaccard before any removal, same contract (and same
    ``"auto"`` = LSH-design-point threshold default) as
    :func:`remove_near_duplicates` — this operator DROPS rows, so a
    band-key coincidence alone must never delete an increment doc.
    """
    if verify_jaccard == "auto":
        r = max(1, num_perm // bands)
        verify_jaccard = (1.0 / bands) ** (1.0 / r)

    def _tag(parity: int):
        def _fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_col], dtype=np.int64)
            if len(ids) and ids.max() >= (1 << 62):
                raise ValueError("incremental_ingest_neardup: ids must "
                                 "fit 62 bits for parity tagging")
            return pa.table({
                id_col: pa.array(ids * 2 + parity, pa.int64()),
                text_col: t[text_col],
            })
        return _fn

    # multi-pass operator contract (CLAUDE.md): inc_ds feeds both the
    # tagged union and the final anti-join; the tagged union feeds both
    # the LSH signature pass and the verify text join — pin so each
    # extra pass reads pinned blocks instead of re-executing upstream
    from ..util import pin_for_multipass

    inc_ds = pin_for_multipass(inc_ds)
    tagged = base_ds.map_batches(_tag(0), batch_format="pyarrow").union(
        inc_ds.map_batches(_tag(1), batch_format="pyarrow"))
    if verify_jaccard is not None:
        tagged = pin_for_multipass(tagged)
    pairs = minhash_duplicate_pairs(
        tagged, id_col, num_perm=num_perm, bands=bands, k=k,
        text_col=text_col)
    if verify_jaccard is not None:
        pairs = verify_pairs_jaccard(
            pairs, tagged, id_col=id_col, text_col=text_col, k=k,
            threshold=verify_jaccard, num_partitions=num_partitions,
        ).map_batches(lambda t: t.select(["id_a", "id_b"]),
                      batch_format="pyarrow")

    def _inc_losers(t: pa.Table) -> pa.Table:
        a = np.asarray(t["id_a"], dtype=np.int64)
        b = np.asarray(t["id_b"], dtype=np.int64)
        cross = (a ^ b) & 1 == 1
        ids = np.concatenate([a[cross], b[cross]])
        ids = ids[ids & 1 == 1] >> 1  # increment-side, untagged
        return pa.table({"id": pa.array(np.unique(ids), pa.int64())})

    losers = pairs.map_batches(_inc_losers, batch_format="pyarrow")
    return hash_antijoin(inc_ds, losers, id_col,
                         num_partitions=num_partitions)


def semantic_dedup(ds, *, id_col: str = "vec_id",
                   emb_col: str = "embedding", n_clusters: int = 16,
                   threshold: float = 0.95, max_cluster: int = 100_000,
                   chunk_rows: int = 1024, kmeans_iters: int = 8,
                   seed: int = 3, num_partitions: int = 64,
                   pin_input: bool = True):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): the
    embedding-space analogue of MinHash removal for paraphrase-level
    duplicates that share no n-grams. Cluster the corpus with
    distributed spherical k-means, then WITHIN each cluster find
    cosine-similar pairs (``>= threshold``), group them into duplicate
    components, and keep exactly one representative per component —
    the member LEAST similar to its cluster centroid (the paper's
    keep-rule: retain the most "edge-of-cluster" example; ties break on
    smallest id). Returns the input minus the removed near-duplicates.

    Scale shape: k-means partials stream (``ann.kmeans_train``);
    assignment is map-only against broadcast centroids; the all-pairs
    step is confined to one cluster per group — the SemDeDup operating
    point is ``n_clusters ~ corpus/10^4`` so clusters stay worker-
    sized (``max_cluster`` guards the skew case: an over-full cluster
    is truncated to its ``max_cluster`` members closest to the
    centroid, and logged — never a silent OOM). Within a cluster the
    similarity matrix is computed in ``chunk_rows`` row-blocks —
    memory ``chunk_rows * |cluster| * 8`` bytes (float64 on purpose:
    threshold compares must not flip with reassociation), ~800 MB per
    chunk at the defaults, so shrink ``chunk_rows`` for tighter
    workers — pairs feed an in-cluster union-find (cluster-sized,
    bounded), and removed ids leave as a Dataset consumed by one
    distributed anti-join.

    Engine addition per the task brief; no reference counterpart
    (the reference has no embedding operators at all).
    """
    import logging

    import ray

    from ..util import embedding_matrix, pin_for_multipass
    from .ann import _normalize, kmeans_train

    ds = pin_for_multipass(ds, enabled=pin_input)  # kmeans + assign + join
    cents = kmeans_train(
        ds.select_columns([emb_col]), n_clusters, emb_col=emb_col,
        iters=kmeans_iters, seed=seed, pin_input=False)
    cents_ref = ray.put(_normalize(cents.astype(np.float64)))

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)  # zero-copy local read
        x = _normalize(embedding_matrix(t[emb_col], dtype=np.float64))
        sims = x @ c.T
        cl = np.argmax(sims, axis=1).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            emb_col: t[emb_col],
            "cluster": pa.array(cl, pa.int64()),
            "cent_sim": pa.array(sims[np.arange(len(cl)), cl],
                                 pa.float64()),
        })

    def _cluster_losers(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) > max_cluster:
            logging.getLogger(__name__).warning(
                "semantic_dedup: cluster %s has %d members; truncating "
                "to the %d closest to the centroid", df["cluster"].iat[0],
                len(df), max_cluster)
            df = df.sort_values(["cent_sim", id_col],
                                ascending=[False, True],
                                kind="mergesort").head(max_cluster)
        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        m = len(df)
        if m < 2:
            return pd.DataFrame({"id": np.empty(0, np.int64)})
        x = _normalize(np.array(df[emb_col].tolist(), dtype=np.float64))
        parent = np.arange(m)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for lo in range(0, m, chunk_rows):
            hi = min(lo + chunk_rows, m)
            sims = x[lo:hi] @ x.T
            rr, cc = np.nonzero(sims >= threshold)
            rr += lo
            for i, j in zip(rr, cc):
                if i < j:  # upper triangle once; diagonal excluded
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(i) for i in range(m)])
        cent = df["cent_sim"].to_numpy()
        ids = df[id_col].to_numpy()
        # keeper per component = least centroid-similar, tie -> min id.
        # ids are sorted ascending, so a stable argsort on cent_sim
        # visits equal-sim members in id order; the first seen per root
        # wins.
        order = np.argsort(cent, kind="mergesort")
        keep = np.zeros(m, dtype=bool)
        seen: set = set()
        for i in order:
            r = roots[i]
            if r not in seen:
                seen.add(r)
                keep[i] = True
        return pd.DataFrame({"id": ids[~keep].astype(np.int64)})

    losers = (
        ds.map_batches(_assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(_cluster_losers, batch_format="pandas")
    )
    return hash_antijoin(ds, losers, id_col,
                         num_partitions=num_partitions)
