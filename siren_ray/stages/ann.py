"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is normalized once
per actor (``ray.put`` broadcast, read zero-copy in ``__init__``), each
batch is one numpy matmul, and per-batch top-k partials are merged by a
final small reduction (no all-to-all: only k rows per (batch, query)
move). Scale path: IVF — k-means coarse centroids assign each vector to a
list; queries probe only ``nprobe`` lists, expressed as a bucket-pruned
groupby. (Engine addition per the task brief; no reference counterpart.)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..util import embedding_matrix


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _empty_scores(id_col: str) -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )


_MERGE_PARTITIONS = 16


def _topk_partial(sims: np.ndarray, ids: np.ndarray, k: int,
                  id_col: str) -> pa.Table:
    """Vectorized per-batch top-k over ALL query columns at once, with
    the SAME deterministic tie-break as the final merge (cosine DESC,
    id ASC): rows are pre-sorted by id, so a stable argsort on -sim
    keeps the smallest ids among boundary ties — a plain argpartition
    kept an arbitrary subset by batch row order, and a tied id dropped
    here could never be recovered downstream (result sets then varied
    with block layout). Rows with sim == -inf (probe-masked) are
    dropped from the output."""
    n, nq = sims.shape
    kk = min(k, n)
    order = np.argsort(ids, kind="stable")
    sims = sims[order]
    ids = ids[order]
    top = np.argsort(-sims, axis=0, kind="stable")[:kk]  # (kk, nq)
    rows = top.T.ravel()
    qs = np.repeat(np.arange(nq, dtype=np.int64), kk)
    vals = sims[rows, qs]
    keep = vals > -np.inf
    return pa.table({
        "query_id": pa.array(qs[keep], pa.int64()),
        id_col: pa.array(ids[rows[keep]].astype(np.int64), pa.int64()),
        "cosine": pa.array(vals[keep].astype(np.float64), pa.float64()),
    })


def _merge_topk(partials, k: int, id_col: str):
    """Per-query top-k merge of per-batch partials, vectorized per hash
    partition of query_id (one pandas call per partition, not per query;
    deterministic tie-break (cosine DESC, id ASC))."""

    def _bucket(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_qb", pa.array((q % _MERGE_PARTITIONS).astype(np.int64))
        )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "cosine", id_col],
                            ascending=[True, False, True], kind="mergesort")
        return (
            df.groupby("query_id", sort=False).head(k)
            .drop(columns=["_qb"]).reset_index(drop=True)
        )

    return (
        partials.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_qb")
        .map_groups(_merge, batch_format="pandas")
    )


class _TopKScorer:
    """Actor-pool stage: per-batch cosine top-k against broadcast queries."""

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float32)).T  # (dim, nq)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty blocks occur; argpartition(-1) raises
            return _empty_scores(self.id_col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mat = embedding_matrix(batch[self.emb_col], dtype=np.float32)
        sims = (_normalize(mat) @ self.q).astype(np.float64)  # (n, nq)
        return _topk_partial(sims, ids, self.k, self.id_col)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     concurrency: int = 2):
    """Exact cosine top-k per query row. Returns Dataset
    (query_id, id_col, cosine) with exactly k rows per query.

    Deterministic tie-break: (cosine DESC, id ASC).
    """
    queries_ref = ray.put(np.asarray(queries, dtype=np.float32))
    partials = ds.map_batches(
        _TopKScorer,
        fn_constructor_kwargs={
            "queries_ref": queries_ref, "k": k,
            "id_col": id_col, "emb_col": emb_col,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )

    return _merge_topk(partials, k, id_col)


# --- IVF (scale path) -----------------------------------------------------

def kmeans_fit(sample: np.ndarray, n_lists: int, iters: int = 8,
               seed: int = 3) -> np.ndarray:
    """Tiny deterministic k-means on a driver-side sample (coarse quantizer
    training is sample-based in any IVF system)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float32))
    cents = sample[rng.choice(len(sample), size=n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_lists):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


class _IVFAssign:
    def __init__(self, cents_ref, emb_col: str):
        c = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        self.cents = np.asarray(c, dtype=np.float32).T
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("ivf_list", pa.array([], pa.int32()))
        mat = _normalize(embedding_matrix(batch[self.emb_col],
                                          dtype=np.float32))
        lists = np.argmax(mat @ self.cents, axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists))


def ivf_build(ds, index_dir: str, *, n_lists: int = 16,
              emb_col: str = "embedding", train_sample: int = 2048,
              train: str = "sample") -> np.ndarray:
    """Build a persisted IVF index: assign every vector to its coarse
    list and write the assignment Parquet PARTITIONED BY ``ivf_list``, so
    queries prune at the read (list id = partition directory). Returns
    the centroid matrix (small; the only driver-side state).

    This is the 100 TB shape: the assignment pass streams the corpus
    once; every later query batch reads only ``nprobe``/:attr:`n_lists`
    of the bytes.

    ``train="sample"`` (default) runs driver-side k-means on a uniform
    random sample; ``train="full"`` runs the distributed full-corpus
    :func:`kmeans_train` (sample-initialized, per-batch partial sums) —
    better-balanced lists when the corpus has structure the sample
    under-represents, at the cost of ``iters`` extra streaming passes.
    """
    import shutil

    # multi-pass operator contract (CLAUDE.md): count + training sample
    # + the assignment pass each consume ds — pin once
    from ..util import pin_for_multipass

    ds = pin_for_multipass(ds)
    if train == "full":
        cents = kmeans_train(ds, n_lists, emb_col=emb_col,
                             train_sample=train_sample)
    elif train == "sample":
        # UNIFORM random training sample, not a prefix: ds.limit() reads
        # the first file(s), which on partitioned data is one domain/day
        # shard — biased centroids -> skewed lists -> pruning stops
        # helping. random_sample is a per-block vectorized Bernoulli draw
        # (no shuffle, deterministic under the seed); the expected draw
        # is 1.25x train_sample and ALL drawn rows train, so no prefix
        # re-enters.
        n = ds.count()
        if n > train_sample:
            frac = min(1.0, (1.25 * train_sample) / n)
            sample_tbl = ds.random_sample(frac, seed=7).to_pandas()
            if len(sample_tbl) < max(n_lists, train_sample // 4):
                sample_tbl = ds.limit(train_sample).to_pandas()  # unlucky
        else:
            sample_tbl = ds.to_pandas()
        cents = kmeans_fit(np.array(sample_tbl[emb_col].tolist()), n_lists)
    else:
        raise ValueError(f"train must be 'sample' or 'full', got {train!r}")
    cents_ref = ray.put(cents)
    assigned = ds.map_batches(
        _IVFAssign,
        fn_constructor_kwargs={"cents_ref": cents_ref, "emb_col": emb_col},
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    # assignment under assign/ so the parquet scan never sees centroids.npy.
    # The list id is BOTH the partition dir (ivf_part=N -> path-level
    # pruning) and a regular data column (ivf_list -> probed files read in
    # ONE read_parquet call; per-dataset read setup dominated at small k)
    assigned = assigned.map_batches(
        lambda t: t.append_column("ivf_part", t["ivf_list"]),
        batch_format="pyarrow",
    )
    assigned.write_parquet(os.path.join(index_dir, "assign"),
                           partition_cols=["ivf_part"])
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    return cents


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_lists: int = 16,
             nprobe: int = 4, id_col: str = "vec_id",
             emb_col: str = "embedding", train_sample: int = 2048,
             index_dir: str | None = None, train: str = "sample"):
    """IVF approximate top-k: assign vectors to coarse lists once
    (persisted, partitioned by list), then score ONLY the union of the
    ``nprobe`` closest lists per query — pruned at the Parquet read, not
    masked after a full scan.
    """
    import tempfile

    if index_dir is None:
        # fresh scratch index per call; pass index_dir to reuse one across
        # query batches (the intended at-scale usage)
        index_dir = tempfile.mkdtemp(prefix="siren_ray_ivf_")
    cents_path = os.path.join(index_dir, "centroids.npy")
    if os.path.exists(cents_path):
        cents = np.load(cents_path)
    else:
        cents = ivf_build(ds, index_dir, n_lists=n_lists, emb_col=emb_col,
                          train_sample=train_sample, train=train)
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probed_lists = sorted({int(x) for x in probe.ravel()})
    # (n_lists, nq) membership lookup: allowed[list, q] — one fancy-index
    # per batch instead of a per-query isin loop
    probe_mask = np.zeros((len(cents), len(qn)), dtype=bool)
    probe_mask[probe.ravel(),
               np.repeat(np.arange(len(qn)), probe.shape[1])] = True
    queries_ref = ray.put(qn)
    probe_mask_ref = ray.put(probe_mask)

    import ray.data as rd

    # partition-pruned read: ONLY files under the probed ivf_part=N
    # directories are opened (Ray's fragment filter can't bind hive
    # partition fields, so the prune is explicit at the path level —
    # same bytes-read win). One read call over the pruned file list; the
    # row-level list id comes from the duplicated ivf_list data column.
    files = []
    for lst in probed_lists:
        p = os.path.join(index_dir, "assign", f"ivf_part={lst}")
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
    pruned = rd.read_parquet(files)

    class _ProbeScorer:
        def __init__(self):
            self.q = ray.get(queries_ref).T
            self.probe_mask = ray.get(probe_mask_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_scores(id_col)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            lists = batch["ivf_list"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            mat = _normalize(embedding_matrix(batch[emb_col],
                                              dtype=np.float32))
            sims = (mat @ self.q).astype(np.float64)
            # mask out rows whose list a query does not probe; -inf rows
            # are dropped inside _topk_partial
            sims[~self.probe_mask[lists]] = -np.inf
            return _topk_partial(sims, ids, k, id_col)

    partials = pruned.map_batches(
        _ProbeScorer, batch_format="pyarrow", batch_size=4096, concurrency=(1, 2)
    )
    return _merge_topk(partials, k, id_col)


def kmeans_train(ds, n_clusters: int, *, emb_col: str = "embedding",
                 iters: int = 8, seed: int = 3, tol: float = 1e-4,
                 train_sample: int = 2048, combine_partitions: int = 8,
                 pin_input: bool = True) -> np.ndarray:
    """Distributed spherical k-means (Lloyd's) over the FULL dataset.

    The IVF coarse quantizer (:func:`ivf_build`) trains on a driver-side
    sample; this is the full-corpus path: every iteration streams the
    dataset once through ``map_batches``, each batch emitting only a
    (cluster, count, sum-vector) PARTIAL — at most ``n_clusters`` rows of
    ``dim`` float64s per batch, never the vectors themselves. Partials
    are combined two-level (per-batch -> ``combine_partitions`` local
    reducers via a shuffle-free repartition -> driver), so the driver
    reduce is O(combine_partitions * K * dim) regardless of corpus size;
    at extreme block counts raise ``combine_partitions`` (a third level
    is the same combine applied once more, not implemented because the
    second level already caps driver bytes).

    Centroids are broadcast once per iteration (``ray.put``; per-batch
    ``ray.get`` is a zero-copy local read). Initialization draws a
    uniform random sample (per-block Bernoulli — no shuffle, no prefix
    bias, same rationale as :func:`ivf_build`) then seeds by greedy
    farthest-point selection within it. Empty clusters keep their
    previous centroid. Stops early when the max centroid shift (L2) drops below
    ``tol``. Assignment is cosine (vectors and centroids normalized),
    consistent with the IVF probe math. Returns the (K, dim) float32
    centroid matrix — the only driver-side state.

    Engine addition per the task brief (training-data pipelines cluster
    embeddings for curation/balancing); no reference counterpart.
    """
    from ..util import pin_for_multipass

    # one pass per Lloyd iteration (+ the init sample): pin the
    # projected vectors instead of re-reading them `iters` times
    ds = pin_for_multipass(ds, enabled=pin_input)
    n = ds.count()
    if n < n_clusters:
        raise ValueError(f"kmeans_train: {n} rows < n_clusters={n_clusters}")
    take = max(n_clusters, train_sample)
    if n > take:
        frac = min(1.0, (1.25 * take) / n)
        sample = ds.random_sample(frac, seed=seed).to_pandas()
        if len(sample) < n_clusters:
            sample = ds.limit(take).to_pandas()  # unlucky draw fallback
    else:
        sample = ds.to_pandas()
    init = _normalize(np.array(sample[emb_col].tolist(), dtype=np.float64))
    # Greedy farthest-point init (k-means++-flavored, deterministic given
    # the sample SET): each next centroid is the sample point least
    # similar to its nearest chosen centroid. Unlike a random draw this
    # cannot put two seeds in one tight cluster, so convergence does not
    # depend on init luck — important because the Bernoulli sample's
    # contents may vary with block execution order.
    chosen = [0]
    best_sim = init @ init[0]
    for _ in range(1, n_clusters):
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, init @ init[nxt])
    cents = init[chosen]

    dim = cents.shape[1]
    sum_type = pa.list_(pa.float64(), dim)

    def _combine(t: pa.Table) -> pa.Table:
        """Sum partial rows by cluster within one block (vectorized)."""
        if t.num_rows == 0 or "cluster" not in t.schema.names:
            return pa.table({"cluster": pa.array([], pa.int32()),
                             "count": pa.array([], pa.int64()),
                             "vsum": pa.array([], sum_type)})
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        cnt = t["count"].to_numpy(zero_copy_only=False)
        mat = embedding_matrix(t["vsum"], dtype=np.float64)
        sums = np.zeros((n_clusters, dim), dtype=np.float64)
        np.add.at(sums, cl, mat)
        counts = np.bincount(cl, weights=cnt, minlength=n_clusters)
        nz = np.nonzero(counts)[0]
        return pa.table({
            "cluster": pa.array(nz.astype(np.int32), pa.int32()),
            "count": pa.array(counts[nz].astype(np.int64), pa.int64()),
            "vsum": pa.FixedSizeListArray.from_arrays(
                pa.array(sums[nz].ravel(), pa.float64()), dim),
        })

    for _ in range(iters):
        cents_ref = ray.put(cents.T.astype(np.float32))  # (dim, K)

        def _partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or emb_col not in batch.schema.names:
                return pa.table({"cluster": pa.array([], pa.int32()),
                                 "count": pa.array([], pa.int64()),
                                 "vsum": pa.array([], sum_type)})
            c = ray.get(cents_ref)
            mat = _normalize(embedding_matrix(batch[emb_col],
                                              dtype=np.float32))
            assign = np.argmax(mat @ c, axis=1)
            sums = np.zeros((n_clusters, dim), dtype=np.float64)
            np.add.at(sums, assign, mat.astype(np.float64))
            counts = np.bincount(assign, minlength=n_clusters)
            nz = np.nonzero(counts)[0]
            return pa.table({
                "cluster": pa.array(nz.astype(np.int32), pa.int32()),
                "count": pa.array(counts[nz].astype(np.int64), pa.int64()),
                "vsum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums[nz].ravel(), pa.float64()), dim),
            })

        reduced = (
            ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=4096)
            .repartition(combine_partitions)
            .map_batches(_combine, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        sums = np.zeros((n_clusters, dim), dtype=np.float64)
        counts = np.zeros(n_clusters, dtype=np.int64)
        if len(reduced):
            cl = reduced["cluster"].to_numpy()
            np.add.at(sums, cl,
                      np.array(reduced["vsum"].tolist(), dtype=np.float64))
            np.add.at(counts, cl, reduced["count"].to_numpy())
        new = cents.copy()
        nz = counts > 0
        means = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(means, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        new[nz] = means / norms
        shift = float(np.max(np.linalg.norm(new - cents, axis=1)))
        cents = new
        if shift < tol:
            break
    return cents.astype(np.float32)


def kmeans_predict(ds, centroids: np.ndarray, *,
                   emb_col: str = "embedding", concurrency: int = 2):
    """Append an ``ivf_list`` cluster-id column (cosine argmax against the
    broadcast centroid matrix) — the assignment half of k-means, shared
    with the IVF index build."""
    cents_ref = ray.put(np.asarray(centroids, dtype=np.float32))
    return ds.map_batches(
        _IVFAssign,
        fn_constructor_kwargs={"cents_ref": cents_ref, "emb_col": emb_col},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )


def cosine_pairs_exact(ds, id_col: str = "vec_id", emb_col: str = "embedding",
                       *, threshold: float = 0.9, num_blocks: int = 16):
    """Exact all-pairs cosine similarity join: every unordered pair with
    cosine >= threshold, as (id_a < id_b) rows.

    Block-decomposed: vectors split into B blocks; each of the
    B(B+1)/2 block pairs is one raw Ray task doing a single float64
    matmul, so the O(n^2) work distributes evenly and no task holds more
    than two blocks. This is deliberately the EXACT kernel — ground
    truth for recall evaluation of the LSH paths
    (:func:`siren_ray.stages.dedup.embedding_neardup_pairs`) and the
    SQL-oracle-checkable member of the similarity family; at corpus
    scale the LSH/IVF paths answer the same question in sub-quadratic
    time. Math in float64 so the threshold decision agrees with a
    double-precision SQL oracle; pick thresholds away from the data's
    similarity values (the driver's hash compare is exact).
    """
    import ray.data as rd

    @ray.remote
    def _prep(tbl):
        from ..util import ensure_arrow

        tbl = ensure_arrow(tbl)
        if tbl.num_rows == 0 or id_col not in tbl.schema.names:
            return (np.empty(0, dtype=np.int64),
                    np.empty((0, 1), dtype=np.float64))
        ids = np.asarray(tbl[id_col], dtype=np.int64)
        mat = _normalize(embedding_matrix(tbl[emb_col], dtype=np.float64))
        return ids, mat

    @ray.remote
    def _block_pair(prep_i, prep_j, same: bool):
        ids_i, mat_i = prep_i
        ids_j, mat_j = prep_j
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if not len(ids_i) or not len(ids_j):
            return empty
        sims = mat_i @ mat_j.T
        if same:
            ia, ib = np.triu_indices(len(ids_i), k=1)
            keep = sims[ia, ib] >= threshold
            a, b = ids_i[ia[keep]], ids_j[ib[keep]]
        else:
            ia, ib = np.nonzero(sims >= threshold)
            a, b = ids_i[ia], ids_j[ib]
        return pa.table({"id_a": pa.array(np.minimum(a, b), pa.int64()),
                         "id_b": pa.array(np.maximum(a, b), pa.int64())})

    preps = [_prep.remote(b)
             for b in ds.repartition(num_blocks).to_arrow_refs()]
    parts = [
        _block_pair.remote(preps[i], preps[j], i == j)
        for i in range(len(preps))
        for j in range(i, len(preps))
    ]
    return rd.from_arrow_refs(parts)


# --- Product quantization (memory-compression scale path) ------------------

_PQ_CACHE: dict = {}


def _pq_cached(ref):
    """Process-global cache for broadcast PQ state (task pool, not actor
    pool — the codebooks/LUTs are tiny; per CLAUDE.md tiny-state stages
    stay task pools with per-worker caches)."""
    if isinstance(ref, ray.ObjectRef):
        key = ref.hex()
        val = _PQ_CACHE.get(key)
        if val is None:
            if len(_PQ_CACHE) > 8:
                _PQ_CACHE.clear()
            val = _PQ_CACHE[key] = ray.get(ref)
        return val
    return ref


def _kmeans_l2(sub: np.ndarray, k: int, iters: int,
               rng: np.random.RandomState) -> np.ndarray:
    """Plain L2 Lloyd's on one subspace sample (driver-side, tiny —
    PQ codebook training is sample-based in any production system).
    Empty cells keep their previous centroid (deterministic)."""
    k = min(k, len(sub))
    cents = sub[rng.choice(len(sub), size=k, replace=False)].copy()
    for _ in range(iters):
        # ||x-c||^2 argmin == argmin(-2 x.c + ||c||^2); skip ||x||^2
        d = -2.0 * (sub @ cents.T) + (cents * cents).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        for c in range(k):
            members = sub[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def pq_train(sample: np.ndarray, *, m: int = 8, nbits: int = 8,
             iters: int = 12, seed: int = 5) -> np.ndarray:
    """Train product-quantization codebooks (Jegou et al. 2011,
    "Product quantization for nearest neighbor search") on a sample:
    the vector is split into ``m`` subspaces and each gets an
    independent L2 k-means codebook of ``2**nbits`` (or fewer, when the
    sample is smaller) centroids. Samples are L2-normalized first so
    asymmetric-distance inner product == cosine at query time.

    Returns ``(m, k, dim/m)`` float32 codebooks — the only state the
    encode/search stages need (a few hundred KB; broadcast once).
    """
    if nbits > 8:
        raise ValueError("nbits > 8 does not fit uint8 codes")
    sample = _normalize(np.asarray(sample, dtype=np.float32))
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    k = min(2 ** nbits, n)
    books = np.empty((m, k, dsub), dtype=np.float32)
    for j in range(m):
        books[j] = _kmeans_l2(
            np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub]),
            k, iters, rng)
    return books


def _pq_assign(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) normalized -> (n, m) uint8 nearest-centroid codes."""
    n = len(mat)
    m, _, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        d = (-2.0 * (sub @ books[j].T)
             + (books[j] * books[j]).sum(axis=1)[None, :])
        codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
    return codes


def _codes_matrix(col, m: int) -> np.ndarray:
    """fixed_size_list<uint8, m> column -> (n, m) ndarray (buffer view,
    offset-safe via flatten)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    return np.asarray(flat, dtype=np.uint8).reshape(-1, m)


def pq_encode(ds, books, *, id_col: str = "vec_id",
              emb_col: str = "embedding", keep_cols: tuple = ()):
    """Map-only PQ encode: each ``d``-dim float32 vector becomes ``m``
    uint8 codes — e.g. 64-dim x 4 B = 256 B down to 8 B (32x), which is
    what lets a 100 TB embedding corpus live in cluster RAM for search.
    Output schema: (id_col, pq_code fixed_size_list<uint8, m>, *keep_cols).
    Task pool with a process-global codebook cache."""
    books_ref = books if isinstance(books, ray.ObjectRef) else ray.put(
        np.asarray(books, dtype=np.float32))
    m = int(_pq_cached(books_ref).shape[0])

    def _enc(t: pa.Table) -> pa.Table:
        cols = {id_col: t[id_col] if t.num_rows else pa.array([], pa.int64())}
        if t.num_rows == 0:
            cols["pq_code"] = pa.array(
                [], pa.list_(pa.uint8(), m))
            for c in keep_cols:
                cols[c] = t[c]
            return pa.table(cols)
        b = _pq_cached(books_ref)
        mat = _normalize(embedding_matrix(t[emb_col], dtype=np.float32))
        codes = _pq_assign(mat, b)
        cols["pq_code"] = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), pa.uint8()), m)
        for c in keep_cols:
            cols[c] = t[c]
        return pa.table(cols)

    return ds.map_batches(_enc, batch_format="pyarrow")


def pq_topk(codes_ds, queries: np.ndarray, books, k: int = 10, *,
            id_col: str = "vec_id"):
    """Asymmetric-distance (ADC) approximate cosine top-k over PQ codes:
    each query precomputes an (m, k_codebook) lookup table of subspace
    inner products against the codebooks; scoring a batch is ONE fancy
    -index gather + sum over the uint8 codes — no vector decode, no
    float matrix in flight. Broadcast state is the LUT (m*k*nq floats).
    Returns (query_id, id_col, cosine) with the same merge/tie-break
    contract as :func:`brute_force_topk`."""
    books = (_pq_cached(books) if isinstance(books, ray.ObjectRef)
             else np.asarray(books, dtype=np.float32))
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    m, kc, dsub = books.shape
    nq = len(qn)
    # lut[j, c, q] = books[j, c] . q[j-th subspace]
    lut = np.einsum("mkd,qmd->mkq", books,
                    qn.reshape(nq, m, dsub)).astype(np.float32)
    lut_ref = ray.put(lut)
    jj = np.arange(m, dtype=np.int64)[None, :]

    def _score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_scores(id_col)
        L = _pq_cached(lut_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        codes = _codes_matrix(t["pq_code"], m).astype(np.int64)
        sims = L[jj, codes, :].sum(axis=1).astype(np.float64)  # (n, nq)
        return _topk_partial(sims, ids, k, id_col)

    partials = codes_ds.map_batches(_score, batch_format="pyarrow",
                                    batch_size=4096)
    return _merge_topk(partials, k, id_col)


def pq_topk_rerank(vectors_ds, codes_ds, queries: np.ndarray, books,
                   k: int = 10, *, shortlist: int = 64,
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """ADC shortlist -> exact re-rank, the production PQ recipe (Jégou
    et al. 2011's IVFADC + re-ranking): :func:`pq_topk` fetches each
    query's ``shortlist`` candidates from the 8-byte codes (quantized,
    cheap), then ONE map-only pass over the original vectors computes
    exact cosine for shortlisted (vector, query) pairs only. Recall is
    now set by shortlist depth, not quantization distortion — ADC-alone
    recall@10 decays as the corpus grows (true neighbors bunch tighter
    than the quantization error) while the re-ranked path holds, at
    exact-scoring cost O(nq * shortlist) instead of O(n).

    Broadcast state: sorted candidate ids + an (n_cand, nq) allowed
    mask — nq * shortlist entries, tiny at any corpus size. No shuffle
    beyond the two _merge_topk exchanges; the vector pass is map-only."""
    short = pq_topk(codes_ds, queries, books, k=shortlist,
                    id_col=id_col).to_pandas()
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    nq = len(qn)
    cand_ids = np.unique(short[id_col].to_numpy())
    allowed = np.zeros((len(cand_ids), nq), dtype=bool)
    pos = np.searchsorted(cand_ids, short[id_col].to_numpy())
    allowed[pos, short["query_id"].to_numpy()] = True
    state_ref = ray.put((cand_ids, allowed, qn.T))  # (dim, nq)

    def _exact(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_scores(id_col)
        cids, mask, qt = _pq_cached(state_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        p = np.searchsorted(cids, ids)
        ok = p < len(cids)
        pc = np.where(ok, p, 0)
        hit = ok & (cids[pc] == ids)
        if not hit.any():
            return _empty_scores(id_col)
        sub = t.filter(pa.array(hit))
        mat = _normalize(embedding_matrix(sub[emb_col], dtype=np.float32))
        sims = (mat @ qt).astype(np.float64)  # (n_hit, nq)
        sims[~mask[pc[hit]]] = -np.inf  # not this query's candidate
        return _topk_partial(sims, ids[hit], k, id_col)

    partials = vectors_ds.map_batches(_exact, batch_format="pyarrow",
                                      batch_size=4096)
    return _merge_topk(partials, k, id_col)
