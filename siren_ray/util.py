"""Small shared utilities: deterministic hashing, URL helpers.

Hashing must be deterministic across processes and parallelism levels so the
URL-seen set and crawl order are identical at num_cpus=8 and num_cpus=32
(SURVEY.md §7 "Seen-filter atomicity across parallelism levels").
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# pandas' hash_array uses SipHash-1-3 with this fixed key -> stable across
# processes/machines (no PYTHONHASHSEED dependence).
_HASH_KEY = "0123456789123456"


def hash_strings(values, categorize: bool = False) -> np.ndarray:
    """Vectorized, deterministic 64-bit hash of a string array-like.

    Returns uint64 ndarray. Used for URL-seen fingerprints and hash
    partitioning (host buckets, url buckets).

    ``categorize=True`` factorizes first and hashes each DISTINCT value
    once — bit-identical output (asserted in tests), ~3-4x faster on
    repeat-heavy inputs like word token streams; leave False for
    mostly-unique inputs (URLs), where factorizing only adds a
    hashtable build.

    The factorize step deliberately goes through Arrow's
    ``dictionary_encode`` rather than ``pd.util.hash_array``'s own
    ``categorize=True``: pandas (observed on 2.2.2) factorizes object
    strings through a C-string hashtable that stops comparing at an
    embedded NUL, so ``''`` and ``'\\x00'`` collapse to ONE category and
    get the same hash — wrong for crawled bytes, where whitespace-split
    tokens can carry NULs. Arrow compares by (length, bytes), the
    uniques then hash through the exact same per-element SipHash as the
    direct path, and a gather maps them back — bit-identical on every
    input (hypothesis-asserted), same repeat-heavy speedup.
    """
    arr = np.asarray(values, dtype=object)
    if categorize and len(arr):
        import pyarrow as pa

        try:
            enc = pa.array(arr, type=pa.large_string()).dictionary_encode()
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            enc = None  # non-string objects: direct path handles them
        if enc is not None and enc.null_count == 0:
            uniq = np.asarray(enc.dictionary.to_pylist(), dtype=object)
            uh = pd.util.hash_array(uniq, hash_key=_HASH_KEY,
                                    categorize=False)
            return uh[enc.indices.to_numpy(zero_copy_only=False)]
    # NOTE: pandas' own default is categorize=True — always pass False
    # here (the NUL-collapsing path this function exists to avoid).
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def hash_string(value: str) -> int:
    return int(hash_strings([value])[0])


def host_of(url: str) -> str:
    """Extract the host from an http(s) URL (no stdlib urlparse in hot path)."""
    # "https://host/path" -> host
    start = url.find("//")
    if start == -1:
        return ""
    start += 2
    end = url.find("/", start)
    return url[start:] if end == -1 else url[start:end]


def path_of(url: str) -> str:
    start = url.find("//")
    if start == -1:
        return url
    end = url.find("/", start + 2)
    return "" if end == -1 else url[end:]


def hosts_of(urls) -> np.ndarray:
    """Vectorized host extraction via pandas string ops."""
    s = pd.Series(urls, dtype="object")
    return s.str.extract(r"^[a-z]+://([^/]+)", expand=False).fillna("").to_numpy()


def paths_of(urls) -> np.ndarray:
    s = pd.Series(urls, dtype="object")
    return s.str.replace(r"^[a-z]+://[^/]*", "", regex=True).to_numpy()


def embedding_matrix(col, dtype=np.float32) -> np.ndarray:
    """Decode an Arrow list<float> column to a dense (n, dim) ndarray
    WITHOUT materializing Python lists: list_flatten -> to_numpy is a
    buffer view (one cast at most), vs ``to_pylist()``'s per-element
    Python objects — the dominant cost on the ANN/LSH hot paths.

    Requires equal-length lists with no null elements (the embedding
    table contract); raises if ragged.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    dim = int(lengths[0])
    if not (lengths == dim).all():
        raise ValueError("ragged embedding column: lengths vary")
    flat = pc.list_flatten(col)
    return flat.to_numpy(zero_copy_only=False).reshape(n, dim).astype(
        dtype, copy=False)


def pin_for_multipass(ds, *, enabled: bool = True):
    """Materialize a Dataset that a multi-pass operator will consume
    more than once (LSH + verify + components + anti-join; k-means
    iterations; two-pass line stats). Ray Data has no lineage cache, so
    every extra pass otherwise RE-EXECUTES the upstream read+transform
    chain. Pinning trades object-store residency (with spill) for those
    re-reads — the right call for the projected (id, text)/(id, vector)
    inputs these operators take, which are far smaller than the raw
    corpus. Callers streaming a projection too large even for spill can
    pass ``enabled=False`` (or pre-materialize a cheaper projection
    themselves) and keep re-read semantics.
    """
    if not enabled:
        return ds
    try:
        return ds.materialize()
    except Exception:
        return ds


def ensure_arrow(block):
    """Coerce a Dataset block to ``pyarrow.Table``.

    ``Dataset.to_arrow_refs()`` usually yields Arrow blocks, but a
    pipeline whose tail fused through a pandas ``map_groups`` stage can
    surface pandas blocks (observed on empty blocks under operator
    fusion). Every raw-task consumer of block refs goes through this
    guard instead of assuming the type.
    """
    import pandas as pd
    import pyarrow as pa

    if isinstance(block, pa.Table):
        return block
    if isinstance(block, pd.DataFrame):
        return pa.Table.from_pandas(block, preserve_index=False)
    return pa.table(block)
