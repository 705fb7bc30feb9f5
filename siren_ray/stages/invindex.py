"""Materialized inverted index: term-bucketed Parquet postings.

``stages/retrieval.py`` answers "top-k docs for these queries NOW" in
one streaming pass over the text; this module is the other retrieval
shape — build the postings table ONCE, then answer unlimited term
lookups touching only the bucket directories (and row groups) the probe
terms hash into. The 100 TB use case is corpus forensics over a
finished crawl: "which documents contain this token, how often" without
re-streaming text bytes.

Reference parity: the reference has no retrieval surface; this extends
the task brief's similarity-search family on the lexical side,
mirroring the CDX index's layout discipline (``stages/cdxindex.py``):
partition-pruned Parquet + scan-pushed filters, no index rows held on
the driver.

Scale shape:
- BUILD is map-only plus one hive-partitioned WRITE — there is no
  all-to-all exchange. Each input block explodes to exact
  ``(word, doc_id, tf)`` postings (exact within a batch because one
  input row holds one whole document — the same argument as
  ``lines.doc_frequency``) and Ray's partitioned write splits each
  block's postings under ``bucket=hash64(word) % num_buckets``
  directories. Every posting for one term lives in exactly one bucket
  directory.
- LOOKUP hashes the probe terms, reads ONLY their bucket directories,
  and pushes ``word isin terms`` into the Parquet scan, so lookup cost
  is O(buckets touched), never O(index).
- Per-(block, bucket) partition splits produce many small files on a
  wide build; that is the output-maintenance concern
  ``stages/compact.py`` exists for, same as every hive-partitioned
  sink here.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import hash_strings
from .lines import _split_lines


def build_inverted_index(docs_ds, out_dir: str, *,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         num_buckets: int = 32) -> dict:
    """Explode documents into exact ``(word, doc_id, tf)`` postings and
    write them hive-partitioned on ``bucket = hash64(word) %
    num_buckets``. Tokenization is a plain single-space split (the
    corpus-wide convention shared with ``doc_frequency`` and its DuckDB
    oracle); empty tokens from repeated separators post like any other
    token, so the layout is a pure function of the bytes.

    Returns ``{"out_dir", "num_buckets"}`` — the lookup handle.
    """

    def _postings(t: pa.Table) -> pa.Table:
        flat, parents = _split_lines(t, text_col, " ")
        ids_col = t[id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        ids = ids_col.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "word": flat.to_numpy(zero_copy_only=False),
            "doc_id": ids[parents],
        })
        g = (df.groupby(["word", "doc_id"], sort=False)
               .size().reset_index(name="tf"))
        words = g["word"].to_numpy(object)
        bucket = (hash_strings(words) % np.uint64(num_buckets)).astype(
            np.int64)
        return pa.table({
            "word": pa.array(words, pa.string()),
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64),
                               pa.int64()),
            "tf": pa.array(g["tf"].to_numpy(np.int64), pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
        })

    (docs_ds.map_batches(_postings, batch_format="pyarrow")
            .write_parquet(out_dir, partition_cols=["bucket"]))
    return {"out_dir": out_dir, "num_buckets": num_buckets}


def lookup_postings(index: dict, terms: list[str]):
    """Postings for ``terms``: a Dataset of ``(word, doc_id, tf)``.

    Reads only the bucket directories the terms hash into and pushes
    the term membership filter into the Parquet scan. Returns
    ``(dataset, info)`` where ``info`` reports
    ``{"buckets_read", "num_buckets"}`` so callers can assert pruning
    effectiveness the way the IVF / CDX lookups do.
    """
    import pyarrow.dataset as pads
    import ray.data as rd

    num_buckets = index["num_buckets"]
    out_dir = index["out_dir"]
    import glob

    want = np.unique(hash_strings(list(terms)) % np.uint64(num_buckets))
    dirs = [os.path.join(out_dir, f"bucket={int(b)}") for b in want]
    dirs = [d for d in dirs if os.path.isdir(d)]
    paths = sorted(p for d in dirs
                   for p in glob.glob(os.path.join(d, "*.parquet")))
    info = {"buckets_read": len(dirs), "num_buckets": num_buckets}
    if not paths:
        empty = pa.table({"word": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64()),
                          "tf": pa.array([], pa.int64())})
        return rd.from_arrow(empty), info
    ds = rd.read_parquet(
        paths, columns=["word", "doc_id", "tf"],
        filter=pads.field("word").isin(list(terms)))
    return ds, info
