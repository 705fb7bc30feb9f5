"""WARC-style gzip source — Common-Crawl-shaped ingest plumbing.

Real web-scale corpora arrive as WARC: concatenated per-record gzip
members (each record its own member so readers can split files without
decompressing the whole archive). The engine's corpus is Parquet, but a
user switching from a crawl archive needs the ingest edge: this module
writes and reads the standard layout with stdlib gzip/zlib only.

Scale shape: one `.warc.gz` shard per write task; reading is
``ray.data.read_binary_files`` (files are the parallelism unit; Ray
schedules one task per file) followed by a map-only per-file member
split + header parse — no shuffle anywhere. Truncated or malformed
members are counted and skipped (recorded-drop semantics, F4-style),
never raised, so one corrupt shard cannot kill a 100 TB ingest.

Record format written (WARC/1.0 response records):
  WARC headers (Target-URI, Date, Content-Length) -> HTTP/1.1 200
  response header -> body. Parsing accepts any WARC file of this
  common shape, not just our own output.
"""
from __future__ import annotations

import gzip
import os
import zlib
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import ray

_CRLF = b"\r\n"

def _warc_record(url: str, ts: datetime, body: bytes,
                 content_type: str = "text/html") -> bytes:
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: " + content_type.encode() + _CRLF
        + b"Content-Length: " + str(len(body)).encode() + _CRLF
        + _CRLF + body
    )
    date = ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
    rec = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + date + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF + http + _CRLF + _CRLF
    )
    # mtime=0: gzip's default header timestamp is WALL-CLOCK, which
    # would make shard bytes (and their content-hash names) differ
    # between a task and its retry — deterministic output is what makes
    # the write idempotent under at-least-once execution
    return gzip.compress(rec, compresslevel=1, mtime=0)


def _shard_name(blob: bytes, tid: str) -> str:
    """Deterministic shard identity: (content hash, task id). A
    re-executed task recomputes the same name (same tid,
    byte-deterministic blobs — see mtime=0 above), so its os.replace
    overwrites identical bytes instead of duplicating. NO per-process
    counter: a retry scheduled onto the SAME still-alive worker used to
    continue the old counter and mint fresh names for replayed batches
    — doubled shards, the exact failure the deterministic naming
    exists to prevent. Two identical-content blocks in different tasks
    still both survive (different tid); byte-identical batches within
    ONE task collapse to one shard — indistinguishable from a replay
    by construction, and the only case given up."""
    import hashlib

    base = hashlib.md5(blob).hexdigest()[:16]
    suffix = hashlib.md5(tid.encode()).hexdigest()[:8]
    return f"{base}-{suffix}.warc.gz"


def write_warc_shards(ds, out_dir: str, *, url_col: str = "url",
                      ts_col: str = "warc_ts", body_col: str = "html",
                      content_type: str = "text/html") -> int:
    """Write one `.warc.gz` member-concatenated shard per block (the
    actor/task that owns the block writes it — no driver funnel).
    Returns the number of shards written."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        urls = t[url_col].to_pylist()
        bodies = t[body_col].to_pylist()
        tss = t[ts_col].to_pylist()
        parts = []
        for u, ts, b in zip(urls, tss, bodies):
            if ts is None:
                ts = datetime(1970, 1, 1, tzinfo=timezone.utc)
            if isinstance(b, str):
                b = b.encode()
            parts.append(_warc_record(u, ts, b or b"", content_type))
        blob = b"".join(parts)
        # DETERMINISTIC shard identity = (content hash, task id): see
        # _shard_name — idempotent under Ray's at-least-once execution
        # even when a retry lands on the same still-alive worker.
        # Consequence unchanged: write into a FRESH directory per run
        # (a rerun is a new driver task id and would add, not overwrite).
        import tempfile

        try:
            tid = ray.get_runtime_context().get_task_id() or "driver"
        except Exception:
            tid = "driver"
        name = _shard_name(blob, tid)
        # unique "."-prefixed tmp per writer, atomic full-content
        # swap-in; a crash between write and replace leaves an orphan
        # that read_warc's extension filter never ingests (a doubled
        # shard would silently double records)
        tf = tempfile.NamedTemporaryFile(dir=out_dir, prefix=".tmp-",
                                         delete=False)
        tmp = tf.name
        with tf:
            tf.write(blob)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"shard": pa.array([name]),
                         "n_records": pa.array([t.num_rows], pa.int64())})

    manifest = ds.map_batches(_write, batch_format="pyarrow").to_pandas()
    return len(manifest)


def _split_members(blob: bytes):
    """Yield decompressed gzip members from a concatenated stream.
    On a corrupt/truncated member, yields the sentinel ``None`` LAST
    (the remaining bytes are undecodable without resync info) so the
    caller can COUNT the loss instead of silently stopping."""
    pos = 0
    view = memoryview(blob)  # per-member tail SLICES of a big shard
    # were O(members^2) memcpy — ~500 GB of copying for a 100 MB shard
    # of 10k per-record members; a memoryview slice is zero-copy
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(view[pos:])
        except zlib.error:
            yield None
            return
        if not d.eof:  # truncated final member
            yield None
            return
        yield out
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            yield None
            return
        pos += consumed


def _split_records_plain(blob: bytes):
    """Yield WARC records from a DECOMPRESSED concatenated stream by
    walking header Content-Lengths (the uncompressed .warc layout; also
    what Ray's read_binary_files hands us after its automatic
    by-extension gunzip of .warc.gz, which spans gzip members)."""
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = blob.find(_CRLF + _CRLF, start)
        if head_end < 0:
            return
        length = -1
        for line in blob[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                try:
                    length = int(v.strip())
                except ValueError:
                    pass
                break
        if length < 0:
            return
        end = head_end + 4 + length
        yield blob[start:min(end, n)]
        pos = end


def _split_any(blob: bytes):
    """Dispatch on framing: gzip members vs plain record stream."""
    if blob[:2] == b"\x1f\x8b":
        yield from _split_members(blob)
    else:
        yield from _split_records_plain(blob)


def _parse_record(rec: bytes):
    """WARC record bytes -> (url, date_str, body bytes); None for a
    MALFORMED record; False for a well-formed record of a non-response
    type (warcinfo/request/metadata — real WARC files interleave these;
    skipping them is normal, not corruption)."""
    head_end = rec.find(_CRLF + _CRLF)
    if head_end < 0 or not rec.startswith(b"WARC/"):
        return None
    headers = {}
    for line in rec[:head_end].split(_CRLF)[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower()] = v.strip()
    if headers.get(b"warc-type") != b"response":
        return False
    url = headers.get(b"warc-target-uri")
    date = headers.get(b"warc-date")
    try:
        length = int(headers.get(b"content-length", b"-1"))
    except ValueError:
        return None
    if url is None or length < 0:
        return None
    content = rec[head_end + 4:head_end + 4 + length]
    # payload = HTTP response -> body after its own header block
    http_end = content.find(_CRLF + _CRLF)
    body = content[http_end + 4:] if http_end >= 0 else content
    return url.decode(), (date or b"").decode(), body


def warc_to_corpus(warc_path: str, pages_dir: str, *,
                   num_buckets: int = 128) -> str:
    """WARC archive -> the crawl engine's bucketed pages layout: hive
    ``bucket=hash64(url) % num_buckets`` partitioned Parquet with
    (url, warc_ts, html) — EXACTLY the layout ``fetch_mode="bucketed"``
    partition-prunes (stages/fetch.py ``_bucket_table``), so an archive
    ingest feeds the fetch join directly with frontier and pages
    co-partitioned by url hash.

    Scale shape: map-only end to end — per-file member split + header
    parse (read_warc), vectorized bucket assignment, and a partitioned
    ``write_parquet`` (each task routes its own rows into bucket dirs;
    no shuffle). A failed ingest re-runs per WARC file. Use the same
    ``num_buckets`` as ``CrawlConfig.num_buckets``.
    """
    from ..util import hash_strings

    def _bucket(t: pa.Table) -> pa.Table:
        b = (hash_strings(t["url"].to_pylist())
             % np.uint64(num_buckets)).astype(np.int32)
        return t.drop_columns(["shard"]).append_column(
            "bucket", pa.array(b, pa.int32()))

    read_warc(warc_path).map_batches(
        _bucket, batch_format="pyarrow"
    ).write_parquet(pages_dir, partition_cols=["bucket"])
    return pages_dir


def read_warc(path: str, *, text: bool = False):
    """Dataset over `.warc.gz` shard files -> rows (url, warc_ts,
    html|text, shard). ``text=True`` decodes bodies as UTF-8 strings
    (lossy-replace) for text/plain archives."""
    import ray.data as rd

    # extension filter: only archive files are shards — staging tmps
    # (".tmp-*" from an interrupted writer) and stray sidecars must
    # never be decompressed as records (read_binary_files does NOT skip
    # hidden files the way Parquet dataset discovery does)
    ds = rd.read_binary_files(path, include_paths=True,
                              file_extensions=["gz", "warc", "arc"])

    def _parse(t: pa.Table) -> pa.Table:
        import logging

        urls, dates, bodies, shards = [], [], [], []
        malformed = ignored = corrupt_shards = 0
        for raw, p in zip(t["bytes"].to_pylist(), t["path"].to_pylist()):
            shard = os.path.basename(p)
            for rec in _split_any(raw):
                if rec is None:  # corrupt gzip member sentinel
                    corrupt_shards += 1
                    continue
                parsed = _parse_record(rec)
                if parsed is None:
                    malformed += 1
                    continue
                if parsed is False:  # warcinfo/request/metadata: normal
                    ignored += 1
                    continue
                u, d, b = parsed
                urls.append(u)
                # per-record defensive parse: one bad date must not
                # kill the ingest task (recorded-drop contract)
                try:
                    dates.append(np.datetime64(d.rstrip("Z") or "NaT",
                                               "us"))
                except ValueError:
                    dates.append(np.datetime64("NaT", "us"))
                bodies.append(b)
                shards.append(shard)
        if malformed or corrupt_shards:
            logging.getLogger(__name__).warning(
                "read_warc: skipped %d malformed records; %d shards had "
                "a corrupt gzip member (their remaining records are "
                "unrecoverable)", malformed, corrupt_shards)
        ts = pa.array(
            np.array(dates, dtype="datetime64[us]")
            if dates else np.empty(0, dtype="datetime64[us]"),
            pa.timestamp("us"))
        body_arr = (
            pa.array([b.decode("utf-8", "replace") for b in bodies],
                     pa.string())
            if text else pa.array(bodies, pa.binary()))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            ("text" if text else "html"): body_arr,
            "shard": pa.array(shards, pa.string()),
        })

    return ds.map_batches(_parse, batch_format="pyarrow")
