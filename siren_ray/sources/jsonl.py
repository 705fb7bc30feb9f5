"""JSONL shard source/sink — the text-corpus interchange format.

Released web-text corpora (C4, The Pile, Dolma, RedPajama) ship as
gzipped JSONL: one JSON object per line, one shard file per writer
task. The engine's native layout is Parquet, but a user exchanging
data with those pipelines needs this edge in both directions. Same
scale shape as the WARC module (`sources/warc.py`): one shard per
write task, reading via ``ray.data.read_binary_files`` (files are the
parallelism unit) followed by a map-only per-file line split + parse —
no shuffle anywhere. Malformed lines are counted and skipped
(recorded-drop semantics, F4-style), never raised, so one corrupt
shard cannot kill a 100 TB ingest.

Line canonicalization: ``json.dumps(sort_keys=True, ensure_ascii=False,
separators=(",", ":"))``. JSON escapes newlines inside values, so one
record is always exactly one line, and str/int/float/bool/null values
round-trip exactly (proved by the ``jsonl_roundtrip`` oracle query).
"""
from __future__ import annotations

import gzip
import json
import os

import pyarrow as pa
import ray

# per-worker-process write counter keyed by task id — same idempotency
# discipline as warc._WRITE_SEQ: a re-executed task restarts at 0 and
# replays identically, so os.replace overwrites identical bytes
_WRITE_SEQ: dict[str, int] = {}


def _shard_name(blob: bytes, tid: str, seq: int, ext: str) -> str:
    """Deterministic shard identity = (content hash, task id, per-task
    sequence); see warc._shard_name for the at-least-once rationale."""
    import hashlib

    base = hashlib.md5(blob).hexdigest()[:16]
    suffix = hashlib.md5(f"{tid}:{seq}".encode()).hexdigest()[:8]
    return f"{base}-{suffix}{ext}"


def encode_jsonl(table: pa.Table, columns: list[str] | None = None) -> bytes:
    """Canonical JSONL bytes for a block (deterministic: sorted keys,
    compact separators, raw UTF-8)."""
    cols = list(columns) if columns is not None else table.column_names
    data = {c: table[c].to_pylist() for c in cols}
    lines = []
    for i in range(table.num_rows):
        rec = {c: data[c][i] for c in cols}
        lines.append(json.dumps(rec, sort_keys=True, ensure_ascii=False,
                                separators=(",", ":")))
    return ("\n".join(lines) + "\n").encode() if lines else b""


def write_jsonl_shards(ds, out_dir: str, *,
                       columns: list[str] | None = None,
                       compress: bool = True) -> int:
    """Write a Dataset as one `.jsonl[.gz]` shard per block, each
    written by the task that owns the block (no driver funnel).
    Idempotent under Ray's at-least-once execution: deterministic
    shard names + atomic ``os.replace`` (see warc.write_warc_shards).
    Returns the number of shards written."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl.gz" if compress else ".jsonl"

    def _write(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        raw = encode_jsonl(t, columns)
        # mtime=0 => byte-deterministic gzip stream, required for the
        # content-hash shard identity to be stable across re-execution
        blob = gzip.compress(raw, mtime=0) if compress else raw
        import tempfile

        try:
            tid = ray.get_runtime_context().get_task_id() or "driver"
        except Exception:
            tid = "driver"
        seq = _WRITE_SEQ.get(tid, 0)
        _WRITE_SEQ[tid] = seq + 1
        name = _shard_name(blob, tid, seq, ext)
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


def parse_jsonl_bytes(raw: bytes):
    """(records, n_malformed) from one shard's bytes. Transparent
    multi-member gzip (magic-byte sniff); undecodable blob => all
    lines counted malformed, never raised."""
    if raw[:2] == b"\x1f\x8b":
        try:
            raw = gzip.decompress(raw)
        except (OSError, EOFError):
            return [], 1
    recs, bad = [], 0
    for line in raw.split(b"\n"):
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except (json.JSONDecodeError, UnicodeDecodeError):
            bad += 1
            continue
        if not isinstance(obj, dict):
            bad += 1
            continue
        recs.append(obj)
    return recs, bad


def read_jsonl(path: str, *, columns: list[str] | None = None):
    """Dataset over `.jsonl` / `.jsonl.gz` shard files -> one row per
    JSON object, plus a ``shard`` provenance column.

    ``columns`` fixes the output schema (missing keys -> null) — pass
    it in production so every block agrees on schema regardless of
    which keys its shard happens to contain. When None, each task
    infers the sorted union of keys it sees (fine for homogeneous
    corpora, documented risk otherwise)."""
    import ray.data as rd

    # extension filter: staging tmps (".tmp-*") and sidecars must never
    # be parsed as shards (read_binary_files does NOT skip hidden files)
    ds = rd.read_binary_files(path, include_paths=True,
                              file_extensions=["jsonl", "gz", "json"])

    def _parse(t: pa.Table) -> pa.Table:
        import logging

        recs, shards = [], []
        malformed = 0
        for raw, p in zip(t["bytes"].to_pylist(), t["path"].to_pylist()):
            got, bad = parse_jsonl_bytes(raw)
            malformed += bad
            recs.extend(got)
            shards.extend([os.path.basename(p)] * len(got))
        if malformed:
            logging.getLogger(__name__).warning(
                "read_jsonl: skipped %d malformed lines", malformed)
        if columns is not None:
            cols = list(columns)
        else:
            keys = set()
            for r in recs:
                keys.update(r)
            cols = sorted(keys)
        out = {c: pa.array([r.get(c) for r in recs]) for c in cols}
        out["shard"] = pa.array(shards, pa.string())
        return pa.table(out)

    return ds.map_batches(_parse, batch_format="pyarrow")
