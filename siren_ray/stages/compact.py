"""Parquet small-file compaction — output maintenance at corpus scale.

A long crawl writes resumable per-round / per-chunk Parquet parts
(`pipelines/frontier.py`, `functions/project.py:write_routed_parquet`);
after months of rounds a 100 TB corpus directory holds millions of
KB-sized shards, and every downstream read pays per-file open/footer
cost. This stage rewrites a directory into ~``target_mb`` files while
preserving hive partition layout, with the idempotence discipline the
frontier's at-least-once task retries require (cf. ADVICE r3 on
`sources/warc.py`):

- **Planning is metadata-only**: one driver-side directory walk
  collects (path, bytes) per leaf directory; bins are first-fit over
  the size-sorted listing. Nothing proportional to data bytes touches
  the driver.
- **Work is map-only**: one Ray Data task per bin reads its member
  files and writes ONE output file. No shuffle.
- **Deterministic identity**: the output name is a hash of the bin's
  member paths, so a re-executed task (worker death, lineage
  reconstruction) recreates byte-stable content under the SAME name —
  write-to-temp + atomic rename makes the last writer win instead of
  duplicating rows. A finished bin is detected by name and skipped,
  making re-runs resumable.
- **Partition-safe**: bins never span leaf directories, so
  hive-encoded partition columns (``bucket=…``) stay correct.

Source files are only removed (``delete_source=True``) after their
bin's output is durably in place, never by the task that wrote it —
delete is a second idempotent pass.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["plan_compaction", "compact_parquet"]


def _leaf_files(root: str) -> dict[str, list[tuple[str, int]]]:
    """{leaf_dir: [(path, bytes), ...]} for every parquet file under
    root (driver-side metadata walk, no data reads)."""
    out: dict[str, list[tuple[str, int]]] = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in sorted(filenames):
            if not fn.endswith(".parquet") or fn.startswith("compacted-"):
                continue
            p = os.path.join(dirpath, fn)
            out.setdefault(dirpath, []).append((p, os.path.getsize(p)))
    return out


def plan_compaction(input_dir: str, *, target_mb: int = 256,
                    min_inputs: int = 2) -> list[dict]:
    """Deterministic compaction plan: per leaf directory, first-fit
    size-descending bins of at most ``target_mb`` (always >=1 file per
    bin; a bin with fewer than ``min_inputs`` members is dropped — the
    file is already big enough to leave alone)."""
    target = target_mb * 1024 * 1024
    bins: list[dict] = []
    leaves = _leaf_files(input_dir)
    for leaf in sorted(leaves):
        files = sorted(leaves[leaf], key=lambda fs: (-fs[1], fs[0]))
        open_bins: list[list] = []  # [members, total_bytes]
        for path, size in files:
            for b in open_bins:
                if b[1] + size <= target:
                    b[0].append(path)
                    b[1] += size
                    break
            else:
                open_bins.append([[path], size])
        for members, total in open_bins:
            if len(members) < min_inputs:
                continue
            members = sorted(members)
            ident = hashlib.md5(
                "\x1f".join(os.path.relpath(m, input_dir)
                            for m in members).encode()).hexdigest()[:16]
            bins.append({"leaf": leaf, "members": members,
                         "bytes": total, "ident": ident})
    return bins


def _compact_bin(leaf: str, members: list[str], ident: str,
                 out_dir: str) -> dict:
    out_path = os.path.join(out_dir, f"compacted-{ident}.parquet")
    if os.path.exists(out_path):  # finished bin: resumable skip
        return {"out_file": out_path, "n_inputs": len(members),
                "n_rows": pq.read_metadata(out_path).num_rows,
                "skipped": True}
    tables = [pq.read_table(m) for m in members]
    merged = pa.concat_tables(tables, promote_options="none")
    tmp = out_path + f".tmp-{os.getpid()}"
    pq.write_table(merged, tmp)
    try:
        os.replace(tmp, out_path)  # atomic: last identical writer wins
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return {"out_file": out_path, "n_inputs": len(members),
            "n_rows": merged.num_rows, "skipped": False}


def compact_parquet(input_dir: str, *, target_mb: int = 256,
                    min_inputs: int = 2, delete_source: bool = False,
                    output_dir: str | None = None):
    """Compact ``input_dir`` in place (or into ``output_dir``'s
    mirrored leaf layout). Returns a manifest Dataset with one row per
    bin: (out_file, n_inputs, n_rows, skipped)."""
    import ray.data as rd

    plan = plan_compaction(input_dir, target_mb=target_mb,
                           min_inputs=min_inputs)
    if not plan:
        return rd.from_arrow(pa.table({
            "out_file": pa.array([], pa.string()),
            "n_inputs": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "skipped": pa.array([], pa.bool_()),
        }))

    def _run(t: pa.Table) -> pa.Table:
        rows = []
        for i in range(t.num_rows):
            leaf = t["leaf"][i].as_py()
            members = t["members"][i].as_py()
            ident = t["ident"][i].as_py()
            if output_dir is not None:
                dest = os.path.join(output_dir,
                                    os.path.relpath(leaf, input_dir))
                os.makedirs(dest, exist_ok=True)
            else:
                dest = leaf
            rows.append(_compact_bin(leaf, members, ident, dest))
        return pa.table({
            "out_file": pa.array([r["out_file"] for r in rows]),
            "n_inputs": pa.array([r["n_inputs"] for r in rows],
                                 pa.int64()),
            "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
            "skipped": pa.array([r["skipped"] for r in rows]),
        })

    plan_tbl = pa.table({
        "leaf": pa.array([b["leaf"] for b in plan]),
        "members": pa.array([b["members"] for b in plan],
                            pa.list_(pa.string())),
        "ident": pa.array([b["ident"] for b in plan]),
    })
    manifest = (rd.from_arrow(plan_tbl)
                .repartition(min(len(plan), 64))
                .map_batches(_run, batch_format="pyarrow")
                .materialize())
    if delete_source:
        # second pass, only after every bin's output is durable
        for b in plan:
            for m in b["members"]:
                if os.path.exists(m):
                    os.unlink(m)
    return manifest
