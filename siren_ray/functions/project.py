"""Projection / CSV serialization layer (SURVEY.md §2.6 W1-W4).

Reproduces the reference's generic CSV projector
(/root/reference/siren/core/scraper.py:86-139):

- field set = model fields ∪ include − exclude, overridden entirely by a
  ``FIELDS`` tuple when declared (scraper.py:125);
- headers renamed through ``aliases`` (scraper.py:126);
- a missing attribute serializes as ``"- no data -"`` (scraper.py:133);
- cell values serialize via X1 ``transform`` (datetime/date ->
  ``%Y-%m-%d``, else ``str()``; scraper.py:15-25);
- output naming: ``{Name}_{end:%Y-%m-%d}.csv`` when the window is <= 1
  day else ``{Name}_{start}_{end}.csv`` (scraper.py:144-155).

Divergence (documented, SURVEY.md §7 "hard parts"): when no FIELDS is
declared the reference iterates a Python ``set`` — column order is
nondeterministic per run. This engine pins sorted order instead.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pyarrow as pa

from .scalars import serialize_column

MISSING = "- no data -"


@dataclass
class ProjectionSpec:
    fields: tuple[str, ...] | None = None  # FIELDS override (pinned order)
    include: frozenset[str] = frozenset()
    exclude: frozenset[str] = frozenset()
    aliases: dict[str, str] = field(default_factory=dict)

    def resolve(self, available: list[str]) -> list[str]:
        if self.fields:
            return list(self.fields)
        cols = (set(available) | set(self.include)) - set(self.exclude)
        return sorted(cols)  # deterministic (reference: arbitrary set order)

    def headers(self, resolved: list[str]) -> list[str]:
        return [self.aliases.get(f, f) for f in resolved]


def project_batch(batch: pa.Table, spec: ProjectionSpec) -> pa.Table:
    """Apply W1-W3: select/rename/serialize; missing fields -> constant."""
    resolved = spec.resolve(batch.column_names)
    headers = spec.headers(resolved)
    cols = []
    for name in resolved:
        if name in batch.column_names:
            cols.append(serialize_column(batch[name]))
        else:
            cols.append(pa.array([MISSING] * batch.num_rows, pa.string()))
    # from_arrays, NOT a dict: an alias colliding with another resolved
    # header must yield BOTH columns under the duplicate name (the
    # reference writes duplicate CSV headers; a dict silently dropped
    # one column's data)
    cols = [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in cols]
    return pa.Table.from_arrays(cols, names=headers)


def write_routed_parquet(ds, out_dir: str,
                         partition_cols: tuple[str, ...] = ("origin",)):
    """W6 at the data level: route rows into one folder per partition
    value with the native hive-partitioned Parquet write
    (``out_dir/col=value/part-*.parquet``) — the Ray-Data analog of the
    reference's per-origin Drive folders (cloud.py:70-78). Partition
    values come from the data, so a multi-scraper union routes itself;
    a failed run skips finished partitions on retry (resumable layout).
    Keep partition columns low-cardinality (origin/scraper/date, not
    url)."""
    ds.write_parquet(out_dir, partition_cols=list(partition_cols))
    return out_dir


def write_resumable_parquet(ds, out_dir: str, *,
                            partition_col: str = "origin") -> dict:
    """Resumable hive-partitioned Parquet sink: a partition directory is
    FINISHED once its ``_SUCCESS`` marker exists; a re-run after a crash
    (1) deletes partition dirs that lack the marker (partial parts from
    the failed attempt — parts are UUID-named, so a naive rewrite would
    DUPLICATE rows, not overwrite), (2) filters finished partitions out
    of the dataset BEFORE the write so their bytes are never recomputed
    or re-shipped, (3) writes the remainder, and (4) stamps markers
    last — the crash-safe ordering (data durable before the marker, same
    discipline as the crawl checkpoints, pipelines/frontier.py).

    ``partition_col`` must be low-cardinality with filesystem-simple
    values (origin/scraper/day bucket — the same contract as
    :func:`write_routed_parquet`). Returns
    ``{"skipped": [...], "written": [...]}`` partition values (as
    directory-name strings) for lineage.
    """
    import shutil

    import pyarrow.compute as pc

    prefix = f"{partition_col}="
    os.makedirs(out_dir, exist_ok=True)
    done, partial = [], []
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not (name.startswith(prefix) and os.path.isdir(p)):
            continue
        # hive dir names are URI-segment-encoded ('HT Scraper' ->
        # 'HT%20Scraper'); compare DECODED values or the skip filter
        # misses and resumed runs duplicate rows into finished dirs
        from urllib.parse import unquote

        val = unquote(name[len(prefix):])
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            done.append(val)
        else:
            partial.append(val)
            shutil.rmtree(p)

    if done:
        done_arr = pa.array(done, pa.string())

        def _drop_done(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or partition_col not in t.schema.names:
                return t
            key = pc.cast(t[partition_col], pa.string())
            return t.filter(pc.invert(pc.is_in(key, value_set=done_arr)))

        ds = ds.map_batches(_drop_done, batch_format="pyarrow")

    ds.write_parquet(out_dir, partition_cols=[partition_col])

    written = []
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if (name.startswith(prefix) and os.path.isdir(p)
                and not os.path.exists(os.path.join(p, "_SUCCESS"))):
            with open(os.path.join(p, "_SUCCESS"), "w"):
                pass
            written.append(name[len(prefix):])
    return {"skipped": done, "written": written}


def flatten_struct(batch: pa.Table, struct_col: str, *,
                   keep_parent: bool = True,
                   child_order: tuple[str, ...] | None = None) -> pa.Table:
    """W3 wide-row struct flatten (epaper/toi.py:228-240): widen a struct
    column into top-level columns appended AFTER the parent's fields, in
    the struct's declared field order (or ``child_order``).

    The reference's TOI writer emits ``Article.model_fields`` followed by
    ``Edition.model_fields`` — the ``edition_details`` struct column
    itself stays in the row (``keep_parent=True``) and its four fields
    (date, edition_code, publication_code, edition_name) become columns;
    the generic W1 projector then serializes the whole wide row. A child
    name colliding with an existing column is an error (the reference
    would silently duplicate the CSV header)."""
    import pyarrow.compute as pc

    arr = batch[struct_col]
    typ = arr.type
    names = list(child_order) if child_order else [
        typ.field(i).name for i in range(typ.num_fields)
    ]
    out = batch if keep_parent else batch.drop_columns([struct_col])
    for name in names:
        if name in out.column_names:
            raise ValueError(
                f"flatten_struct: child field {name!r} collides with an "
                "existing column"
            )
        out = out.append_column(name, pc.struct_field(arr, name))
    return out


def output_filename(name: str, start: datetime, end: datetime,
                    fmt: str = "%Y-%m-%d", ext: str = "csv") -> str:
    """W4 (scraper.py:144-155); TOI variant uses fmt="%d-%m-%Y"
    (toi.py:245-250)."""
    if (end - start) <= timedelta(days=1):
        daterange = end.strftime(fmt)
    else:
        daterange = f"{start.strftime(fmt)}_{end.strftime(fmt)}"
    return f"{name}_{daterange}.{ext}"


def write_projected_csv(ds, spec: ProjectionSpec, out_dir: str,
                        name: str, start: datetime, end: datetime):
    """Project a Dataset and write CSV under the reference naming scheme.

    The reference writes ONE in-memory CSV (scraper.py:117-139 — full
    materialization); here the write is streamed per-block into a
    directory named by the W4 scheme (resumable, no driver
    materialization).
    """
    import os

    dirname = output_filename(name, start, end, ext="csvd")
    path = os.path.join(out_dir, dirname)
    ds.map_batches(
        project_batch, fn_kwargs={"spec": spec}, batch_format="pyarrow"
    ).write_csv(path)
    return path
