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
    return pa.table(dict(zip(headers, cols)))


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
