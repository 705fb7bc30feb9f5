"""Conditional-GET revalidation recrawl (HTTP 304 semantics).

A recrawl of an already-seen corpus should not re-download — let alone
re-extract — the unchanged majority. This stage replays stored
validators (``ETag`` per url, RFC 9110 §13.1.2) as ``If-None-Match``
conditional GETs through the same per-actor :class:`HttpTransport` the
live fetch uses (F3/F5 machinery):

- ``304 Not Modified`` -> the row keeps its PRIOR extracted text
  byte-identically (zero body bytes on the wire, zero extract compute),
  ``status="not_modified"``.
- ``200`` -> fresh body, re-extracted through the SAME
  ``stages.extract.extract_batch`` path as the crawl (the byte-identical
  north-star invariant holds across recrawls), ``status="fresh"`` and a
  new etag for the next cycle.
- errors -> ``status="error"`` + the F4 error code; prior text is
  retained (a transient failure must not erase a good document).

Scale shape: map-only actor-pool stage — rows (url, etag, prior text)
in, rows (url, status, etag, text, err) out; no shuffle, no driver
state. The validator store is just columns on the previous crawl's
extracted output, so a revalidation cycle is
``prior_extracted -> map_batches(RevalidateFetch) -> next snapshot``,
and :func:`stages.relational.snapshot_diff` classifies what moved.

(The reference has no recrawl story — its scrapers re-enumerate search
APIs from scratch each run; engine addition per the task brief.)
"""

from __future__ import annotations

import pyarrow as pa

_OUT_FIELDS = [
    ("status", pa.string()),
    ("etag", pa.string()),
    ("text", pa.string()),
    ("err", pa.string()),
]


class RevalidateFetch:
    """Actor-pool callable: conditional-GET revalidation over live HTTP.

    Input batch columns: ``url`` (required), optional ``etag`` (stored
    validator; null = unconditional GET) and ``prior_text`` (carried
    forward on 304/error). Extra columns pass through untouched.
    Transport is built once per actor (T2/T5)."""

    def __init__(self, *, http_base: str, http_headers: dict | None = None,
                 http_timeout_s: float = 5.0, http_concurrency: int = 16,
                 http_retries: int = 1):
        from .transport import HttpTransport

        self._transport = HttpTransport(
            http_base, headers=http_headers, timeout_s=http_timeout_s,
            concurrency=http_concurrency, retries=http_retries,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .extract import extract_batch

        n = batch.num_rows
        out_names = [f[0] for f in _OUT_FIELDS]
        passthrough = [c for c in batch.column_names
                       if c not in ("etag", "prior_text", *out_names)]
        if n == 0:
            t = batch.select(passthrough)
            for name, typ in _OUT_FIELDS:
                t = t.append_column(name, pa.nulls(0, typ))
            return t
        urls = batch["url"].to_pylist()
        etags = (batch["etag"].to_pylist()
                 if "etag" in batch.column_names else [None] * n)
        prior = (batch["prior_text"].to_pylist()
                 if "prior_text" in batch.column_names else [None] * n)
        bodies, errs, new_tags = self._transport.fetch_many_conditional(
            urls, etags)

        status, text, etag_out, err_out = [], [], [], []
        fresh_idx = [i for i, b in enumerate(bodies) if b is not None]
        fresh_text: dict[int, str | None] = {}
        if fresh_idx:
            sub = pa.table({
                "url": pa.array([urls[i] for i in fresh_idx], pa.string()),
                "html": pa.array([bodies[i] for i in fresh_idx],
                                 pa.binary()),
            })
            extracted = extract_batch(sub)["text"].to_pylist()
            fresh_text = dict(zip(fresh_idx, extracted))
        for i in range(n):
            if bodies[i] is not None:
                status.append("fresh")
                text.append(fresh_text[i])
                etag_out.append(new_tags[i])
                err_out.append(None)
            elif errs[i] == "not_modified":
                status.append("not_modified")
                text.append(prior[i])
                etag_out.append(new_tags[i])
                err_out.append(None)
            else:
                status.append("error")
                text.append(prior[i])
                etag_out.append(etags[i])
                err_out.append(errs[i])

        t = batch.select(passthrough)
        cols = {"status": status, "etag": etag_out, "text": text,
                "err": err_out}
        for name, typ in _OUT_FIELDS:
            t = t.append_column(name, pa.array(cols[name], typ))
        return t


def revalidate_dataset(ds, *, http_base: str, concurrency: int = 4,
                       batch_size: int = 256, **transport_kwargs):
    """One revalidation cycle over a prior snapshot Dataset with
    (url, etag, prior_text) columns: actor-pool ``map_batches`` of
    :class:`RevalidateFetch` (real per-actor transport state — actor
    pool, not task pool, per CLAUDE.md policy)."""
    return ds.map_batches(
        RevalidateFetch,
        fn_constructor_kwargs={"http_base": http_base, **transport_kwargs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
