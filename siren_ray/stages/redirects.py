"""Redirect resolution — canonical-alias discovery over live HTTP.

A crawl frontier accumulates URL aliases (http→https upgrades, moved
articles, tracking shims); each 301/302 chain ends at one canonical
URL. This stage GETs through the same per-actor
:class:`..transport.HttpTransport` as the live fetch, follows the
chain (the opener's own redirect handling, loop-guarded), and emits
the ``(url, final_url)`` alias edge plus the landed body's presence.

Feeding the edges to ``dedup_exact(key="final_url")`` collapses alias
families to one document — the pre-fetch URL-seen set (D2) can then be
keyed on canonical URLs so an alias is never fetched twice. Map-only
actor-pool stage: no shuffle, no driver state. (The reference pins
exact article URLs from search APIs and never meets aliases; engine
addition per the task brief.)
"""

from __future__ import annotations

import pyarrow as pa


class ResolveRedirects:
    """Actor-pool callable: rows (url, ...) in, the same rows +
    (final_url, redirected, found, err) out. Transport built once per
    actor (T2/T5). ``final_url`` is null on error; ``redirected`` is
    true when the chain moved (final != requested)."""

    def __init__(self, *, http_base: str, http_headers: dict | None = None,
                 http_timeout_s: float = 5.0, http_concurrency: int = 16,
                 http_retries: int = 1):
        from .transport import HttpTransport

        self._transport = HttpTransport(
            http_base, headers=http_headers, timeout_s=http_timeout_s,
            concurrency=http_concurrency, retries=http_retries,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return (batch
                    .append_column("final_url", pa.nulls(0, pa.string()))
                    .append_column("redirected", pa.nulls(0, pa.bool_()))
                    .append_column("found", pa.nulls(0, pa.bool_()))
                    .append_column("err", pa.nulls(0, pa.string())))
        urls = batch["url"].to_pylist()
        bodies, errs, finals = self._transport.fetch_many_resolved(urls)
        redirected = [
            (f is not None and f != u) for u, f in zip(urls, finals)]
        return (batch
                .append_column("final_url", pa.array(finals, pa.string()))
                .append_column("redirected", pa.array(redirected,
                                                      pa.bool_()))
                .append_column("found", pa.array(
                    [b is not None for b in bodies], pa.bool_()))
                .append_column("err", pa.array(errs, pa.string())))


def resolve_redirects(ds, *, http_base: str, concurrency: int = 4,
                      batch_size: int = 256, **transport_kwargs):
    """Alias-resolution pass over a url Dataset: actor-pool
    ``map_batches`` of :class:`ResolveRedirects` (real per-actor
    transport state — actor pool per CLAUDE.md policy)."""
    return ds.map_batches(
        ResolveRedirects,
        fn_constructor_kwargs={"http_base": http_base, **transport_kwargs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
