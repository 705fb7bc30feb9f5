"""Sitemap discovery source — the standard seed-expansion edge of a
web-scale crawl (sitemaps.org protocol: ``<urlset>`` leaf files and
``<sitemapindex>`` index files, optionally gzip-compressed).

The reference's scrapers enumerate URLs from site-specific search APIs
(SURVEY.md §2.1); a generic frontier also needs the protocol every host
publishes. This is an engine addition per the task brief.

Scale shape: map-only. One sitemap file (≤50k entries per the spec)
parses inside one task; a ``sitemapindex`` emits child sitemap rows
(``is_index=true``) that the caller feeds back through the fetch join —
the same two-phase discover→expand pattern as S3/S4 pagination.

Parsing is regex-based over the decoded payload — the sitemap schema is
flat and the regex contract (``<loc>`` / optional ``<lastmod>`` inside
``<url>`` / ``<sitemap>`` blocks, whitespace-trimmed, first match per
block) is shared with the DuckDB oracle arithmetic so the query is
hash-exact-checked end to end.
"""

from __future__ import annotations

import gzip
import re

import pyarrow as pa

_BLOCK_RE = re.compile(rb"<(url|sitemap)\b[^>]*>(.*?)</\1>", re.S)
_LOC_RE = re.compile(rb"<loc>\s*(.*?)\s*</loc>", re.S)
_LASTMOD_RE = re.compile(rb"<lastmod>\s*(.*?)\s*</lastmod>", re.S)
_GZ_MAGIC = b"\x1f\x8b"


def parse_sitemap(url: str, payload: bytes | str | None) -> list[dict]:
    """One sitemap document -> entry rows.

    Each ``<url>`` block yields ``{src, loc, lastmod, is_index=False}``;
    each ``<sitemap>`` block (index files) yields the child sitemap URL
    with ``is_index=True``. Gzip payloads (magic ``1f 8b``) decompress
    transparently (the spec allows .xml.gz). Blocks without a ``<loc>``
    are skipped; ``lastmod`` is None when absent. Malformed payloads
    return [] (F4 swallow-and-record discipline is the caller's)."""
    if not payload:
        return []
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    if payload[:2] == _GZ_MAGIC:
        try:
            payload = gzip.decompress(payload)
        except OSError:
            return []
    out = []
    for m in _BLOCK_RE.finditer(payload):
        kind, body = m.group(1), m.group(2)
        locm = _LOC_RE.search(body)
        if not locm:
            continue
        lm = _LASTMOD_RE.search(body)
        out.append({
            "src": url,
            "loc": locm.group(1).decode("utf-8", "replace"),
            "lastmod": (lm.group(1).decode("utf-8", "replace")
                        if lm else None),
            "is_index": kind == b"sitemap",
        })
    return out


def sitemap_batch(batch: pa.Table, *, url_col: str = "url",
                  payload_col: str = "html") -> pa.Table:
    """Batched flat-map over (url, payload) -> entry rows."""
    urls = batch[url_col].to_pylist()
    payloads = batch[payload_col].to_pylist()
    src, loc, lastmod, is_index = [], [], [], []
    for u, p in zip(urls, payloads):
        for e in parse_sitemap(u, p):
            src.append(e["src"])
            loc.append(e["loc"])
            lastmod.append(e["lastmod"])
            is_index.append(e["is_index"])
    return pa.table({
        "src": pa.array(src, pa.string()),
        "loc": pa.array(loc, pa.string()),
        "lastmod": pa.array(lastmod, pa.string()),
        "is_index": pa.array(is_index, pa.bool_()),
    })
