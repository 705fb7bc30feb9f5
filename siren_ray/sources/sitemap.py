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


# --- sitemap-freshness recrawl planning -------------------------------------

def lastmod_to_epoch(value: str | None) -> int | None:
    """W3C-datetime ``<lastmod>`` -> epoch seconds (UTC), or None.

    The sitemap spec allows the W3C datetime profiles: ``YYYY-MM-DD``
    (taken as midnight UTC) and ``YYYY-MM-DDThh:mm(:ss[.frac])``
    with a mandatory ``Z``/``±hh:mm`` zone designator (a zoneless
    timestamp is out of profile; parsed as UTC rather than dropped —
    freshness planning prefers a recrawl-too-often bias over silently
    never recrawling). Unparseable values -> None (F4 discipline)."""
    if not value:
        return None
    from datetime import datetime, timezone

    try:
        # normalize the Z designator explicitly (as feeds.py does):
        # pre-3.11 fromisoformat rejects it, and the W3C Z-form is the
        # most common lastmod spelling — silently parsing none of them
        # would mean never recrawling updated pages
        dt = datetime.fromisoformat(
            value.strip().replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def plan_recrawl(entries_ds, crawled_ds, *, loc_col: str = "loc",
                 lastmod_col: str = "lastmod", url_col: str = "url",
                 ts_col: str = "crawl_ts", num_partitions: int = 16):
    """Sitemap-freshness recrawl planner: join the sitemap's declared
    ``lastmod`` against the crawl store's per-URL fetch timestamp and
    emit a verdict per sitemap URL — the standard freshness loop a
    production crawler runs between full recrawls (poll the sitemaps,
    refetch only what the publisher says changed).

    Verdicts: ``new`` (never crawled), ``stale`` (lastmod strictly
    after the stored fetch), ``fresh`` (lastmod at or before it),
    ``unknown`` (crawled but no usable lastmod — the caller's policy
    decides; the planner never silently equates "no lastmod" with
    "fresh"). Feed ``verdict IN ('new','stale')`` rows back in as
    seeds (``CrawlConfig.seeds_path``).

    Scale shape: map-only lastmod normalization, then ONE
    co-partitioned hash join (``stages.relational.hash_join``,
    broadcast fallback for small crawl stores), then a map-only
    verdict kernel — no driver materialization. ``entries_ds`` rows
    are (loc, lastmod) as emitted by :func:`sitemap_batch` (leaf rows;
    filter ``is_index`` first); ``crawled_ds`` is (url, ts) with ts in
    epoch seconds. Returns (url, lastmod_ts, crawl_ts, verdict)."""
    import numpy as np

    from ..stages.relational import hash_join

    def _norm(t: pa.Table) -> pa.Table:
        locs = t[loc_col].to_pylist()
        lms = t[lastmod_col].to_pylist()
        return pa.table({
            url_col: pa.array(locs, pa.string()),
            "lastmod_ts": pa.array([lastmod_to_epoch(v) for v in lms],
                                   pa.int64()),
        })

    def _proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            url_col: t[url_col],
            "crawl_ts": pc.cast(t[ts_col], pa.int64()),
        })

    ent = entries_ds.map_batches(_norm, batch_format="pyarrow")
    crawled = crawled_ds.map_batches(_proj, batch_format="pyarrow")
    joined = hash_join(ent, crawled, on=url_col, how="left",
                       num_partitions=num_partitions)

    def _verdict(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        lm = df["lastmod_ts"]          # nullable
        ct = df["crawl_ts"]            # float64 + NaN where unmatched
        new = ct.isna()
        unknown = (~new) & lm.isna()
        stale = (~new) & (~lm.isna()) & (lm > ct)
        verdict = np.where(new, "new",
                           np.where(unknown, "unknown",
                                    np.where(stale, "stale", "fresh")))
        return pa.table({
            url_col: pa.array(df[url_col], pa.string()),
            "lastmod_ts": pa.array(lm, pa.int64(), from_pandas=True),
            "crawl_ts": pa.array(
                pd.array(ct, dtype="Int64"), pa.int64(), from_pandas=True),
            "verdict": pa.array(verdict, pa.string()),
        })

    return joined.map_batches(_verdict, batch_format="pyarrow")
