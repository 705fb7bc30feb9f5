"""RSS/Atom feed discovery source — the second universal seed-expansion
protocol of a web-scale crawl (alongside sitemaps, `sources/sitemap.py`).

The reference's scrapers enumerate articles from site-specific search
APIs (SURVEY.md §2.1); a generic frontier also wants the feeds most
hosts publish. Engine addition per the task brief.

Scale shape: map-only. One feed document parses inside one task; the
emitted ``link`` rows feed the frontier exactly like sitemap ``loc``
rows — no shuffle, no state.

Parsing is regex-based over the decoded payload, mirroring the sitemap
source: the two formats are flat enough that a block regex per
``<item>`` (RSS 2.0) / ``<entry>`` (Atom) with first-match field
carves is exact on well-formed feeds, and malformed payloads degrade
to [] (F4 swallow-and-record discipline is the caller's). Timestamps
normalize to epoch seconds — RFC 822 (``pubDate``) via
``email.utils.parsedate_to_datetime``, ISO 8601 (``updated`` /
``published``) via ``datetime.fromisoformat`` — so downstream date
windows (Q1) apply uniformly; the arithmetic is shared with the DuckDB
oracle so q:feed is hash-exact end to end.
"""

from __future__ import annotations

import gzip
import re
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime

import pyarrow as pa

_GZ_MAGIC = b"\x1f\x8b"
_ITEM_RE = re.compile(rb"<(item|entry)\b[^>]*>(.*?)</\1>", re.S)
_TITLE_RE = re.compile(rb"<title\b[^>]*>\s*(.*?)\s*</title>", re.S)
# RSS: <link>url</link>; Atom: <link ... href="url" .../>.
_LINK_TEXT_RE = re.compile(rb"<link>\s*(.*?)\s*</link>", re.S)
_LINK_HREF_RE = re.compile(rb"<link\b([^>]*?)/?>", re.S)
_HREF_RE = re.compile(rb"""href\s*=\s*["']([^"']*)["']""")
_REL_RE = re.compile(rb"""rel\s*=\s*["']([^"']*)["']""")
_PUBDATE_RE = re.compile(rb"<pubDate>\s*(.*?)\s*</pubDate>", re.S)
_UPDATED_RE = re.compile(
    rb"<(updated|published)>\s*(.*?)\s*</\1>", re.S)
_CDATA_RE = re.compile(rb"^<!\[CDATA\[(.*)\]\]>$", re.S)

_SCHEMA = pa.schema([
    ("src", pa.string()),
    ("link", pa.string()),
    ("title", pa.string()),
    ("published_ts", pa.int64()),
    ("kind", pa.string()),
])


def _text(m: re.Match | None, group: int = 1) -> str | None:
    if m is None:
        return None
    body = m.group(group).strip()
    cm = _CDATA_RE.match(body)
    if cm:
        body = cm.group(1).strip()
    return body.decode("utf-8", "replace")


def _parse_ts(raw: str | None, kind: str) -> int | None:
    """Feed timestamp string -> epoch seconds (None if unparseable).

    RSS ``pubDate`` is RFC 822 (weekday optional, numeric or named
    zone); Atom ``updated``/``published`` is ISO 8601 (``Z`` accepted).
    Naive timestamps are taken as UTC — deterministic and
    engine-independent, matching the oracle arithmetic."""
    if not raw:
        return None
    try:
        if kind == "rss":
            dt = parsedate_to_datetime(raw)
        else:
            dt = datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except (ValueError, TypeError):
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _entry_link(body: bytes, kind: str) -> str | None:
    """First usable link of an item/entry.

    RSS: the ``<link>text</link>`` element. Atom: the first ``<link>``
    whose ``rel`` is absent or ``alternate`` (``rel="self"`` is the
    feed's own URL, never the article)."""
    if kind == "rss":
        m = _LINK_TEXT_RE.search(body)
        return _text(m) if m else None
    for am in _LINK_HREF_RE.finditer(body):
        attrs = am.group(1)
        rel = _REL_RE.search(attrs)
        if rel and rel.group(1) not in (b"", b"alternate"):
            continue
        href = _HREF_RE.search(attrs)
        if href:
            return href.group(1).decode("utf-8", "replace")
    return None


def parse_feed(url: str, payload: bytes | str | None) -> list[dict]:
    """One feed document -> article rows.

    Format sniff: ``<feed`` root => Atom (``<entry>`` blocks), else
    RSS (``<item>`` blocks). Gzip payloads decompress transparently.
    Rows without a link are skipped; ``title`` is None when absent
    (CDATA unwrapped); ``published_ts`` is epoch seconds or None."""
    if not payload:
        return []
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    if payload[:2] == _GZ_MAGIC:
        try:
            payload = gzip.decompress(payload)
        except OSError:
            return []
    # sniff the ROOT element, not any occurrence: an RSS item whose
    # content merely mentions '<feed' must not flip the parser to Atom
    # (which would silently drop every RSS item). The first match of
    # either root tag in document order decides.
    m0 = re.search(rb"<(feed|rss)[\s>]", payload)
    kind = "atom" if (m0 is not None and m0.group(1) == b"feed") else "rss"
    out = []
    for m in _ITEM_RE.finditer(payload):
        body = m.group(2)
        link = _entry_link(body, kind)
        if not link:
            continue
        if kind == "rss":
            ts = _parse_ts(_text(_PUBDATE_RE.search(body)), kind)
        else:
            ts = _parse_ts(_text(_UPDATED_RE.search(body), 2), kind)
        out.append({
            "src": url,
            "link": link,
            "title": _text(_TITLE_RE.search(body)),
            "published_ts": ts,
            "kind": kind,
        })
    return out


def feed_batch(batch: pa.Table, *, url_col: str = "url",
               payload_col: str = "html") -> pa.Table:
    """Batched flat-map over (url, payload) -> article rows."""
    urls = batch[url_col].to_pylist()
    payloads = batch[payload_col].to_pylist()
    cols: dict[str, list] = {k: [] for k in _SCHEMA.names}
    for u, p in zip(urls, payloads):
        for e in parse_feed(u, p):
            for k in cols:
                cols[k].append(e[k])
    return pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in _SCHEMA})
