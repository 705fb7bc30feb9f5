"""NewsMinute offset-paginated search pipeline (S3/P4/P9/Q1/W2/X10).

Reference: /root/reference/siren/scrapers/online/newsminute.py:44-112
(`NMScraper`). Two-phase discover->expand, Ray-Data-first:

- phase 1: fetch page 0 per keyword (a tiny seed Dataset through the
  corpus lookup join); read ``total`` per keyword; an ``error`` payload
  yields SearchResult(total=0, items=[]) (newsminute.py:74-75);
- expand: the EXACT pagination quirk ``pages = (total // 100) - 1``,
  offsets ``range(1, pages - 1)`` (newsminute.py:84-90, X10 — the tail
  pages are intentionally never fetched);
- phase 2: fetch all offset pages, validate each item (pydantic
  parse-or-drop, P9), flatten ``cards -> story-elements -> text``
  (P4, newsminute.py:31-35);
- strict-exclusive date window ``start < published-at < end``
  (Q1, newsminute.py:82,94);
- projection include={text} exclude={cards, author_name}
  (W2, newsminute.py:105-112) via :data:`NM_SPEC`.

The discovery metadata (one total per keyword) is the only driver-side
materialization — the same shape as the reference's sequential initial
fetch; item parsing and filtering stream through ``map_batches``.
"""

from __future__ import annotations

import json
from datetime import datetime

import pyarrow as pa
import ray.data as rd

from ..corpus import nm_url
from ..functions.project import ProjectionSpec
from ..functions.scalars import expand_offsets_newsminute
from .scrapers import date_window_filter, fetch_raw, make_fetch_kwargs

# W2: fields = model_fields | {text} - {cards, author_name}
# (model fields: url, author_name, headline, subheadline, published_at,
# cards -> resolved sorted per the engine's set-order pinning)
NM_SPEC = ProjectionSpec(
    include=frozenset({"text"}),
    exclude=frozenset({"cards", "author_name"}),
)

_OUT_SCHEMA = [
    ("q", pa.string()),
    ("url", pa.string()),
    ("author_name", pa.string()),
    ("headline", pa.string()),
    ("subheadline", pa.string()),
    ("published_ts", pa.timestamp("us")),
    ("text", pa.string()),
]


def _parse_items(batch: pa.Table) -> pa.Table:
    """One search-page row -> N validated article rows (P9 + P4)."""
    cols: dict[str, list] = {name: [] for name, _ in _OUT_SCHEMA}
    for q, html, found in zip(
        batch["q"].to_pylist(),
        batch["html"].to_pylist(),
        batch["found"].to_pylist(),
    ):
        if not found:
            continue  # F4: error swallowed -> no items
        try:
            data = json.loads(bytes(html).decode())
        except (json.JSONDecodeError, UnicodeDecodeError):
            continue
        if not isinstance(data, dict) or data.get("error"):
            continue  # newsminute.py:74-75
        for item in data.get("items") or []:
            if not isinstance(item, dict):
                continue
            try:
                url = item["url"]
                headline = item["headline"]
                author = item["author-name"]
                cards = item["cards"]
                ts = datetime.fromisoformat(item["published-at"])
                text = "\n".join(
                    story.get("text", "")
                    for card in cards
                    for story in card["story-elements"]
                )
            except (KeyError, TypeError, ValueError):
                continue  # ValidationError -> drop (P9)
            cols["q"].append(q)
            cols["url"].append(url)
            cols["author_name"].append(author)
            cols["headline"].append(headline)
            cols["subheadline"].append(item.get("subheadline"))
            cols["published_ts"].append(ts)
            cols["text"].append(text)
    return pa.table(
        {name: pa.array(cols[name], typ) for name, typ in _OUT_SCHEMA}
    )


def newsminute_pipeline(corpus_dir: str, *, start: datetime, end: datetime,
                        keywords: list[str], concurrency: int = 2,
                        fetch_mode: str = "broadcast"):
    fk = make_fetch_kwargs(corpus_dir, fetch_mode=fetch_mode,
                           fetch_concurrency=concurrency)
    seed = rd.from_items([{"url": nm_url(kw, 0), "q": kw} for kw in keywords])
    # materialized: page 0 is reused (totals AND its items) — one fetch,
    # and the expand fetch pool later executes alone in its own graph
    page0 = fetch_raw(seed, fk, concurrency=concurrency).materialize()

    # discovery: one (keyword, total) per seed row — tiny, driver-side,
    # exactly the reference's sequential initial fetch (newsminute.py:80-84)
    expand: list[dict] = []
    for row in page0.take_all():
        if not row["found"]:
            continue
        try:
            data = json.loads(bytes(row["html"]).decode())
        except (json.JSONDecodeError, UnicodeDecodeError):
            continue
        if not isinstance(data, dict) or data.get("error"):
            continue
        total = int(data.get("total") or 0)
        expand.extend(
            {"url": nm_url(row["q"], off), "q": row["q"]}
            for off in expand_offsets_newsminute(total)
        )

    pages = page0
    if expand:
        pages = pages.union(
            fetch_raw(rd.from_items(expand), fk, concurrency=concurrency)
        )
    articles = pages.map_batches(_parse_items, batch_format="pyarrow")
    return date_window_filter(articles, "published_ts", start, end)
