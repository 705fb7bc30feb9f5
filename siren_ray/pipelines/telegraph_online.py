"""Telegraph online search pipeline (S4/P5/Q1/X6/X10).

Reference: /root/reference/siren/scrapers/online/telegraph.py:105-150
(`TelegraphOnlineScraper`). Two-phase discover->expand:

- phase 1: fetch search page 0 per keyword; parse ``div.searchresult``
  and carve the result count from its text with the exact
  ``int(results.text.split()[-1])`` (X6, telegraph.py:141);
- expand: ``pages = total // 20`` then ``range(1, pages + 1)``
  (X10, telegraph.py:109-114);
- each search page lists articles under ``ul.storylisting li > a``; the
  href is carved ``href[1:]`` and joined onto the site base
  (telegraph.py:142-145);
- hydration: fetch every article url through the corpus join; the
  article body parses via the generic tg parser (P5,
  telegraph.py:68-98) inside FetchExtract;
- strict-exclusive date window on the parsed ``Published %d.%m.%y``
  date (Q1, telegraph.py:46-49).

No dedup: the reference accumulates pages' articles as-is (D6 —
duplicates across pages surface downstream, reproduced faithfully).
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..corpus import tgo_url
from ..functions.scalars import last_token_int, pages_telegraph
from ..html_mini import parse_html
from ..util import host_of
from .scrapers import (
    _fetch_urls,
    date_window_filter,
    fetch_raw,
    make_fetch_kwargs,
)


def parse_tgo_search(url: str, html: bytes) -> tuple[int, list[str]] | None:
    """One search page -> (total, article urls); None when the result
    container is absent (telegraph.py:146-150 returns None)."""
    root = parse_html(html)
    results = root.find("div", class_="searchresult")
    if results is None:
        return None
    total = last_token_int(results.text)  # X6 telegraph.py:141
    urls: list[str] = []
    host = host_of(url)
    if (listing := root.find("ul", class_="storylisting")) is not None:
        for li in listing.find_all("li"):
            if (a := li.first_child("a")) is not None and (h := a.get("href")):
                # href[1:] carve + join onto the site base
                # (telegraph.py:144-145)
                urls.append(f"https://{host}/{str(h)[1:]}")
    return total, urls


def _explode_search(batch: pa.Table) -> pa.Table:
    out: list[str] = []
    for url, html, found in zip(
        batch["url"].to_pylist(),
        batch["html"].to_pylist(),
        batch["found"].to_pylist(),
    ):
        if not found:
            continue
        parsed = parse_tgo_search(url, bytes(html))
        if parsed is not None:
            out.extend(parsed[1])
    return pa.table({"url": pa.array(out, pa.string())})


def telegraph_online_pipeline(corpus_dir: str, *, start: datetime,
                              end: datetime, keywords: list[str],
                              concurrency: int = 2,
                              fetch_mode: str = "broadcast"):
    fk = make_fetch_kwargs(corpus_dir, fetch_mode=fetch_mode,
                           fetch_concurrency=concurrency)
    seed = rd.from_items(
        [{"url": tgo_url(kw, 0), "q": kw} for kw in keywords]
    )
    # materialized: page 0 is reused (total AND its article list), and
    # the page-expand fetch pool then executes alone in its own graph
    page0 = fetch_raw(seed, fk, concurrency=concurrency).materialize()

    # discovery: one total per keyword (tiny, driver-side — the
    # reference's sequential initial search, telegraph.py:107-114)
    expand: list[dict] = []
    for row in page0.take_all():
        if not row["found"]:
            continue
        parsed = parse_tgo_search(row["url"], bytes(row["html"]))
        if parsed is None:
            continue
        pages = pages_telegraph(parsed[0])  # total // 20
        expand.extend(
            {"url": tgo_url(row["q"], p), "q": row["q"]}
            for p in range(1, pages + 1)
        )

    search_pages = page0
    if expand:
        search_pages = search_pages.union(
            fetch_raw(rd.from_items(expand), fk, concurrency=concurrency)
        )
    article_urls = search_pages.map_batches(
        _explode_search, batch_format="pyarrow"
    ).materialize()  # url-only table; isolates the hydration pool's graph
    articles = _fetch_urls(article_urls, fk, concurrency=concurrency)
    ok = articles.map_batches(
        lambda t: t.filter(
            pc.and_kleene(t["found"], t["parse_ok"]).fill_null(False)
        ),
        batch_format="pyarrow",
    )
    return date_window_filter(
        ok, "published_ts", start, end
    ).select_columns(["url", "title", "author", "published_ts", "text"])
