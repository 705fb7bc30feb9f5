"""Per-family scraper pipelines: the reference's user surface, Ray-Data-first.

Each reference scraper (SURVEY.md §2.1/§2.9) becomes a declarative
composition over the Parquet ``pages`` corpus: seed -> fetch(lookup) ->
parse -> filter -> dedup -> project. Live HTTP is replaced by the corpus
join (SURVEY.md §1.3); everything downstream is the same logic.

Date-window semantics are the reference's STRICT EXCLUSIVE bounds
(``start < published < end``; Q1 — mirror.py:60-62, newsminute.py:82,94).
Dedup semantics: D1 exact-by-url set (mirror.py:106-108), D3 first-wins
by headline with deterministic order (ht.py:261-268).
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data as rd

from ..functions.project import ProjectionSpec, project_batch
from ..stages.dedup import dedup_exact
from ..stages.fetch import FetchExtract, broadcast_pages
from ..util import hosts_of, paths_of
import os


def read_pages(corpus_dir: str, *, kinds: tuple[str, ...] | None = None,
               columns: list[str] | None = None,
               ts_start: datetime | None = None,
               ts_end: datetime | None = None):
    """Column-pruned, predicate-pushed read of the pages corpus.

    ``ts_start``/``ts_end`` push the date window into the Parquet read
    (S2 semantics: server-side date filter -> read predicate,
    indiatoday.py:124-136). ``kinds`` prunes by URL-path family.
    """
    # predicate pushed INTO the Parquet scan: row groups whose warc_ts
    # statistics fall outside the window are never read (S2 server-side
    # date filter -> read-level pruning, not a post-read map_batches)
    expr = None
    if ts_start is not None:
        expr = pads.field("warc_ts") > ts_start
    if ts_end is not None:
        e = pads.field("warc_ts") < ts_end
        expr = e if expr is None else expr & e
    ds = rd.read_parquet(
        os.path.join(corpus_dir, "pages"),
        columns=columns,
        filter=expr,
    )
    if kinds:
        pats = tuple(f"/{k}" for k in _KIND_PATHS(kinds))
        ds = ds.map_batches(
            lambda t: t.filter(
                pa.array([any(p in u for p in pats)
                          for u in t["url"].to_pylist()])
            ),
            batch_format="pyarrow",
        )
    return ds


def _KIND_PATHS(kinds):
    m = {"search": ("search/",), "epaper": ("epaper/",),
         "textview": ("textview/",), "apijson": ("api/article/",),
         "ld": ("news/",), "it": ("story/",), "tg": ("tg/",)}
    out = []
    for k in kinds:
        out.extend(m[k])
    return out


def make_fetch_kwargs(corpus_dir: str, *, fetch_mode: str = "broadcast",
                      num_buckets: int = 128, fetch_concurrency: int = 4,
                      cache_buckets: int | None = None) -> dict:
    """Build the FetchExtract constructor kwargs ONCE per pipeline.

    ``broadcast``: one corpus read + one ``ray.put``; every fetch stage of
    the pipeline shares the same object-store ref (round 1 re-read and
    re-put the corpus per stage — twice per mirror run). ``bucketed``: the
    100 TB path — actors read only the hash-bucket partitions their
    batches need (same discipline as CrawlConfig.fetch_mode).
    """
    pages_dir = os.path.join(corpus_dir, "pages")
    if fetch_mode == "broadcast":
        return {"pages_ref": broadcast_pages(pages_dir)}
    owned = -(-num_buckets // max(1, fetch_concurrency)) + 1
    return {
        "pages_dir": pages_dir,
        "num_buckets": num_buckets,
        "cache_buckets": max(cache_buckets or 8, owned),
    }


def _fetch_urls(urls_ds, fetch_kwargs: dict, *, concurrency: int = 4,
                batch_size: int = 1024):
    """frontier-shaped fetch: urls Dataset -> extracted rows (F2 join)."""

    def _prep(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        cols = {
            "url": t["url"],
            "host": pa.array(hosts_of(urls), pa.string()),
            "path": pa.array(paths_of(urls), pa.string()),
        }
        for name in t.column_names:
            if name not in cols:
                cols[name] = t[name]
        return pa.table(cols)

    return urls_ds.map_batches(_prep, batch_format="pyarrow").map_batches(
        FetchExtract,
        fn_constructor_kwargs=fetch_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def _explode_link_col(batch: pa.Table) -> pa.Table:
    """search-page rows -> one row per discovered article url (S1 fan-out)."""
    out = []
    for ls in batch["links"].to_pylist():
        out.extend(ls or [])
    return pa.table({"url": pa.array(out, pa.string())})


def date_window_filter(ds, col: str, start: datetime, end: datetime):
    """Q1: strict exclusive bounds (start < col < end)."""
    def _f(t: pa.Table) -> pa.Table:
        c = t[col]
        mask = pc.and_kleene(
            pc.greater(c, pa.scalar(start)), pc.less(c, pa.scalar(end))
        )
        return t.filter(mask.fill_null(False))
    return ds.map_batches(_f, batch_format="pyarrow")


def keyword_filter(ds, cols: list[str], keywords: list[str],
                   exclude: list[str] = ()):
    """Q2/Q3: lowercase substring OR-match over ``cols``; NOT-contains for
    ``exclude`` (epaper/telegraph.py:80-88; toi.py:211-220 exclude_all).
    """
    kws = [k.lower() for k in keywords]
    exs = [e.lower() for e in exclude]

    def _f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keep = np.zeros(n, dtype=bool)
        lowered = []
        for c in cols:
            lowered.append(
                pc.utf8_lower(pc.coalesce(t[c], pa.scalar(""))).to_pylist()
            )
        for vals in lowered:
            for kw in kws:
                keep |= np.fromiter((kw in v for v in vals), bool, count=n)
        for vals in lowered:
            for ex in exs:
                keep &= ~np.fromiter((ex in v for v in vals), bool, count=n)
        return t.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow")


# --------------------------------------------------------------------------
# family pipelines
# --------------------------------------------------------------------------

MIRROR_SPEC = ProjectionSpec(
    # MirrorOnlineArticle fields (mirror.py:24-31), sorted (set-order fix)
    fields=None, include=frozenset(), exclude=frozenset(),
)


def mirror_pipeline(corpus_dir: str, *, start: datetime, end: datetime,
                    concurrency: int = 4, fetch_mode: str = "broadcast"):
    """Mirror family (S1/P1/P2/Q1/D1/W1, online/mirror.py).

    search pages -> link extraction (Pagination dropped) -> article fetch
    -> ld+json parse-or-drop -> strict date window -> exact URL dedup.
    One corpus ref serves BOTH fetch stages (built once per pipeline).
    """
    fk = make_fetch_kwargs(corpus_dir, fetch_mode=fetch_mode,
                           fetch_concurrency=concurrency)
    searches = read_pages(corpus_dir, kinds=("search",), columns=["url"])
    listed = _fetch_urls(searches, fk, concurrency=concurrency)
    article_urls = listed.map_batches(_explode_link_col, batch_format="pyarrow")
    # keep only mirror-family article urls (BASE_URL / "news" routing)
    article_urls = article_urls.map_batches(
        lambda t: t.filter(
            pa.array(["/news/" in u for u in t["url"].to_pylist()])
        ),
        batch_format="pyarrow",
    )
    articles = _fetch_urls(article_urls, fk, concurrency=concurrency)
    ok = articles.map_batches(
        lambda t: t.filter(
            pc.and_kleene(t["found"], t["parse_ok"]).fill_null(False)
        ),
        batch_format="pyarrow",
    )
    windowed = date_window_filter(ok, "published_ts", start, end)
    deduped = dedup_exact(windowed, "url", "url")
    return deduped.select_columns(
        ["url", "headline", "author", "published_ts", "text"]
    )


def indiatoday_pipeline(corpus_dir: str, *, start: datetime, end: datetime,
                        keywords: list[str], concurrency: int = 4,
                        fetch_mode: str = "broadcast"):
    """IndiaToday family (S2/P3/Q4, online/indiatoday.py): date predicate
    pushed to the read; body text parsed from Story div; keyword filter."""
    fk = make_fetch_kwargs(corpus_dir, fetch_mode=fetch_mode,
                           fetch_concurrency=concurrency)
    arts = read_pages(
        corpus_dir, kinds=("it",), columns=["url", "warc_ts"],
        ts_start=start, ts_end=end,
    )
    fetched = _fetch_urls(arts.select_columns(["url"]), fk,
                          concurrency=concurrency)
    ok = fetched.map_batches(
        lambda t: t.filter(
            pc.and_kleene(t["found"], t["parse_ok"]).fill_null(False)
        ),
        batch_format="pyarrow",
    )
    return keyword_filter(ok, ["text"], keywords).select_columns(
        ["url", "text"]
    )


def ht_pipeline(corpus_dir: str, *, keywords: list[str],
                concurrency: int = 4, fetch_mode: str = "broadcast"):
    """HT family (S6/P7/P9/D2/D3/X7, epaper/ht.py): article JSON hydrate,
    pre-fetch ID dedup (seen semantics), first-wins headline dedup."""
    fk = make_fetch_kwargs(corpus_dir, fetch_mode=fetch_mode,
                           fetch_concurrency=concurrency)
    partials = read_pages(corpus_dir, kinds=("apijson",), columns=["url"])
    # D2: pre-fetch dedup by article id == url here (ids are unique by
    # construction; the frontier seen-filter covers the general case)
    deduped_pre = dedup_exact(partials, "url", "url")
    fetched = _fetch_urls(deduped_pre, fk, concurrency=concurrency)
    ok = fetched.map_batches(
        lambda t: t.filter(
            pc.and_kleene(t["found"], t["parse_ok"]).fill_null(False)
        ),
        batch_format="pyarrow",
    )
    matched = keyword_filter(ok, ["text", "headline"], keywords)
    # D3: first-wins global headline dedup, deterministic order by url
    return dedup_exact(matched, "headline", "url").select_columns(
        ["url", "headline", "text", "published_ts"]
    )


def telegraph_epaper_pipeline(corpus_dir: str, *, keywords: list[str],
                              concurrency: int = 4,
                              fetch_mode: str = "broadcast"):
    """TG e-paper family (S9-S11/P6/Q2, epaper/telegraph.py): Page-N pages
    -> show_pop regex links -> textview parse -> keyword containment."""
    fk = make_fetch_kwargs(corpus_dir, fetch_mode=fetch_mode,
                           fetch_concurrency=concurrency)
    pages = read_pages(corpus_dir, kinds=("epaper",), columns=["url"])
    epaper = _fetch_urls(pages, fk, concurrency=concurrency)
    tv_urls = epaper.map_batches(_explode_link_col, batch_format="pyarrow")
    tv_urls = dedup_exact(tv_urls, "url", "url")
    tv = _fetch_urls(tv_urls, fk, concurrency=concurrency)
    ok = tv.map_batches(
        lambda t: t.filter(
            pc.and_kleene(t["found"], t["parse_ok"]).fill_null(False)
        ),
        batch_format="pyarrow",
    )
    return keyword_filter(ok, ["title", "text"], keywords).select_columns(
        ["url", "title", "text"]
    )


def toi_pipeline(corpus_dir: str, *, include_any: list[str],
                 exclude_all: list[str] = ("bomb",),
                 start: datetime | None = None,
                 end: datetime | None = None, concurrency: int = 4,
                 fetch_mode: str = "broadcast"):
    """TOI family (S5/Q3/W3, epaper/toi.py): boolean include/exclude
    keyword query over article text; hardcoded exclude ["bomb"]
    (toi.py:211-220)."""
    fk = make_fetch_kwargs(corpus_dir, fetch_mode=fetch_mode,
                           fetch_concurrency=concurrency)
    arts = read_pages(corpus_dir, kinds=("tg", "it"), columns=["url"])
    fetched = _fetch_urls(arts, fk, concurrency=concurrency)
    ok = fetched.map_batches(
        lambda t: t.filter(
            pc.and_kleene(t["found"], t["parse_ok"]).fill_null(False)
        ),
        batch_format="pyarrow",
    )
    if start is not None and end is not None:
        ok = date_window_filter(ok, "published_ts", start, end)
    return keyword_filter(
        ok, ["text", "title"], include_any, exclude=list(exclude_all)
    ).select_columns(["url", "title", "text", "published_ts"])


def project_pipeline(ds, spec: ProjectionSpec):
    """W1-W3 CSV-shape projection as a map_batches stage."""
    return ds.map_batches(project_batch, fn_kwargs={"spec": spec},
                          batch_format="pyarrow")
