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

from dataclasses import dataclass

from ..functions.project import ProjectionSpec, project_batch
from ..stages.dedup import dedup_exact
from ..stages.fetch import (broadcast_pages, fetch_extract_task,
                            fetch_raw_task)
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
        # the generic '/search/' family must not swallow the readwhere
        # issue-search API pages ('/search/issue/...'), which have their
        # own dedicated pipeline — without the carve-out every mirror
        # run fetched and mis-parsed the whole readwhere corpus slice
        excl = ("/search/issue/",) if "search" in kinds else ()
        ds = ds.map_batches(
            lambda t: t.filter(
                pa.array([any(p in u for p in pats)
                          and not any(x in u for x in excl)
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

    # TASK pool with per-worker cached corpus state (CLAUDE.md
    # tiny-state rule; same discipline as the crawl's distributed
    # round) — actor pools paid spin-up per pipeline stage and stacked
    # into the documented multi-pool deadlock hazard on small clusters
    _ = concurrency  # pool width is the task scheduler's to decide
    return urls_ds.map_batches(_prep, batch_format="pyarrow").map_batches(
        fetch_extract_task,
        fn_kwargs=dict(fetch_kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def fetch_raw(urls_ds, fetch_kwargs: dict, *, concurrency: int = 2,
              batch_size: int = 1024):
    """Lookup-only fetch (html + found, no extract) — the hydration stage
    for API-JSON families parsed by dedicated multi-record parsers."""
    _ = concurrency  # pool width is the task scheduler's to decide
    return urls_ds.map_batches(
        fetch_raw_task,
        fn_kwargs=dict(fetch_kwargs),
        batch_format="pyarrow",
        batch_size=batch_size,
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
        # fully Arrow: utf8_lower + match_substring kernels, no per-row
        # Python in this hot path
        lowered = [
            pc.utf8_lower(pc.coalesce(pc.cast(t[c], pa.string()),
                                      pa.scalar("")))
            for c in cols
        ]
        for col in lowered:
            for kw in kws:
                keep |= pc.match_substring(col, kw).to_numpy(
                    zero_copy_only=False)
        for col in lowered:
            for ex in exs:
                keep &= ~pc.match_substring(col, ex).to_numpy(
                    zero_copy_only=False)
        return t.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow")


@dataclass(frozen=True)
class ToiQuerySpec:
    """The TOI POST boolean search body (S5, epaper/toi.py:101-147):
    allOfThese / exactPhrase / anyOfThese / excludeThese / byline /
    location. Server-side in the reference; the engine expresses it as a
    vectorized lowercase-substring predicate (Q2/Q3 conventions), with
    byline/location matched against their own columns."""

    include_all: tuple[str, ...] = ()
    include_exact: str = ""
    include_any: tuple[str, ...] = ()
    exclude_all: tuple[str, ...] = ()
    byline: str = ""
    location: str = ""


def toi_query_filter(ds, spec: ToiQuerySpec, *, text_cols=("text",),
                     byline_col: str | None = None,
                     location_col: str | None = None):
    """Vectorized boolean-query filter over ``text_cols``.

    Match rule (engine semantics for the opaque server-side search):
    every ``include_all`` term present AND ``include_exact`` present (if
    set) AND any ``include_any`` term present (if any given) AND no
    ``exclude_all`` term present; ``byline``/``location`` are substring
    matches on their own columns. All matching is lowercased substring
    (X9, epaper/telegraph.py:82-84).
    """
    all_of = tuple(s.lower() for s in spec.include_all if s)
    exact = spec.include_exact.lower()
    any_of = tuple(s.lower() for s in spec.include_any if s)
    excl = tuple(s.lower() for s in spec.exclude_all if s)

    def _col(t: pa.Table, c: str):
        # cast first: an all-null block arrives as null-typed and breaks
        # coalesce/utf8_lower otherwise
        arr = pc.cast(t[c], pa.string())
        return pc.utf8_lower(pc.coalesce(arr, pa.scalar("")))

    def _f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        hays = [_col(t, c) for c in text_cols]

        def contains(term: str) -> np.ndarray:
            m = np.zeros(n, dtype=bool)
            for col in hays:
                m |= pc.match_substring(col, term).to_numpy(
                    zero_copy_only=False)
            return m

        keep = np.ones(n, dtype=bool)
        for term in all_of:
            keep &= contains(term)
        if exact:
            keep &= contains(exact)
        if any_of:
            m = np.zeros(n, dtype=bool)
            for term in any_of:
                m |= contains(term)
            keep &= m
        for term in excl:
            keep &= ~contains(term)
        if spec.byline and byline_col:
            keep &= pc.match_substring(
                _col(t, byline_col), spec.byline.lower()
            ).to_numpy(zero_copy_only=False)
        if spec.location and location_col:
            keep &= pc.match_substring(
                _col(t, location_col), spec.location.lower()
            ).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow")


# --------------------------------------------------------------------------
# family pipelines
# --------------------------------------------------------------------------

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


def _keep_urls_containing(ds, pat: str):
    return ds.map_batches(
        lambda t: t.filter(
            pa.array([pat in u for u in t["url"].to_pylist()])
        ),
        batch_format="pyarrow",
    )


def telegraph_epaper_pipeline(corpus_dir: str, *, keywords: list[str],
                              concurrency: int = 4,
                              fetch_mode: str = "broadcast"):
    """TG e-paper family (S9-S11/P6/Q2/X10, epaper/telegraph.py).

    Two-phase, as the reference runs it (telegraph.py:34-78): fetch each
    issue's Page-1, read ``#totalpages`` and expand to sibling pages
    2..N (S10); every page's ``show_pop`` regex yields textview links
    (S11); textview parse (P6) then keyword containment (Q2).
    """
    fk = make_fetch_kwargs(corpus_dir, fetch_mode=fetch_mode,
                           fetch_concurrency=concurrency)
    page1 = _keep_urls_containing(
        read_pages(corpus_dir, kinds=("epaper",), columns=["url"]),
        "/Page-1.html",
    )
    ep1 = _fetch_urls(page1, fk, concurrency=concurrency)
    # materialize the link tables (urls only — tiny even at scale): each
    # phase's fetch actor pool then executes ALONE instead of three pools
    # + a sort shuffle coexisting in one graph (deadlocks small clusters)
    links1 = ep1.map_batches(
        _explode_link_col, batch_format="pyarrow"
    ).materialize()
    # S10 expansion: sibling Page-2..N discovered from Page-1's count
    sibling_pages = _keep_urls_containing(links1, "/epaper/")
    ep_rest = _fetch_urls(sibling_pages, fk, concurrency=concurrency)
    links_rest = ep_rest.map_batches(
        _explode_link_col, batch_format="pyarrow"
    ).materialize()
    tv_urls = _keep_urls_containing(links1, "/textview/").union(
        _keep_urls_containing(links_rest, "/textview/")
    )
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


def toi_pipeline(corpus_dir: str, *, include_any: list[str] = (),
                 exclude_all: list[str] = ("bomb",),
                 start: datetime | None = None,
                 end: datetime | None = None, concurrency: int = 4,
                 fetch_mode: str = "broadcast",
                 spec: ToiQuerySpec | None = None):
    """TOI family (S5/Q3/W3, epaper/toi.py): boolean query over article
    text. ``scrape()`` uses include_any=[term] + hardcoded exclude
    ["bomb"] (toi.py:211-220); pass ``spec`` for the full query surface
    (allOfThese/exactPhrase/anyOfThese/excludeThese/byline/location)."""
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
    if spec is None:
        spec = ToiQuerySpec(include_any=tuple(include_any),
                            exclude_all=tuple(exclude_all))
    return toi_query_filter(
        ok, spec, text_cols=("text", "title"), byline_col="author",
        location_col="location",
    ).select_columns(["url", "title", "text", "published_ts"])


def project_pipeline(ds, spec: ProjectionSpec):
    """W1-W3 CSV-shape projection as a map_batches stage."""
    return ds.map_batches(project_batch, fn_kwargs={"spec": spec},
                          batch_format="pyarrow")
