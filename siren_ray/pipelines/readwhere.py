"""Readwhere e-paper family pipelines (S7/S8/S12/P8/P9/Q6/T2/W2/X3).

Reference: /root/reference/siren/scrapers/epaper/readwhere/core.py
(`BaseReadwhereScraper`), ocr.py (`BaseReadwhereScraperOCR`), with the
config-only subclasses tie.py / tnie.py / tribune.py (paper specs live in
``corpus.READWHERE_PAPERS``).

Pipeline shape (search variant):

1. publishdates discovery (S7, core.py:137-182): one GET per (edition,
   window) — ``viewer/publishdates/{ed}/{start_epoch}/{end_epoch}/json``
   with X3 epoch-seconds formatting — yields the issue list;
2. issue × keyword search fan-out (S8, core.py:72-117):
   ``search/issue/{id}/{kw}``; drop unsuccessful results
   (``sr and sr.status``, core.py:117 — Q6); every child row carries the
   parent PartialArticle fields, OVERWRITING same-named keys
   (core.py:104-106 — parent-field merge);
3. Article.url = base_url / str(issue_id) (core.py:127-128); projection
   include={url} exclude={base_url} (W2, core.py:205-214).

Reference quirks reproduced exactly: ``scrape()`` only consumes the
FIRST edition (`tasks.append(task); break`, core.py:196-203); the OCR
variant additionally only consumes the FIRST issue (ocr.py:186,199
``break  # TODO: remove after benchmarking``).

OCR variant (ocr.py): pagemeta (S12) -> level2 tile pyramid flatten ->
tile fetch -> stateful OCR actor pool (P8/T2, engine built once per
actor) -> keep non-empty (Q6, ocr.py:87-91). Output layout divergence
(documented): the reference serializes one row per ISSUE with
``text = str(list[{tile_url: text}])`` in a single CSV cell
(ocr.py:113-133); the engine emits one row per matched tile with the
issue fields carried — a relational layout the reference data model
flattens into.
"""

from __future__ import annotations

import json
from datetime import datetime

import pyarrow as pa
import ray.data as rd

from ..corpus import (
    READWHERE_PAPERS,
    WINDOW_END,
    WINDOW_START,
    rw_pagemeta_url,
    rw_publishdates_url,
    rw_search_url,
)
from ..functions.project import ProjectionSpec
from ..stages.multimodal import OcrTiles
from .scrapers import fetch_raw, make_fetch_kwargs

# W2 (core.py:205-214): include {url}, exclude {base_url}
RW_SPEC = ProjectionSpec(include=frozenset({"url"}),
                         exclude=frozenset({"base_url"}))


def _first_edition(paper: str) -> tuple[str, str, str]:
    """The reference's `break` quirk: only the first EDITIONS entry is
    ever scraped (core.py:196-203)."""
    host, editions = READWHERE_PAPERS[paper]
    ed_id, ed_name = next(iter(editions.items()))
    return host, ed_id, ed_name


def _issues(fk: dict, paper: str, start: datetime,
            end: datetime) -> tuple[str, str, str, list[dict]]:
    """S7 discovery: publishdates fetch -> PartialArticle rows (tiny,
    driver-side — one request per edition in the reference too)."""
    host, ed_id, ed_name = _first_edition(paper)
    url = rw_publishdates_url(host, ed_id, start, end)
    rows = fetch_raw(rd.from_items([{"url": url}]), fk).take_all()
    issues: list[dict] = []
    for row in rows:
        if not row["found"]:
            continue  # F4: swallowed fetch error -> no issues
        try:
            data = json.loads(bytes(row["html"]).decode())
        except (json.JSONDecodeError, UnicodeDecodeError):
            continue
        for item in data if isinstance(data, list) else []:
            try:
                issues.append({
                    "id": item["id"],
                    "published": datetime.fromisoformat(item["published"]),
                })
            except (KeyError, TypeError, ValueError):
                continue  # P9 parse-or-drop
    return host, ed_id, ed_name, issues


_ARTICLE_SCHEMA = [
    ("url", pa.string()),            # Article.url = base_url / issue_id
    ("id", pa.string()),
    ("published_ts", pa.timestamp("us")),
    ("edition_id", pa.string()),
    ("edition_name", pa.string()),
    ("pageNum", pa.int64()),
    ("excerpt", pa.string()),
    ("issue_id", pa.int64()),
    ("title_id", pa.int64()),
]


def _explode_search(batch: pa.Table) -> pa.Table:
    """S8: one SearchPageResult row -> N Article rows with parent fields
    merged (overwriting, core.py:104-106); status-false dropped (Q6)."""
    cols: dict[str, list] = {name: [] for name, _ in _ARTICLE_SCHEMA}
    for html, found, iid, pub, base, ed_id, ed_name in zip(
        batch["html"].to_pylist(),
        batch["found"].to_pylist(),
        batch["issue_id"].to_pylist(),
        batch["published"].to_pylist(),
        batch["base_url"].to_pylist(),
        batch["edition_id"].to_pylist(),
        batch["edition_name"].to_pylist(),
    ):
        if not found:
            continue
        try:
            data = json.loads(bytes(html).decode())
        except (json.JSONDecodeError, UnicodeDecodeError):
            continue
        if not isinstance(data, dict) or not data.get("status"):
            continue  # `if sr and sr.status` (core.py:117)
        for art in data.get("data") or []:
            if not isinstance(art, dict):
                continue
            try:
                page_num = int(art["pageNum"])
                excerpt = art["excerpt"]
                title_id = int(art["title_id"])
            except (KeyError, TypeError, ValueError):
                continue  # P9
            # parent-field merge OVERWRITES the child's same-named keys
            # (core.py:104-106): id/published/edition_* come from parent
            cols["url"].append(f"{base}/{iid}")
            cols["id"].append(str(iid))
            cols["published_ts"].append(pub)
            cols["edition_id"].append(ed_id)
            cols["edition_name"].append(ed_name)
            cols["pageNum"].append(page_num)
            cols["excerpt"].append(excerpt)
            cols["issue_id"].append(int(iid))
            cols["title_id"].append(title_id)
    return pa.table(
        {name: pa.array(cols[name], typ) for name, typ in _ARTICLE_SCHEMA}
    )


def readwhere_pipeline(corpus_dir: str, paper: str, *,
                       start: datetime = WINDOW_START,
                       end: datetime = WINDOW_END,
                       keywords: list[str], concurrency: int = 2,
                       fetch_mode: str = "broadcast"):
    fk = make_fetch_kwargs(corpus_dir, fetch_mode=fetch_mode,
                           fetch_concurrency=concurrency)
    host, ed_id, ed_name, issues = _issues(fk, paper, start, end)
    seed = [
        {
            "url": rw_search_url(host, issue["id"], kw),
            "issue_id": int(issue["id"]),
            "published": issue["published"],
            "base_url": f"https://{host}",
            "edition_id": ed_id,
            "edition_name": ed_name,
        }
        for issue in issues
        for kw in keywords
    ]
    if not seed:
        return rd.from_arrow(
            pa.table({n: pa.array([], t) for n, t in _ARTICLE_SCHEMA})
        )
    fetched = fetch_raw(rd.from_items(seed), fk, concurrency=concurrency)
    return fetched.map_batches(_explode_search, batch_format="pyarrow")


# --------------------------------------------------------------------------
# OCR variant (ocr.py)
# --------------------------------------------------------------------------

_TILE_COLS = [
    ("url", pa.string()),            # Result.url = partial.url
    ("date_ts", pa.timestamp("us")),  # Result.date = partial.published
    ("edition", pa.string()),        # Result.edition = partial.edition_name
    ("pagenum", pa.int32()),
    ("tile_url", pa.string()),
]


def readwhere_ocr_pipeline(corpus_dir: str, paper: str, *,
                           start: datetime = WINDOW_START,
                           end: datetime = WINDOW_END,
                           keywords: list[str] = (),
                           concurrency: int = 2,
                           fetch_mode: str = "broadcast",
                           ocr_concurrency: int = 2):
    fk = make_fetch_kwargs(corpus_dir, fetch_mode=fetch_mode,
                           fetch_concurrency=concurrency)
    host, ed_id, ed_name, issues = _issues(fk, paper, start, end)
    # ocr.py:186,199: only the FIRST issue of the FIRST edition
    issues = issues[:1]
    tile_rows: dict[str, list] = {name: [] for name, _ in _TILE_COLS}
    for issue in issues:
        iid = issue["id"]
        meta_rows = fetch_raw(
            rd.from_items([{"url": rw_pagemeta_url(host, iid)}]), fk
        ).take_all()
        for row in meta_rows:
            if not row["found"]:
                continue
            try:
                pages = json.loads(bytes(row["html"]).decode())
            except (json.JSONDecodeError, UnicodeDecodeError):
                continue
            for _pgno, page in (pages.items()
                                if isinstance(pages, dict) else []):
                try:
                    chunks = page["levels"]["level2"]["chunks"]
                    pagenum = int(page["pagenum"])
                except (KeyError, TypeError, ValueError):
                    continue
                for chunk in chunks:
                    tile_rows["url"].append(f"https://{host}/{iid}")
                    tile_rows["date_ts"].append(issue["published"])
                    tile_rows["edition"].append(ed_name)
                    tile_rows["pagenum"].append(pagenum)
                    tile_rows["tile_url"].append(chunk["url"])
    tiles = rd.from_arrow(
        pa.table({n: pa.array(tile_rows[n], t) for n, t in _TILE_COLS})
    )
    # tile fetch joins on tile_url (the chunk GET, ocr.py:31-32)
    tiles = tiles.map_batches(
        lambda t: t.append_column("url2", t["url"]).drop_columns(["url"])
        .append_column("url", t["tile_url"]),
        batch_format="pyarrow",
    )
    fetched = fetch_raw(tiles, fk, concurrency=concurrency)
    # stateful OCR actor pool: engine loaded once per actor (P8/T2)
    ocr = fetched.map_batches(
        OcrTiles,
        fn_constructor_kwargs={"data_col": "html"},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, ocr_concurrency),
    )
    # Q6 (ocr.py:87-91): keep only tiles whose OCR found text
    ocr = ocr.map_batches(
        lambda t: t.filter(
            pa.compute.not_equal(
                pa.compute.coalesce(t["ocr_text"], pa.scalar("")), "")
        ),
        batch_format="pyarrow",
    )
    # restore Result field names (url = issue url, text = tile text)
    def _project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url2"],
                "date_ts": t["date_ts"],
                "edition": t["edition"],
                "pagenum": t["pagenum"],
                "tile_url": t["tile_url"],
                "text": t["ocr_text"],
            }
        )

    return ocr.map_batches(_project, batch_format="pyarrow")
