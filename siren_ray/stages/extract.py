"""Extraction stage: per-kind HTML/JSON parsers as batched Arrow UDFs.

Re-implements the reference parse semantics (SURVEY.md §2.3 P1-P7, P9) as
pure functions over (url, html) suitable for ``Dataset.map_batches``. Page
kind is routed by URL path pattern (as a real crawler routes by site).

Per-family semantics and citations into /root/reference:

- ``search``  (P1, online/mirror.py:64-77): drop the ``div.Pagination
  clearfix`` subtree, then collect every ``a[href]`` under
  ``div.searchcontent``. No text output.
- ``epaper``  (S10/S11, epaper/telegraph.py:24,34-78): read the
  ``#totalpages`` input value; find ``show_pop('(\\d+)','(\\d+)','(\\d+)')``
  over the *raw* HTML; each match yields a textview URL built from the
  page's own host: ``https://{host}/textview/{article_id}/{z}.html``.
- ``textview`` (P6, epaper/telegraph.py:101-123): title = first ``<b>``
  child of ``.haedlinesstory`` (sic), body = "\\n".join of all ``<p>``
  under ``.storyview-div``.
- ``apijson`` (HT article JSON, epaper/ht.py:62-154): body =
  ``StoryContent[0].Body``; headline = first of ``Headlines`` else
  ``" - no data -"``; ``Eddate`` parsed ``%d/%m/%Y`` when present (X2).
  Validation failure (missing required fields) drops the record (P9).
- ``ld``      (P2, online/mirror.py:88-99): first ``script
  [type=application/ld+json]`` -> ``json.loads(strict=False)``; ``author =
  data.get("author",{}).get("name","-")``; ``thumbnailUrl``/``headline``
  default ``"-"``; missing required fields (url/datePublished/dateModified/
  description) -> record dropped.
- ``it``      (P3, online/indiatoday.py:109-114): first
  ``div.Story_description__fq_4S``; body = "\\n".join(<p>.text).
- ``tg``      (P5, online/telegraph.py:68-98): ``.articletsection`` -> h1
  title / h2 header; ``.publishdate`` -> strong=author, span=location, date
  regex ``Published (\\d{2}.\\d{2}.\\d{2}), (\\d{2}:\\d{2}) (\\w{2})``
  parsed ``%d.%m.%y`` (time discarded); body = "\\n".join of ``<p>`` under
  ``#contentbox > div``.

The unified ``text`` output per url is the conformance target: it must be
byte-identical to the corpus golden ``pages.text`` column.

Article-page link discovery (``a[href]`` under ``div.related``) is a
corpus-level convention for multi-round crawling; the reference's own link
discovery only exists on search/epaper pages (S1-S11).
"""

from __future__ import annotations

import json
import re
from datetime import datetime

import numpy as np
import pyarrow as pa

from ..html_mini import parse_html
from ..util import host_of

IMAGE_REGEX = re.compile(r"show_pop\('(\d+)','(\d+)','(\d+)'\)")
TG_DATE_REGEX = re.compile(r"Published (\d{2}\.\d{2}\.\d{2}), (\d{2}:\d{2}) (\w{2})")

KIND_PATTERNS = (
    # aux API families first (they contain generic substrings like
    # "/search/"); no generic parser — dedicated pipelines consume them
    ("/nmapi/", "nmapi"),
    ("/tgsearch/", "tgsearch"),
    ("/search/issue/", "rwsearch"),
    ("/viewer/publishdates/", "rwdates"),
    ("/pagemeta/", "rwmeta"),
    ("/tiles/", "tile"),
    ("/search/", "search"),
    ("/epaper/", "epaper"),
    ("/textview/", "textview"),
    ("/api/article/", "apijson"),
    ("/news/", "ld"),
    ("/story/", "it"),
    ("/tg/", "tg"),
)


def classify_url(url: str) -> str:
    for pat, kind in KIND_PATTERNS:
        if pat in url:
            return kind
    return "unknown"


_EMPTY = {
    "parse_ok": False,
    "text": "",
    "title": None,
    "author": None,
    "headline": None,
    "location": None,
    "published_ts": None,
    "links": [],
}


def parse_search(url: str, html: bytes) -> dict:
    root = parse_html(html)
    if clearfix := root.find("div", class_="Pagination clearfix"):
        clearfix.extract()
    div = root.find("div", class_="searchcontent")
    links: list[str] = []
    if div is not None:
        for tag in div.find_all("a"):
            href = tag.get("href")
            if href:
                links.append(str(href))
    return {**_EMPTY, "parse_ok": True, "links": links}


def parse_epaper(url: str, html: bytes) -> dict:
    """S10/S11 (epaper/telegraph.py:34-78): show_pop links on every page;
    Page-1 additionally reads ``#totalpages`` and discovers its sibling
    pages ``range(2, pages + 1)`` (the reference expands only from the
    first page's count, telegraph.py:70-73)."""
    raw = html.decode("utf-8", errors="replace")
    host = host_of(url)
    links = []
    for m in IMAGE_REGEX.finditer(raw):
        _paper_id, article_id, z = m.groups()
        links.append(f"https://{host}/textview/{article_id}/{z}.html")
    if url.endswith("/Page-1.html"):
        total = 0
        if (el := parse_html(html).find(id_="totalpages")) is not None:
            if (v := el.get("value")) is not None:
                try:
                    total = int(v)
                except (ValueError, TypeError):
                    total = 0  # malformed count: no sibling expansion,
                    # never a crashed batch
        base = url[: -len("Page-1.html")]
        links.extend(f"{base}Page-{p}.html" for p in range(2, total + 1))
    return {**_EMPTY, "parse_ok": True, "links": links}


def parse_textview(url: str, html: bytes) -> dict:
    root = parse_html(html)
    head = root.find(class_="haedlinesstory")
    title = None
    if head is not None and (b := head.first_child("b")) is not None:
        title = b.text
    sview = root.find(class_="storyview-div")
    body = "\n".join(p.text for p in sview.find_all("p")) if sview is not None else ""
    text = (title + "\n" + body) if title is not None else body
    return {**_EMPTY, "parse_ok": True, "title": title, "text": text}


def parse_apijson(url: str, html: bytes) -> dict:
    try:
        data = json.loads(html.decode("utf-8"))
    except (json.JSONDecodeError, UnicodeDecodeError):
        return dict(_EMPTY)
    if not isinstance(data, dict):
        return dict(_EMPTY)  # Model(**json) TypeError -> drop (P9)
    story = data.get("StoryContent") or []
    if not isinstance(story, list) or (story and not isinstance(story[0], dict)):
        return dict(_EMPTY)
    if not story or "PageNumber" not in data or "Body" not in story[0]:
        return dict(_EMPTY)  # ValidationError -> drop (ht.py:120-123)
    body = story[0]["Body"]
    if not isinstance(body, str):
        return dict(_EMPTY)
    heads = story[0].get("Headlines") or []
    headline = heads[0] if isinstance(heads, list) and heads else " - no data -"  # ht.py:151-154
    if not isinstance(headline, str):
        headline = " - no data -"
    ts = None
    if raw := data.get("Eddate"):
        try:
            ts = datetime.strptime(raw, "%d/%m/%Y")  # ht.py:72-74
        except (ValueError, TypeError):
            ts = None
    return {
        **_EMPTY,
        "parse_ok": True,
        "text": body,
        "headline": headline,
        "published_ts": ts,
    }


def parse_ld(url: str, html: bytes) -> dict:
    root = parse_html(html)
    t = root.find("script", attrs={"type": "application/ld+json"})
    raw = t.text if t else "{}"
    try:
        data = json.loads(raw, strict=False)
    except json.JSONDecodeError:
        data = {}
    if not isinstance(data, dict):
        data = {}
    author = data.get("author")
    name = author.get("name") if isinstance(author, dict) else None
    # type-validate, not just key presence: real-world JSON-LD carries
    # list-valued headline/author, and a non-string value would crash
    # the whole extract batch at the Arrow column build instead of
    # dropping the record (P9 validate-or-drop)
    data["author"] = name if isinstance(name, str) else "-"
    data.setdefault("thumbnailUrl", "-")
    data.setdefault("headline", "-")
    links = _related_links(root)
    required = ("url", "datePublished", "dateModified", "description")
    if any(k not in data for k in required):
        return {**_EMPTY, "links": links}  # ValidationError -> drop
    if not (isinstance(data["headline"], str)
            and isinstance(data["description"], str)):
        return {**_EMPTY, "links": links}
    try:
        ts = datetime.fromisoformat(data["datePublished"])
    except (ValueError, TypeError):
        return {**_EMPTY, "links": links}
    return {
        **_EMPTY,
        "parse_ok": True,
        "text": f"{data['headline']}\n{data['description']}",
        "headline": data["headline"],
        "author": data["author"],
        "published_ts": ts,
        "links": links,
    }


def parse_it(url: str, html: bytes) -> dict:
    root = parse_html(html)
    story = root.find("div", class_="Story_description__fq_4S")
    text = "\n".join(p.text for p in story.find_all("p")) if story is not None else ""
    return {**_EMPTY, "parse_ok": True, "text": text, "links": _related_links(root)}


def parse_tg(url: str, html: bytes) -> dict:
    root = parse_html(html)
    title = header = author = location = ""
    ts = None
    if articlet := root.find(class_="articletsection"):
        title = tag.text if (tag := articlet.find("h1")) else ""
        header = tag.text if (tag := articlet.find("h2")) else ""
        if meta := articlet.find(class_="publishdate"):
            author = s.text if (s := meta.find("strong")) else ""
            location = s.text if (s := meta.find("span")) else ""
            if match := TG_DATE_REGEX.search(meta.text):
                ts = datetime.strptime(match.group(1), "%d.%m.%y")
    body = ""
    if (cb := root.find(id_="contentbox")) and (inner := cb.first_child("div")):
        body = "\n".join(p.text for p in inner.find_all("p"))
    _ = header
    return {
        **_EMPTY,
        "parse_ok": True,
        "text": body,
        "title": title,
        "author": author or None,
        "location": location or None,
        "published_ts": ts,
        "links": _related_links(root),
    }


def _related_links(root) -> list[str]:
    rel = root.find("div", class_="related")
    if rel is None:
        return []
    return [str(a.get("href")) for a in rel.find_all("a") if a.get("href")]


_PARSERS = {
    "search": parse_search,
    "epaper": parse_epaper,
    "textview": parse_textview,
    "apijson": parse_apijson,
    "ld": parse_ld,
    "it": parse_it,
    "tg": parse_tg,
}


def extract_one(url: str, html: bytes | None) -> dict:
    if html is None:
        return dict(_EMPTY)
    parser = _PARSERS.get(classify_url(url))
    if parser is None:
        return dict(_EMPTY)
    return parser(url, html)


EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("kind", pa.string()),
        ("parse_ok", pa.bool_()),
        ("text", pa.string()),
        ("title", pa.string()),
        ("author", pa.string()),
        ("headline", pa.string()),
        ("location", pa.string()),
        ("published_ts", pa.timestamp("us")),
        ("links", pa.list_(pa.string())),
    ]
)


def extract_batch(batch: pa.Table) -> pa.Table:
    """Batched extract UDF: (url, html[, ...]) -> EXTRACT_SCHEMA columns.

    Extra input columns are preserved (except html, which is dropped after
    parsing so heavy binary payloads don't flow further down the pipeline).
    """
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    kinds = [classify_url(u) for u in urls]
    results = [extract_one(u, h) for u, h in zip(urls, htmls)]
    cols = {
        "url": pa.array(urls, pa.string()),
        "kind": pa.array(kinds, pa.string()),
        "parse_ok": pa.array([r["parse_ok"] for r in results], pa.bool_()),
        "text": pa.array([r["text"] for r in results], pa.string()),
        "title": pa.array([r["title"] for r in results], pa.string()),
        "author": pa.array([r["author"] for r in results], pa.string()),
        "headline": pa.array([r["headline"] for r in results], pa.string()),
        "location": pa.array([r["location"] for r in results], pa.string()),
        "published_ts": pa.array(
            [r["published_ts"] for r in results], pa.timestamp("us")
        ),
        "links": pa.array([r["links"] for r in results], pa.list_(pa.string())),
    }
    for name in batch.column_names:
        if name not in cols and name != "html":
            cols[name] = batch[name]
    return pa.table(cols)
