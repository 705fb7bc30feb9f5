"""Deterministic synthetic web corpus (Common-Crawl-style ``pages`` table).

Produces the engine's primary input per BASELINE.json ``input_hint``:

    pages(url: string, warc_ts: timestamp[us], html: binary, text: string,
          lang: string)  [+ ``bucket`` partition column = hash(url) % NUM_BUCKETS]

plus frontier-side tables ``seeds(url, priority, seed_id)`` and
``robots(host, disallow_prefixes, crawl_delay_ms)`` and an analytic golden
``links(url, links)`` table (FIXTURES.md §1-§3).

Every page body embeds exactly one of the document shapes the reference
parsers target (FIXTURES.md §3); the ``text`` column is the *golden*
extracted text computed analytically from the embedded content at
generation time (NOT by running our parsers — keeps conformance tests
non-tautological). The container has no bs4, so "reference parse logic"
is encoded as the per-family text rules cited in extract.py.

Everything is a pure function of (seed, row index) -> generation is
parallelized with Ray Data ``map_batches`` and is deterministic at any
parallelism level. Pages are written hash-partitioned by ``bucket`` so the
fetch stage can prune partitions at the read (the 100 TB design point:
frontier and pages co-partitioned by hash(url)).
"""

from __future__ import annotations

import html as html_escape_mod
import json
import os
import random
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .util import hash_strings

SEED = 42
CORPUS_VERSION = 6  # bump to invalidate cached corpora under /tmp
NUM_BUCKETS = 128
NUM_HOSTS = 40
NUM_HOT_HOSTS = 5  # Zipf head: these hosts own most pages (skew exercise)

# corpus timestamp window
TS_START = datetime(2024, 1, 1)
TS_END = datetime(2024, 7, 1)
_TS_SECONDS = int((TS_END - TS_START).total_seconds())

# canonical crawl-config date window (strict-exclusive filter bounds, Q1)
WINDOW_START = datetime(2024, 2, 1)
WINDOW_END = datetime(2024, 5, 1)

KEYWORDS = ["suicide", "kill self", "ends life", "hang self", "found dead"]
IGNORE_KEYWORDS = ["suicide bomb"]

_WORDS = (
    "the state capital city police report officials said district court order "
    "health family farmer student school hospital road river water power crop "
    "minister member party election village town market price bank loan land "
    "festival season rain storm heat train station bus accident rescue team "
    "doctor teacher worker union protest strike meeting scheme project fund"
).split()

_KINDS = (
    ("search", 0, 50),
    ("epaper", 50, 70),
    ("textview", 70, 150),
    ("apijson", 150, 250),
    ("ld", 250, 550),
    ("it", 550, 800),
    ("tg", 800, 1000),
)


def kind_of_index(i: int) -> str:
    m = i % 1000
    for name, lo, hi in _KINDS:
        if lo <= m < hi:
            return name
    raise AssertionError


_HOSTS = [f"news{k}.example.org" for k in range(NUM_HOSTS)]
_HOST_WEIGHTS = np.array([1.0 / (r + 1) ** 1.1 for r in range(NUM_HOSTS)])
_HOST_CUM = np.cumsum(_HOST_WEIGHTS / _HOST_WEIGHTS.sum())


def _rng(i: int) -> random.Random:
    return random.Random((SEED << 34) ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFF))


def host_of_index(i: int) -> str:
    r = _rng(i * 2 + 1).random()
    return _HOSTS[int(np.searchsorted(_HOST_CUM, r))]


_PATHS = {
    # epaper is ISSUE-structured (v6): main row i = its issue's Page-1;
    # Page-2..totalpages are extra corpus rows (S10 page-count discovery,
    # reference epaper/telegraph.py:46-49 `#totalpages` + range(2, pages+1))
    "search": "/search/{i}",
    "epaper": "/epaper/{i}/Page-1.html",
    "textview": "/textview/{i}/71.html",
    "apijson": "/api/article/{i}",
    "ld": "/news/{i}",
    "it": "/story/{i}",
    "tg": "/tg/{i}",
}


def url_of_index(i: int) -> str:
    kind = kind_of_index(i)
    return f"https://{host_of_index(i)}{_PATHS[kind].format(i=i)}"


def ts_of_index(i: int) -> datetime:
    # boundary cases for the strict-exclusive window filter (FIXTURES.md §1)
    if i % 1000 == 551:
        return WINDOW_START
    if i % 1000 == 552:
        return WINDOW_END
    return TS_START + timedelta(seconds=(i * 104729) % _TS_SECONDS)


def lang_of_index(i: int) -> str:
    r = _rng(i * 2 + 7).random()
    if r < 0.90:
        return "en"
    if r < 0.94:
        return "hi"
    if r < 0.97:
        return "ta"
    return "bn"


def _sentence(rng: random.Random, force_kw: str | None = None) -> str:
    nwords = rng.randint(6, 14)
    words = [rng.choice(_WORDS) for _ in range(nwords)]
    if force_kw is not None:
        pos = rng.randint(0, len(words) - 1)
        words[pos:pos] = force_kw.split()
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: random.Random, kw_prob: float = 0.12) -> str:
    nsent = rng.randint(2, 6)
    sents = []
    for _ in range(nsent):
        kw = None
        if rng.random() < kw_prob:
            kw = rng.choice(KEYWORDS + IGNORE_KEYWORDS)
        sents.append(_sentence(rng, kw))
    return " ".join(sents)


def _para_html(p: str, rng: random.Random) -> str:
    """Render paragraph text to HTML such that concatenated text nodes == p."""
    esc = html_escape_mod.escape(p)
    if rng.random() < 0.3:
        words = esc.split(" ")
        if len(words) > 3:
            k = rng.randint(1, len(words) - 2)
            words[k] = f"<b>{words[k]}</b>"
            esc = " ".join(words)
    return esc


# index-range helpers for link targets -----------------------------------

def _indices_of_kind(kind: str, n: int, rng: random.Random, count: int) -> list[int]:
    """Pick `count` random indices < n whose kind == kind (pure arithmetic)."""
    lo, hi = next((lo, hi) for name, lo, hi in _KINDS if name == kind)
    out = []
    blocks = max(1, n // 1000)
    for _ in range(count):
        b = rng.randrange(blocks)
        off = rng.randrange(lo, hi)
        idx = b * 1000 + off
        if idx >= n:
            idx = off  # first block always exists when n >= 1000; clamp
            if idx >= n:
                idx = idx % max(1, n)
        out.append(idx)
    return out


_ARTICLE_KINDS = ("ld", "it", "tg")


def epaper_totalpages(i: int) -> int:
    """Deterministic per-issue page count (S10 `#totalpages` value)."""
    return _rng(i * 2 + 3).randint(2, 5)


def _gen_epaper_extra(i: int, p: int, n: int) -> dict:
    """Page-p (p >= 2) of epaper issue ``i``: its own show_pop textview
    links, same `#totalpages`, no sibling links (only Page-1 discovers
    siblings — the reference expands from the first page's count)."""
    rng = _rng((i << 8) ^ (p * 0x9E37) ^ 0xE9)
    host = host_of_index(i)
    url = f"https://{host}/epaper/{i}/Page-{p}.html"
    total = epaper_totalpages(i)
    k = rng.randint(2, 8)
    targets = _indices_of_kind("textview", n, rng, k)
    pops = "\n".join(
        f"""<div class="thumb" onclick="show_pop('{rng.randrange(10**6)}','{t}','71')">page</div>"""
        for t in targets
    )
    body = f'<input id="totalpages" type="hidden" value="{total}">\n{pops}'
    links = [f"https://{host}/textview/{t}/71.html" for t in targets]
    return _finish(i, url, ts_of_index(i), body, "", lang_of_index(i), links,
                   full_doc=True)


def _gen_rows(i: int, n: int) -> list[dict]:
    """All corpus rows derived from main index ``i`` (main page + any
    per-issue extras), still a pure function of (SEED, i)."""
    main = _gen_page(i, n)
    if kind_of_index(i) != "epaper":
        return [main]
    return [main] + [
        _gen_epaper_extra(i, p, n)
        for p in range(2, epaper_totalpages(i) + 1)
    ]


def _gen_page(i: int, n: int) -> dict:
    rng = _rng(i)
    kind = kind_of_index(i)
    host = host_of_index(i)
    url = url_of_index(i)
    ts = ts_of_index(i)
    lang = lang_of_index(i)
    links: list[str] = []
    text = ""

    if kind == "search":
        k = rng.randint(5, 15)
        targets = _indices_of_kind(rng.choice(_ARTICLE_KINDS), n, rng, k)
        # duplicates within the page (D1/D2 exercise)
        if targets and rng.random() < 0.5:
            targets.append(targets[0])
        hrefs = [url_of_index(t) for t in targets]
        # dead links: URLs not present in the corpus (F4 fetch-error rows)
        for _ in range(rng.randint(0, 2)):
            hrefs.append(f"https://{host}/news/{n + rng.randrange(10_000)}")
        items = "\n".join(
            f'<li><a href="{h}">{html_escape_mod.escape(_sentence(rng))}</a></li>'
            for h in hrefs
        )
        pag = "".join(
            f'<a href="{url_of_index(t)}">{p}</a>'
            for p, t in enumerate(_indices_of_kind("search", n, rng, 2))
        )
        body = (
            f'<div class="searchwrap"><div class="searchcontent"><ul>{items}</ul>'
            f'</div><div class="Pagination clearfix">{pag}</div></div>'
        )
        links = hrefs  # golden: Pagination links are NOT followed (P1)
        text = ""

    elif kind == "epaper":
        total = epaper_totalpages(i)
        k = rng.randint(3, 10)
        targets = _indices_of_kind("textview", n, rng, k)
        pops = "\n".join(
            f"""<div class="thumb" onclick="show_pop('{rng.randrange(10**6)}','{t}','71')">page</div>"""
            for t in targets
        )
        body = (
            f'<input id="totalpages" type="hidden" value="{total}">\n{pops}'
        )
        # Reference semantics (epaper/telegraph.py:51-59): the textview URL is
        # built from the paper's OWN base url; if the target article lives on a
        # different host this is a dead link -> fetch-error row (F4).
        # S10: Page-1 additionally discovers its sibling pages 2..totalpages
        # (epaper/telegraph.py:46-49,70-73 `#totalpages` + range(2, pages+1)).
        links = [f"https://{host}/textview/{t}/71.html" for t in targets] + [
            f"https://{host}/epaper/{i}/Page-{p}.html"
            for p in range(2, total + 1)
        ]
        text = ""

    elif kind == "textview":
        has_title = rng.random() > 0.1
        title = _sentence(rng) if has_title else None
        paras = [_paragraph(rng) for _ in range(rng.randint(12, 30))]
        phtml = "\n".join(f"<p>{_para_html(p, rng)}</p>" for p in paras)
        thtml = (
            f'<div class="haedlinesstory"><b>{html_escape_mod.escape(title)}</b>'
            "<span>meta</span></div>"
            if has_title
            else '<div class="haedlinesstory"><span>meta</span></div>'
        )
        body = f'{thtml}<div class="storyview-div">{phtml}</div>'
        joined = "\n".join(paras)
        text = (title + "\n" + joined) if has_title else joined
        links = []

    elif kind == "apijson":
        body_text = " ".join(_paragraph(rng, kw_prob=0.2) for _ in range(rng.randint(8, 20)))
        headline = f"Headline {rng.randrange(200)}"  # small pool -> dupes (D3)
        eddate = ts.strftime("%d/%m/%Y") if rng.random() > 0.15 else None
        edname = f"Edition {rng.randrange(20)}" if rng.random() > 0.15 else None
        payload = {
            "ParentEdition": f"PE{rng.randrange(9)}",
            "PageId": rng.randrange(10**5),
            "storyid": f"S{i}",
            "Eddate": eddate,
            "Edname": edname,
            "PageNumber": str(rng.randint(1, 24)),
            "LinkPicture": [
                {"caption": "img", "url": f"https://{host}/img/{i}.jpg"}
            ]
            if rng.random() > 0.3
            else [],
            "StoryContent": [
                {"Headlines": [headline] if rng.random() > 0.05 else [],
                 "Body": body_text}
            ],
        }
        body = json.dumps(payload)
        text = body_text
        links = []
        return _finish(i, url, ts, body, text, lang, links, full_doc=False)

    elif kind == "ld":
        headline = _sentence(rng)
        desc = " ".join(_paragraph(rng, kw_prob=0.2) for _ in range(rng.randint(5, 10)))
        data = {
            "url": url,
            "thumbnailUrl": f"https://{host}/thumb/{i}.jpg",
            "datePublished": ts.strftime("%Y-%m-%dT%H:%M:%S"),
            "dateModified": ts.strftime("%Y-%m-%dT%H:%M:%S"),
            "headline": headline,
            "description": desc,
            "author": {"name": f"Author {rng.randrange(500)}"},
        }
        r = rng.random()
        invalid = False
        if r < 0.05:
            del data["datePublished"]  # required field -> record dropped (P2)
            invalid = True
        elif r < 0.15:
            del data["author"]  # author defaults to "-"
        elif r < 0.23:
            del data["thumbnailUrl"]
        elif r < 0.28:
            del data["headline"]  # headline defaults to "-"
        h = data.get("headline", "-")
        d = data.get("description", "-")
        text = "" if invalid else f"{h}\n{d}"
        rel = [url_of_index(t)
               for t in _indices_of_kind(rng.choice(_ARTICLE_KINDS), n, rng,
                                         rng.randint(0, 3))]
        relhtml = "".join(f'<a href="{u}">rel</a>' for u in rel)
        body = (
            '<script type="application/ld+json">'
            + json.dumps(data)
            + f'</script><div class="related">{relhtml}</div>'
        )
        links = rel

    elif kind == "it":
        paras = [_paragraph(rng) for _ in range(rng.randint(15, 40))]
        phtml = "\n".join(f"<p>{_para_html(p, rng)}</p>" for p in paras)
        rel = [url_of_index(t)
               for t in _indices_of_kind(rng.choice(_ARTICLE_KINDS), n, rng,
                                         rng.randint(0, 3))]
        relhtml = "".join(f'<a href="{u}">rel</a>' for u in rel)
        body = (
            f'<div class="Story_description__fq_4S">{phtml}</div>'
            f'<div class="related">{relhtml}</div>'
        )
        text = "\n".join(paras)
        links = rel

    elif kind == "tg":
        title = _sentence(rng)
        header = _sentence(rng)
        author = f"Reporter {rng.randrange(300)}"
        location = rng.choice(["Kolkata", "Delhi", "Mumbai", "Chennai", "Pune"])
        has_date = rng.random() > 0.08
        datestr = (
            f"Published {ts.strftime('%d.%m.%y')}, {ts.strftime('%H:%M')} "
            f"{'AM' if ts.hour < 12 else 'PM'}"
            if has_date
            else "Published recently"
        )
        paras = [_paragraph(rng) for _ in range(rng.randint(15, 40))]
        phtml = "\n".join(f"<p>{_para_html(p, rng)}</p>" for p in paras)
        rel = [url_of_index(t)
               for t in _indices_of_kind(rng.choice(_ARTICLE_KINDS), n, rng,
                                         rng.randint(0, 3))]
        relhtml = "".join(f'<a href="{u}">rel</a>' for u in rel)
        body = (
            f'<div class="articletsection"><h1>{html_escape_mod.escape(title)}</h1>'
            f"<h2>{html_escape_mod.escape(header)}</h2>"
            f'<div class="publishdate"><strong>{author}</strong>'
            f"<span>{location}</span> {datestr}</div></div>"
            f'<div id="contentbox"><div>{phtml}</div></div>'
            f'<div class="related">{relhtml}</div>'
        )
        text = "\n".join(paras)
        links = rel
    else:
        raise AssertionError(kind)

    return _finish(i, url, ts, body, text, lang, links, full_doc=True)


def _finish(i, url, ts, body, text, lang, links, *, full_doc):
    if full_doc:
        html = (
            "<html><head><title>p</title></head><body>"
            f"{body}</body></html>"
        )
    else:
        html = body  # JSON endpoint
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
        "links": links,
    }


# --------------------------------------------------------------------------
# aux API families (constant-size, appended after the n main rows):
# NewsMinute offset-paginated search (S3, online/newsminute.py:44-96),
# Telegraph-online HTML-paginated search (S4, online/telegraph.py:105-150),
# Readwhere publishdates/issue-search/pagemeta/tiles (S7/S8/S12,
# epaper/readwhere/core.py:137-182,72-117, ocr.py:140-151).
# --------------------------------------------------------------------------

NM_HOST = "newsminute.example.org"
NM_PAGE_SIZE = 100
TGO_HOST = _HOSTS[0]  # Zipf head: plenty of same-host tg articles
TGO_PAGE_SIZE = 20

# Readwhere papers: BASE_URL stand-in hosts + the reference's edition
# config tables verbatim (config-only subclassing surface, SURVEY.md §2.9;
# tie.py:8-19, tnie.py:8-43 (subset), tribune.py:7-22 (subset)).
READWHERE_PAPERS: dict[str, tuple[str, dict[str, str]]] = {
    "tie": (
        "epaper.indianexpress.example.org",
        {"271": "CHANDIGARH", "336": "KOLKATA", "10015": "JAIPUR",
         "433": "LUCKNOW", "300": "AHMEDABAD", "266": "PUNE",
         "236": "MUMBAI", "226": "DELHI"},
    ),
    "tnie": (
        "epaper.newindianexpress.example.org",
        {"6539": "Kollam", "3469": "Kozhikode", "11447": "Kannur",
         "3353": "Chennai", "3381": "Hyderabad", "3357": "Bengaluru"},
    ),
    "tribune": (
        "epaper.tribuneindia.example.org",
        {"702": "Jalandhar Edition", "684": "Bathinda Edition",
         "109": "Ludhiana Tribune", "106": "The Tribune"},
    ),
}
# corpus generates data for the first N_GEN_EDITIONS editions per paper;
# the reference's scrape() quirk only ever consumes the FIRST
# (`tasks.append(task); break`, readwhere/core.py:196-203) — the second
# exists so conformance tests can assert the quirk is reproduced.
N_GEN_EDITIONS = 2


def _slug(kw: str) -> str:
    return kw.replace(" ", "-")


def _aux_rng(*parts) -> random.Random:
    h = 0x5AF3
    for p in parts:
        for ch in str(p):
            h = (h * 131 + ord(ch)) & 0xFFFFFFFF
    return random.Random((SEED << 20) ^ h)


def _aux_ts(rng: random.Random) -> datetime:
    return TS_START + timedelta(seconds=rng.randrange(_TS_SECONDS))


def _aux_row(url: str, ts: datetime, payload: bytes, lang: str = "en") -> dict:
    return {"url": url, "warc_ts": ts, "html": payload, "text": "",
            "lang": lang, "links": []}


# -- NewsMinute ------------------------------------------------------------

def nm_total(kw: str) -> int:
    return 300 + _aux_rng("nmtotal", kw).randrange(10) * 100 + 37


def nm_url(kw: str, offset: int) -> str:
    # stand-in for BASE_URL % {"q": f'"{kw}"', "limit": 100, "offset": o}
    # (newsminute.py:63-68) — params path-encoded for corpus lookup
    return (f"https://{NM_HOST}/nmapi/advanced-search/"
            f"{_slug(kw)}/{offset}")


def _nm_article(rng: random.Random, kw: str, offset: int, j: int) -> dict:
    ts = _aux_ts(rng)
    cards = []
    for _c in range(rng.randint(1, 3)):
        stories = [{"text": _sentence(rng, kw if rng.random() < 0.3 else None)}
                   for _s in range(rng.randint(1, 4))]
        cards.append({"story-elements": stories})
    return {
        "url": f"https://{NM_HOST}/story/{_slug(kw)}-{offset}-{j}",
        "author-name": f"NM Author {rng.randrange(40)}",
        "headline": f"NM {kw} {offset}+{j} " + _sentence(rng),
        "subheadline": _sentence(rng) if rng.random() > 0.3 else None,
        "published-at": ts.strftime("%Y-%m-%dT%H:%M:%S"),
        "cards": cards,
    }


def nm_flatten_text(article: dict) -> str:
    """Analytic golden for P4 (newsminute.py:31-35)."""
    return "\n".join(
        story.get("text", "")
        for card in article["cards"]
        for story in card["story-elements"]
    )


def gen_nm_pages() -> list[dict]:
    rows = []
    for kw in KEYWORDS:
        total = nm_total(kw)
        for offset in range(0, ((total // NM_PAGE_SIZE) + 1) * NM_PAGE_SIZE,
                            NM_PAGE_SIZE):
            rng = _aux_rng("nm", kw, offset)
            if offset > 0 and rng.random() < 0.08:
                payload = {"error": "rate limited"}  # newsminute.py:74-75
            else:
                items = [_nm_article(rng, kw, offset, j)
                         for j in range(rng.randint(3, 8))]
                payload = {"total": total, "items": items}
            rows.append(_aux_row(nm_url(kw, offset), _aux_ts(rng),
                                 json.dumps(payload).encode()))
    return rows


# -- Telegraph online search ----------------------------------------------

def tgo_total(kw: str) -> int:
    return 60 + _aux_rng("tgototal", kw).randrange(10) * TGO_PAGE_SIZE + 3


def tgo_url(kw: str, page: int) -> str:
    return f"https://{TGO_HOST}/tgsearch/{_slug(kw)}/{page}"


def gen_tgo_pages(n: int) -> list[dict]:
    rows = []
    lo, hi = next((lo, hi) for name, lo, hi in _KINDS if name == "tg")
    blocks = max(1, n // 1000)
    for kw in KEYWORDS:
        total = tgo_total(kw)
        for page in range(0, total // TGO_PAGE_SIZE + 1):
            rng = _aux_rng("tgo", kw, page)
            hrefs = []
            # same-host tg articles only (the reference joins hrefs onto
            # its own BASE_URL, online/telegraph.py:142-145)
            for _ in range(rng.randint(3, 6)):
                for _try in range(200):
                    idx = rng.randrange(blocks) * 1000 + rng.randrange(lo, hi)
                    if idx < n and host_of_index(idx) == TGO_HOST:
                        hrefs.append(f"/tg/{idx}")
                        break
            if rng.random() < 0.3:  # dead link -> F4 fetch-error row
                hrefs.append(f"/tg/{n + rng.randrange(10_000)}")
            lis = "".join(
                f'<li><a href="{h}">{html_escape_mod.escape(_sentence(rng))}'
                "</a></li>"
                for h in hrefs
            )
            body = (
                f'<div class="searchresult">About results for {kw}: {total}'
                f'</div><ul class="storylisting">{lis}</ul>'
            )
            html = f"<html><head></head><body>{body}</body></html>"
            rows.append(_aux_row(tgo_url(kw, page), _aux_ts(rng),
                                 html.encode()))
    return rows


# -- Readwhere -------------------------------------------------------------

def rw_publishdates_url(host: str, edition_id: str, start: datetime,
                        end: datetime) -> str:
    # readwhere/core.py:169-172 (X3 epoch seconds)
    return (f"https://{host}/viewer/publishdates/{edition_id}/"
            f"{int(start.timestamp())}/{int(end.timestamp())}/json")


def rw_search_url(host: str, issue_id: int, kw: str) -> str:
    return f"https://{host}/search/issue/{issue_id}/{kw}"


def rw_pagemeta_url(host: str, issue_id: int) -> str:
    # exact query constants from readwhere/ocr.py:142-148
    return (f"https://{host}/pagemeta/get/{issue_id}/1-50"
            "?type=newspaper&user=2341985"
            "&crypt=313581a5b8d413a08e027161b18e2921857250ef&key=1711454980")


def rw_tile_url(host: str, issue_id: int, pagenum: int, cx: int) -> str:
    return f"https://{host}/tiles/{issue_id}/{pagenum}/{cx}.jpg"


def rw_issues(paper: str, edition_id: str) -> list[dict]:
    """Issues of an edition inside the canonical window (the publishdates
    endpoint is server-side filtered; the corpus embodies the filtered
    response for the canonical window)."""
    rng = _aux_rng("rwissues", paper, edition_id)
    span = int((WINDOW_END - WINDOW_START).total_seconds()) - 3600
    out = []
    for k in range(rng.randint(4, 7)):
        ts = WINDOW_START + timedelta(seconds=1800 + rng.randrange(span))
        out.append({"id": int(edition_id) * 100 + k,
                    "published": ts.strftime("%Y-%m-%dT%H:%M:%S")})
    return out


def gen_readwhere_pages() -> list[dict]:
    rows = []
    for paper, (host, editions) in READWHERE_PAPERS.items():
        for ed_id, _ed_name in list(editions.items())[:N_GEN_EDITIONS]:
            issues = rw_issues(paper, ed_id)
            rng0 = _aux_rng("rwpd", paper, ed_id)
            rows.append(_aux_row(
                rw_publishdates_url(host, ed_id, WINDOW_START, WINDOW_END),
                _aux_ts(rng0), json.dumps(issues).encode(),
            ))
            for issue in issues:
                iid = issue["id"]
                for kw in KEYWORDS:
                    rng = _aux_rng("rwsearch", paper, iid, kw)
                    if rng.random() < 0.1:
                        payload = {"status": False}
                    else:
                        data = []
                        for j in range(rng.randint(0, 4)):
                            data.append({
                                "id": f"doc-{iid}-{j}",
                                "pageNum": rng.randint(1, 24),
                                "excerpt": _sentence(
                                    rng, kw if rng.random() < 0.6 else None),
                                "issue_id": iid,
                                "title_id": rng.randrange(10**4),
                                "published": "1970-01-01T00:00:00",
                            })
                        payload = {"status": True, "numFound": len(data),
                                   "start": 0, "to": len(data), "data": data}
                    rows.append(_aux_row(rw_search_url(host, iid, kw),
                                         _aux_ts(rng),
                                         json.dumps(payload).encode()))
                # pagemeta + tiles (S12 tile pyramid; only level2 is real)
                rngm = _aux_rng("rwmeta", paper, iid)
                pages = {}
                for pg in range(1, rngm.randint(2, 4) + 1):
                    chunks = []
                    for cx in range(rngm.randint(3, 6)):
                        turl = rw_tile_url(host, iid, pg, cx)
                        chunks.append({
                            "tx": cx % 3 * 512, "ty": cx // 3 * 512,
                            "width": 512, "height": 512, "url": turl,
                        })
                        has_text = rngm.random() < 0.6
                        payload_b = bytes([1 if has_text else 2]) + \
                            rngm.randbytes(47)
                        rows.append(_aux_row(turl, _aux_ts(rngm), payload_b))
                    empty = {"width": 0, "height": 0, "chunks": []}
                    pages[str(pg)] = {
                        "key": f"K{iid}-{pg}", "pagenum": pg,
                        "levels": {
                            "thumbs": empty, "level0": empty,
                            "leveldefault": empty, "level1": empty,
                            "header": empty,
                            "level2": {"width": 1536, "height": 1024,
                                       "chunks": chunks},
                        },
                    }
                rows.append(_aux_row(rw_pagemeta_url(host, iid),
                                     _aux_ts(rngm),
                                     json.dumps(pages).encode()))
    return rows


def gen_aux_pages(n: int) -> list[dict]:
    return gen_nm_pages() + gen_tgo_pages(n) + gen_readwhere_pages()


_PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("bucket", pa.int32()),
    ]
)


def _pages_table(rows: list[dict]) -> pa.Table:
    urls = [r["url"] for r in rows]
    buckets = (hash_strings(urls) % NUM_BUCKETS).astype(np.int32)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "bucket": pa.array(buckets),
        }
    )


def _links_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "links": pa.array([r["links"] for r in rows],
                              pa.list_(pa.string())),
        }
    )


def _gen_batch(batch: pa.Table, n: int) -> pa.Table:
    rows = [r for i in batch["id"].to_pylist() for r in _gen_rows(int(i), n)]
    return _pages_table(rows)


def _gen_links_batch(batch: pa.Table, n: int) -> pa.Table:
    rows = [r for i in batch["id"].to_pylist() for r in _gen_rows(int(i), n)]
    return _links_table(rows)


def gen_seeds(n: int, num_seeds: int | None = None) -> pa.Table:
    num_seeds = num_seeds or max(8, n // 25)
    idxs = [i for i in range(n) if kind_of_index(i) == "search"][:num_seeds]
    return pa.table(
        {
            "url": pa.array([url_of_index(i) for i in idxs], pa.string()),
            "priority": pa.array(
                [1.0 - 0.001 * r for r in range(len(idxs))], pa.float64()
            ),
            "seed_id": pa.array(list(range(len(idxs))), pa.int64()),
        }
    )


def gen_robots() -> pa.Table:
    rng = random.Random(SEED ^ 0xB0B)
    hosts, dis, delay = [], [], []
    for h in _HOSTS:
        if rng.random() < 0.5:
            hosts.append(h)
            d = []
            if rng.random() < 0.3:
                d.append("/api/")
            if rng.random() < 0.15:
                d.append("/tg/")
            dis.append(d)
            delay.append(rng.choice([0, 100, 200, 500, 1000]))
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "disallow_prefixes": pa.array(dis, pa.list_(pa.string())),
            "crawl_delay_ms": pa.array(delay, pa.int64()),
        }
    )


def n_for_sf(sf: float) -> int:
    return max(1000, int(2_000_000 * sf))


def corpus_dir(sf: float, root: str | None = None) -> str:
    root = root or os.environ.get("SIREN_RAY_CORPUS_ROOT", "/tmp/siren_ray_corpus")
    return os.path.join(root, f"sf{sf:g}")


def ensure_corpus(sf: float, root: str | None = None) -> str:
    """Generate (once, cached) the corpus for scale factor ``sf``.

    Returns the corpus directory containing pages/ (bucket-partitioned
    parquet), seeds.parquet, robots.parquet, links.parquet.
    """
    import ray.data as rd

    d = corpus_dir(sf, root)
    marker = os.path.join(d, "_SUCCESS")
    params_path = os.path.join(d, "params.json")
    if os.path.exists(marker):
        try:
            with open(params_path) as f:
                if json.load(f).get("version") == CORPUS_VERSION:
                    return d
        except (OSError, json.JSONDecodeError):
            pass
        import shutil

        shutil.rmtree(d)
    n = n_for_sf(sf)
    os.makedirs(d, exist_ok=True)
    aux = gen_aux_pages(n)  # constant-size API families, driver-side
    ds = rd.range(n).map_batches(
        _gen_batch, batch_format="pyarrow", batch_size=2000, fn_kwargs={"n": n}
    ).union(rd.from_arrow(_pages_table(aux)))
    ds.write_parquet(os.path.join(d, "pages"), partition_cols=["bucket"])
    rd.range(n).map_batches(
        _gen_links_batch, batch_format="pyarrow", batch_size=2000,
        fn_kwargs={"n": n},
    ).union(rd.from_arrow(_links_table(aux))).write_parquet(
        os.path.join(d, "links")
    )
    pq.write_table(gen_seeds(n), os.path.join(d, "seeds.parquet"))
    pq.write_table(gen_robots(), os.path.join(d, "robots.parquet"))
    with open(params_path, "w") as f:
        json.dump({"sf": sf, "n": n, "seed": SEED, "buckets": NUM_BUCKETS,
                   "version": CORPUS_VERSION}, f)
    with open(marker, "w") as f:
        f.write("ok")
    return d
