"""Golden tests for the API-search families (NewsMinute, Telegraph
online, Readwhere) and the full registry surface.

Expected sets are computed driver-side from the corpus payload bytes
(JSON / raw HTML regex), independent of the engine's parser code paths —
same discipline as test_scrapers.py."""

import json
import os
import re
from datetime import datetime

import pyarrow.dataset as pads
import pytest

from siren_ray import corpus
from siren_ray.corpus import KEYWORDS, WINDOW_END, WINDOW_START
from siren_ray.functions.scalars import expand_offsets_newsminute


@pytest.fixture(scope="module")
def pages(corpus_sf0001):
    t = pads.dataset(
        os.path.join(corpus_sf0001, "pages"), partitioning="hive"
    ).to_table(columns=["url", "warc_ts", "html"])
    return {
        u: (ts, h)
        for u, ts, h in zip(
            t["url"].to_pylist(), t["warc_ts"].to_pylist(),
            t["html"].to_pylist(),
        )
    }


def _nm_flat(article):
    return "\n".join(
        s.get("text", "")
        for c in article["cards"]
        for s in c["story-elements"]
    )


def test_newsminute_pipeline_golden(ray_session, corpus_sf0001, pages):
    from siren_ray.pipelines.newsminute import newsminute_pipeline

    kws = KEYWORDS[:2]
    got = newsminute_pipeline(
        corpus_sf0001, start=WINDOW_START, end=WINDOW_END, keywords=kws
    ).to_pandas()

    expected = {}
    for kw in kws:
        total = json.loads(
            bytes(pages[corpus.nm_url(kw, 0)][1]).decode()
        )["total"]
        # the exact fetched-offset set: 0 plus the (total//100)-1 /
        # range(1, pages-1) quirk — later offsets exist in the corpus but
        # are intentionally never fetched
        offsets = [0] + expand_offsets_newsminute(total)
        for off in offsets:
            payload = json.loads(bytes(pages[corpus.nm_url(kw, off)][1]).decode())
            if payload.get("error"):
                continue
            for item in payload["items"]:
                ts = datetime.fromisoformat(item["published-at"])
                if WINDOW_START < ts < WINDOW_END:
                    expected[item["url"]] = _nm_flat(item)
    assert set(got["url"]) == set(expected)
    for u, txt in zip(got["url"], got["text"]):
        assert txt == expected[u]
    # projection surface (W2): fields = model ∪ {text} − {cards, author_name}
    from siren_ray.functions.project import project_batch
    from siren_ray.pipelines.newsminute import NM_SPEC
    import pyarrow as pa

    proj = project_batch(
        pa.table({"url": ["u"], "author_name": ["a"], "headline": ["h"],
                  "subheadline": ["s"], "published_at": ["2024-01-01"],
                  "cards": ["c"], "text": ["t"]}),
        NM_SPEC,
    )
    assert "author_name" not in proj.column_names
    assert "cards" not in proj.column_names
    assert "text" in proj.column_names


def test_newsminute_tail_pages_not_fetched(pages):
    """The corpus embeds offset pages past the quirk's range; they must
    exist (otherwise the quirk is untestable)."""
    kw = KEYWORDS[0]
    total = json.loads(bytes(pages[corpus.nm_url(kw, 0)][1]).decode())["total"]
    fetched = {0} | set(expand_offsets_newsminute(total))
    all_offsets = set(range(0, ((total // 100) + 1) * 100, 100))
    assert all_offsets - fetched, "corpus must contain unfetched tail pages"


TG_DATE = re.compile(rb"Published (\d{2}\.\d{2}\.\d{2})")


def test_telegraph_online_pipeline_golden(ray_session, corpus_sf0001, pages):
    from siren_ray.pipelines.telegraph_online import telegraph_online_pipeline

    kws = KEYWORDS[:2]
    got = telegraph_online_pipeline(
        corpus_sf0001, start=WINDOW_START, end=WINDOW_END, keywords=kws
    ).to_pandas()

    expected = set()
    for kw in kws:
        p0 = bytes(pages[corpus.tgo_url(kw, 0)][1])
        total = int(
            re.search(rb'class="searchresult">[^<]*?(\d+)</div>', p0).group(1)
        )
        for page in range(0, total // 20 + 1):
            html = bytes(pages[corpus.tgo_url(kw, page)][1])
            for href in re.findall(rb'href="(/tg/\d+)"', html):
                art_url = f"https://{corpus.TGO_HOST}{href.decode()}"
                if art_url not in pages:
                    continue  # dead link -> fetch-error row, dropped
                m = TG_DATE.search(bytes(pages[art_url][1]))
                if not m:
                    continue  # "Published recently" -> no date -> dropped
                ts = datetime.strptime(m.group(1).decode(), "%d.%m.%y")
                if WINDOW_START < ts < WINDOW_END:
                    expected.add(art_url)
    assert set(got["url"]) == expected
    assert len(got) >= len(expected)  # no dedup (reference accumulates)


def test_readwhere_pipeline_golden(ray_session, corpus_sf0001, pages):
    from siren_ray.pipelines.readwhere import readwhere_pipeline

    kws = KEYWORDS[:3]
    for paper, (host, editions) in corpus.READWHERE_PAPERS.items():
        got = readwhere_pipeline(
            corpus_sf0001, paper, keywords=kws
        ).to_pandas()
        ed_id, ed_name = next(iter(editions.items()))
        issues = json.loads(bytes(pages[corpus.rw_publishdates_url(
            host, ed_id, WINDOW_START, WINDOW_END)][1]).decode())
        expected = []
        for issue in issues:
            for kw in kws:
                payload = json.loads(bytes(
                    pages[corpus.rw_search_url(host, issue["id"], kw)][1]
                ).decode())
                if not payload.get("status"):
                    continue
                for art in payload["data"]:
                    expected.append((issue["id"], art["excerpt"]))
        assert sorted(zip(got["issue_id"], got["excerpt"])) == sorted(expected)
        # parent-field merge: edition fields come from the parent partial
        if len(got):
            assert set(got["edition_name"]) == {ed_name}
            assert set(got["edition_id"]) == {ed_id}


def test_readwhere_first_edition_only(ray_session, corpus_sf0001, pages):
    """The corpus HAS data for a second edition; the pipeline must ignore
    it (scrape()'s `tasks.append(task); break`, core.py:196-203)."""
    from siren_ray.pipelines.readwhere import readwhere_pipeline

    host, editions = corpus.READWHERE_PAPERS["tie"]
    eds = list(editions.items())
    ed2_url = corpus.rw_publishdates_url(host, eds[1][0], WINDOW_START,
                                         WINDOW_END)
    assert ed2_url in pages  # second edition's data exists...
    got = readwhere_pipeline(corpus_sf0001, "tie",
                             keywords=KEYWORDS[:2]).to_pandas()
    assert set(got["edition_id"]) <= {eds[0][0]}  # ...but is never scraped


def test_readwhere_ocr_golden(ray_session, corpus_sf0001, pages):
    from siren_ray.pipelines.readwhere import readwhere_ocr_pipeline
    from siren_ray.stages.multimodal import FakeOcrEngine

    got = readwhere_ocr_pipeline(corpus_sf0001, "tie").to_pandas()
    host, editions = corpus.READWHERE_PAPERS["tie"]
    ed_id, ed_name = next(iter(editions.items()))
    issues = json.loads(bytes(pages[corpus.rw_publishdates_url(
        host, ed_id, WINDOW_START, WINDOW_END)][1]).decode())
    # ocr.py:186,199 quirk: FIRST issue only
    iid = issues[0]["id"]
    meta = json.loads(bytes(pages[corpus.rw_pagemeta_url(host, iid)][1]).decode())
    engine = FakeOcrEngine(init_cost_s=0)
    expected = {}
    for page in meta.values():
        for chunk in page["levels"]["level2"]["chunks"]:
            text = engine.image_to_string(bytes(pages[chunk["url"]][1]))
            if text:
                expected[chunk["url"]] = text
    assert dict(zip(got["tile_url"], got["text"])) == expected
    if len(got):
        assert set(got["edition"]) == {ed_name}
        assert set(got["url"]) == {f"https://{host}/{iid}"}


def test_epaper_extras_extract_golden():
    """Multi-page issues: Page-2..N extras parse to their analytic
    golden links; Page-1 discovers its siblings (S10)."""
    from siren_ray.stages import extract

    n = 3000
    checked = 0
    for i in range(n):
        if corpus.kind_of_index(i) != "epaper":
            continue
        total = corpus.epaper_totalpages(i)
        main = corpus._gen_page(i, n)
        got = extract.extract_one(main["url"], main["html"])
        assert got["links"] == main["links"]
        sib = [u for u in got["links"] if "/epaper/" in u]
        assert len(sib) == total - 1
        for p in range(2, total + 1):
            row = corpus._gen_epaper_extra(i, p, n)
            g = extract.extract_one(row["url"], row["html"])
            assert g["links"] == row["links"]
            assert not any("/epaper/" in u for u in g["links"])
        checked += 1
        if checked > 20:
            break
    assert checked > 5


def test_registry_complete(ray_session, corpus_sf0001):
    """All 14 reference SCRAPERS keys resolve and run (the reference's
    registry contract, siren/__init__.py:9-18)."""
    from siren_ray.sources.registry import PIPELINES, get_pipeline

    ref_keys = {
        "dummy.DummyScraper",
        "online.mirror.MumbaiMirrorOnlineScraper",
        "online.mirror.BangaloreMirrorOnlineScraper",
        "online.mirror.PuneMirrorOnlineScraper",
        "online.indiatoday.IndiaTodayOnlineScraper",
        "online.telegraph.TelegraphOnlineScraper",
        "online.newsminute.NMScraper",
        "epaper.ht.HTScraper",
        "epaper.telegraph.TGScraper",
        "epaper.toi.TOIScraper",
        "epaper.readwhere.tie.TIEScraper",
        "epaper.readwhere.tie.TIEScraperOCR",
        "epaper.readwhere.tnie.TNIEScraper",
        "epaper.readwhere.tribune.TribuneScraper",
    }
    assert set(PIPELINES) == ref_keys
    for key in ("dummy.DummyScraper", "online.mirror.PuneMirrorOnlineScraper"):
        ds = get_pipeline(key)(corpus_sf0001)
        assert ds.count() >= 0


def test_toi_query_spec(ray_session):
    import ray.data as rd

    from siren_ray.pipelines.scrapers import ToiQuerySpec, toi_query_filter

    rows = [
        {"id": 1, "text": "alpha beta gamma", "author": "Jane Doe"},
        {"id": 2, "text": "alpha delta", "author": "John Smith"},
        {"id": 3, "text": "ALPHA beta exact phrase here", "author": "Jane Doe"},
        {"id": 4, "text": "beta gamma bomb", "author": "Jane Doe"},
        {"id": 5, "text": "", "author": None},
    ]
    ds = rd.from_items(rows)
    spec = ToiQuerySpec(include_all=("alpha",), include_any=("beta", "delta"),
                        exclude_all=("bomb",))
    got = sorted(toi_query_filter(ds, spec).to_pandas()["id"])
    assert got == [1, 2, 3]
    spec2 = ToiQuerySpec(include_exact="exact phrase", byline="jane")
    got2 = sorted(
        toi_query_filter(ds, spec2, byline_col="author").to_pandas()["id"]
    )
    assert got2 == [3]
