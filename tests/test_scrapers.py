"""End-to-end scraper-family pipeline tests against corpus goldens.

Expected sets are computed driver-side from the corpus tables alone
(pages.text golden + analytic links table) — independent of the engine's
parser/fetch code paths."""

import json
import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from siren_ray.corpus import KEYWORDS, WINDOW_END, WINDOW_START


@pytest.fixture(scope="module")
def corpus_tables(corpus_sf0001):
    pages = pads.dataset(
        os.path.join(corpus_sf0001, "pages"), partitioning="hive"
    ).to_table(columns=["url", "warc_ts", "text", "html"])
    links = pads.dataset(os.path.join(corpus_sf0001, "links")).to_table()
    return {
        "dir": corpus_sf0001,
        "pages": {
            u: (ts, tx, h)
            for u, ts, tx, h in zip(
                pages["url"].to_pylist(),
                pages["warc_ts"].to_pylist(),
                pages["text"].to_pylist(),
                pages["html"].to_pylist(),
            )
        },
        "links": dict(
            zip(links["url"].to_pylist(), links["links"].to_pylist())
        ),
    }


def test_mirror_pipeline(ray_session, corpus_tables):
    from siren_ray.pipelines.scrapers import mirror_pipeline

    got = mirror_pipeline(
        corpus_tables["dir"], start=WINDOW_START, end=WINDOW_END
    ).to_pandas()

    expected = set()
    pages = corpus_tables["pages"]
    for url, ls in corpus_tables["links"].items():
        if "/search/" not in url:
            continue
        for u in ls:
            if "/news/" not in u or u not in pages:
                continue
            ts, text, _ = pages[u]
            if text and WINDOW_START < ts < WINDOW_END:
                expected.add(u)
    assert set(got["url"]) == expected
    assert got["url"].is_unique
    # extracted text matches golden byte-for-byte
    for u, t in zip(got["url"], got["text"]):
        assert t == pages[u][1]


def test_ht_pipeline(ray_session, corpus_tables):
    from siren_ray.pipelines.scrapers import ht_pipeline

    kws = KEYWORDS[:2]
    got = ht_pipeline(corpus_tables["dir"], keywords=kws).to_pandas()

    # expected: apijson pages whose body/headline contains a keyword,
    # deduped by headline keeping min url
    best: dict[str, str] = {}
    for url, (_ts, text, html) in corpus_tables["pages"].items():
        if "/api/article/" not in url:
            continue
        payload = json.loads(bytes(html).decode())
        heads = payload["StoryContent"][0].get("Headlines") or []
        headline = heads[0] if heads else " - no data -"
        hay = (text or "").lower() + " " + headline.lower()
        if any(k in hay for k in kws):
            if headline not in best or url < best[headline]:
                best[headline] = url
    assert set(got["url"]) == set(best.values())
    assert got["headline"].is_unique


def test_tg_epaper_pipeline(ray_session, corpus_tables):
    from siren_ray.pipelines.scrapers import telegraph_epaper_pipeline

    kws = KEYWORDS[:2]
    got = telegraph_epaper_pipeline(
        corpus_tables["dir"], keywords=kws
    ).to_pandas()

    pages = corpus_tables["pages"]
    expected = set()
    for url, ls in corpus_tables["links"].items():
        if "/epaper/" not in url:
            continue
        for u in ls:
            if u in pages:
                text = pages[u][1] or ""
                if any(k in text.lower() for k in kws):
                    expected.add(u)
    assert set(got["url"]) == expected


def test_read_pages_pushdown_is_in_the_scan(ray_session, corpus_tables):
    """The date predicate lives INSIDE read_parquet (row-group pruning at
    the scan), not in a post-read map_batches stage."""
    from siren_ray.pipelines.scrapers import read_pages

    ds = read_pages(corpus_tables["dir"], columns=["url", "warc_ts"],
                    ts_start=WINDOW_START, ts_end=WINDOW_END)
    dag = ds._logical_plan.dag  # single Read op, no post-read filter stage
    assert dag.name == "ReadParquet" and not dag.input_dependencies
    got = ds.to_pandas()
    expected = sum(
        1 for _u, (ts, _t, _h) in corpus_tables["pages"].items()
        if WINDOW_START < ts < WINDOW_END
    )
    assert len(got) == expected
    assert got["warc_ts"].between(WINDOW_START, WINDOW_END,
                                  inclusive="neither").all()


def test_indiatoday_pipeline_predicate_pushdown(ray_session, corpus_tables):
    from siren_ray.pipelines.scrapers import indiatoday_pipeline

    got = indiatoday_pipeline(
        corpus_tables["dir"], start=WINDOW_START, end=WINDOW_END,
        keywords=KEYWORDS[:1],
    ).to_pandas()
    pages = corpus_tables["pages"]
    expected = {
        u
        for u, (ts, text, _) in pages.items()
        if "/story/" in u
        and WINDOW_START < ts < WINDOW_END
        and KEYWORDS[0] in (text or "").lower()
    }
    assert set(got["url"]) == expected


def test_toi_exclude(ray_session, corpus_tables):
    from siren_ray.pipelines.scrapers import toi_pipeline

    got = toi_pipeline(
        corpus_tables["dir"], include_any=[KEYWORDS[0]],
        exclude_all=["bomb"],
    ).to_pandas()
    # every result contains the include keyword and not the exclude
    for _, row in got.iterrows():
        hay = ((row["text"] or "") + " " + (row["title"] or "")).lower()
        assert KEYWORDS[0] in hay
        assert "bomb" not in hay


def test_write_projected_csv(ray_session, corpus_tables, tmp_path):
    import csv

    import ray.data as rd

    from siren_ray.functions.project import (
        MISSING,
        ProjectionSpec,
        write_projected_csv,
    )

    ds = rd.from_items(
        [{"url": "u1", "headline": "h1"}, {"url": "u2", "headline": "h2"}]
    )
    spec = ProjectionSpec(fields=("url", "headline", "author"))
    path = write_projected_csv(
        ds, spec, str(tmp_path), "MirrorScraper", WINDOW_START, WINDOW_END
    )
    assert "MirrorScraper_2024-02-01_2024-05-01" in path
    rows = []
    for f in sorted(os.listdir(path)):
        with open(os.path.join(path, f)) as fh:
            rows.extend(list(csv.DictReader(fh)))
    assert {r["url"] for r in rows} == {"u1", "u2"}
    assert all(r["author"] == MISSING for r in rows)
