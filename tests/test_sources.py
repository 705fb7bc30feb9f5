"""Source readers: JSON records (S13), pagemeta tile flattening (S12)."""

import json


def test_read_json_records(ray_session, tmp_path):
    from siren_ray.sources.readers import read_json_records

    path = tmp_path / "data.json"
    records = [{"url": f"u{i}", "title": f"t{i}"} for i in range(5)]
    path.write_text(json.dumps(records))
    ds = read_json_records(str(path))
    df = ds.to_pandas()
    assert len(df) == 5 and set(df.columns) == {"url", "title"}


def test_flatten_pagemeta():
    from siren_ray.sources.readers import (
        flatten_pagemeta,
        make_pagemeta_fixture,
    )

    raw = make_pagemeta_fixture(n_pages=3, tiles_per_level=4)
    t = flatten_pagemeta(raw)  # level2 only, like the reference (ocr.py:81)
    assert t.num_rows == 3 * 4
    assert set(t["level"].to_pylist()) == {"level2"}
    assert t["tx"].to_pylist()[:4] == [0, 512, 1024, 1536]

    t_all = flatten_pagemeta(raw, levels=("thumbs", "level2"))
    assert t_all.num_rows == 3 * 4 * 2


def test_registry_lookup():
    from siren_ray.sources.registry import PIPELINES, get_pipeline

    assert get_pipeline("online.indiatoday.IndiaTodayOnlineScraper") is not None
    assert get_pipeline("nope") is None
    assert len(PIPELINES) >= 7


def test_config_date_defaults():
    from datetime import datetime, timedelta

    from siren_ray.config import RunConfig

    c = RunConfig(scraper="x", start=datetime(2024, 1, 10), days=3)
    assert c.end == datetime(2024, 1, 13)  # only start -> start+days
    c2 = RunConfig(scraper="x", end=datetime(2024, 1, 10), days=3)
    assert c2.start == datetime(2024, 1, 7)  # only end -> end-days
    c3 = RunConfig(scraper="x", days=2)
    assert (c3.end - c3.start) == timedelta(days=2)


# --- sitemap discovery source (sources/sitemap.py) ------------------------

def test_parse_sitemap_urlset_index_and_gzip():
    import gzip

    from siren_ray.sources.sitemap import parse_sitemap

    urlset = (b"<?xml version='1.0'?>"
              b"<urlset xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>"
              b"<url><loc> https://h.example.org/a </loc>"
              b"<lastmod>2024-01-05</lastmod></url>"
              b"<url><loc>https://h.example.org/b</loc></url>"
              b"<url><lastmod>2024-01-06</lastmod></url>"  # no loc: skip
              b"</urlset>")
    got = parse_sitemap("https://h.example.org/sitemap.xml", urlset)
    assert [(e["loc"], e["lastmod"], e["is_index"]) for e in got] == [
        ("https://h.example.org/a", "2024-01-05", False),
        ("https://h.example.org/b", None, False),
    ]
    idx = (b"<sitemapindex>"
           b"<sitemap><loc>https://h.example.org/sm-1.xml.gz</loc>"
           b"<lastmod>2024-02-01</lastmod></sitemap>"
           b"</sitemapindex>")
    got = parse_sitemap("https://h.example.org/sitemap.xml", idx)
    assert got[0]["is_index"] is True
    assert got[0]["loc"] == "https://h.example.org/sm-1.xml.gz"
    # gzip-compressed payloads decompress transparently
    got = parse_sitemap("https://h/s.xml.gz", gzip.compress(urlset))
    assert len(got) == 2
    # degenerate inputs
    assert parse_sitemap("https://h/s", None) == []
    assert parse_sitemap("https://h/s", b"\x1f\x8bnot-gzip") == []
    assert parse_sitemap("https://h/s", b"<html>no sitemap</html>") == []


def test_sitemap_batch_stage(ray_session):
    import ray.data as rd

    from siren_ray.sources.sitemap import sitemap_batch

    ds = rd.from_items([
        {"url": "https://h/s1.xml",
         "html": b"<urlset><url><loc>https://h/p1</loc></url></urlset>"},
        {"url": "https://h/s2.xml", "html": b""},
    ])
    out = ds.map_batches(sitemap_batch, batch_format="pyarrow").to_pandas()
    assert list(out.columns) == ["src", "loc", "lastmod", "is_index"]
    assert len(out) == 1 and out.loc[0, "loc"] == "https://h/p1"


def test_parse_feed_rss_and_atom():
    import gzip

    from siren_ray.sources.feeds import parse_feed

    rss = (b"<?xml version='1.0'?><rss version='2.0'><channel>"
           b"<title>chan title ignored</title>"
           b"<link>https://h.example.org/</link>"
           b"<item><title><![CDATA[A &amp; B]]></title>"
           b"<link> https://h.example.org/a </link>"
           b"<pubDate>Mon, 05 Jan 2024 06:30:00 +0000</pubDate></item>"
           b"<item><link>https://h.example.org/b</link></item>"
           b"<item><title>no link: skip</title></item>"
           b"</channel></rss>")
    got = parse_feed("https://h.example.org/feed.xml", rss)
    assert [(e["link"], e["title"], e["published_ts"], e["kind"])
            for e in got] == [
        ("https://h.example.org/a", "A &amp; B", 1704436200, "rss"),
        ("https://h.example.org/b", None, None, "rss"),
    ]

    atom = (b"<feed xmlns='http://www.w3.org/2005/Atom'>"
            b"<title>feed title ignored</title>"
            b"<link rel='self' href='https://h/feed.atom'/>"
            b"<entry><title>e1</title>"
            b"<link rel='self' href='https://h/feed.atom'/>"
            b"<link rel='alternate' href='https://h/e1'/>"
            b"<updated>2024-01-05T06:30:00Z</updated></entry>"
            b"<entry><title>e2</title><link href='https://h/e2'/>"
            b"<published>2024-02-01T00:00:00+05:30</published></entry>"
            b"</feed>")
    got = parse_feed("https://h/feed.atom", atom)
    assert [(e["link"], e["title"], e["published_ts"], e["kind"])
            for e in got] == [
        ("https://h/e1", "e1", 1704436200, "atom"),
        ("https://h/e2", "e2", 1706725800, "atom"),
    ]

    # gzip transparent; degenerate inputs degrade to []
    assert len(parse_feed("https://h/f.gz", gzip.compress(rss))) == 2
    assert parse_feed("https://h/f", None) == []
    assert parse_feed("https://h/f", b"\x1f\x8bnot-gzip") == []
    assert parse_feed("https://h/f", b"<html>no feed</html>") == []
    # bad timestamps -> null ts, row kept
    bad = (b"<rss><channel><item><link>https://h/x</link>"
           b"<pubDate>not a date</pubDate></item></channel></rss>")
    assert parse_feed("https://h/f", bad)[0]["published_ts"] is None


def test_feed_batch_stage(ray_session):
    import ray.data as rd

    from siren_ray.sources.feeds import feed_batch

    ds = rd.from_items([
        {"url": "https://h/f1.xml",
         "html": (b"<rss><channel><item><link>https://h/p1</link>"
                  b"</item></channel></rss>")},
        {"url": "https://h/f2.xml", "html": b""},
    ])
    out = ds.map_batches(feed_batch, batch_format="pyarrow").to_pandas()
    assert list(out.columns) == ["src", "link", "title",
                                 "published_ts", "kind"]
    assert len(out) == 1 and out.loc[0, "link"] == "https://h/p1"
