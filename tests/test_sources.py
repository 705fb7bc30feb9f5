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


def test_jsonl_roundtrip_unicode(ray_session, tmp_path):
    # unicode, embedded newlines/quotes, null field, int/float/bool
    # values: one record must stay one line and round-trip exactly
    import ray.data as rd

    from siren_ray.sources.jsonl import read_jsonl, write_jsonl_shards

    rows = [
        {"doc_id": 1, "text": 'line1\nline2 "quoted" é中\U0001f600',
         "score": 0.5, "ok": True, "extra": None},
        {"doc_id": 2, "text": "", "score": -3.25, "ok": False,
         "extra": "x"},
        {"doc_id": 3, "text": "plain", "score": 7.0, "ok": True,
         "extra": None},
    ]
    out = tmp_path / "shards"
    n = write_jsonl_shards(rd.from_items(rows), str(out))
    assert n >= 1
    names = [f for f in out.iterdir() if f.name.endswith(".jsonl.gz")]
    assert names and not [f for f in out.iterdir()
                          if f.name.startswith(".tmp-")]
    got = (read_jsonl(str(out),
                      columns=["doc_id", "text", "score", "ok", "extra"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, want in enumerate(rows):
        for k, v in want.items():
            g = got[k][i]
            assert (g is None or g != g) if v is None else g == v, (k, i)
    assert got["shard"].str.endswith(".jsonl.gz").all()


def test_jsonl_malformed_lines_skipped(ray_session, tmp_path):
    from siren_ray.sources.jsonl import parse_jsonl_bytes, read_jsonl

    shard = tmp_path / "a.jsonl"
    shard.write_bytes(
        b'{"doc_id":1,"text":"ok"}\n'
        b'not json at all\n'
        b'[1,2,3]\n'          # valid JSON, not an object -> skipped
        b'\n'                  # blank line -> ignored, not malformed
        b'{"doc_id":2,"text":"also ok"}\n')
    recs, bad = parse_jsonl_bytes(shard.read_bytes())
    assert [r["doc_id"] for r in recs] == [1, 2] and bad == 2
    df = read_jsonl(str(tmp_path), columns=["doc_id", "text"]).to_pandas()
    assert sorted(df["doc_id"]) == [1, 2]

    # corrupt gzip blob: counted, never raised
    recs, bad = parse_jsonl_bytes(b"\x1f\x8b" + b"\x00" * 16)
    assert recs == [] and bad == 1


def test_jsonl_shard_name_deterministic():
    from siren_ray.sources.jsonl import _shard_name, encode_jsonl
    import gzip
    import pyarrow as pa

    t = pa.table({"doc_id": [1, 2], "text": ["a", "b"]})
    blob1 = gzip.compress(encode_jsonl(t), mtime=0)
    blob2 = gzip.compress(encode_jsonl(t), mtime=0)
    assert blob1 == blob2  # byte-deterministic stream (mtime=0)
    assert (_shard_name(blob1, "tid", 0, ".jsonl.gz")
            == _shard_name(blob2, "tid", 0, ".jsonl.gz"))
    assert (_shard_name(blob1, "tid", 0, ".jsonl.gz")
            != _shard_name(blob1, "tid", 1, ".jsonl.gz"))


def test_lastmod_to_epoch_w3c_profiles():
    from siren_ray.sources.sitemap import lastmod_to_epoch as lme

    assert lme("2024-02-01") == 1706745600            # midnight UTC
    assert lme("2024-02-01T10:30:00Z") == 1706783400
    assert lme("2024-02-01T10:30:00+05:30") == 1706763600
    assert lme("2024-02-01T10:30:00") == 1706783400   # zoneless -> UTC
    assert lme("not-a-date") is None
    assert lme("") is None and lme(None) is None


def test_plan_recrawl_verdicts(ray_session):
    """new / stale / fresh / unknown across the join: lastmod after the
    stored fetch is stale, at-or-before is fresh, never-crawled is new,
    crawled-but-no-lastmod is unknown (never silently fresh)."""
    import ray.data as rd

    from siren_ray.sources.sitemap import plan_recrawl

    entries = rd.from_items([
        {"loc": "https://h/new", "lastmod": "2024-03-01"},
        {"loc": "https://h/stale", "lastmod": "2024-03-02T00:00:01Z"},
        {"loc": "https://h/fresh", "lastmod": "2024-03-02T00:00:00Z"},
        {"loc": "https://h/unknown", "lastmod": None},
        {"loc": "https://h/bad", "lastmod": "yesterday-ish"},
    ])
    ts = 1709337600  # 2024-03-02T00:00:00Z
    crawled = rd.from_items([
        {"url": f"https://h/{n}", "ts": ts}
        for n in ("stale", "fresh", "unknown", "bad")])
    out = plan_recrawl(entries, crawled, ts_col="ts").to_pandas()
    got = dict(zip(out["url"], out["verdict"]))
    assert got == {"https://h/new": "new",
                   "https://h/stale": "stale",
                   "https://h/fresh": "fresh",
                   "https://h/unknown": "unknown",
                   "https://h/bad": "unknown"}
    # never-crawled rows carry a true Arrow null crawl_ts
    assert out[out["url"] == "https://h/new"]["crawl_ts"].isna().all()
