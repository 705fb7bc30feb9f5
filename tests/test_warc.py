"""WARC-style gzip source (sources/warc.py): round-trip fidelity,
multi-member splitting, malformed-member recorded-drop semantics."""

import gzip
import os

import pyarrow as pa
import pytest
import ray.data as rd

from siren_ray.sources.warc import (_parse_record, _split_members,
                                    read_warc, write_warc_shards)

ROWS = [
    {"url": f"https://ex.com/p/{i}", "warc_ts": None,
     "html": f"<html><body>page {i} éé</body></html>".encode()}
    for i in range(57)
]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("warc"))
    ds = rd.from_items(ROWS, override_num_blocks=4)
    import datetime

    ds = ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("warc_ts"),
            "warc_ts",
            pa.array([datetime.datetime(2024, 1, 1, 0, 0, i % 60)
                      for i in range(t.num_rows)], pa.timestamp("us"))),
        batch_format="pyarrow")
    n = write_warc_shards(ds, d)
    assert 1 <= n <= 4
    return d


def test_roundtrip_bodies_and_urls(warc_dir):
    out = read_warc(warc_dir).to_pandas().sort_values("url")
    assert len(out) == len(ROWS)
    want = {r["url"]: r["html"] for r in ROWS}
    for u, h in zip(out["url"], out["html"]):
        assert want[u] == h
    assert out["warc_ts"].notna().all()
    assert str(out["warc_ts"].iloc[0]).startswith("2024-01-01")


def test_member_split_and_truncation():
    a = gzip.compress(b"first")
    b = gzip.compress(b"second")
    assert list(_split_members(a + b)) == [b"first", b"second"]
    # truncated final member: earlier members still parse, no raise,
    # and the loss is OBSERVABLE via the trailing None sentinel
    assert list(_split_members(a + b[: len(b) // 2])) == [b"first", None]
    assert list(_split_members(b"notgzip")) == [None]


def test_malformed_records_skipped(warc_dir, tmp_path):
    d = str(tmp_path)
    # copy one real shard + one garbage-in-the-middle shard
    shard = sorted(os.listdir(warc_dir))[0]
    with open(os.path.join(warc_dir, shard), "rb") as f:
        real = f.read()
    junk = gzip.compress(b"HTTP/1.1 200 OK\r\n\r\nnot a warc record")
    with open(os.path.join(d, "mix.warc.gz"), "wb") as f:
        f.write(junk + real)
    out = read_warc(d).to_pandas()
    # junk member dropped, every real record behind it survives
    n_real = sum(1 for _ in _split_members(real))
    assert len(out) == n_real


def test_plain_stream_framing(warc_dir):
    """Uncompressed .warc layout (and Ray's auto-gunzipped view of
    .warc.gz) splits by Content-Length walking, same results."""
    from siren_ray.sources.warc import _split_any, _split_records_plain

    shard = sorted(os.listdir(warc_dir))[0]
    with open(os.path.join(warc_dir, shard), "rb") as f:
        blob = f.read()
    via_gzip = list(_split_members(blob))
    plain = b"".join(via_gzip)
    via_plain = list(_split_records_plain(plain))
    assert len(via_plain) == len(via_gzip)
    for a, b in zip(via_gzip, via_plain):
        assert _parse_record(a) == _parse_record(b)
    # dispatcher picks the right framing for both
    assert len(list(_split_any(blob))) == len(via_gzip)
    assert len(list(_split_any(plain))) == len(via_gzip)


def test_parse_record_rejects_non_response():
    rec = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: x\r\nContent-Length: 0\r\n\r\n")
    # well-formed non-response types are IGNORED (False), not counted
    # malformed (None) — real WARCs interleave warcinfo/request records
    assert _parse_record(rec) is False
    assert _parse_record(b"garbage") is None
    # unparseable WARC-Date must not kill the read (NaT, not raise)
    import gzip as _gz

    bad_date = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: https://x/\r\n"
                b"WARC-Date: 2024/01/01\r\nContent-Length: 4\r\n\r\nbody")
    import ray.data  # noqa: F401  (ray session from other tests)

    d = None
    import tempfile, os as _os

    d = tempfile.mkdtemp()
    with open(_os.path.join(d, "x.warc.gz"), "wb") as f:
        f.write(_gz.compress(bad_date))
    out = read_warc(d).to_pandas()
    assert len(out) == 1 and out["warc_ts"].isna().all()


def test_identical_blocks_both_survive(tmp_path):
    """Two byte-identical blocks must produce two shards (suffix on
    content-hash collision), not a silent overwrite halving the data."""
    import ray.data as rd

    rows = [{"url": "https://ex.com/same", "warc_ts": None,
             "html": b"<html>dup</html>"}] * 2
    d = str(tmp_path)
    n = write_warc_shards(
        rd.from_items(rows, override_num_blocks=2), d)
    assert n == 2
    assert len(os.listdir(d)) == 2
    out = read_warc(d).to_pandas()
    assert len(out) == 2


def test_shard_write_is_idempotent_under_task_retry():
    """Retry semantics: a task re-executed by Ray (at-least-once) reruns
    with the SAME task id over the same batches in the same order, so
    the shard name must be a pure function of (blob, task id, seq) and
    the blob bytes must be run-independent — together the retry's
    os.replace overwrites identical bytes instead of adding a duplicate
    shard that doubles records."""
    import datetime

    from siren_ray.sources.warc import _shard_name, _warc_record

    ts = datetime.datetime(2024, 1, 1)
    # blob bytes deterministic across calls (gzip mtime pinned to 0 —
    # the default header timestamp is wall-clock and would defeat the
    # content hash between a task and its retry)
    b1 = _warc_record("https://ex.com/a", ts, b"<html>x</html>")
    b2 = _warc_record("https://ex.com/a", ts, b"<html>x</html>")
    assert b1 == b2
    # name deterministic for the same task identity — INCLUDING a
    # retry that lands on the same still-alive worker (no per-process
    # counter in the name anymore: a surviving counter used to mint
    # fresh names for replayed batches -> doubled shards)
    assert _shard_name(b1, "task-7") == _shard_name(b2, "task-7")
    # ...but distinct for identical content under a DIFFERENT identity
    # (a genuinely doubled ingest must keep both shards)
    assert _shard_name(b1, "task-7") != _shard_name(b1, "task-8")
    # distinct content under one task stays distinct
    b3 = _warc_record("https://ex.com/b", ts, b"<html>y</html>")
    assert _shard_name(b1, "task-7") != _shard_name(b3, "task-7")


def test_warc_to_corpus_feeds_bucketed_crawl(corpus_sf0001,
                                             tmp_path_factory):
    """The archive-ingest composite: corpus pages -> WARC shards ->
    warc_to_corpus (hive bucket partitioning) -> a bucketed-fetch crawl
    over the INGESTED corpus must reproduce the crawl over the original
    Parquet corpus exactly (order, seen size, extracted text)."""
    import shutil

    import pyarrow.dataset as pads

    from siren_ray.pipelines.frontier import (CrawlConfig,
                                              read_crawl_order, run_crawl)
    from siren_ray.sources.warc import warc_to_corpus

    base = tmp_path_factory.mktemp("warc_ingest")
    warc_dir = str(base / "archive")
    os.makedirs(warc_dir)
    pages = rd.read_parquet(os.path.join(corpus_sf0001, "pages")) \
        .map_batches(lambda t: t.select(["url", "warc_ts", "html"]),
                     batch_format="pyarrow")
    write_warc_shards(pages, warc_dir)

    corpus2 = str(base / "corpus2")
    os.makedirs(corpus2)
    warc_to_corpus(warc_dir, os.path.join(corpus2, "pages"),
                   num_buckets=128)
    for f in ("seeds.parquet", "robots.parquet"):
        shutil.copy(os.path.join(corpus_sf0001, f),
                    os.path.join(corpus2, f))

    P = dict(budget_per_round=50, round_ms=1000, max_rounds=6,
             max_depth=6, fetch_mode="bucketed", scheduler="driver")
    runs = {}
    for name, corpus in (("orig", corpus_sf0001), ("ingested", corpus2)):
        out = str(base / f"crawl_{name}")
        res = run_crawl(CrawlConfig(corpus_dir=corpus, out_dir=out, **P))
        order = read_crawl_order(out)
        text = pads.dataset(os.path.join(out, "extracted"),
                            partitioning="hive").to_table(
            columns=["url", "text"]).to_pandas().sort_values("url")
        runs[name] = (res, order, text)
    res_a, order_a, text_a = runs["orig"]
    res_b, order_b, text_b = runs["ingested"]
    assert order_a.equals(order_b)
    assert res_a.seen_size == res_b.seen_size
    assert res_a.total_fetched == res_b.total_fetched
    assert list(text_a["text"]) == list(text_b["text"])
