"""SURT keys + CDX-style sorted index: transform semantics, manifest
range pruning, and scan-vs-full-filter equality (the exact-SQL gate in
test_queries.py covers the oracle parity; these are the edge cases)."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from siren_ray.stages.cdxindex import (
    build_cdx_index,
    cdx_prefix_scan,
    surt_key,
    surt_keys,
)


@pytest.mark.parametrize("url,key", [
    ("https://www.Example.com/a", "com,example)/a"),
    ("http://Host.co.uk:8080/p?b=2&a=1#frag", "uk,co,host:8080)/p?a=1&b=2"),
    ("http://example.com", "com,example)/"),
    # only ONE leading www. label is stripped
    ("https://sub.www.example.com/x/", "com,example,www,sub)/x/"),
    ("http://example.com/p?utm_source=x&z=1", "com,example)/p?z=1"),
    ("https://example.com:443/a", "com,example)/a"),  # default port drops
    ("not a url", "not a url"),  # non-URLs fall back, never null
])
def test_surt_key_semantics(url, key):
    assert surt_key(url) == key


def test_surt_keys_null_and_empty():
    assert surt_keys(pa.array([], pa.string())).to_pylist() == []
    out = surt_keys(pa.array([None, "https://a.b/c"], pa.string()))
    # null urls now PROPAGATE as null through canonicalization and fall
    # back to "" (total-orderable, never aliasing the literal "/" url)
    assert out.to_pylist() == ["", "b,a)/c"]
    assert out.null_count == 0


def test_surt_keys_chunked_input():
    ch = pa.chunked_array([["https://www.X.com/a"],
                           ["http://y.org/b?b=1&a=2"]])
    assert surt_keys(ch).to_pylist() == ["com,x)/a", "org,y)/b?a=2&b=1"]


def _urls_ds(n=400):
    hosts = ["www.alpha.com", "beta.org", "gamma.net", "delta.co.uk"]
    urls = [f"https://{hosts[i % 4]}/p/{i}" for i in range(n)]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "url": pa.array(urls, pa.string()),
    })).repartition(4)


def test_cdx_index_prunes_and_matches_full_filter(ray_session, tmp_path):
    manifest = build_cdx_index(_urls_ds(), str(tmp_path), url_col="url",
                               carry_cols=("doc_id",), num_shards=8)
    assert sum(m["rows"] for m in manifest) == 400
    # manifest is sorted, non-overlapping key ranges
    for a, b in zip(manifest, manifest[1:]):
        assert a["max_key"] <= b["min_key"]
    hits, read, total = cdx_prefix_scan(manifest, "com,alpha)")
    df = hits.to_pandas()
    # a single domain is a contiguous key range: the scan must NOT
    # touch every shard
    assert 0 < read < total
    assert sorted(df["doc_id"]) == list(range(0, 400, 4))
    assert df["surt_key"].str.startswith("com,alpha)").all()


def test_cdx_prefix_scan_no_match(ray_session, tmp_path):
    manifest = build_cdx_index(_urls_ds(80), str(tmp_path), url_col="url",
                               num_shards=4)
    hits, read, total = cdx_prefix_scan(manifest, "zz,nohost)")
    assert read == 0 and total == 4
    assert hits.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_merge_cdx_index_equals_full_rebuild(tmp_path):
    """LSM-style delta merge: build on half the URLs, merge the rest;
    every prefix scan must equal a from-scratch full build, untouched
    shards must not be rewritten, and only the delta shuffles."""
    import ray.data as rd

    from siren_ray.stages.cdxindex import (build_cdx_index, cdx_prefix_scan,
                                           merge_cdx_index)

    def urls(lo, hi):
        return [{"url": f"https://h{i % 7}.example.org/p/{i}",
                 "warc_ts": i} for i in range(lo, hi)]

    full = build_cdx_index(rd.from_items(urls(0, 400)),
                           str(tmp_path / "full"),
                           carry_cols=("warc_ts",), num_shards=8)
    base = build_cdx_index(rd.from_items(urls(0, 200)),
                           str(tmp_path / "base"),
                           carry_cols=("warc_ts",), num_shards=8)
    base_paths = {m["path"] for m in base}
    merged = merge_cdx_index(base, rd.from_items(urls(200, 400)),
                             str(tmp_path / "merged"),
                             carry_cols=("warc_ts",))
    assert sum(m["rows"] for m in merged) == 400
    # sorted, non-overlapping manifest
    for a, b in zip(merged, merged[1:]):
        assert a["max_key"] <= b["min_key"] or a["min_key"] <= b["min_key"]

    def scan(manifest, prefix):
        ds, _, _ = cdx_prefix_scan(manifest, prefix)
        t = ds.to_pandas()
        if "warc_ts" not in t.columns:  # zero-shard fast path
            return []
        return sorted(zip(t.surt_key, t.warc_ts))

    for prefix in ("org,example,h3)/", "org,example,", "org,example,h6)/p/1",
                   "zzz,"):
        assert scan(merged, prefix) == scan(full, prefix), prefix

    # a delta touching ONE key range rewrites only shards, never re-keys
    # the whole base: untouched shard files are carried over verbatim
    one = rd.from_items([{"url": "https://h3.example.org/p/5x",
                          "warc_ts": 999}])
    merged2 = merge_cdx_index(merged, one, str(tmp_path / "merged2"),
                              carry_cols=("warc_ts",))
    rewritten = [m for m in merged2
                 if m["path"].startswith(str(tmp_path / "merged2"))]
    assert len(rewritten) == 1
    assert sum(m["rows"] for m in merged2) == 401
    got = scan(merged2, "org,example,h3)/p/5")
    assert ("org,example,h3)/p/5x", 999) in got


@pytest.mark.usefixtures("ray_session")
def test_merge_cdx_into_empty_manifest(tmp_path):
    import ray.data as rd

    from siren_ray.stages.cdxindex import cdx_prefix_scan, merge_cdx_index

    m = merge_cdx_index([], rd.from_items(
        [{"url": f"https://a.org/{i}"} for i in range(20)]),
        str(tmp_path / "fresh"))
    assert sum(x["rows"] for x in m) == 20
    ds, hit, total = cdx_prefix_scan(m, "org,a)/1")
    assert ds.count() == 11  # 1, 10..19
