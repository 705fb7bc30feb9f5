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
    assert out.to_pylist() == ["/", "b,a)/c"]
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
