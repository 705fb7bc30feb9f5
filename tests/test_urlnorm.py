"""URL canonicalization + mimetype inference (W7)."""

import numpy as np
import pyarrow as pa

from siren_ray.functions.urlnorm import (
    canonicalize_url,
    canonicalize_urls,
    infer_mimetypes,
)

CASES = [
    # (input, canonical)
    ("HTTP://Example.COM/a/b", "http://example.com/a/b"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/a?utm_source=x&utm_medium=y", "https://example.com/a"),
    ("https://example.com/a?b=2&a=1&fbclid=zzz", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?b=2&b=1", "https://example.com/a?b=1&b=2"),
    ("https://example.com/a?", "https://example.com/a"),
    ("  https://example.com/a ", "https://example.com/a"),
    # already canonical: must be untouched
    ("https://news.example.org/story/one", "https://news.example.org/story/one"),
    ("http://h0st-name.org/x.y/z", "http://h0st-name.org/x.y/z"),
]


def test_canonicalize_scalar_cases():
    for raw, want in CASES:
        assert canonicalize_url(raw) == want, raw


def test_canonicalize_idempotent():
    for raw, _ in CASES:
        once = canonicalize_url(raw)
        assert canonicalize_url(once) == once, raw


def test_canonicalize_batch_matches_scalar():
    """The vectorized fast-path screen must agree with the exact scalar
    kernel on every row — canonical inputs pass through, the rest take
    the slow path."""
    raws = [r for r, _ in CASES] * 7 + [
        "https://example.com/already/canonical/path",
        "ftp://odd.example.org/x",
        "",
    ]
    got = canonicalize_urls(pa.array(raws, pa.string())).to_pylist()
    want = [canonicalize_url(r) for r in raws]
    assert got == want


def test_canonicalize_screen_accepts_only_canonical():
    """Every url the regex screen passes must be a fixed point of the
    exact kernel (screen soundness — fast path can't skip a rewrite)."""
    import pyarrow.compute as pc

    from siren_ray.functions.urlnorm import _CANONICAL_RE

    urls = [r for r, _ in CASES] + [c for _, c in CASES]
    arr = pa.array(urls, pa.string())
    passed = arr.filter(pc.match_substring_regex(arr, _CANONICAL_RE))
    for u in passed.to_pylist():
        assert canonicalize_url(u) == u, u


def test_infer_mimetypes_magic_and_extension():
    urls = pa.array([
        "https://x.org/doc.pdf",        # magic wins
        "https://x.org/img",            # magic only
        "https://x.org/page.html",      # body html
        "https://x.org/style.css",      # no body -> extension
        "https://x.org/data.json",      # no body -> extension
        "https://x.org/unknown.xyz",    # default
        "https://x.org/api",            # json body magic
    ], pa.string())
    bodies = pa.array([
        b"%PDF-1.7 ...",
        b"\x89PNG\r\n",
        b"<!DOCTYPE html><html>",
        None,
        None,
        None,
        b'{"a": 1}',
    ], pa.binary())
    got = infer_mimetypes(urls, bodies).to_pylist()
    assert got == ["application/pdf", "image/png", "text/html",
                   "text/css", "application/json", "text/html",
                   "application/json"]


def test_crawl_with_canonicalization_unchanged_on_canonical_corpus(
        corpus_sf0001, tmp_path, ray_session):
    """The corpus generator emits canonical URLs, so canonicalize=True
    must not perturb the crawl (screen passes everything; the seen-set,
    order, and counts are identical to the baseline run)."""
    from siren_ray.pipelines.frontier import (
        CrawlConfig, read_crawl_order, run_crawl,
    )

    params = dict(budget_per_round=50, round_ms=1000, max_rounds=5,
                  max_depth=6)
    a = CrawlConfig(corpus_dir=corpus_sf0001, out_dir=str(tmp_path / "a"),
                    scheduler="driver", **params)
    b = CrawlConfig(corpus_dir=corpus_sf0001, out_dir=str(tmp_path / "b"),
                    scheduler="driver", canonicalize=True, **params)
    run_crawl(a)
    run_crawl(b)

    def order(out_dir):
        t = read_crawl_order(out_dir)
        return list(zip(t["round"].to_pylist(), t["url"].to_pylist(),
                        t["seq"].to_pylist()))

    assert order(a.out_dir) == order(b.out_dir)


def test_url_trap_signals_kernel():
    import pyarrow as pa

    from siren_ray.functions.urlnorm import url_trap_signals

    t = url_trap_signals(pa.array([
        "https://h.example.org/x/y/z",                  # clean
        "https://h.example.org/a/b/a/b/a/b/page",       # segment loop
        "https://h.example.org/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7",  # params
        "https://h.example.org/" + "d/" * 12 + "end",   # depth
        "https://h.example.org/p?" + "x" * 300,         # length
        "https://h.example.org",                        # no path
        "",                                             # degenerate
        None,                                           # null
    ]))
    d = t.to_pandas()
    assert list(d["is_trap"]) == [False, True, True, True, True,
                                  False, False, False]
    assert d.loc[1, "max_seg_repeat"] == 3
    assert d.loc[2, "n_params"] == 7
    assert d.loc[3, "path_depth"] == 13
    assert d.loc[5, "path_depth"] == 0 and d.loc[5, "n_params"] == 0
    # consecutive slashes produce no phantom empty segments
    t2 = url_trap_signals(pa.array(["https://h/x//x//x/y"]))
    assert t2.to_pandas().loc[0, "max_seg_repeat"] == 3


def test_registrable_domain_psl_longest_match():
    from siren_ray.functions.urlnorm import registrable_domain

    # longest suffix wins: co.uk beats uk
    assert registrable_domain("news.bbc.co.uk") == ("co.uk", "bbc.co.uk")
    assert registrable_domain("a.b.x.com") == ("com", "x.com")
    assert registrable_domain("example.org") == ("org", "example.org")
    # bare public suffix: no registrable domain
    assert registrable_domain("co.uk") == ("co.uk", None)
    assert registrable_domain("uk") == ("uk", None)
    # unlisted TLD: no suffix at all
    assert registrable_domain("x.unknowntld") == (None, None)
    assert registrable_domain(None) == (None, None)
    assert registrable_domain("") == (None, None)
    # case-insensitive on input
    assert registrable_domain("WWW.Example.COM") == ("com", "example.com")


def test_blocklist_filter_domains_terms_invert(ray_session):
    """Registrable-domain blocks catch subdomains; unlisted TLDs fall
    back to full-host matching; terms match the lowercase path+query
    (never the host); invert=True keeps only the blocked audit rows."""
    import ray.data as rd

    from siren_ray.functions.urlnorm import blocklist_filter

    urls = [
        "https://ads.tracker.com/x",        # sub of blocked eTLD+1
        "https://tracker.com/y",            # blocked eTLD+1 itself
        "https://nottracker.com/z",         # different domain: kept
        "https://weird.internal/a",         # unlisted TLD -> full host
        "https://ok.example.com/a?q=CASINO-bonus",  # term, case-folded
        "https://casino.example.com/clean",  # term in HOST only: kept
        "https://ok.example.com/fine",
    ]
    ds = rd.from_items([{"url": u} for u in urls])
    kw = dict(blocked_domains=("tracker.com", "weird.internal"),
              blocked_terms=("casino",))
    kept = sorted(blocklist_filter(ds, **kw).to_pandas().url)
    assert kept == sorted([
        "https://nottracker.com/z",
        "https://casino.example.com/clean",
        "https://ok.example.com/fine",
    ])
    audit = sorted(blocklist_filter(ds, invert=True, **kw).to_pandas().url)
    assert len(audit) == 4 and "https://tracker.com/y" in audit


def test_url_template_batch_rules():
    """Template generalization: query stripped, >=16-char lowercase hex
    -> <H>, digit runs -> <N>; uppercase hex and short hex stay."""
    import pyarrow as pa

    from siren_ray.functions.urlnorm import url_template_batch

    t = pa.table({"url": pa.array([
        "https://a.org/x?q=1&r=2",
        "https://a.org/h/0123456789abcdef",
        "https://a.org/h/0123456789ABCDEF",   # uppercase: not hex rule
        "https://a.org/h/abc123",             # short: digit rule only
        "https://a.org/plain/slug",
    ])})
    got = url_template_batch(t)["template"].to_pylist()
    assert got == [
        "https://a.org/x",
        "https://a.org/h/<H>",
        "https://a.org/h/<N>ABCDEF",
        "https://a.org/h/abc<N>",
        "https://a.org/plain/slug",
    ]


def test_canonicalize_never_raises_on_malformed():
    """Crawled hrefs are hostile: malformed ports, IPv6 literals,
    credentials — one bad URL must pass through stripped, never kill
    the batch (urlsplit defers port validation to .port access)."""
    from siren_ray.functions.urlnorm import canonicalize_url, canonicalize_urls
    import pyarrow as pa

    assert canonicalize_url("http://host:abc/x") == "http://host:abc/x"
    assert canonicalize_url("http://host:99999/x") == "http://host:99999/x"
    assert canonicalize_url("http://[::1]:8080/x") == "http://[::1]:8080/x"
    assert canonicalize_url("https://[2001:db8::1]/x") == \
        "https://[2001:db8::1]/x"
    # credentials preserved: a credentialed URL is a different resource
    assert canonicalize_url("http://user:pw@Host/x") == \
        "http://user:pw@host/x"
    out = canonicalize_urls(pa.array(
        ["http://host:bad/x", None, "http://h/a ", "http://h/a"]))
    assert out.to_pylist() == ["http://host:bad/x", None,
                               "http://h/a", "http://h/a"]
