"""Parser conformance: extracted text/links byte-identical to the analytic
golden embedded in the corpus at generation time (FIXTURES.md §3)."""

import pyarrow as pa
import pytest

from siren_ray import corpus
from siren_ray.html_mini import parse_html
from siren_ray.stages import extract


N = 3000


@pytest.mark.parametrize("kind", [k for k, _, _ in corpus._KINDS])
def test_golden_text_and_links_per_kind(kind):
    checked = 0
    for i in range(N):
        if corpus.kind_of_index(i) != kind:
            continue
        page = corpus._gen_page(i, N)
        got = extract.extract_one(page["url"], page["html"])
        assert got["text"] == page["text"], (i, kind)
        assert got["links"] == page["links"], (i, kind)
        checked += 1
    assert checked > 10


def test_extract_batch_schema():
    pages = [corpus._gen_page(i, 2000) for i in range(0, 2000, 97)]
    batch = pa.table(
        {
            "url": [p["url"] for p in pages],
            "html": pa.array([p["html"] for p in pages], pa.binary()),
            "extra": list(range(len(pages))),
        }
    )
    out = extract.extract_batch(batch)
    assert "html" not in out.column_names
    assert "extra" in out.column_names  # passthrough
    assert out["text"].to_pylist() == [p["text"] for p in pages]


def test_ld_invalid_dropped():
    # missing datePublished -> parse_ok False, empty text (mirror.py:96-99)
    html = b'<html><body><script type="application/ld+json">{"url":"u","dateModified":"2024-01-01T00:00:00","description":"d"}</script></body></html>'
    got = extract.parse_ld("https://h/news/1", html)
    assert got["parse_ok"] is False and got["text"] == ""


def test_ld_defaults():
    html = (
        b'<html><body><script type="application/ld+json">'
        b'{"url":"u","datePublished":"2024-01-01T00:00:00",'
        b'"dateModified":"2024-01-01T00:00:00","description":"d"}'
        b"</script></body></html>"
    )
    got = extract.parse_ld("https://h/news/1", html)
    assert got["parse_ok"] is True
    assert got["headline"] == "-" and got["author"] == "-"
    assert got["text"] == "-\nd"


def test_search_drops_pagination():
    html = (
        b'<div class="searchcontent"><a href="https://a/x">one</a>'
        b'<div class="Pagination clearfix"><a href="https://a/pag">p</a></div>'
        b"</div>"
    )
    got = extract.parse_search("https://h/search/0", html)
    assert got["links"] == ["https://a/x"]


def test_apijson_headline_default():
    html = b'{"PageNumber":"3","StoryContent":[{"Headlines":[],"Body":"B"}]}'
    got = extract.parse_apijson("https://h/api/article/1", html)
    assert got["headline"] == " - no data -"  # ht.py:151-154
    assert got["text"] == "B"


def test_html_mini_text_concat_and_entities():
    root = parse_html("<p>a &amp; <b>b</b>!</p>")
    assert root.find("p").text == "a & b!"


def test_html_mini_extract():
    root = parse_html('<div id="a"><span>x</span><i>y</i></div>')
    root.find("span").extract()
    assert root.find(id_="a").text == "y"


# --- generic main-content extraction (maincontent.py) ---------------------

BOILER_PAGE = b"""<html><head><title>Example News \xe2\x80\x94 Story</title>
<script>var x = "should never appear";</script>
<style>.a{color:red}</style></head><body>
<nav><a href="/">Home</a> <a href="/politics">Politics</a>
<a href="/sports">Sports</a> <a href="/world">World</a></nav>
<div class="sidebar"><ul>
<li><a href="/s1">Related story one headline text</a></li>
<li><a href="/s2">Related story two headline text</a></li>
<li><a href="/s3">Related story three headline text</a></li>
</ul></div>
<div class="article-body">
<p>The district administration announced a new irrigation scheme on
Tuesday, officials said, covering twelve villages in the region.</p>
<p>Farmers welcomed the decision, noting that the canal network had
been pending for years, and sought a clear construction timeline.</p>
<p><a href="/tag">tagged under schemes</a></p>
<p>The collector said tenders would be floated next month.</p>
</div>
<footer><p>Copyright 2024 Example News. All rights reserved. Terms.
Privacy. Contact us at example@example.org for any queries here.</p>
<a href="/about">About</a> <a href="/terms">Terms</a></footer>
</body></html>"""


def test_main_content_extracts_article_drops_boilerplate():
    from siren_ray.stages.maincontent import extract_main_content

    out = extract_main_content(BOILER_PAGE)
    assert out["title"].startswith("Example News")
    paras = out["main_text"].split("\n")
    assert paras[0].startswith("The district administration")
    assert paras[1].startswith("Farmers welcomed")
    # short all-link paragraph inside the winning container is dropped
    assert all("tagged under" not in p for p in paras)
    # the winner keeps its own short non-linky paragraph
    assert any(p.startswith("The collector said") for p in paras)
    # boilerplate never leaks
    for bad in ("Home", "Related story", "Copyright", "should never"):
        assert bad not in out["main_text"]
    assert out["n_paragraphs"] == 3
    assert 0.0 < out["link_density"] < 1.0


def test_main_content_edge_cases():
    from siren_ray.stages.maincontent import extract_main_content

    assert extract_main_content(None)["main_text"] == ""
    assert extract_main_content(b"")["main_text"] == ""
    # pure link page: no content container wins
    links = b"<html><body><nav><a href='/a'>x</a></nav></body></html>"
    out = extract_main_content(links)
    assert out["main_text"] == "" and out["n_paragraphs"] == 0
    # title falls back to h1 when <title> is absent
    h1 = (b"<html><body><h1>Headline Here</h1><div><p>"
          b"A single long enough paragraph of body text, with a comma, "
          b"sits alone in the document body today.</p></div></body></html>")
    out = extract_main_content(h1)
    assert out["title"] == "Headline Here"
    assert out["main_text"].startswith("A single long")


def test_main_content_batch_shape(ray_session):
    import ray.data as rd

    from siren_ray.stages.maincontent import main_content_batch

    ds = rd.from_items([
        {"url": "http://a/1", "html": BOILER_PAGE},
        {"url": "http://a/2", "html": b"<html><body></body></html>"},
    ])
    out = ds.map_batches(main_content_batch,
                         batch_format="pyarrow").to_pandas()
    assert list(out.columns) == ["url", "title", "main_text",
                                 "link_density", "n_paragraphs"]
    assert out.loc[0, "n_paragraphs"] == 3
    assert out.loc[1, "main_text"] == ""


def test_anchor_links_resolution_and_noise():
    from siren_ray.stages.maincontent import anchor_links

    html = (b"<html><body>"
            b"<nav><a href='/home'>Home</a></nav>"
            b"<div><a href='story/42'>Relative story link</a>"
            b"<a href='https://other.example.org/x#frag'>Abs</a>"
            b"<a href='#top'>Top</a>"
            b"<a href='javascript:void(0)'>js</a>"
            b"<a href='mailto:a@b.c'>mail</a>"
            b"<a href=''>empty</a></div>"
            b"</body></html>")
    out = anchor_links("https://h.example.org/sec/page", html)
    assert [(e["dst"], e["anchor"]) for e in out] == [
        ("https://h.example.org/sec/story/42", "Relative story link"),
        ("https://other.example.org/x", "Abs"),
    ]
    # drop_noise=False keeps the nav link, resolved absolute
    full = anchor_links("https://h.example.org/sec/page", html,
                        drop_noise=False)
    assert full[0]["dst"] == "https://h.example.org/home"
    assert len(full) == 3
    assert anchor_links("https://h/x", None) == []


def test_anchor_links_batch_stage(ray_session):
    import ray.data as rd

    from siren_ray.stages.maincontent import anchor_links_batch

    ds = rd.from_items([
        {"url": "https://h/x", "html": b"<a href='/a'>One link</a>"},
        {"url": "https://h/y", "html": b"<p>no links</p>"},
    ])
    out = ds.map_batches(anchor_links_batch,
                         batch_format="pyarrow").to_pandas()
    assert list(out.columns) == ["src", "dst", "anchor"]
    assert len(out) == 1 and out.loc[0, "dst"] == "https://h/a"


def test_decode_html_charset_sniffing():
    from siren_ray.stages.maincontent import decode_html

    # BOM wins (and is stripped from the decoded text)
    t, e = decode_html("héllo".encode("utf-8-sig"))
    assert (t, e) == ("héllo", "utf-8-sig")
    t, e = decode_html("héllo".encode("utf-16"))  # BOM-prefixed utf-16
    assert t == "héllo" and e.startswith("utf-16")
    # meta charset declaration
    raw = ("<html><head><meta charset='iso-8859-1'></head>"
           "<body>caf\xe9</body></html>").encode("latin-1")
    t, e = decode_html(raw)
    assert e == "iso-8859-1" and "café" in t
    # http-equiv form
    raw = (b"<meta http-equiv='Content-Type' "
           b"content='text/html; charset=windows-1252'>caf\xe9")
    t, e = decode_html(raw)
    assert e == "windows-1252" and "café" in t
    # clean utf-8 default, latin-1 last resort
    assert decode_html("plain".encode())[1] == "utf-8"
    assert decode_html(b"\xff\xfa\x01")[1] in ("latin-1", "utf-16-le")
    assert decode_html(None) == ("", "utf-8")
    # declared charset that cannot decode the bytes -> fallback chain
    raw = b"<meta charset='utf-8'>caf\xe9"
    t, e = decode_html(raw)
    assert e == "latin-1" and "café" in t


def test_decode_html_batch_stage(ray_session):
    import ray.data as rd

    from siren_ray.stages.maincontent import decode_html_batch

    ds = rd.from_items([
        {"url": "u1", "html": "héllo".encode("utf-8")},
        {"url": "u2", "html": ("<meta charset='latin-1'>"
                               "caf\xe9").encode("latin-1")},
    ])
    out = ds.map_batches(decode_html_batch,
                         batch_format="pyarrow").to_pandas()
    assert "html_text" in out.columns and "encoding" in out.columns
    out = out.set_index("url")
    assert out.loc["u1", "html_text"] == "héllo"
    assert "café" in out.loc["u2", "html_text"]


def test_soft404_signals():
    import pyarrow as pa

    from siren_ray.stages.maincontent import soft404_batch

    t = pa.table({"text": [
        "Oops - Page Not Found. Try the homepage instead, or search.",
        "ERROR 404 " + "x" * 100,      # phrase hit despite length
        "a real long article body " * 10,
        "tiny stub",                    # thin -> soft404, no phrase
        None,                           # null counts as empty/thin
    ]})
    o = soft404_batch(t)
    assert o["has_404_phrase"].to_pylist() == [
        True, True, False, False, False]
    assert o["is_soft404"].to_pylist() == [True, True, False, True, True]
    assert o["n_chars"].to_pylist()[4] == 0


def test_meta_tags_batch_edges():
    """Metadata extraction robustness: missing head, malformed tags,
    unquoted/flipped/cased attributes, entities, first-canonical-wins,
    meta without content."""
    import pyarrow as pa

    from siren_ray.stages.maincontent import meta_tags_batch

    pages = [
        b"",                                   # empty
        b"no html at all",                     # no tags
        b"<meta property='og:title'>",         # no content -> ignored
        (b"<TITLE>T &lt;1&gt;</TITLE>"
         b"<meta content=X property=og:title>"
         b'<link rel=canonical href=/a><link rel=canonical href=/b>'),
        b"<meta name='description' content='d1'><p>body</p>",
    ]
    t = pa.table({"url": pa.array([f"u{i}" for i in range(len(pages))]),
                  "html": pa.array(pages, pa.binary())})
    out = meta_tags_batch(t).to_pydict()
    assert out["title"] == [None, None, None, "T <1>", None]
    assert out["og_title"] == [None, None, None, "X", None]
    assert out["canonical"] == [None, None, None, "/a", None]
    assert out["description"] == [None, None, None, None, "d1"]


def test_robots_directives_semantics():
    """REP robots-meta parse: case/quote/order insensitivity, `none`
    expansion, `all` no-op, unknown-token skip, multi-tag
    most-restrictive union, agent-specific names, empty input."""
    from siren_ray.stages.maincontent import robots_directives as rd

    assert rd(b'<META NAME="ROBOTS" CONTENT="NOINDEX, NOFOLLOW">') == {
        "noindex": True, "nofollow": True, "noarchive": False,
        "nosnippet": False}
    # attribute order + single quotes; `none` = noindex+nofollow
    r = rd("<meta content='none' name='robots'>")
    assert r["noindex"] and r["nofollow"]
    # `all` and unknown tokens assert nothing
    assert not any(rd('<meta name="robots" '
                      'content="all, max-snippet:50">').values())
    # union across multiple tags (most restrictive wins)
    r = rd('<meta name="robots" content="noarchive">'
           '<meta name="robots" content=" NOFOLLOW ">')
    assert r == {"noindex": False, "nofollow": True, "noarchive": True,
                 "nosnippet": False}
    # agent-specific tags honored only when that agent is asked for
    tag = '<meta name="mybot" content="noindex">'
    assert not rd(tag)["noindex"]
    assert rd(tag, agent="MyBot")["noindex"]
    # a different agent's tag never applies
    assert not rd('<meta name="otherbot" content="noindex">',
                  agent="mybot")["noindex"]
    # content-less / empty inputs
    assert not any(rd('<meta name="robots">').values())
    assert not any(rd(b"").values())
    assert not any(rd(None).values())


def test_follow_edges_and_rel_nofollow():
    """Link hygiene: rel=nofollow/ugc/sponsored edges dropped, a
    page-level meta nofollow drops ALL the page's edges, emit_rel
    surfaces the per-edge flag without changing the default schema."""
    import pyarrow as pa

    from siren_ray.stages.maincontent import (anchor_links_batch,
                                              follow_edges_batch)

    page = (b'<html><body><a href="/keep">K</a>'
            b'<a href="/nf" rel="nofollow">N</a>'
            b'<a href="/ugc" rel="UGC sponsored">U</a></body></html>')
    nf_page = (b'<meta name="robots" content="nofollow">'
               b'<a href="/x">X</a>')
    t = pa.table({"url": pa.array(["https://ex.org/a",
                                   "https://ex.org/b"]),
                  "html": pa.array([page, nf_page], pa.binary())})
    # default anchor schema unchanged (no nofollow column)
    assert anchor_links_batch(t).column_names == ["src", "dst", "anchor"]
    rel = anchor_links_batch(t, emit_rel=True)
    assert rel["nofollow"].to_pylist() == [False, True, True, False]
    kept = follow_edges_batch(t)
    assert kept.column_names == ["src", "dst", "anchor"]
    assert kept["dst"].to_pylist() == ["https://ex.org/keep"]


def test_parse_x_robots_tag_semantics():
    """X-Robots-Tag grammar: agent scope applies to the rest of ITS
    header, valued directives' colons are not scopes, `none`
    expansion, unknown tokens skipped, scope resets per header line."""
    import pyarrow as pa

    from siren_ray.stages.maincontent import (parse_x_robots_tag as px,
                                              x_robots_batch)

    assert px("noindex, nofollow")["noindex"]
    # agent scope covers every later directive in the header
    f = px("googlebot: noindex, nofollow")
    assert not f["noindex"] and not f["nofollow"]
    f = px("googlebot: noindex, nofollow", agent="GoogleBot")
    assert f["noindex"] and f["nofollow"]
    # valued directives keep their colon; unavailable_after has a date
    assert not any(px("max-snippet:50, unavailable_after: "
                      "25 Jun 2030 15:00:00 PST").values())
    # `none` expands; `all` asserts nothing
    f = px("none")
    assert f["noindex"] and f["nofollow"]
    assert not any(px("all").values())
    # multi-header: scope resets per line, restrictions union
    f = px("otherbot: noindex\nnoarchive")
    assert f == {"noindex": False, "nofollow": False,
                 "noarchive": True, "nosnippet": False}
    assert px(None) == dict.fromkeys(
        ("noindex", "nofollow", "noarchive", "nosnippet"), False)
    # batch form over a header column with nulls
    t = pa.table({"url": pa.array(["a", "b"]),
                  "x_robots_tag": pa.array(["nosnippet", None])})
    out = x_robots_batch(t).to_pydict()
    assert out["nosnippet"] == [True, False]
    assert out["noindex"] == [False, False]


def test_parse_ld_type_validation_drops_not_crashes():
    """Real-world JSON-LD carries list/dict-valued headline and author;
    a non-string value must DROP the record (P9 validate-or-drop), not
    crash the Arrow column build for the whole batch."""
    import json

    from siren_ray.stages.extract import extract_batch
    import pyarrow as pa

    def ld_page(payload):
        return (b'<html><script type="application/ld+json">'
                + json.dumps(payload).encode()
                + b"</script></html>")

    base = {"url": "u", "datePublished": "2024-01-02T00:00:00",
            "dateModified": "2024-01-02T00:00:00", "description": "d"}
    good = dict(base, headline="ok")
    bad_headline = dict(base, headline=["a", "b"])
    bad_author = dict(base, headline="h", author={"name": ["x"]})
    bad_desc = dict(base, headline="h", description={"en": "d"})
    batch = pa.table({
        "url": pa.array([f"https://h/news/{i}" for i in range(4)]),
        "html": pa.array([ld_page(good), ld_page(bad_headline),
                          ld_page(bad_author), ld_page(bad_desc)],
                         pa.binary()),
    })
    out = extract_batch(batch)  # must not raise
    ok = out["parse_ok"].to_pylist()
    assert ok[0] is True and ok[1] is False and ok[3] is False
    assert ok[2] is True  # bad author coerces to '-', record survives
    assert out["author"].to_pylist()[2] == "-"


def test_parse_epaper_malformed_totalpages():
    from siren_ray.stages.extract import parse_epaper

    html = b'<html><input id="totalpages" value=""></html>'
    r = parse_epaper("https://h/epaper/x/Page-1.html", html)
    assert r["parse_ok"] is True and r["links"] == []
    html2 = b'<html><input id="totalpages" value="junk"></html>'
    r2 = parse_epaper("https://h/epaper/x/Page-1.html", html2)
    assert r2["parse_ok"] is True and r2["links"] == []
