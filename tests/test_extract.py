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
