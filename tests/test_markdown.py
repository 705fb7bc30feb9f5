"""HTML → Markdown serializer (stages/markdown.py): structural goldens
and the map-only batch stage."""

import pyarrow as pa
import pytest

from siren_ray.stages.markdown import html_to_markdown, markdown_batch


def test_headings_paragraphs_emphasis():
    html = """
    <html><head><title>skip me</title><style>p{}</style></head><body>
    <h1>Title</h1>
    <p>First <b>bold</b> and <em>italic</em>   text.</p>
    <h2>Sub</h2>
    <p>Second.</p>
    </body></html>"""
    assert html_to_markdown(html) == (
        "# Title\n\n"
        "First **bold** and *italic* text.\n\n"
        "## Sub\n\n"
        "Second."
    )


def test_links_images_code():
    html = ('<p>See <a href="https://x.test/a">the docs</a> and '
            '<code> f(x) </code> plus <img src="/i.png" alt="pic">.</p>')
    assert html_to_markdown(html) == (
        "See [the docs](https://x.test/a) and `f(x)` plus ![pic](/i.png)."
    )


def test_anchor_without_href_is_plain_text():
    assert html_to_markdown("<p><a>bare</a> anchor</p>") == "bare anchor"


def test_lists_nested():
    html = """
    <ul><li>one</li><li>two
      <ol><li>a</li><li>b</li></ol>
    </li></ul>"""
    assert html_to_markdown(html) == (
        "- one\n"
        "- two\n"
        "\n"
        "    1. a\n"
        "    2. b"
    )


def test_blockquote_and_pre_verbatim():
    html = ("<blockquote><p>quoted  line</p></blockquote>"
            "<pre>  keep   spacing\nline2</pre>")
    assert html_to_markdown(html) == (
        "> quoted line\n\n"
        "```\n  keep   spacing\nline2\n```"
    )


def test_table_pipe_layout():
    html = """<table>
      <tr><th>h1</th><th>h2</th></tr>
      <tr><td>a|x</td><td>b</td></tr>
      <tr><td>c</td></tr>
    </table>"""
    assert html_to_markdown(html) == (
        "| h1 | h2 |\n"
        "| --- | --- |\n"
        "| a\\|x | b |\n"
        "| c |  |"
    )


def test_br_and_hr():
    html = "<p>line1<br>line2</p><hr><p>after</p>"
    assert html_to_markdown(html) == "line1\nline2\n\n---\n\nafter"


def test_transparent_containers_and_script_drop():
    html = ('<div><section><p>inner</p></section>'
            '<script>var x=1;</script><noscript>no</noscript></div>')
    assert html_to_markdown(html) == "inner"


def test_bare_text_between_blocks():
    html = "<div>loose <b>text</b><p>para</p>tail</div>"
    assert html_to_markdown(html) == "loose **text**\n\npara\n\ntail"


def test_deterministic_and_bytes_input():
    html = b"<h1>T</h1><p>x</p>"
    assert html_to_markdown(html) == html_to_markdown(html.decode())


def test_markdown_batch_stage():
    t = pa.table({
        "url": pa.array(["u1", "u2", "u3"], pa.string()),
        "html": pa.array([b"<h1>A</h1><p>one</p>", b"", None],
                         pa.binary()),
    })
    out = markdown_batch(t)
    assert out.column_names == ["url", "markdown", "n_chars"]
    md = out["markdown"].to_pylist()
    assert md[0] == "# A\n\none"
    assert md[1] == "" and md[2] == ""
    assert out["n_chars"].to_pylist() == [len(md[0]), 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_markdown_over_corpus_pages(corpus_sf0001):
    """End-to-end over the synthetic pages corpus: every fetched page
    yields markdown whose heading matches the page's <h1>."""
    import os

    import ray.data as rd

    import pyarrow.compute as pc

    def _html_only(t):
        # the corpus mixes HTML pages with JSON API payloads and binary
        # image tiles; markdownify the HTML ones
        keep = pc.starts_with(t["html"], pattern=b"<")
        return t.filter(pc.fill_null(keep, False))

    pages = (rd.read_parquet(os.path.join(corpus_sf0001, "pages"),
                             columns=["url", "html"])
             .map_batches(_html_only, batch_format="pyarrow")
             .limit(50)).materialize()
    out = pages.map_batches(markdown_batch,
                            batch_format="pyarrow").to_pandas()
    assert len(out) == 50
    # the only empty conversions are ld+json articles, whose entire
    # payload is a (correctly skipped) <script> block
    raw = {r["url"]: bytes(r["html"]) for r in pages.take_all()}
    for _, row in out.iterrows():
        if row.n_chars == 0:
            assert b"ld+json" in raw[row.url]
    assert (out.n_chars > 0).mean() > 0.5
    # structure survives: search pages become link lists, articles
    # become heading + paragraphs
    assert out.markdown.str.contains(r"\[.+\]\(.+\)", regex=True).any()
    assert out.markdown.str.contains("^# ", regex=True).any()
