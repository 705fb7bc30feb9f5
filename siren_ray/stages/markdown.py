"""HTML → Markdown serialization over the stdlib mini-DOM.

LLM-corpus pipelines increasingly keep *structure* (headings, lists,
tables, code blocks, links) instead of flattening pages to plain text —
markdown is the lingua franca the big public corpora distribute
(FineWeb/Dolma-style "markdownified" text). This stage serializes the
`html_mini` DOM to deterministic CommonMark-flavoured markdown:

- headings ``h1..h6`` → ``#``×n, paragraphs blank-line separated
- ``ul``/``ol`` → ``- `` / ``1. `` items, nested lists indented 2 spaces
- ``blockquote`` → ``> `` per line; ``pre`` → fenced code block
  (verbatim text, no whitespace collapse); inline ``code`` → backticks
- ``strong``/``b`` → ``**``, ``em``/``i`` → ``*``
- ``a[href]`` → ``[text](href)``, ``img`` → ``![alt](src)``
- ``table`` → pipe table (first row = header, ``---`` separator)
- ``script``/``style``/``head``/``template``/``noscript`` dropped
- inter-tag whitespace collapsed; block output joined by blank lines

No character escaping is performed: the output is training text, not
round-trippable markup (the reference pipeline likewise emits bare
``Tag.text``, e.g. /root/reference/siren/scrapers/online/mirror.py:77).
Conversion is per-document tree work (inherently non-vectorizable, like
every parser in ``stages/extract.py``); ``markdown_batch`` is a
map-only stage whose parallelism comes from Ray Data task fan-out, with
the DOM never crossing a batch boundary.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..html_mini import Node, parse_html

__all__ = ["html_to_markdown", "markdown_batch"]

_SKIP = frozenset({"script", "style", "head", "template", "noscript"})
_WRAP = {"strong": "**", "b": "**", "em": "*", "i": "*"}
_H = {f"h{i}": i for i in range(1, 7)}
# elements rendered as their own block; everything else inside a block
# container is treated as inline content
_BLOCK = frozenset(
    {"p", "div", "section", "article", "main", "body", "html", "header",
     "footer", "aside", "figure", "figcaption", "ul", "ol", "li",
     "blockquote", "pre", "table", "hr", "br", "[document]"}
    | set(_H)
)

_WS = re.compile(r"\s+")


def _collapse(s: str) -> str:
    return _WS.sub(" ", s)


def _inline(n, out: list[str]) -> None:
    """Render inline content (text, emphasis, links, code) into out."""
    if isinstance(n, str):
        out.append(_collapse(n))
        return
    tag = n.tag
    if tag in _SKIP:
        return
    if tag == "br":
        out.append("\n")
        return
    if tag == "img":
        src = n.get("src") or ""
        out.append(f"![{_collapse(n.get('alt') or '')}]({src})" if src
                   else "")
        return
    if tag == "a":
        inner: list[str] = []
        for c in n.children:
            _inline(c, inner)
        txt = "".join(inner).strip()
        href = n.get("href")
        out.append(f"[{txt}]({href})" if href and txt else txt)
        return
    if tag == "code":
        out.append(f"`{n.text.strip()}`")
        return
    mark = _WRAP.get(tag)
    if mark:
        inner = []
        for c in n.children:
            _inline(c, inner)
        txt = "".join(inner).strip()
        out.append(f"{mark}{txt}{mark}" if txt else "")
        return
    for c in n.children:
        _inline(c, out)


def _inline_of(n: Node) -> str:
    parts: list[str] = []
    for c in n.children:
        _inline(c, parts)
    # collapse spaces across text-node seams, keep explicit <br> breaks
    return "\n".join(_collapse(ln).strip()
                     for ln in "".join(parts).split("\n")).strip()


def _table(n: Node, blocks: list[str]) -> None:
    rows = []
    for tr in n.find_all("tr"):
        cells = [c for c in tr.child_elements() if c.tag in ("td", "th")]
        rows.append([_inline_of(c).replace("|", "\\|").replace("\n", " ")
                     for c in cells])
    rows = [r for r in rows if r]
    if not rows:
        return
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    lines = ["| " + " | ".join(rows[0]) + " |",
             "|" + " --- |" * width]
    lines += ["| " + " | ".join(r) + " |" for r in rows[1:]]
    blocks.append("\n".join(lines))


def _list(n: Node, blocks: list[str], depth: int) -> None:
    ordered = n.tag == "ol"
    pad = "  " * depth
    items = []
    idx = 0
    for li in n.child_elements():
        if li.tag != "li":
            continue
        idx += 1
        marker = f"{idx}." if ordered else "-"
        sub: list[str] = []
        _blocks(li, sub, depth + 1)
        body = "\n\n".join(sub).strip() or ""
        first, _, rest = body.partition("\n")
        item = f"{pad}{marker} {first}"
        if rest:
            hang = " " * (len(marker) + 1)
            item += "\n" + "\n".join(
                (pad + hang + ln if ln.strip() else ln)
                for ln in rest.split("\n"))
        items.append(item)
    if items:
        blocks.append("\n".join(items))


def _blocks(n: Node, blocks: list[str], depth: int = 0) -> None:
    """Render n's children as a block sequence into blocks."""
    run: list = []  # pending inline content between block children

    def flush():
        if run:
            holder = Node("span", {}, None)
            holder.children = list(run)
            txt = _inline_of(holder)
            if txt:
                blocks.append(txt)
            run.clear()

    for c in n.children:
        if isinstance(c, str) or c.tag not in _BLOCK:
            if not (isinstance(c, Node) and c.tag in _SKIP):
                run.append(c)
            continue
        flush()
        tag = c.tag
        if tag in _SKIP:
            continue
        if tag in _H:
            txt = _inline_of(c)
            if txt:
                blocks.append("#" * _H[tag] + " " + txt)
        elif tag == "p":
            txt = _inline_of(c)
            if txt:
                blocks.append(txt)
        elif tag in ("ul", "ol"):
            _list(c, blocks, depth)
        elif tag == "blockquote":
            sub: list[str] = []
            _blocks(c, sub, depth)
            body = "\n\n".join(sub)
            if body:
                blocks.append("\n".join("> " + ln if ln else ">"
                                        for ln in body.split("\n")))
        elif tag == "pre":
            body = c.text.strip("\n")
            blocks.append(f"```\n{body}\n```")
        elif tag == "table":
            _table(c, blocks)
        elif tag == "hr":
            blocks.append("---")
        elif tag == "br":
            pass  # stray block-level <br>: paragraph break, nothing to emit
        else:  # transparent block container
            _blocks(c, blocks, depth)
    flush()


def html_to_markdown(html: str | bytes) -> str:
    root = parse_html(html)
    blocks: list[str] = []
    _blocks(root, blocks)
    return "\n\n".join(b for b in blocks if b).strip()


def markdown_batch(t: pa.Table, *, html_col: str = "html",
                   url_col: str = "url") -> pa.Table:
    """Map-only batch stage: (url, markdown, n_chars) per page."""
    md = [html_to_markdown(h if h is not None else b"")
          for h in t[html_col].to_pylist()]
    return pa.table({
        url_col: t[url_col],
        "markdown": pa.array(md, pa.string()),
        "n_chars": pa.array([len(m) for m in md], pa.int64()),
    })
