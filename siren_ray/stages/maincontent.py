"""Generic main-content extraction — the "trafilatura-style text
extraction" stage the north star names for arbitrary (non-registry)
pages.

The per-site parsers in ``stages/extract.py`` reproduce the reference's
exact per-family semantics (SURVEY.md §2.3) and remain the conformance
path; this module is the generic fallback a web-scale crawl needs for
the long tail of hosts no parser covers. It is a from-scratch
readability/boilerpipe-style text-density heuristic over the same
stdlib mini-DOM (``html_mini``) — no external extraction library exists
in this container, and the algorithm (score text blocks by length,
punctuation and link density; credit ancestors; emit the best
container's paragraphs) is the published Readability/Boilerpipe/
trafilatura recipe, not a port of any of them.

Scale shape: a stateless map-only ``map_batches`` stage. HTML parsing
is inherently per-document (the same boundary as ``extract_batch``);
everything around the parse is O(nodes) single-pass. No shuffle, no
state, no driver involvement.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..html_mini import Node, parse_html

# subtrees that never contain main content (dropped before scoring)
NOISE_TAGS = frozenset(
    "script style noscript nav header footer aside form iframe svg "
    "button select option template figure".split()
)
# containers that can win the content vote
_MIN_PARA_CHARS = 25      # readability's minimum paragraph length
_SCORE_CAP = 800          # cap per-paragraph length credit
_MAX_PARA_LINK_DENSITY = 0.5
_WS = re.compile(r"\s+")


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


def _link_chars(node: Node) -> int:
    return sum(len(_norm(a.text)) for a in node.find_all("a"))


def _para_score(txt: str, link_len: int) -> float:
    """Readability-style block score: effective (non-link) length,
    capped, plus a comma/punctuation bonus — link-heavy blocks score
    negative and cannot credit their ancestors."""
    eff = len(txt) - 2 * link_len
    if eff <= 0:
        return 0.0
    return min(float(eff), float(_SCORE_CAP)) + 10.0 * txt.count(",")


def extract_main_content(html: bytes | str | None) -> dict:
    """Extract (title, main_text, link_density, n_paragraphs) from one
    HTML document. Deterministic: candidate ties break by document
    order (first-seen container wins)."""
    if not html:
        return {"title": "", "main_text": "", "link_density": 0.0,
                "n_paragraphs": 0}
    try:
        root = parse_html(html)
    except Exception:
        return {"title": "", "main_text": "", "link_density": 0.0,
                "n_paragraphs": 0}

    t = root.find("title")
    title = _norm(t.text) if t is not None else ""

    # drop noise subtrees BEFORE measuring anything (their link farms
    # would otherwise poison both scores and the page link density)
    for n in list(root.iter_desc()):
        if n.tag in NOISE_TAGS:
            n.extract()
    if not title:
        h1 = root.find("h1")
        title = _norm(h1.text) if h1 is not None else ""

    total_chars = len(_norm(root.text))
    page_link_chars = _link_chars(root)
    link_density = (page_link_chars / total_chars) if total_chars else 0.0

    # vote: each substantial paragraph credits its parent fully and its
    # grandparent half (the Readability ancestor-credit rule)
    scores: dict[int, float] = {}
    containers: dict[int, Node] = {}
    order: dict[int, int] = {}
    seq = 0
    for p in root.find_all("p"):
        txt = _norm(p.text)
        if len(txt) < _MIN_PARA_CHARS:
            continue
        s = _para_score(txt, _link_chars(p))
        if s <= 0:
            continue
        node, weight = p.parent, 1.0
        while node is not None and weight >= 0.5:
            k = id(node)
            if k not in containers:
                containers[k] = node
                order[k] = seq
                seq += 1
                scores[k] = 0.0
            scores[k] += s * weight
            node, weight = node.parent, weight / 2
    if not containers:
        return {"title": title, "main_text": "", "link_density":
                round(link_density, 4), "n_paragraphs": 0}

    best_key = min(scores, key=lambda k: (-scores[k], order[k]))
    best = containers[best_key]
    paras: list[str] = []
    for p in best.find_all("p"):
        txt = _norm(p.text)
        if not txt:
            continue
        lc = _link_chars(p)
        if len(txt) >= _MIN_PARA_CHARS and lc / len(txt) > \
                _MAX_PARA_LINK_DENSITY:
            continue  # link-list paragraph inside the winner
        if len(txt) < _MIN_PARA_CHARS and lc >= len(txt) / 2:
            continue  # tiny linky fragment
        paras.append(txt)
    return {
        "title": title,
        "main_text": "\n".join(paras),
        "link_density": round(link_density, 4),
        "n_paragraphs": len(paras),
    }


def main_content_batch(batch: pa.Table, *, html_col: str = "html",
                       url_col: str = "url") -> pa.Table:
    """Batched Arrow UDF: (url, html) -> (url, title, main_text,
    link_density, n_paragraphs). Stateless; pass to ``map_batches``
    directly (task pool — there is no per-worker state to amortize)."""
    htmls = batch[html_col].to_pylist()
    outs = [extract_main_content(h) for h in htmls]
    return pa.table({
        url_col: batch[url_col],
        "title": pa.array([o["title"] for o in outs], pa.string()),
        "main_text": pa.array([o["main_text"] for o in outs],
                              pa.string()),
        "link_density": pa.array([o["link_density"] for o in outs],
                                 pa.float64()),
        "n_paragraphs": pa.array([o["n_paragraphs"] for o in outs],
                                 pa.int32()),
    })


# --- anchor-text link extraction ------------------------------------------

_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")


def anchor_links(url: str, html: bytes | str | None,
                 *, drop_noise: bool = True) -> list[dict]:
    """(src page) -> [(src, dst, anchor_text)] for every ``<a href>`` —
    the anchor-text edge list web search/rank pipelines consume (anchor
    text is the classic off-page relevance signal; dst in-links feed
    PageRank/HITS in ``stages/graph.py``).

    Relative hrefs resolve against the source URL (RFC 3986 urljoin);
    fragment-only, empty and non-fetchable (javascript:/mailto:/tel:/
    data:) hrefs are skipped; ``drop_noise`` removes nav/footer/aside
    subtrees first so boilerplate chrome links don't dominate the edge
    list (set False for a complete graph). Each edge carries
    ``nofollow``: True when the anchor's ``rel`` attribute holds a
    nofollow-family token (nofollow/ugc/sponsored, space-separated,
    case-insensitive) — the REP link-level control."""
    from urllib.parse import urljoin

    if not html:
        return []
    try:
        root = parse_html(html)
    except Exception:
        return []
    if drop_noise:
        for n in list(root.iter_desc()):
            if n.tag in NOISE_TAGS and n.tag != "figure":
                n.extract()
    out = []
    for a in root.find_all("a"):
        href = (a.get("href") or "").strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        dst = urljoin(url, href)
        frag = dst.find("#")
        if frag >= 0:
            dst = dst[:frag]
        if not dst:
            continue
        rel = (a.get("rel") or "").lower().split()
        out.append({"src": url, "dst": dst, "anchor": _norm(a.text),
                    "nofollow": bool(_NOFOLLOW_RELS.intersection(rel))})
    return out


def anchor_links_batch(batch: pa.Table, *, html_col: str = "html",
                       url_col: str = "url", drop_noise: bool = True,
                       emit_rel: bool = False) -> pa.Table:
    """Batched flat-map: one (src, dst, anchor) row per extracted link.
    Stateless map-only stage; the edge list is the shuffle-ready input
    for dst-grouped anchor aggregation or the graph operators.
    ``emit_rel=True`` appends the per-edge ``nofollow`` bool (REP rel
    tokens) consumed by ``follow_edges_batch``."""
    urls = batch[url_col].to_pylist()
    htmls = batch[html_col].to_pylist()
    src, dst, anc, nf = [], [], [], []
    for u, h in zip(urls, htmls):
        for e in anchor_links(u, h, drop_noise=drop_noise):
            src.append(e["src"])
            dst.append(e["dst"])
            anc.append(e["anchor"])
            nf.append(e["nofollow"])
    out = {
        "src": pa.array(src, pa.string()),
        "dst": pa.array(dst, pa.string()),
        "anchor": pa.array(anc, pa.string()),
    }
    if emit_rel:
        out["nofollow"] = pa.array(nf, pa.bool_())
    return pa.table(out)


# --- robots meta directives (REP page-level crawl controls) ----------------

# Restriction tokens the REP robots <meta> spec defines (the subset with
# crawl/corpus consequences). "none" expands to noindex+nofollow; "all"
# asserts no restrictions (a no-op token); unknown tokens are ignored.
ROBOTS_RESTRICTIONS = ("noindex", "nofollow", "noarchive", "nosnippet")


def robots_directives(html: bytes | str | None,
                      *, agent: str | None = None) -> dict:
    """Parse page-level REP robots directives from ``<meta>`` tags —
    the in-page complement of robots.txt (``stages/robotstxt.py``): a
    fetched page can still tell the crawler "don't index me" /
    "don't follow my links".

    Applicable tags are those whose ``name`` is ``robots`` or, when
    ``agent`` is given, that agent's own name (both case-insensitive).
    ``content`` is a comma-separated token list (tokens trimmed,
    case-insensitive). Restrictions UNION across all applicable tags —
    the documented most-restrictive-wins combination rule — so
    conflicting tags resolve to the safer behavior. Returns a dict of
    the four booleans in ``ROBOTS_RESTRICTIONS`` order.

    Regex tag scan + attribute parse (shared with ``meta_tags_batch``),
    no DOM build; the reference's scrapers never see these because
    their search APIs return article JSON, but a generic frontier must
    honor them (REP: RFC 9309 governs robots.txt; the meta tag is the
    companion page-level control)."""
    flags = dict.fromkeys(ROBOTS_RESTRICTIONS, False)
    if not html:
        return flags
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    names = {"robots"}
    if agent:
        names.add(agent.lower())
    for tag in _META_TAG_RE.findall(html):
        a = _tag_attrs(tag)
        if a.get("name", "").strip().lower() not in names:
            continue
        content = a.get("content")
        if content is None:
            continue
        for tok in content.split(","):
            tok = tok.strip().lower()
            if tok == "none":
                flags["noindex"] = flags["nofollow"] = True
            elif tok in flags:
                flags[tok] = True
    return flags


def robots_meta_batch(t: pa.Table, *, html_col: str = "html",
                      url_col: str = "url",
                      agent: str | None = None) -> pa.Table:
    """Batched robots-meta extraction: (url, noindex, nofollow,
    noarchive, nosnippet). Map-only, stateless. ``noindex`` pages are
    kept OUT of a training-corpus sink; ``nofollow`` pages contribute
    no frontier child links (see ``follow_edges_batch``)."""
    htmls = t[html_col].to_pylist()
    rows = [robots_directives(h, agent=agent) for h in htmls]
    out = {url_col: t[url_col]}
    for k in ROBOTS_RESTRICTIONS:
        out[k] = pa.array([r[k] for r in rows], pa.bool_())
    return pa.table(out)


# directive names that legitimately carry a ":<value>" suffix — their
# colon must NOT be read as an agent-scope prefix
_VALUED_DIRECTIVES = frozenset((
    "max-snippet", "max-image-preview", "max-video-preview",
    "unavailable_after"))


def parse_x_robots_tag(value: str | None,
                       *, agent: str | None = None) -> dict:
    """Parse ``X-Robots-Tag`` response-header value(s) into the same
    restriction flags as :func:`robots_directives` — the HTTP-level REP
    control that covers non-HTML payloads (PDFs, images) a ``<meta>``
    tag can't reach.

    Grammar (as publicly documented): a comma-separated directive list,
    optionally opened by an ``agent:`` scope that applies to every
    following directive in THAT header (``googlebot: noindex, nofollow``
    scopes both). A colon inside a known valued directive
    (``max-snippet:50``, ``unavailable_after: <date>``) is a value
    separator, not a scope. Repeated headers arrive newline-joined
    (``HttpTransport.fetch_many_with_meta``) and each line resets the
    scope. Unscoped directives always apply; scoped ones only when
    ``agent`` matches (case-insensitive). Restrictions UNION across
    headers — most restrictive wins, same as the meta tag."""
    flags = dict.fromkeys(ROBOTS_RESTRICTIONS, False)
    if not value:
        return flags
    want = agent.lower() if agent else None
    for line in value.split("\n"):
        scope = None  # generic until an agent prefix appears
        for raw in line.split(","):
            tok = raw.strip()
            if ":" in tok:
                pre, rest = tok.split(":", 1)
                pre_l = pre.strip().lower()
                if (pre_l not in _VALUED_DIRECTIVES
                        and pre_l not in ROBOTS_RESTRICTIONS
                        and pre_l not in ("none", "all")):
                    scope = pre_l
                    tok = rest
            t = tok.strip().lower()
            if scope is not None and scope != want:
                continue
            if t == "none":
                flags["noindex"] = flags["nofollow"] = True
            elif t in flags:
                flags[t] = True
    return flags


def x_robots_batch(t: pa.Table, *, header_col: str = "x_robots_tag",
                   url_col: str = "url",
                   agent: str | None = None) -> pa.Table:
    """Batched X-Robots-Tag parse: (url, noindex, nofollow, noarchive,
    nosnippet) from a header-value column (nulls = no header = no
    restrictions). Union with ``robots_meta_batch`` flags for the full
    page-level REP verdict."""
    vals = t[header_col].to_pylist()
    rows = [parse_x_robots_tag(v, agent=agent) for v in vals]
    out = {url_col: t[url_col]}
    for k in ROBOTS_RESTRICTIONS:
        out[k] = pa.array([r[k] for r in rows], pa.bool_())
    return pa.table(out)


# rel tokens that mark a link as not-to-be-followed/credited (REP rel
# attribute values: nofollow, plus the ugc/sponsored refinements that
# crawl pipelines treat the same way for frontier purposes)
_NOFOLLOW_RELS = frozenset(("nofollow", "ugc", "sponsored"))


def follow_edges_batch(batch: pa.Table, *, html_col: str = "html",
                       url_col: str = "url", drop_noise: bool = True,
                       agent: str | None = None) -> pa.Table:
    """Link-hygiene composite: the (src, dst, anchor) edges a polite
    frontier may actually follow — ``anchor_links_batch`` edges minus
    (a) links carrying a nofollow-family ``rel`` token and (b) ALL
    links from pages whose robots meta says ``nofollow``. Map-only;
    the output is drop-in frontier/graph input."""
    edges = anchor_links_batch(batch, html_col=html_col,
                               url_col=url_col, drop_noise=drop_noise,
                               emit_rel=True)
    meta = robots_meta_batch(batch, html_col=html_col, url_col=url_col,
                             agent=agent)
    page_nf = {u: nf for u, nf in
               zip(meta[url_col].to_pylist(),
                   meta["nofollow"].to_pylist()) if nf}
    keep = [not rel_nf and src not in page_nf
            for src, rel_nf in zip(edges["src"].to_pylist(),
                                   edges["nofollow"].to_pylist())]
    return edges.filter(pa.array(keep, pa.bool_())).drop_columns(
        ["nofollow"])


# --- charset-sniffing decode ----------------------------------------------

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.I)
_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)


def decode_html(payload: bytes | str | None) -> tuple[str, str]:
    """Decode a raw HTML byte payload to text, sniffing the encoding the
    way browsers (WHATWG) and Common-Crawl processors do: BOM first,
    then a ``<meta charset=…>`` / ``http-equiv`` declaration scanned in
    the first 1024 bytes, else UTF-8; undecodable byte sequences fall
    back to latin-1 (which never fails) rather than dropping the
    document. Returns ``(text, encoding_used)``.

    The corpus generator writes clean UTF-8 so the crawl's hot path
    never needs this, but a real WARC ingest does — it slots between
    ``read_warc`` and the extraction stages as a map-only transform."""
    if payload is None:
        return "", "utf-8"
    if isinstance(payload, str):
        return payload, "utf-8"
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            try:
                # utf-8-sig consumes its BOM; utf-16 BOMs are sliced off
                body = payload if enc == "utf-8-sig" else payload[len(bom):]
                return body.decode(enc), enc
            except UnicodeDecodeError:
                break
    m = _META_CHARSET_RE.search(payload[:1024])
    if m:
        enc = m.group(1).decode("ascii", "replace").lower()
        try:
            return payload.decode(enc), enc
        except (UnicodeDecodeError, LookupError):
            pass
    try:
        return payload.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("latin-1"), "latin-1"


def decode_html_batch(batch: pa.Table, *, payload_col: str = "html",
                      out_col: str = "html_text") -> pa.Table:
    """Map-only batched decode: appends ``out_col`` (decoded text) and
    ``encoding`` columns."""
    payloads = batch[payload_col].to_pylist()
    texts, encs = [], []
    for p in payloads:
        t, e = decode_html(p)
        texts.append(t)
        encs.append(e)
    return batch.append_column(
        out_col, pa.array(texts, pa.string())
    ).append_column("encoding", pa.array(encs, pa.string()))


# --- soft-404 detection -----------------------------------------------------

# Error-page phrase screen. RE2, shared VERBATIM with the DuckDB oracle
# ((?i) inline flag — both engines are RE2-compatible here). Applied to
# extracted text (title || body), NOT raw HTML, so chrome like a
# footer's "404 monitoring" link doesn't fire.
SOFT404_PATTERN = ("(?i)(page not found|error 404|404 not found|"
                   "not be found|no longer available|does not exist)")
SOFT404_MIN_CHARS = 64


def soft404_signals(text: pa.Array | pa.ChunkedArray,
                    *, min_chars: int = SOFT404_MIN_CHARS) -> pa.Table:
    """Soft-404 screen: pages that answered 200 but are error pages —
    the classic crawl-corpus pollutant (the reference's scrapers never
    see them because their search APIs only return real articles; a
    generic frontier must screen for them before text lands in a
    training corpus).

    Fully vectorized Arrow kernels, map-only. Signals: ``n_chars``
    (codepoints), ``has_404_phrase`` (RE2 phrase screen over the
    extracted text), and the verdict ``is_soft404`` = phrase hit OR
    thin page (< ``min_chars`` after extraction — error pages that
    say nothing recognizable still say almost nothing). Nulls count
    as empty (thin)."""
    x = text
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    filled = pc.fill_null(x, "")
    n_chars = pc.cast(pc.utf8_length(filled), pa.int64())
    phrase = pc.match_substring_regex(filled, SOFT404_PATTERN)
    thin = pc.less(n_chars, pa.scalar(min_chars, pa.int64()))
    return pa.table({
        "n_chars": n_chars,
        "has_404_phrase": phrase,
        "is_soft404": pc.or_(phrase, thin),
    })


def soft404_batch(batch: pa.Table, *, text_col: str = "text",
                  min_chars: int = SOFT404_MIN_CHARS) -> pa.Table:
    """Batched soft-404 screen: appends the three signal columns."""
    sig = soft404_signals(batch[text_col], min_chars=min_chars)
    out = batch
    for name in sig.column_names:
        out = out.append_column(name, sig[name])
    return out


# --- page metadata (OpenGraph / meta tags / canonical) ---------------------

_META_TAG_RE = re.compile(r"<meta\b[^>]*>", re.I | re.S)
_LINK_TAG_RE = re.compile(r"<link\b[^>]*>", re.I | re.S)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.I | re.S)
_ATTR_RE = re.compile(
    r"""([a-zA-Z:_][\w:.-]*)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+))""")


def _tag_attrs(tag: str) -> dict[str, str]:
    import html as _html

    return {m.group(1).lower(): _html.unescape(
                m.group(2) or m.group(3) or m.group(4) or "")
            for m in _ATTR_RE.finditer(tag)}


def meta_tags_batch(t: pa.Table, *, html_col: str = "html",
                    url_col: str = "url") -> pa.Table:
    """Page metadata extraction: ``<title>``, OpenGraph properties
    (og:title/og:description/og:image), ``<meta name=description>``
    and the ``<link rel=canonical>`` href — the envelope fields a
    search/social index keeps per page. Meta/link tags are
    self-contained void elements, so a compiled tag-regex + attribute
    parse (order- and quote-style-insensitive, entity-decoded) reads
    them without a full DOM build; map-only. Missing fields are null.
    The reference parses equivalent ld+json envelope fields per
    article (/root/reference/siren/scrapers/online/mirror.py:70-77);
    this is the page-level generalization."""
    import html as _html

    htmls = t[html_col].to_pylist()
    cols: dict[str, list] = {k: [] for k in (
        "title", "og_title", "og_description", "og_image",
        "description", "canonical")}
    for h in htmls:
        if isinstance(h, (bytes, bytearray, memoryview)):
            h = bytes(h).decode("utf-8", errors="replace")
        h = h or ""
        row = dict.fromkeys(cols)
        m = _TITLE_RE.search(h)
        if m:
            row["title"] = _html.unescape(m.group(1)).strip()
        for tag in _META_TAG_RE.findall(h):
            a = _tag_attrs(tag)
            content = a.get("content")
            if content is None:
                continue
            key = a.get("property") or a.get("name") or ""
            key = key.lower()
            if key == "og:title":
                row["og_title"] = content
            elif key == "og:description":
                row["og_description"] = content
            elif key == "og:image":
                row["og_image"] = content
            elif key == "description":
                row["description"] = content
        for tag in _LINK_TAG_RE.findall(h):
            a = _tag_attrs(tag)
            if a.get("rel", "").lower() == "canonical" and a.get("href"):
                row["canonical"] = a["href"]
                break  # first canonical wins
        for k in cols:
            cols[k].append(row[k])
    out = {url_col: t[url_col]}
    out.update({k: pa.array(v, pa.string()) for k, v in cols.items()})
    return pa.table(out)
