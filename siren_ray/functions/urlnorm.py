"""URL canonicalization + mimetype inference (crawl-side scalars).

Canonicalization is the frontier's first line of dedup leverage: at a
10^10-URL design point the same page arrives as `HTTP://Host/a`,
`http://host:80/a?utm_source=x#frag`, … and every variant that slips
past the seen-set costs a full fetch. Rules (the conservative,
widely-safe subset):

- scheme + host lowercased; default ports (:80 http, :443 https) dropped
- fragment dropped
- tracking query params dropped (utm_*, fbclid, gclid, msclkid)
- remaining query params sorted by (key, value); empty query -> no "?"
- empty path -> "/"

Scale shape: a single vectorized regex screen passes already-canonical
URLs through untouched (the overwhelming majority of a well-formed
frontier), and only the flagged minority pays the exact
``urllib.parse`` slow path — the screen is deliberately conservative
(anything unusual fails it and gets parsed).

Mimetype inference (reference W7, core/file.py:21) is magic-bytes
first, extension second: vectorized prefix compares over the binary
column, one regex extract for the extension fallback.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_TRACKING = ("fbclid", "gclid", "msclkid")

# Already-canonical screen: lowercase scheme, lowercase reg-name host
# without port, non-empty path, no query, no fragment, no %XX, no
# backslashes, doubled slashes or WHITESPACE in the path (a trailing
# space used to pass the screen while the scalar spec strips it — two
# canonical forms for one URL).
_CANONICAL_RE = (
    r"^https?://"                 # lowercase scheme (regex is case-sens.)
    r"[a-z0-9]([a-z0-9.-]*[a-z0-9])?"  # lowercase host, no port
    r"((/[^/?#\\%\s]+)+/?|/)$"    # explicit path, no ?/#/%/\/whitespace
)


def canonicalize_url(url: str) -> str:
    """Exact scalar canonicalization (the semantics spec). Anything
    unparseable passes through stripped but otherwise untouched —
    a crawled page's one malformed href must never kill the batch."""
    s = url.strip()
    try:
        parts = urlsplit(s)
        port = parts.port  # raises ValueError on malformed ports —
        # urlsplit defers port validation to this property access
    except ValueError:
        return s
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    if ":" in host:  # IPv6 literal: hostname strips the brackets
        host = f"[{host}]"
    if port is not None and not (
        (scheme == "http" and port == 80)
        or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    if parts.username is not None:
        # preserve userinfo: a credentialed URL is NOT the same
        # resource as its bare-host counterpart
        userinfo = parts.username
        if parts.password is not None:
            userinfo += f":{parts.password}"
        host = f"{userinfo}@{host}"
    path = parts.path or "/"
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not k.startswith("utm_") and k not in _TRACKING
    ]
    query = urlencode(sorted(q)) if q else ""
    return urlunsplit((scheme, host, path, query, ""))


def canonicalize_urls(col) -> pa.Array:
    """Vectorized batch canonicalization: regex fast-path screen, exact
    slow path only for the non-canonical minority (taken by index and
    scattered back — never a full-column Python materialization).
    Nulls propagate as nulls."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return pa.array([], pa.string())
    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    ok = pc.fill_null(
        pc.match_substring_regex(arr, _CANONICAL_RE), False
    ).to_numpy(zero_copy_only=False).astype(bool)
    fix = ~ok & valid
    if not fix.any():
        return arr if isinstance(arr, pa.Array) else arr.combine_chunks()
    idx = np.flatnonzero(fix)
    sub = arr.take(pa.array(idx)).to_pylist()
    fixed = pa.array([canonicalize_url(u) for u in sub], pa.string())
    return pc.replace_with_mask(arr, pa.array(fix), fixed)


# --- mimetype inference (W7) ----------------------------------------------

_MAGIC: list[tuple[bytes, str]] = [
    (b"%PDF", "application/pdf"),
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\x1f\x8b", "application/gzip"),
    (b"PK\x03\x04", "application/zip"),
    (b"{", "application/json"),
]

_EXT = {
    "html": "text/html", "htm": "text/html", "json": "application/json",
    "pdf": "application/pdf", "png": "image/png", "jpg": "image/jpeg",
    "jpeg": "image/jpeg", "gif": "image/gif", "css": "text/css",
    "js": "text/javascript", "xml": "application/xml",
    "txt": "text/plain", "csv": "text/csv",
}


def infer_mimetypes(url_col, body_col=None) -> pa.Array:
    """Vectorized mimetype inference: magic-bytes prefix compares over
    the binary column first (content truth), URL extension fallback,
    ``text/html`` default (a crawler's modal answer). Bodies whose
    first bytes are '<' (tag soup) are html regardless of extension."""
    urls = (url_col.combine_chunks()
            if isinstance(url_col, pa.ChunkedArray) else url_col)
    n = len(urls)
    out = np.full(n, None, dtype=object)
    if body_col is not None:
        bodies = (body_col.combine_chunks()
                  if isinstance(body_col, pa.ChunkedArray) else body_col)
        maxm = max(len(m) for m, _ in _MAGIC)
        heads = pc.binary_slice(
            pc.coalesce(bodies, pa.scalar(b"", pa.binary())), 0, maxm
        ).to_pylist()
        for i, h in enumerate(heads):
            if not h:
                continue
            if h[:1] in (b"<", b" ") or h[:1].isspace():
                out[i] = "text/html"
                continue
            for magic, mt in _MAGIC:
                if h.startswith(magic):
                    out[i] = mt
                    break
    # extension fallback, vectorized extract over unresolved rows
    todo = np.flatnonzero([o is None for o in out])
    if len(todo):
        sub = urls.take(pa.array(todo))
        ext = pc.extract_regex(
            pc.coalesce(sub, pa.scalar("")),
            r"\.(?P<ext>[A-Za-z0-9]{1,5})$")
        ext_list = ext.to_pylist()
        for j, m in zip(todo, ext_list):
            e = (m["ext"].lower() if m else "")
            out[j] = _EXT.get(e, "text/html")
    return pa.array(out, pa.string())


# --- crawler-trap detection ----------------------------------------------

_SCHEME_HOST_RE = r"^[a-z]+://[^/]*"


def url_trap_signals(url_col, *, depth_limit: int = 8,
                     param_limit: int = 6, len_limit: int = 200,
                     repeat_limit: int = 2) -> pa.Table:
    """Vectorized crawler-trap signals over a URL column — the frontier
    hygiene screen every web-scale crawl needs (calendar traps, session
    loops, faceted-search parameter explosions generate unbounded URL
    spaces; the reference's fixed scraper URL builders never face this,
    so this is an engine addition per the task brief).

    Per url: ``url_len``, ``path_depth`` (count of '/' in the path),
    ``n_params`` ('&'-separated query entries), ``max_seg_repeat``
    (highest multiplicity of one non-empty path segment — the
    /a/b/a/b/a/b loop detector), and ``is_trap`` (any limit exceeded).
    The definitions are shared verbatim with the DuckDB oracle
    (string arithmetic, not urllib), so parity is by construction.

    Fully vectorized: Arrow regex/substring kernels for the splits and
    counts; segment multiplicity via one numpy lexsort run-length pass
    over the exploded (row, segment-hash) pairs — no per-row Python.
    """
    import pyarrow.compute as pc

    from ..util import hash_strings

    urls = (url_col.combine_chunks()
            if isinstance(url_col, pa.ChunkedArray) else url_col)
    urls = pc.coalesce(urls, pa.scalar(""))
    n = len(urls)
    url_len = pc.utf8_length(urls)
    rest = pc.replace_substring_regex(urls, _SCHEME_HOST_RE, "")
    # path / query split on the first '?' (regex carve — Arrow slice
    # kernels take scalar bounds only)
    path = pc.replace_substring_regex(rest, r"\?.*$", "")
    query = pc.replace_substring_regex(rest, r"^[^?]*\??", "")
    path_depth = pc.count_substring(path, "/")
    n_params = pc.if_else(
        pc.equal(query, ""), pa.scalar(0, pa.int32()),
        pc.cast(pc.add(pc.count_substring(query, "&"), 1), pa.int32()))
    # max segment multiplicity: explode non-empty segments, hash them,
    # lexsort (row, hash), run-length count, segment-max per row
    segs = pc.split_pattern(path, "/")
    seg_flat = segs.flatten()
    lengths = pc.list_value_length(segs).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    nonempty = pc.not_equal(seg_flat, "").to_numpy(zero_copy_only=False)
    row_idx = row_idx[nonempty]
    seg_h = hash_strings(seg_flat.filter(pa.array(nonempty)))
    max_rep = np.zeros(n, dtype=np.int64)
    if len(row_idx):
        order = np.lexsort((seg_h, row_idx))
        r, h = row_idx[order], seg_h[order]
        new_run = np.empty(len(r), dtype=bool)
        new_run[0] = True
        new_run[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
        run_id = np.cumsum(new_run) - 1
        counts = np.bincount(run_id)
        run_row = r[new_run]
        np.maximum.at(max_rep, run_row, counts)
    url_len64 = pc.cast(url_len, pa.int64())
    pd64 = pc.cast(path_depth, pa.int64())
    np64 = pc.cast(n_params, pa.int64())
    rep = pa.array(max_rep, pa.int64())
    is_trap = pc.or_(
        pc.or_(pc.greater(pd64, depth_limit),
               pc.greater(rep, repeat_limit)),
        pc.or_(pc.greater(np64, param_limit),
               pc.greater(url_len64, len_limit)),
    )
    return pa.table({
        "url": urls, "url_len": url_len64, "path_depth": pd64,
        "n_params": np64, "max_seg_repeat": rep, "is_trap": is_trap,
    })


def url_trap_batch(batch: pa.Table, url_col: str = "url",
                   **limits) -> pa.Table:
    """map_batches wrapper around :func:`url_trap_signals`."""
    return url_trap_signals(batch[url_col], **limits)


# --- registrable domain (public-suffix, eTLD+1) -----------------------------

# Embedded slice of the public suffix list (publicsuffix.org) — enough
# for deterministic tests and the common crawl hosts; production swaps
# in the full PSL data file via these two sets (pure config, the
# longest-match algorithm below is list-size-independent). Shared
# VERBATIM with the DuckDB oracle's IN-lists.
PSL_2 = frozenset({
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.in", "net.in", "org.in", "ac.in",
    "gov.in", "com.br", "com.cn", "com.mx", "co.za", "com.sg", "com.tr",
})
PSL_1 = frozenset({
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "ai",
    "app", "dev", "info", "biz", "uk", "in", "jp", "au", "de", "fr",
    "br", "cn", "ru", "us", "ca", "es", "it", "nl", "se", "no",
})


def registrable_domain(host: str | None) -> tuple[str | None, str | None]:
    """PSL longest-match: ``host -> (public_suffix, registrable)``.

    The LONGEST listed suffix wins (``x.co.uk`` registers under
    ``co.uk``, never ``uk``); the registrable domain (eTLD+1) is the
    suffix plus exactly one more label. A bare public suffix
    (``co.uk``) has no registrable domain; an unlisted TLD yields
    ``(None, None)`` — per-domain politeness then falls back to the
    full host. This is what groups ``news.bbc.co.uk`` and
    ``www.bbc.co.uk`` into one politeness/budget unit."""
    if not host:
        return (None, None)
    labels = host.lower().split(".")
    if len(labels) >= 2 and ".".join(labels[-2:]) in PSL_2:
        n = 2
    elif labels[-1] in PSL_1:
        n = 1
    else:
        return (None, None)
    suffix = ".".join(labels[-n:])
    if len(labels) <= n:
        return (suffix, None)
    return (suffix, ".".join(labels[-(n + 1):]))


def registrable_domain_batch(batch: pa.Table, *, host_col: str = "host"
                             ) -> pa.Table:
    """Map-only batched PSL match: appends ``public_suffix`` and
    ``registrable_domain`` columns (set lookups per host — two hashed
    probes, no regex)."""
    pairs = [registrable_domain(h) for h in batch[host_col].to_pylist()]
    return batch.append_column(
        "public_suffix", pa.array([p[0] for p in pairs], pa.string())
    ).append_column(
        "registrable_domain", pa.array([p[1] for p in pairs], pa.string()))


def blocklist_signals(url_col, *, blocked_domains: frozenset,
                      blocked_terms: tuple) -> pa.Array:
    """Per-URL block decision (UT1-style domain/keyword lists): a URL
    is blocked when its registrable domain — or the full host when the
    TLD is unlisted — is in ``blocked_domains``, OR when any
    ``blocked_terms`` entry appears as a substring of the lowercase
    path+query. Pure per-row function of the URL; vectorized host/path
    carving, hashed set probes per host, one pandas ``contains`` pass
    per term."""
    import pandas as pd

    from ..util import hosts_of, paths_of

    urls = url_col.to_numpy(zero_copy_only=False) \
        if hasattr(url_col, "to_numpy") else np.asarray(url_col, object)
    hosts = hosts_of(urls)
    # probe each DISTINCT host once (crawl batches repeat hosts heavily)
    uniq, inv = np.unique(hosts.astype(str), return_inverse=True)
    hit = np.fromiter(
        (((registrable_domain(h)[1] or h).lower() in blocked_domains)
         for h in uniq),
        dtype=bool, count=len(uniq))
    blocked = hit[inv]
    if blocked_terms:
        paths = pd.Series(paths_of(urls), dtype="object").str.lower()
        for term in blocked_terms:
            blocked |= paths.str.contains(term, regex=False,
                                          na=False).to_numpy()
    return pa.array(blocked, pa.bool_())


def blocklist_filter(ds, *, url_col: str = "url",
                     blocked_domains=(), blocked_terms=(),
                     invert: bool = False):
    """Drop rows whose URL the blocklist matches (``invert=True``
    keeps ONLY matches, for audit samples). The lists are broadcast
    ONCE via ``ray.put`` and rehydrated per worker in the callable's
    ``__init__`` (UT1-scale domain lists run to millions of entries —
    they must never ride along per batch). Map-only; no shuffle.

    (Engine addition — the reference pins exact article URLs from
    search APIs and never needs corpus-level URL hygiene; standard
    front-door step for Common-Crawl-style ingest.)
    """
    import ray

    bl_ref = ray.put((
        frozenset(d.lower() for d in blocked_domains),
        tuple(t.lower() for t in blocked_terms),
    ))

    class _Blocklist:
        def __init__(self):
            self.domains, self.terms = ray.get(bl_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            blocked = blocklist_signals(
                t[url_col].combine_chunks(),
                blocked_domains=self.domains, blocked_terms=self.terms)
            keep = blocked if invert else pa.compute.invert(blocked)
            return t.filter(keep)

    return ds.map_batches(_Blocklist, batch_format="pyarrow",
                          concurrency=(1, 8))


# --- URL template mining ----------------------------------------------------

# shared VERBATIM with the DuckDB oracle (both engines compile RE2)
TEMPLATE_QUERY_RE = r"\?.*$"          # strip the query string
TEMPLATE_HEX_RE = r"\b[0-9a-f]{16,}\b"  # long hex ids (hashes, uuids)
TEMPLATE_NUM_RE = r"\d+"              # any digit run


def url_template_batch(batch: pa.Table, *, url_col: str = "url"
                       ) -> pa.Table:
    """Generalize each URL into its generator template: query string
    stripped, long hex ids -> ``<H>``, digit runs -> ``<N>``. Grouping
    on the template exposes the URL *families* a site generates
    (article ids, pagination, tile grids, calendar traps) — the
    crawl-ops complement to `url_trap_signals`: a family whose count
    explodes is a generator, not content. Three vectorized RE2 passes,
    map-only; patterns shared verbatim with the oracle."""
    import pyarrow.compute as pc

    u = batch[url_col]
    t = pc.replace_substring_regex(u, pattern=TEMPLATE_QUERY_RE,
                                   replacement="")
    t = pc.replace_substring_regex(t, pattern=TEMPLATE_HEX_RE,
                                   replacement="<H>")
    t = pc.replace_substring_regex(t, pattern=TEMPLATE_NUM_RE,
                                   replacement="<N>")
    return batch.append_column("template", pc.cast(t, pa.string()))
