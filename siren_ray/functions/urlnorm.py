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
# backslashes or doubled slashes in the path.
_CANONICAL_RE = (
    r"^https?://"                 # lowercase scheme (regex is case-sens.)
    r"[a-z0-9]([a-z0-9.-]*[a-z0-9])?"  # lowercase host, no port
    r"((/[^/?#\\%]+)+/?|/)$"      # explicit path, no ?/#/%/backslash
)


def canonicalize_url(url: str) -> str:
    """Exact scalar canonicalization (the semantics spec)."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    if port is not None and not (
        (scheme == "http" and port == 80)
        or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
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
    slow path only for the non-canonical minority."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return pa.array([], pa.string())
    ok = pc.match_substring_regex(arr, _CANONICAL_RE).to_numpy(
        zero_copy_only=False)
    ok &= ~pc.is_null(arr).to_numpy(zero_copy_only=False)
    if ok.all():
        return arr
    out = np.asarray(arr.to_pylist(), dtype=object)
    for i in np.flatnonzero(~ok):
        out[i] = canonicalize_url(out[i] or "")
    return pa.array(out, pa.string())


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
