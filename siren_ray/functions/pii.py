"""PII redaction and text normalization — vectorized RE2 kernels.

Webtext curation redacts personal identifiers (emails, phone numbers,
IP addresses) before training, and normalizes text (case/punct/space
folding) before fuzzy dedup. Both stages are pure per-batch string
kernels: `pyarrow.compute.replace_substring_regex` compiles the pattern
with RE2, and DuckDB's `regexp_replace` uses RE2 too, so the oracle
comparison is exact by construction — the pattern strings below are
defined ONCE and shared verbatim with the SQL side (no quotes or
backslash-escape divergence: DuckDB single-quoted literals keep
backslashes literal, like Python raw strings).

At 100 TB this is a map-only stage: no shuffle, no state, zero-copy
Arrow in/out; regexes are compiled once per pattern inside Arrow's
kernel cache, not per batch.

No reference counterpart (the reference scrapes public news bylines) —
engine addition per the task brief's text-analysis family.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Shared verbatim with oracle SQL (RE2 on both sides). Redaction order:
# email -> ipv4 -> phone. The replacement tokens contain no digits, so a
# later pattern never matches inside an earlier replacement.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d{1,3}[ .\-]?\(?\d{2,4}\)?[ .\-]?\d{3,4}[ .\-]?\d{3,4}\b"

REDACTIONS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact_pii(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Sequential RE2 replacement of email -> ip -> phone patterns."""
    out = col
    for _, pat, repl in REDACTIONS:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return out


def pii_counts(col: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Per-row match counts for each PII family, on the ORIGINAL text
    (independent counts, unlike the sequential redaction)."""
    return {
        f"n_{name}": pc.cast(
            pc.count_substring_regex(col, pattern=pat), pa.int64())
        for name, pat, _ in REDACTIONS
    }


def redact_batch(batch: pa.Table, text_col: str = "text",
                 out_col: str = "clean") -> pa.Table:
    """doc batch -> batch + redacted column + per-family counts."""
    cols = {name: batch[name] for name in batch.column_names}
    cols[out_col] = redact_pii(batch[text_col])
    cols.update(pii_counts(batch[text_col]))
    return pa.table(cols)


# --- normalization (pre-dedup canonical text form) -------------------------

# lowercase -> non-alnum runs to one space -> trim. Applied before exact
# or fuzzy dedup so case/punctuation/whitespace variants collapse.
NORM_STRIP_RE = r"[^a-z0-9]+"


def normalize_text(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    out = pc.utf8_lower(col)
    out = pc.replace_substring_regex(out, pattern=NORM_STRIP_RE,
                                     replacement=" ")
    return pc.utf8_trim_whitespace(out)
