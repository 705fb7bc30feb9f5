"""C4-style page cleaning (Raffel et al. 2020, §2.2 of the T5 paper).

The recipe that produced C4 from Common Crawl — the line/page screens
every later corpus (MassiveText, RefinedWeb, Dolma) descends from:

- keep only lines ending in a terminal punctuation mark
- keep only lines with at least ``min_words_per_line`` words
- drop lines mentioning javascript (cookie/JS boilerplate)
- drop pages containing ``lorem ipsum`` or a curly brace ``{`` (code)
- drop pages left with fewer than ``min_sentences`` sentences

All predicates are RE2/substring kernels applied column-wise with
pyarrow.compute — the page's line structure is handled as ONE Arrow
list array (split → flat line-level predicate → offset rebuild →
``binary_join``), no per-row Python. The pattern strings below are
shared VERBATIM with the DuckDB oracle (both engines compile RE2), so
parity is by construction (CLAUDE.md measurement rules).

Scale shape: map-only — the operator never shuffles; composes with the
Gopher rule signals (`functions/textstats.py:gopher_rules_batch`) and
paragraph dedup (`stages/lines.py`) into the curation pipeline.

Reference anchor: the reference engine filters at page granularity only
(e.g. /root/reference/siren/core/scraper.py:131-139 keyword screens);
line-level cleaning is the corpus-scale extension SURVEY §2 calls for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["c4_clean_batch", "C4_TERMINAL_RE", "C4_WORD_RE",
           "C4_SENTENCE_RE", "C4_JS_SUBSTR", "C4_LOREM_SUBSTR",
           "C4_BRACE_SUBSTR"]

# shared VERBATIM with the DuckDB oracle (__ray_entry__.oracle_sql)
C4_TERMINAL_RE = '[.!?"]\\s*$'   # line ends in terminal punctuation
C4_WORD_RE = "\\S+"              # word = maximal non-space run
C4_SENTENCE_RE = "[.!?]"         # sentence counter on the cleaned page
C4_JS_SUBSTR = "javascript"      # on the lowercased line
C4_LOREM_SUBSTR = "lorem ipsum"  # on the lowercased page
C4_BRACE_SUBSTR = "{"            # on the raw page


def c4_clean_batch(t: pa.Table, *, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words_per_line: int = 5,
                   min_sentences: int = 3) -> pa.Table:
    """Clean a batch C4-style; returns (id_col, text) for surviving
    pages, ``text`` rebuilt from the kept lines joined by newlines."""
    txt = t[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.coalesce(txt, pa.scalar("", pa.string()))

    # page-level screens on the raw text
    low = pc.utf8_lower(txt)
    doc_ok = pc.and_(
        pc.invert(pc.match_substring(low, C4_LOREM_SUBSTR)),
        pc.invert(pc.match_substring(txt, C4_BRACE_SUBSTR)),
    )

    # line-level screens: one flat pass over every line in the batch
    lines = pc.split_pattern(txt, pattern="\n")
    flat = pc.list_flatten(lines)
    keep = pc.and_(
        pc.and_(
            pc.match_substring_regex(flat, C4_TERMINAL_RE),
            pc.greater_equal(
                pc.count_substring_regex(flat, C4_WORD_RE),
                min_words_per_line),
        ),
        pc.invert(pc.match_substring(pc.utf8_lower(flat), C4_JS_SUBSTR)),
    )

    # rebuild per-page lists from the kept-line mask, then join
    n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    mask = keep.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(n_lines):
        starts = np.concatenate(
            ([0], np.cumsum(n_lines)[:-1])).astype(np.int64)
        # split of a non-null string always yields >=1 line, so no
        # empty reduceat segments exist
        kept_per_doc = np.add.reduceat(mask, starts) if mask.size else \
            np.zeros(len(n_lines), dtype=np.int64)
        new_offsets = np.concatenate(([0], np.cumsum(kept_per_doc)))
    else:
        new_offsets = np.array([0], dtype=np.int64)
    kept_vals = flat.filter(keep)
    if isinstance(kept_vals, pa.ChunkedArray):
        kept_vals = kept_vals.combine_chunks()
    kept_lines = pa.LargeListArray.from_arrays(
        pa.array(new_offsets, pa.int64()),
        kept_vals.cast(pa.large_string()))
    clean = pc.binary_join(kept_lines, pa.scalar("\n", pa.large_string()))

    page_ok = pc.and_(
        doc_ok,
        pc.greater_equal(pc.count_substring_regex(clean, C4_SENTENCE_RE),
                         min_sentences),
    )
    out = pa.table({id_col: t[id_col], text_col: clean.cast(pa.string())})
    return out.filter(page_ok)
