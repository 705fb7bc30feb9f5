"""C4-style cleaning (functions/c4.py): per-rule goldens, DuckDB-RE2
parity on adversarial lines, and batch invariance."""

import duckdb
import pyarrow as pa

from siren_ray.functions.c4 import (C4_JS_SUBSTR, C4_LOREM_SUBSTR,
                                    C4_SENTENCE_RE, C4_TERMINAL_RE,
                                    C4_WORD_RE, c4_clean_batch)

GOOD = "This line has plenty of words and ends properly."


def _tbl(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _doc(*lines):
    return "\n".join(lines)


def test_line_rules():
    doc = _doc(
        GOOD,
        "no terminal punctuation here so dropped",
        "Too short.",
        "Please enable JavaScript to view the comments powered here.",
        'He said "stop right there and think again."',
        GOOD, GOOD,
    )
    out = c4_clean_batch(_tbl([doc])).to_pandas()
    assert len(out) == 1
    kept = out.text.iloc[0].split("\n")
    assert kept == [GOOD,
                    'He said "stop right there and think again."',
                    GOOD, GOOD]


def test_page_rules():
    lorem = _doc(GOOD, GOOD, GOOD, "We use Lorem Ipsum filler text here.")
    brace = _doc(GOOD, GOOD, GOOD, "if (x) { return; }")
    thin = _doc(GOOD)  # one sentence < min_sentences
    fine = _doc(GOOD, GOOD, GOOD)
    out = c4_clean_batch(_tbl([lorem, brace, thin, fine])).to_pandas()
    assert list(out.doc_id) == [3]
    assert out.text.iloc[0] == fine


def test_empty_and_null():
    out = c4_clean_batch(_tbl(["", None, _doc(GOOD, GOOD, GOOD)]))
    assert out["doc_id"].to_pylist() == [2]


def test_batch_invariance():
    docs = [_doc(GOOD, f"Filler number {i} words are counted here.", GOOD,
                 "tiny.")
            for i in range(8)]
    whole = c4_clean_batch(_tbl(docs)).to_pandas()
    parts = [c4_clean_batch(_tbl([d], ids=[i])).to_pandas()
             for i, d in enumerate(docs)]
    import pandas as pd

    split = pd.concat(parts, ignore_index=True)
    pd.testing.assert_frame_equal(whole, split)


def test_duckdb_re2_parity_adversarial():
    """The Arrow kernels and the oracle's DuckDB expressions share the
    pattern strings verbatim — verify they agree on edge-case lines."""
    lines = [
        "Ends with question mark?",
        "Ends with bang!",
        'Quoted ending."',
        "Trailing spaces after period.   ",
        "Tab\tseparated words count as words too.",
        "ALL CAPS JAVASCRIPT WARNING LINE HERE TODAY.",
        "unicode punctuation ends here…",
        "five words exactly right here.",
        "only four words here.",
        "",
    ]
    doc = "\n".join(lines)
    got = c4_clean_batch(_tbl([doc] * 3), min_sentences=0)
    kept_engine = got["text"].to_pylist()[0].split("\n")

    con = duckdb.connect()
    sql = f"""
    SELECT array_to_string(list_filter(string_split(?, chr(10)),
      l -> regexp_matches(l, '{C4_TERMINAL_RE}')
       AND length(regexp_extract_all(l, '{C4_WORD_RE}')) >= 5
       AND NOT contains(lower(l), '{C4_JS_SUBSTR}')), chr(10))
    """
    kept_duck = con.execute(sql, [doc]).fetchone()[0].split("\n")
    assert kept_engine == kept_duck
    # sentence counter parity too
    n_eng = len(__import__("re").findall(C4_SENTENCE_RE,
                                         "\n".join(kept_engine)))
    n_duck = con.execute(
        f"SELECT length(regexp_extract_all(?, '{C4_SENTENCE_RE}'))",
        ["\n".join(kept_duck)]).fetchone()[0]
    assert n_eng == n_duck
    assert C4_LOREM_SUBSTR == "lorem ipsum"  # page screens are substrings
