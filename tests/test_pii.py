"""PII redaction / normalization kernels (functions/pii.py): planted-PII
behavior, sequential-replace semantics, and RE2 parity with DuckDB (the
oracle's engine) on adversarial strings."""

import duckdb
import pyarrow as pa

from siren_ray.functions.pii import (EMAIL_RE, IPV4_RE, NORM_STRIP_RE,
                                     PHONE_RE, normalize_text, pii_counts,
                                     redact_batch, redact_pii)

PLANTED = [
    "reach me at john.doe+spam@example.co.uk or 10.42.0.255 now",
    "call +1 415-555-0123 or (022) 2345 6789",
    "No pii Here!  Multiple   spaces, Punct-uation; end.",
    "a@b.io x 1.2.3.4",
    "",
]


def test_redact_planted_pii():
    out = redact_pii(pa.array(PLANTED)).to_pylist()
    assert out[0] == "reach me at <EMAIL> or <IP> now"
    assert "<PHONE>" in out[1] and "415" not in out[1]
    assert out[2] == PLANTED[2]  # no PII -> unchanged
    assert out[3] == "<EMAIL> x <IP>"
    assert out[4] == ""


def test_counts_independent_of_sequence():
    cnt = {k: v.to_pylist() for k, v in pii_counts(pa.array(PLANTED)).items()}
    assert cnt["n_email"] == [1, 0, 0, 1, 0]
    assert cnt["n_ip"] == [1, 0, 0, 1, 0]
    assert cnt["n_phone"][1] >= 1
    for v in pii_counts(pa.array(PLANTED)).values():
        assert v.type == pa.int64()


def test_redact_batch_keeps_columns():
    t = pa.table({"doc_id": [1, 2], "text": PLANTED[:2]})
    out = redact_batch(t)
    assert out.column_names == ["doc_id", "text", "clean",
                                "n_email", "n_ip", "n_phone"]
    assert out["doc_id"].to_pylist() == [1, 2]


def test_normalize_text_folds_case_punct_space():
    out = normalize_text(pa.array(PLANTED)).to_pylist()
    assert out[2] == "no pii here multiple spaces punct uation end"
    assert out[4] == ""
    # idempotent
    again = normalize_text(pa.array(out)).to_pylist()
    assert again == out


def test_re2_parity_with_duckdb():
    """The oracle's exactness premise: identical pattern strings through
    Arrow RE2 and DuckDB RE2 produce identical results, including on
    boundary-heavy inputs."""
    rows = PLANTED + [
        "999.999.999.999 not-an-ip? still matches the shape",
        "v1.2.3.4suffix",  # \b prevents the ip match mid-token? digits end
        "x@y.z too-short-tld",
        "+123456789012345 overlong",
        "dots...everywhere 1.2.3.4.5.6",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE d(text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?)", [(r,) for r in rows])
    sql = (
        "SELECT regexp_replace(regexp_replace(regexp_replace(text, '"
        + EMAIL_RE + "', '<EMAIL>', 'g'), '" + IPV4_RE
        + "', '<IP>', 'g'), '" + PHONE_RE + "', '<PHONE>', 'g'), "
        "trim(regexp_replace(lower(text), '" + NORM_STRIP_RE
        + "', ' ', 'g')) FROM d"
    )
    expect = con.execute(sql).fetchall()
    got_clean = redact_pii(pa.array(rows)).to_pylist()
    got_norm = normalize_text(pa.array(rows)).to_pylist()
    for i, (e_clean, e_norm) in enumerate(expect):
        assert got_clean[i] == e_clean, rows[i]
        assert got_norm[i] == e_norm, rows[i]
