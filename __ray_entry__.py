"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship crawl pipeline on the sf0.001 synthetic corpus.
``queries()`` — one entry per implemented operator/pipeline (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible subset.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init``/``ray.shutdown``.

Numeric-compare notes: float SUMs are cast to integer cents using
round-half-AWAY-FROM-ZERO on the engine side (``_cents``), matching
DuckDB's ``round()``, so accumulation order and rounding mode can't flip
the value hash; kNN results return (query_id, vec_id) pairs only (cosine
ranking verified in tests, not hashed).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from datetime import datetime
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

KEYWORDS = ["spark", "window"]          # present in testdata documents vocab
UNION_KEYWORD = "join"
EXCLUDE_KEYWORD = "merge"
WINDOW_START = datetime(2024, 1, 10)
WINDOW_END = datetime(2024, 1, 20)


def _cents(values) -> "Any":
    """value -> integer cents, round-half-away-from-zero (DuckDB round())."""
    import numpy as np

    v = np.asarray(values, dtype="float64") * 100.0
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype("int64")


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    return float(base.removeprefix("sf")) if base.startswith("sf") else 0.001


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _events(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                           columns=columns)


# --------------------------------------------------------------------------
# SQL-expressible operators (oracle-checked)
# --------------------------------------------------------------------------

def q_date_window(sf_dir: str):
    """Q1: strict exclusive date window (mirror.py:60-62)."""
    from siren_ray.pipelines.scrapers import date_window_filter

    ds = _events(sf_dir, columns=["event_id", "ts"])
    return date_window_filter(ds, "ts", WINDOW_START, WINDOW_END)


def q_keyword_or(sf_dir: str):
    """Q2: lowercase substring OR-containment (epaper/telegraph.py:80-88)."""
    from siren_ray.pipelines.scrapers import keyword_filter

    ds = _docs(sf_dir)
    return keyword_filter(ds, ["text"], KEYWORDS).select_columns(
        ["doc_id", "source"]
    )


def q_keyword_exclude(sf_dir: str):
    """Q3: include-any minus exclude (toi.py:211-220 exclude_all)."""
    from siren_ray.pipelines.scrapers import keyword_filter

    ds = _docs(sf_dir)
    return keyword_filter(
        ds, ["text"], KEYWORDS, exclude=[EXCLUDE_KEYWORD]
    ).select_columns(["doc_id", "source"])


def q_dedup_first_wins(sf_dir: str):
    """D1/D3: first-wins dedup by key, deterministic order (ht.py:261-268)."""
    from siren_ray.stages.dedup import dedup_exact

    ds = _docs(sf_dir).select_columns(["doc_id", "source"])
    return dedup_exact(ds, "source", "doc_id")


def q_dedup_exact_text(sf_dir: str):
    """Exact content dedup: one row per distinct text, min doc_id wins."""
    from siren_ray.stages.dedup import dedup_exact

    ds = _docs(sf_dir).select_columns(["doc_id", "text"])
    return dedup_exact(ds, "text", "doc_id")


def q_flatten_union(sf_dir: str):
    """D4: flatten-union of per-keyword result sets (mirror.py:101-108)."""
    from siren_ray.pipelines.scrapers import keyword_filter

    ds = _docs(sf_dir)
    a = keyword_filter(ds, ["text"], [KEYWORDS[0]]).select_columns(["doc_id"])
    b = keyword_filter(ds, ["text"], [UNION_KEYWORD]).select_columns(["doc_id"])
    return a.union(b)


def q_count_by_group(sf_dir: str):
    """D5-style count reconciliation: per-key counts with partial
    pre-aggregation inside map_batches before the small groupby."""
    import pyarrow as pa

    ds = _events(sf_dir, columns=["event_type"])

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(t["event_type"])
        return pa.table(
            {
                "event_type": vc.field("values"),
                "partial": vc.field("counts"),
            }
        )

    import pandas as pd

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n": [int(df["partial"].sum())],
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(_merge, batch_format="pandas")
    )


def q_hash_partition_counts(sf_dir: str):
    """Host-hash-partition analog: bucket = user_id % 16, counts per
    bucket (the politeness shuffle key discipline, SURVEY.md §7)."""
    import pandas as pd
    import pyarrow as pa

    ds = _events(sf_dir, columns=["user_id"])

    def _partial(t: pa.Table) -> pa.Table:
        import numpy as np

        b = (t["user_id"].to_numpy(zero_copy_only=False) % 16).astype("int64")
        vals, counts = np.unique(b, return_counts=True)
        return pa.table({"bucket": vals, "partial": counts.astype("int64")})

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"bucket": [int(df["bucket"].iloc[0])],
             "n": [int(df["partial"].sum())]}
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_merge, batch_format="pandas")
    )


def q_projection_serialize(sf_dir: str):
    """W1: FIELDS projection + X1 serialization + missing-attr constant
    (core/scraper.py:86-139,15-25,133)."""
    from siren_ray.functions.project import ProjectionSpec, project_batch

    spec = ProjectionSpec(fields=("doc_id", "lang", "source", "thumbnail"))
    return _docs(sf_dir).map_batches(
        project_batch, fn_kwargs={"spec": spec}, batch_format="pyarrow"
    )


def q_serialize_dates(sf_dir: str):
    """X1/X3: datetime -> %Y-%m-%d and epoch seconds (scraper.py:15-25,
    readwhere/core.py:169-172)."""
    import pyarrow as pa

    from siren_ray.functions.scalars import format_dates, to_epoch_seconds

    ds = _events(sf_dir, columns=["event_id", "ts"])

    def _f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts_day": format_dates(t["ts"]),
                "epoch_s": to_epoch_seconds(t["ts"]),
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def q_token_count(sf_dir: str):
    """Token counting (whitespace), vectorized."""
    import pyarrow as pa

    from siren_ray.functions.textstats import token_count_ws

    return _docs(sf_dir).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_tokens": token_count_ws(t["text"])}
        ),
        batch_format="pyarrow",
    )


def q_quality_filter(sf_dir: str):
    """Quality scoring filter: length / token / punctuation gates."""
    import pyarrow as pa

    from siren_ray.functions.textstats import quality_batch

    ds = _docs(sf_dir).select_columns(["doc_id", "text"])
    out = ds.map_batches(
        lambda t: quality_batch(t), batch_format="pyarrow"
    )
    return out.map_batches(
        lambda t: t.filter(t["quality_ok"]).select(["doc_id"]),
        batch_format="pyarrow",
    )


def q_fingerprint(sf_dir: str):
    """Document fingerprinting (SQL-checkable md5-of-normalized variant)."""
    import hashlib

    import pyarrow as pa

    def _f(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(" ".join((x or "").split()).encode()).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"],
                         "fp": pa.array(fps, pa.string())})

    return _docs(sf_dir).map_batches(_f, batch_format="pyarrow")


def q_normalize_text(sf_dir: str):
    """Unicode text normalization (`functions/textstats.py:
    normalize_text_batch` — NFC + control/zero-width strip + whitespace
    collapse + trim, fully vectorized Arrow kernels). ORACLE-checked
    hash-exact: each doc's text is decorated deterministically by
    doc_id%3 with a combining-accent sequence (NFC must compose),
    tabs/newlines (collapse must fold), and zero-width/control bytes
    (strip must remove); DuckDB replays the same decoration and
    normalizes with nfc_normalize + the same RE2 patterns — both NFC
    implementations are utf8proc, both regex engines RE2."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from siren_ray.functions.textstats import normalize_text_batch

    dirty = pa.array([" é\t\tq", "​ x\x01\n\ny ", ""],
                     pa.string())

    def _mk(t: pa.Table) -> pa.Table:
        case = np.asarray(t["doc_id"], dtype=np.int64) % 3
        suffix = pc.take(dirty, pa.array(case))
        decorated = pc.binary_join_element_wise(
            pc.fill_null(t["text"], ""), suffix, "")
        out = normalize_text_batch(
            pa.table({"doc_id": t["doc_id"], "text": decorated}))
        return out.select(["doc_id", "norm_text"])

    return _docs(sf_dir).select_columns(
        ["doc_id", "text"]).map_batches(_mk, batch_format="pyarrow")


def q_soft404(sf_dir: str):
    """Soft-404 screen (`stages/maincontent.py:soft404_batch` — pages
    that answered 200 but are error pages; RE2 phrase screen + thin-page
    floor, fully vectorized Arrow, map-only). ORACLE-checked hash-exact:
    text is decorated deterministically by doc_id%4 (phrase-bearing
    error body / thin stub / clean / clean-with-appended-phrase) and the
    DuckDB oracle replays the same decoration with the VERBATIM pattern
    and length rule."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.maincontent import soft404_batch

    ERR = "Sorry, error 404 - the page could not be found."
    GONE = " This article is no longer available."

    def _mk(t: pa.Table) -> pa.Table:
        case = np.asarray(t["doc_id"], dtype=np.int64) % 4
        base = np.array(
            [x if x is not None else "" for x in t["text"].to_pylist()],
            dtype=object)
        txt = base.copy()
        txt[case == 0] = ERR
        txt[case == 1] = "ok"
        txt[case == 3] = np.char.add(base[case == 3].astype(str), GONE)
        out = soft404_batch(pa.table({
            "doc_id": t["doc_id"], "text": pa.array(txt, pa.string())}))
        return out.select(
            ["doc_id", "n_chars", "has_404_phrase", "is_soft404"])

    return _docs(sf_dir).select_columns(
        ["doc_id", "text"]).map_batches(_mk, batch_format="pyarrow")


def q_registrable_domain(sf_dir: str):
    """Registrable-domain extraction (`functions/urlnorm.py:
    registrable_domain_batch` — public-suffix LONGEST-match, eTLD+1;
    groups sibling subdomains into one politeness/budget unit).
    ORACLE-checked hash-exact: hosts are synthesized deterministically
    by doc_id%8 covering 2-level suffix, deep subdomain, bare suffix
    (no registrable), unlisted TLD (no suffix), and 1-level cases; the
    DuckDB oracle replays the longest-match rule with the VERBATIM
    PSL IN-lists."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.functions.urlnorm import registrable_domain_batch

    def _mk(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"], dtype=np.int64)
        ids = d.astype(str)
        case = d % 8
        host = np.empty(len(d), dtype=object)
        host[case == 0] = np.char.add(
            np.char.add("news.h", ids[case == 0]), ".co.uk")
        host[case == 1] = np.char.add(
            np.char.add("a.b.h", ids[case == 1]), ".com")
        host[case == 2] = "example.org"
        host[case == 3] = "co.uk"
        host[case == 4] = np.char.add(
            np.char.add("h", ids[case == 4]), ".unknowntld")
        host[case == 5] = np.char.add(
            np.char.add("h", ids[case == 5]), ".gov.in")
        host[case == 6] = "uk"
        host[case == 7] = np.char.add(
            np.char.add("x.h", ids[case == 7]), ".io")
        out = registrable_domain_batch(pa.table({
            "doc_id": t["doc_id"], "host": pa.array(host, pa.string())}))
        return out

    return _docs(sf_dir).select_columns(
        ["doc_id"]).map_batches(_mk, batch_format="pyarrow")


def q_robots_rules(sf_dir: str):
    """RFC 9309 robots matcher (`stages/robotstxt.py:
    parse_robots_rules/RobotsMatcher` — full Allow/Disallow
    longest-match with * and $ wildcards, allow-wins tiebreak; the
    live-deployment upgrade over the engine's conservative
    prefix-disallow corpus model). ORACLE-checked hash-exact: paths
    are synthesized by doc_id%5 to hit prefix-disallow, longer-Allow
    override, $-anchored wildcard, and anchor-miss cases; the DuckDB
    oracle states each case's decision directly."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.robotstxt import RobotsMatcher, parse_robots_rules

    txt = ("User-agent: *\n"
           "Disallow: /private/\n"
           "Allow: /private/public/\n"
           "Disallow: /files/*.pdf$\n")
    rules, _delay = parse_robots_rules(txt)

    def _mk(t: pa.Table) -> pa.Table:
        m = RobotsMatcher(rules)
        d = np.asarray(t["doc_id"], dtype=np.int64)
        ids = d.astype(str)
        case = d % 5
        path = np.empty(len(d), dtype=object)
        path[case == 0] = np.char.add(
            np.char.add("/p/", ids[case == 0]), ".html")
        path[case == 1] = np.char.add("/private/", ids[case == 1])
        path[case == 2] = np.char.add("/private/public/", ids[case == 2])
        path[case == 3] = np.char.add(
            np.char.add("/files/", ids[case == 3]), ".pdf")
        path[case == 4] = np.char.add(
            np.char.add("/files/", ids[case == 4]), ".pdf.html")
        parr = pa.array(path, pa.string())
        return pa.table({"doc_id": t["doc_id"], "path": parr,
                         "allowed": pa.array(m.allowed(parr))})

    return _docs(sf_dir).select_columns(
        ["doc_id"]).map_batches(_mk, batch_format="pyarrow")


def q_pagination_expand(sf_dir: str):
    """X10 (NewsMinute convention, newsminute.py:84-90): per-key totals ->
    offset fan-out with the exact (total//100)-1 / range(1, pages-1)
    arithmetic. The distributed part computes the per-key totals
    (discovery phase); the fan-out itself is tiny driver-side metadata —
    exactly the reference's two-phase discover->expand shape (S3)."""
    import pandas as pd
    import pyarrow as pa

    from siren_ray.functions.scalars import expand_offsets_newsminute

    ds = _events(sf_dir, columns=["event_type"])

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(t["event_type"])
        return pa.table({"event_type": vc.field("values"),
                         "partial": vc.field("counts")})

    totals = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum("partial")
        .to_pandas()
    )
    sum_col = [c for c in totals.columns if c != "event_type"][0]
    types, offsets = [], []
    for _, row in totals.iterrows():
        for off in expand_offsets_newsminute(int(row[sum_col])):
            types.append(row["event_type"])
            offsets.append(off)
    return pd.DataFrame(
        {"event_type": pd.Series(types, dtype="object"),
         "offset": pd.Series(offsets, dtype="int64")}
    )


def q_range_join(sf_dir: str):
    """Banded non-equi range join: per event, count orders dated within
    the trailing 7 days (no key equality). Right rows replicate into the
    constant number of time bands their window overlaps; each partition
    resolves the interval with two vectorized searchsorted calls."""
    import os

    import ray.data as rd

    from siren_ray.stages.relational import range_join_count

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderdate"])
    return range_join_count(
        ev, orders, left_ts="ts", right_ts="o_orderdate",
        width_s=7 * 86400.0,
    ).select_columns(["event_id", "n_matches"])


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: exactly 50 events per
    event_type, chosen by md5(event_id) order — an engine-independent
    pseudo-random order both DuckDB and hashlib compute identically, so
    the sample is exact-oracle-checkable (unlike rand()). Reuses
    grouped_topk (per-batch prune -> partition finish)."""
    import hashlib as _hl
    import os

    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.relational import grouped_topk

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "event_type"])

    def _md5(t: pa.Table) -> pa.Table:
        hs = [_hl.md5(str(x).encode()).hexdigest()
              for x in t["event_id"].to_pylist()]
        return t.append_column("h", pa.array(hs, pa.string()))

    out = grouped_topk(
        ev.map_batches(_md5, batch_format="pyarrow"),
        "event_type", "h", 50, ascending=True, tie_col="event_id",
    )
    return out.select_columns(["event_id", "event_type"])


def q_asof_join(sf_dir: str):
    """As-of join: each event picks the latest order of the same
    customer at-or-before the event time (backward, tie-inclusive).
    Engine = one tagged-union shuffle + per-partition merge_asof;
    oracle = DuckDB ASOF LEFT JOIN. The joined value is the matched
    ORDER DATE (tie-deterministic), not an arbitrary tied row id."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.relational import asof_join

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "user_id"])
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    ).map_batches(
        lambda t: pa.table({"user_id": t["o_custkey"],
                            "ts": t["o_orderdate"],
                            "o_date": t["o_orderdate"]}),
        batch_format="pyarrow",
    )
    return asof_join(ev, orders, on="ts", by="user_id",
                     right_cols=("o_date",)).select_columns(
        ["event_id", "user_id", "ts", "o_date"]
    )


def q_token_quantiles(sf_dir: str):
    """Doc token-count distribution via the mergeable KLL sketch (the
    standard first report over a fresh 100 TB crawl): per-block
    vectorized sketch update, tiny sketch tables merge on the driver.
    Rows-only — approximate by design; rank error is accuracy-bound
    unit-tested (t:test_kll_quantile_sketch_accuracy_and_merge) and the
    values land within DuckDB approx_quantile's own tolerance."""
    import pyarrow as pa

    from siren_ray.functions.textstats import token_count_ws
    from siren_ray.stages.relational import quantile_sketch

    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    counts = _docs(sf_dir).map_batches(
        lambda t: pa.table({"n_tokens": token_count_ws(t["text"])}),
        batch_format="pyarrow",
    )
    import numpy as np

    est = quantile_sketch(counts, "n_tokens", qs, k=200)
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "n_tokens": pa.array(np.asarray(est, dtype=np.float64),
                             pa.float64()),
    })


def q_heavy_hitters(sf_dir: str):
    """Misra-Gries top-20 users over the event stream: per-block exact
    counts compressed to k counters, driver merge. Rows-only —
    (count_lo, max_undercount) brackets are the MG guarantee,
    accuracy-bound unit-tested (t:test_misra_gries_heavy_hitters_bounds)."""
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.relational import heavy_hitters

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])
    return pa.Table.from_pandas(heavy_hitters(ev, "user_id", k=20),
                                preserve_index=False)


def q_approx_distinct(sf_dir: str):
    """HLL count-distinct over events.user_id (mergeable sketch;
    rows-only — approximate by design, accuracy bound unit-tested)."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.relational import approx_distinct

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])
    r = approx_distinct(ev, "user_id")
    return pa.table({"estimate": pa.array([round(r["estimate"])],
                                          pa.int64())})


def q_grouped_topk(sf_dir: str):
    """Top-3 orders per customer by (o_totalprice DESC, o_orderkey ASC):
    per-batch prune -> hash-partitioned vectorized finish. Oracle =
    row_number() window."""
    import os

    import ray.data as rd

    from siren_ray.stages.relational import grouped_topk

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )
    return grouped_topk(orders, "o_custkey", "o_totalprice", 3,
                        tie_col="o_orderkey")


def q_window_agg(sf_dir: str):
    """Tumbling-window aggregate (day windows over the events stream):
    partial per-batch aggregation, then a small merge groupby. (The
    reference is batch-only, SURVEY.md §2.10 — this is the engine's
    windowed-aggregate addition.)"""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    ds = _events(sf_dir, columns=["ts", "event_type", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["day"] = df["ts"].dt.floor("D")
        df["value_c"] = _cents(df["value"])
        g = (
            df.groupby(["day", "event_type"], sort=False)
            .agg(n=("value_c", "size"), sum_value_c=("value_c", "sum"))
            .reset_index()
        )
        g["key"] = g["day"].astype(str) + "|" + g["event_type"]
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": [df["day"].iloc[0]],
                "event_type": [df["event_type"].iloc[0]],
                "n": [int(df["n"].sum())],
                "sum_value_c": [int(df["sum_value_c"].sum())],
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("key")
        .map_groups(_merge, batch_format="pandas")
    )


def q_lineitem_pricing(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate with partial combiners; float sums
    carried as integer cents for exact cross-engine equality."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["qty_c"] = _cents(df["l_quantity"])
        df["price_c"] = _cents(df["l_extendedprice"])
        df["disc_c"] = _cents(df["l_discount"])
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty_c=("qty_c", "sum"),
                sum_price_c=("price_c", "sum"),
                sum_disc_c=("disc_c", "sum"),
                n_rows=("qty_c", "size"),
            )
            .reset_index()
        )
        g["key"] = g["l_returnflag"] + "|" + g["l_linestatus"]
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [df["l_returnflag"].iloc[0]],
                "l_linestatus": [df["l_linestatus"].iloc[0]],
                "sum_qty_c": [int(df["sum_qty_c"].sum())],
                "sum_price_c": [int(df["sum_price_c"].sum())],
                "sum_disc_c": [int(df["sum_disc_c"].sum())],
                "n_rows": [int(df["n_rows"].sum())],
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("key")
        .map_groups(_merge, batch_format="pandas")
    )


def q_broadcast_join(sf_dir: str):
    """Broadcast hash join: small side (customer) shipped once via
    ray.put, looked up inside map_batches (SURVEY.md 'broadcast small
    sides'), then grouped counts."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    seg_ref = ray.put(
        dict(zip(cust["c_custkey"].to_pylist(),
                 cust["c_mktsegment"].to_pylist()))
    )
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey"])

    class _Join:
        def __init__(self):
            self.seg = ray.get(seg_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            segs = [self.seg.get(k) for k in t["o_custkey"].to_pylist()]
            import collections

            c = collections.Counter(s for s in segs if s is not None)
            return pa.table(
                {"c_mktsegment": list(c.keys()),
                 "partial": pa.array(list(c.values()), pa.int64())}
            )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"c_mktsegment": [df["c_mktsegment"].iloc[0]],
             "n_orders": [int(df["partial"].sum())]}
        )

    return (
        orders.map_batches(_Join, batch_format="pyarrow", concurrency=(1, 2))
        .groupby("c_mktsegment")
        .map_groups(_merge, batch_format="pandas")
    )


def q_hash_join(sf_dir: str):
    """General distributed equi-join where BOTH sides shuffle (no
    broadcast: lineitem ⋈ orders on orderkey via raw-task hash
    co-partitioning, one all-to-all exchange, one vectorized pandas
    merge per partition — siren_ray.stages.relational.hash_join), then
    a partial-combined group count per order priority. Integer cents
    keep the float sum order-independent."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.relational import hash_join

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_quantity"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderpriority"])
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                       how="inner", broadcast=False)

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["qty_c"] = _cents(df["l_quantity"])
        g = (
            df.groupby("o_orderpriority", sort=False)
            .agg(sum_qty_c=("qty_c", "sum"), n_rows=("qty_c", "size"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": [df["o_orderpriority"].iloc[0]],
                "sum_qty_c": [int(df["sum_qty_c"].sum())],
                "n_rows": [int(df["n_rows"].sum())],
            }
        )

    return (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(_merge, batch_format="pandas")
    )


def q_sessionize(sf_dir: str):
    """Per-user sessionization of the event stream (30-min inactivity
    gap): one hash shuffle on user bucket, vectorized diff+cumsum per
    partition. Oracle = lag/sum window functions."""
    import os

    import ray.data as rd

    from siren_ray.stages.events import sessionize

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "user_id"])
    return sessionize(ev, gap_s=1800).select_columns(
        ["event_id", "user_id", "session_seq"]
    )


def q_connected_components(sf_dir: str):
    """Distributed connected components (min-label propagation, no
    driver-side graph state) over the exact-duplicate-text chain graph:
    docs sharing a text form a path; cluster = min doc_id. The SQL oracle
    is the window-min per text partition."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from siren_ray.stages.dedup import connected_components
    from siren_ray.util import hash_strings

    # one read serves both the edge build and the node list
    docs = _docs(sf_dir).select_columns(["doc_id", "text"]).materialize()

    def _bucket(t: pa.Table) -> pa.Table:
        pk = (hash_strings([str(x) for x in t["text"].to_pylist()]) % 64)
        return t.append_column("_pk", pa.array(pk.astype("int64")))

    def _chain_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text", "doc_id"], kind="mergesort")
        ids = df["doc_id"].to_numpy()
        same = df["text"].to_numpy()[:-1] == df["text"].to_numpy()[1:]
        return pd.DataFrame(
            {"id_a": ids[:-1][same].astype("int64"),
             "id_b": ids[1:][same].astype("int64")}
        )

    edges = (
        docs.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_chain_edges, batch_format="pandas")
    )
    nodes = docs.map_batches(
        lambda t: pa.table({"id": t["doc_id"]}), batch_format="pyarrow"
    )
    # 16 partitions ~ sqrt of the sf0.1 doc count: P^2 shard objects per
    # iteration is the fixed cost, so P tracks data size, not cluster size
    out = connected_components(edges, nodes, num_partitions=16)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["id"], "cluster": t["cluster"]}),
        batch_format="pyarrow",
    )


def q_cosine_pairs(sf_dir: str):
    """Exact all-pairs cosine similarity join (block-pair matmul tasks):
    every unordered (id_a < id_b) pair with cosine >= 0.3. Ground truth
    for the LSH near-dup paths; float64 on both sides (the oracle casts
    the float32 lists to DOUBLE[]) so the threshold decision agrees."""
    import os

    import ray.data as rd

    from siren_ray.stages.ann import cosine_pairs_exact

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return cosine_pairs_exact(ds, threshold=0.3, num_blocks=8)


def q_knn_brute(sf_dir: str):
    """ANN baseline: exact cosine top-10 for 5 query vectors (pairs only;
    ranking tie-break (cosine DESC, vec_id ASC))."""
    import pyarrow.parquet as pq
    import ray.data as rd
    import numpy as np

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    order = np.argsort(qt["vec_id"].to_numpy(zero_copy_only=False))[:5]
    queries = np.array(
        [qt["embedding"][int(i)].as_py() for i in order], dtype=np.float32
    )
    from siren_ray.stages.ann import brute_force_topk

    ds = rd.read_parquet(emb_path)
    out = brute_force_topk(ds, queries, k=10)
    return out.select_columns(["query_id", "vec_id"])


# --------------------------------------------------------------------------
# non-SQL-expressible (rows-only checks)
# --------------------------------------------------------------------------

def q_main_content(sf_dir: str):
    """Generic trafilatura-style main-content extraction over the
    synthetic pages corpus (`stages/maincontent.py` — readability
    text-density vote over the stdlib mini-DOM; the generic fallback
    for hosts no registry parser covers). Rows-only: HTML heuristics
    are not SQL-expressible; fixture-golden tests in t:test_extract
    pin the boilerplate-drop semantics."""
    import ray.data as rd

    from siren_ray.corpus import ensure_corpus
    from siren_ray.stages.maincontent import main_content_batch

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    pages = rd.read_parquet(os.path.join(corpus, "pages"),
                            columns=["url", "html"])
    import pyarrow.compute as pc

    out = pages.map_batches(main_content_batch, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.filter(pc.greater(t["n_paragraphs"], 0)),
        batch_format="pyarrow")


def q_html_markdown(sf_dir: str):
    """HTML -> Markdown corpus serialization (`stages/markdown.py`):
    deterministic CommonMark-flavoured structure preservation (headings,
    lists, links, tables, code) — the markdownified-text shape public
    LLM corpora distribute. Map-only per-doc tree serialization over the
    synthetic pages corpus; returns (url, markdown, n_chars) for pages
    that produce non-empty markdown. Rows-only (tree serialization is
    not SQL-expressible; structural goldens in t:test_markdown)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from siren_ray.corpus import ensure_corpus
    from siren_ray.stages.markdown import markdown_batch

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    pages = rd.read_parquet(os.path.join(corpus, "pages"),
                            columns=["url", "html"])
    out = pages.map_batches(markdown_batch, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.filter(pc.greater(t["n_chars"], 0)),
        batch_format="pyarrow")


def q_anchor_golden(sf_dir: str):
    """Byte-exact anchor-extraction oracle: each synthesized page
    carries one absolute link, one relative path (RFC 3986-resolved
    against a subdirectory base), one ../ hop, and one skipped
    javascript: href; DuckDB states the expected (src, dst, anchor)
    edges directly. Complements the rows-only corpus run
    (q:anchor_text) with exact resolution parity."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.maincontent import anchor_links_batch

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls, htmls = [], []
        for d in ids:
            urls.append(f"https://h{d % 3}.ex.org/sec/{d}/page.html")
            htmls.append(
                f'<html><body>'
                f'<a href="https://abs.ex.org/x/{d}">Abs {d}</a>'
                f'<a href="rel{d}.html">Rel</a>'
                f'<a href="../up/{d}#frag">Up {d}</a>'
                f'<a href="javascript:void(0)">JS</a>'
                f"</body></html>".encode())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    pages = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    return pages.map_batches(
        lambda t: anchor_links_batch(t, drop_noise=False),
        batch_format="pyarrow")


def q_mimetype_golden(sf_dir: str):
    """Byte-exact mimetype-inference oracle (W7): bodies synthesized
    with known magic bytes (pdf/png/jpeg/gzip), tag-soup html, an
    extension-fallback case (.css, no magic) and a default case, keyed
    by doc_id%6; DuckDB states the expected mimetype per row directly.
    Complements the rows-only corpus counts (q:mimetype_counts)."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.functions.urlnorm import infer_mimetypes

    BODIES = [b"%PDF-1.7 x", b"\x89PNG\r\n\x1a\n body",
              b"\xff\xd8\xff\xe0jfif", b"\x1f\x8b\x08 gz",
              b"<html><body>x</body></html>", None]

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls = [(f"https://ex.org/f/{d}.css" if d % 6 == 5
                 else f"https://ex.org/f/{d}.bin") for d in ids]
        bodies = [BODIES[d % 6] for d in ids]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "html": pa.array(bodies, pa.binary())})

    pages = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    return pages.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "mimetype": infer_mimetypes(t["url"], t["html"])}),
        batch_format="pyarrow")


def q_langid_golden(sf_dir: str):
    """Language-ID oracle on canonical per-language texts: four
    signature-trigram-rich sentences (en/es/fr/de) assigned by doc_id%4
    run through the real n-gram classifier; DuckDB states the expected
    label. Proves the kernel classifies canonically (the corpus run
    q:lang_id stays rows-only — real text has no ground truth)."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.functions.textstats import lang_id_batch

    TEXTS = [
        "the company and the union said that the decision of the "
        "board " * 5,
        "la empresa de la ciudad que el gobierno de la region dijo "
        "que " * 5,
        "le gouvernement de la ville et le ministre de la region ont "
        "dit que " * 5,
        "die regierung und der minister der stadt haben gesagt dass "
        "ein ich " * 5,
    ]

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([TEXTS[d % 4] for d in ids], pa.string()),
        })

    docs = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    return docs.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "lang_pred": lang_id_batch(t)["lang_pred"]}),
        batch_format="pyarrow")


def q_canonical_golden(sf_dir: str):
    """Byte-exact URL-canonicalization oracle: messy variants
    (uppercase scheme+host, default :443 port + fragment, non-default
    port kept, utm/tracking param drop + query-key sort) keyed by
    doc_id%4; DuckDB states the expected canonical string directly.
    Complements the rows-only collapse-count run (q:url_canonicalize)."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.functions.urlnorm import canonicalize_urls

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls = []
        for d in ids:
            f = d % 4
            if f == 0:
                urls.append(f"HTTPS://WWW.Ex.ORG/a/{d}")
            elif f == 1:
                urls.append(f"https://ex.org:443/b/{d}#frag")
            elif f == 2:
                urls.append(f"https://ex.org:8080/c/{d}")
            else:
                urls.append(
                    f"https://ex.org/d/{d}?z=2&utm_source=x&a=1&gclid=g")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string())})

    pages = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    return pages.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "canonical": canonicalize_urls(t["url"])}),
        batch_format="pyarrow")


def q_markdown_golden(sf_dir: str):
    """Byte-exact markdown serialization oracle: pages synthesized from
    doc_id (heading with an entity, emphasis paragraph, link, 2-item
    list — doc_id%2 flips ul/ol) run through the real serializer
    (stages/markdown.py); DuckDB states the expected markdown string
    directly. Complements the rows-only corpus run (q:html_markdown)
    with exact value parity."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.markdown import markdown_batch

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls, htmls = [], []
        for d in ids:
            tag = "ol" if d % 2 else "ul"
            htmls.append(
                f"<html><head><title>skip</title></head><body>"
                f"<h1>Doc &amp; {d}</h1>"
                f"<p>Para <b>bold{d}</b> and <i>it</i>.</p>"
                f'<p>See <a href="https://ex.org/{d}">link {d}</a>.</p>'
                f"<{tag}><li>first {d}</li><li>second</li></{tag}>"
                f"</body></html>".encode())
            urls.append(f"https://ex.org/p/{d}")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    pages = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    out = pages.map_batches(
        lambda t: markdown_batch(t).append_column("doc_id", t["doc_id"]),
        batch_format="pyarrow")
    return out.select_columns(["doc_id", "url", "markdown", "n_chars"])


def q_anchor_text(sf_dir: str):
    """Anchor-text link index: extract (src, dst, anchor) edges from the
    corpus HTML (`stages/maincontent.py:anchor_links_batch`, map-only),
    then one dst-grouped vectorized aggregation -> per-target in-link
    count and deterministic min anchor string (the off-page relevance
    signal search pipelines consume). Rows-only (HTML parse not
    SQL-expressible; fixture-golden tests in t:test_extract)."""
    import ray.data as rd

    from siren_ray.corpus import ensure_corpus
    from siren_ray.stages.maincontent import anchor_links_batch
    from siren_ray.stages.relational import grouped_agg

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    pages = rd.read_parquet(os.path.join(corpus, "pages"),
                            columns=["url", "html"])
    edges = pages.map_batches(anchor_links_batch, batch_format="pyarrow")
    return grouped_agg(edges, ["dst"],
                       {"n_inlinks": ("anchor", "count"),
                        "min_anchor": ("anchor", "min")})


def q_charset_decode(sf_dir: str):
    """Charset-sniffing HTML decode (`stages/maincontent.py:
    decode_html_batch` — WHATWG-style BOM / meta-charset / fallback
    chain, the WARC-ingest decode step). ORACLE-checked hash-exact via
    a deterministic round-trip: each documents row is ENCODED by
    doc_id%3 (plain UTF-8 / BOM utf-16 / meta-tagged latin-1), decoded
    back through the operator, and the DuckDB oracle states the
    expected text and detected encoding directly."""
    import pyarrow as pa

    from siren_ray.stages.maincontent import decode_html_batch

    def _encode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        payloads = []
        for i, x in zip(ids, texts):
            x = x or ""
            m = i % 3
            if m == 0:
                payloads.append(x.encode("utf-8"))
            elif m == 1:
                payloads.append(x.encode("utf-16"))
            else:
                payloads.append(
                    ("<meta charset='latin-1'>" + x).encode("latin-1"))
        return pa.table({"doc_id": t["doc_id"],
                         "html": pa.array(payloads, pa.binary())})

    enc = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _encode, batch_format="pyarrow")
    out = enc.map_batches(decode_html_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "html_text", "encoding"])


def q_sitemap(sf_dir: str):
    """Sitemap discovery source (`sources/sitemap.py` — sitemaps.org
    urlset/sitemapindex/gzip parsing, map-only flat-map). ORACLE-checked
    hash-exact: the query builds one REAL multi-entry urlset XML per
    `documents` source (deterministic doc_id arithmetic), parses it
    back through the operator, and the DuckDB oracle states the
    expected (loc, lastmod) rows directly — the parser must recover
    exactly the embedded entries. The per-source XML build is fixture
    scaffolding over ~5 groups, not an engine hot path."""
    import numpy as np
    import pandas as pd

    from siren_ray.sources.sitemap import sitemap_batch

    def _build(df: pd.DataFrame) -> pd.DataFrame:
        src = df["source"].iloc[0]
        ids = np.sort(df["doc_id"].to_numpy())
        entries = "".join(
            f"<url><loc>https://{src}.example.org/p/{i}</loc>"
            f"<lastmod>2024-01-{i % 28 + 1:02d}</lastmod></url>"
            for i in ids)
        return pd.DataFrame({
            "url": [f"https://{src}.example.org/sitemap.xml"],
            "html": [f"<urlset>{entries}</urlset>".encode()],
        })

    docs = _docs(sf_dir).select_columns(["doc_id", "source"])
    sitemaps = docs.groupby("source").map_groups(
        _build, batch_format="pandas")
    entries = sitemaps.map_batches(sitemap_batch, batch_format="pyarrow")
    return entries.select_columns(["loc", "lastmod"])


def q_feed(sf_dir: str):
    """RSS/Atom feed discovery source (`sources/feeds.py` — the other
    universal seed-expansion protocol next to sitemaps; map-only
    flat-map, RFC 822 / ISO 8601 timestamp normalization to epoch
    seconds). ORACLE-checked hash-exact: the query builds one REAL RSS
    feed (even doc_ids) and one REAL Atom feed (odd doc_ids) per
    `documents` source with deterministic doc_id arithmetic, parses
    them back through the operator, and the DuckDB oracle states the
    expected (link, title, published_ts, kind) rows directly — the
    parser and both timestamp grammars must recover exactly the
    embedded entries. Per-source XML build is fixture scaffolding over
    ~5 groups, not an engine hot path."""
    import numpy as np
    import pandas as pd

    from siren_ray.sources.feeds import feed_batch

    def _build(df: pd.DataFrame) -> pd.DataFrame:
        src = df["source"].iloc[0]
        ids = np.sort(df["doc_id"].to_numpy())
        rss = "".join(
            f"<item><title>doc {i}</title>"
            f"<link>https://{src}.example.org/a/{i}</link>"
            f"<pubDate>{i % 28 + 1:02d} Jan 2024 "
            f"{i % 24:02d}:00:00 +0000</pubDate></item>"
            for i in ids if i % 2 == 0)
        atom = "".join(
            f"<entry><title>doc {i}</title>"
            f"<link rel='alternate' "
            f"href='https://{src}.example.org/a/{i}'/>"
            f"<updated>2024-01-{i % 28 + 1:02d}T"
            f"{i % 24:02d}:00:00Z</updated></entry>"
            for i in ids if i % 2 == 1)
        return pd.DataFrame({
            "url": [f"https://{src}.example.org/feed.rss",
                    f"https://{src}.example.org/feed.atom"],
            "html": [f"<rss><channel>{rss}</channel></rss>".encode(),
                     f"<feed>{atom}</feed>".encode()],
        })

    docs = _docs(sf_dir).select_columns(["doc_id", "source"])
    feeds = docs.groupby("source").map_groups(
        _build, batch_format="pandas")
    entries = feeds.map_batches(feed_batch, batch_format="pyarrow")
    return entries.select_columns(
        ["link", "title", "published_ts", "kind"])


def q_url_traps(sf_dir: str):
    """Crawler-trap URL detection (`functions/urlnorm.py:
    url_trap_signals` — calendar-loop / parameter-explosion / over-deep
    path screens for frontier hygiene). URLs are synthesized
    deterministically from `documents` with arithmetic shared VERBATIM
    with the oracle SQL (repeat('/d', doc_id%12) path runs, full doc_id
    for uniqueness, 3-way query-string cases), so the signal kernel is
    DuckDB-oracle-checked end to end: url_len / path_depth / n_params /
    max_seg_repeat / is_trap all hash-exact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from siren_ray.functions.urlnorm import url_trap_signals

    rep_lut = np.array(["/d" * k for k in range(12)], dtype=object)
    fat_q = "?a=1&b=2&c=3&d=4&e=5&f=6&g=7"

    def _mk(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"], dtype=np.int64)
        idstr = d.astype(str)
        suffix = np.where(
            d % 5 == 0, fat_q,
            np.where(d % 3 == 0, np.char.add("?q=", idstr), ""))
        urls = pc.binary_join_element_wise(
            pa.scalar("https://"), t["source"],
            pa.scalar(".example.org"),
            pa.array(rep_lut[d % 12], pa.string()),
            pa.scalar("/p/"), pa.array(idstr, pa.string()),
            pa.array(suffix, pa.string()), pa.scalar(""))
        return url_trap_signals(urls)

    return _docs(sf_dir).select_columns(
        ["doc_id", "source"]).map_batches(_mk, batch_format="pyarrow")


def q_crawl(sf_dir: str):
    """Full frontier crawl on the deterministic synthetic corpus mapped
    from sf (north-rule pipeline; conformance vs simulator in tests)."""
    from siren_ray.corpus import ensure_corpus
    from siren_ray.pipelines.frontier import CrawlConfig, run_crawl
    import pyarrow.dataset as pads

    sf = min(_sf_of(sf_dir), 0.01)
    corpus = ensure_corpus(sf)
    out = f"/tmp/siren_ray_runs/entry_crawl_sf{sf:g}"
    res = run_crawl(
        CrawlConfig(
            corpus_dir=corpus,
            out_dir=out,
            budget_per_round=5000,
            round_ms=100_000,
            max_rounds=12,
            max_depth=6,
            fetch_concurrency=4,
        )
    )
    t = pads.dataset(res.extracted_path).to_table(
        columns=["url", "kind", "found", "parse_ok", "text", "round"]
    )
    return t


def q_revalidate(sf_dir: str):
    """Conditional-GET revalidation recrawl (`stages/revalidate.py` —
    stored ETags replayed as If-None-Match over REAL sockets against
    the corpus HTTP front-end; 304 rows carry prior text forward
    byte-identically with zero body bytes on the wire). Two cycles over
    the article pages: cycle 1 unconditional (all fresh), cycle 2 with
    cycle-1 validators (all not_modified). Rows-only (live-socket
    operator, not SQL); the three-cycle change-detection test is
    t:test_http::test_conditional_get_revalidation."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from siren_ray.corpus import ensure_corpus
    from siren_ray.sources.localhttp import CorpusHttpServer, load_pages_map
    from siren_ray.stages.extract import classify_url
    from siren_ray.stages.revalidate import revalidate_dataset

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    pages = load_pages_map(os.path.join(corpus, "pages"))
    urls = [u for u in sorted(pages) if classify_url(u) == "ld"][:200]
    with CorpusHttpServer({u: pages[u] for u in urls}, etags=True) as srv:
        c1 = revalidate_dataset(
            rd.from_items([{"url": u} for u in urls]),
            http_base=srv.base_url, concurrency=2).to_pandas()
        snap = rd.from_items([
            {"url": r.url, "etag": r.etag, "prior_text": r.text}
            for r in c1.itertuples()])
        c2 = revalidate_dataset(
            snap, http_base=srv.base_url,
            concurrency=2).to_pandas()
    c2["cycle1_status"] = c1.set_index("url").status.reindex(
        c2.url).to_numpy()
    return pa.Table.from_pandas(
        c2[["url", "cycle1_status", "status", "text"]],
        preserve_index=False)


def q_minhash_pairs(sf_dir: str):
    from siren_ray.stages.dedup import minhash_duplicate_pairs

    ds = _docs(sf_dir).select_columns(["doc_id", "text"])
    return minhash_duplicate_pairs(ds, "doc_id")


def q_neardup_removed(sf_dir: str):
    """End-to-end near-dup removal: MinHash+LSH pairs -> union-find
    clusters -> keep min doc_id per cluster (broadcast loser filter)."""
    from siren_ray.stages.dedup import remove_near_duplicates

    ds = _docs(sf_dir).select_columns(["doc_id", "text"])
    return remove_near_duplicates(ds, "doc_id")


def q_simhash(sf_dir: str):
    from siren_ray.stages.dedup import simhash_batch

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "simhash"])


def q_simhash_neardup(sf_dir: str):
    """EXACT Hamming-ball near-dup pairs over 64-bit SimHash
    fingerprints (Manku et al. WWW'07 pigeonhole banding + in-bucket
    xor/popcount verify — `stages/dedup.py:simhash_neardup_pairs`).
    Rows-only: the fingerprint is not SQL-recomputable, but the
    operator's output is proven EQUAL to the brute-force Hamming pair
    set in t:test_ops::test_simhash_neardup_pairs_exact_vs_bruteforce."""
    from siren_ray.stages.dedup import simhash_neardup_pairs

    ds = _docs(sf_dir).select_columns(["doc_id", "text"])
    return simhash_neardup_pairs(ds, "doc_id", max_hamming=3)


def q_simhash_neardup_removed(sf_dir: str):
    """Driver-free SimHash dedup: exact Hamming pairs -> distributed
    connected components -> hash anti-join (keep min doc_id per
    cluster)."""
    from siren_ray.stages.dedup import remove_simhash_neardups

    ds = _docs(sf_dir).select_columns(["doc_id", "text"])
    return remove_simhash_neardups(ds, "doc_id", max_hamming=3)


def q_hamming_pairs_synth(sf_dir: str):
    """Oracle-checked exercise of the distributed Hamming-ball
    pair-finder (`stages/dedup.py:hamming_pairs` — the Manku WWW'07
    pigeonhole banding + in-bucket xor/popcount verify that
    `simhash_neardup` rides): fingerprints are CONSTRUCTED
    SQL-replayably (base = first 8 md5 hex bytes of doc_id//4, with
    0-2 deterministic bit flips by doc_id%4 — groups of 4 docs within
    Hamming <= 3), so DuckDB can state the exact pair set via
    xor + bit_count over the same construction. This oracle-checks the
    banding/bucketing/verify machinery end to end; the SimHash
    fingerprint kernel itself stays covered by the brute-force
    equality test (t:test_ops::test_simhash_neardup_pairs_exact)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.dedup import hamming_pairs

    def _fp(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        fps = np.empty(len(ids), dtype=np.uint64)
        for j, d in enumerate(ids):
            g = int(d) // 4
            base = int(hashlib.md5(str(g).encode()).hexdigest()[:16], 16)
            r = int(d) % 4
            if r == 1:
                mask = 1 << (g % 64)
            elif r == 2:
                mask = (1 << (g % 64)) ^ (1 << ((g * 7 + 13) % 64))
            elif r == 3:
                mask = 1 << ((g * 31 + 5) % 64)
            else:
                mask = 0
            fps[j] = np.uint64(base ^ mask)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "simhash": pa.array(fps, pa.uint64())})

    sigs = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _fp, batch_format="pyarrow")
    return hamming_pairs(sigs, "doc_id", max_hamming=3)


def q_chunk_dedup_fixed(sf_dir: str):
    """Fixed-size (256 B) chunk-dedup stats with a full DuckDB oracle:
    the fixed policy's chunk boundaries and identities ARE
    SQL-expressible (substr windows; distinct-by-content == the
    engine's distinct-by-64-bit-hash on this corpus), so the
    pre-combined partial/merge plumbing of
    `stages/cdc.py:chunk_dedup_stats` gets an exact end-to-end check.
    The gear-hash CDC policy stays rows-only in q:chunk_dedup."""
    from siren_ray.stages.cdc import chunk_dedup_stats

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    return chunk_dedup_stats(docs, chunker="fixed", size=256)


def q_embedding_neardup(sf_dir: str):
    import ray.data as rd

    from siren_ray.stages.dedup import embedding_neardup_pairs

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # low threshold so random test embeddings yield non-trivial pairs;
    # probes=1 multi-probe (recall ~3x single-probe on planted near-dups,
    # see test_embedding_multiprobe_recall)
    return embedding_neardup_pairs(ds, threshold=0.2, probes=1)


def q_embedding_neardup_removed(sf_dir: str):
    """Driver-free vector dedup: multi-probe LSH pairs -> distributed
    connected components -> hash anti-join (keep min vec_id per
    cluster)."""
    import ray.data as rd

    from siren_ray.stages.dedup import remove_embedding_neardups

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return remove_embedding_neardups(
        ds, threshold=0.2, probes=1, num_partitions=16
    ).select_columns(["vec_id"])


def q_knn_ivf(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from siren_ray.stages.ann import ivf_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    order = np.argsort(qt["vec_id"].to_numpy(zero_copy_only=False))[:5]
    queries = np.array(
        [qt["embedding"][int(i)].as_py() for i in order], dtype=np.float32
    )
    ds = rd.read_parquet(emb_path)
    return ivf_topk(ds, queries, k=10).select_columns(
        ["query_id", "vec_id"]
    )


def q_knn_pq(sf_dir: str):
    """Product-quantization ANN (stages/ann.py pq_train/pq_encode/
    pq_topk): train per-subspace codebooks on a sample, encode every
    embedding to m uint8 codes (64-dim float32 256 B -> 8 B, 32x — the
    compression that lets a 100 TB embedding corpus live in cluster RAM),
    then for 5 query vectors an ADC shortlist via per-query lookup
    tables (one gather+sum per batch, no vector decode) re-ranked
    exactly (ann.py:pq_topk_rerank — the IVFADC+re-rank recipe: recall
    set by shortlist depth, not quantization distortion; ADC-alone
    recall@10 decayed 0.94 -> 0.46 from sf0.001 to sf0.1 as true
    neighbors bunched tighter than the ADC error — these synthetic
    embeddings are near-random, PQ's hardest case. Measured at sf0.1:
    shortlist 64/128/256/512 -> recall 0.84/0.94/0.96/1.0; 256 buys
    comfortable margin at exact-scoring cost O(nq*256)). Rows-only: the
    quantizer is not SQL-expressible; before returning, recall@10
    against the oracle-checked exact path (q:knn_brute's
    brute_force_topk) is asserted >= 0.9 in-query, and t:test_ops pins
    encode determinism and recall on clustered data."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from siren_ray.stages.ann import (brute_force_topk, pq_encode,
                                      pq_topk_rerank, pq_train)

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = qt["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)[:5]
    queries = np.array(
        [qt["embedding"][int(i)].as_py() for i in order], dtype=np.float32
    )
    ds = rd.read_parquet(emb_path)
    # sample-trained codebooks (driver-side, like the IVF coarse quantizer)
    n = ds.count()
    sample_ds = ds.random_sample(min(1.0, 4096 / n), seed=11) \
        if n > 4096 else ds
    sample = np.array(sample_ds.to_pandas()["embedding"].tolist(),
                      dtype=np.float32)
    books = pq_train(sample, m=8, nbits=8)
    codes = pq_encode(ds, books)
    approx = pq_topk_rerank(ds, codes, queries, books, k=10,
                            shortlist=256).to_pandas()
    exact = brute_force_topk(ds, queries, k=10).to_pandas()
    hits = 0
    for qi in range(len(queries)):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        hits += len(e & set(approx[approx["query_id"] == qi]["vec_id"]))
    recall = hits / (10 * len(queries))
    assert recall >= 0.9, f"PQ recall@10 {recall} below floor"
    return approx[["query_id", "vec_id"]].sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)


def q_incremental_ingest(sf_dir: str):
    """Incremental corpus ingest: keep only increment docs (doc_id odd)
    whose text does not already exist in the base corpus (doc_id even) —
    a co-partitioned anti-join on an int64 text fingerprint
    (stages/dedup.py:hash_antijoin), so neither the base key set nor the
    increment touches the driver. 64-bit fingerprint: at 1e10 docs the
    expected false-drop count is ~3 (birthday bound) — the standard
    fingerprint-dedup tradeoff, exact at test scale."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.dedup import hash_antijoin
    from siren_ray.util import hash_strings

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def _half(parity: int, as_keys: bool):
        def _f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = ids % 2 == parity
            sub = t.filter(pa.array(keep))
            fp = hash_strings(sub["text"].to_pylist()).astype(np.int64)
            if as_keys:
                return pa.table({"id": pa.array(fp, pa.int64())})
            return pa.table({"doc_id": sub["doc_id"],
                             "fp": pa.array(fp, pa.int64())})
        return _f

    base_keys = docs.map_batches(_half(0, True), batch_format="pyarrow")
    inc = docs.map_batches(_half(1, False), batch_format="pyarrow")
    return hash_antijoin(inc, base_keys, "fp",
                         num_partitions=16).select_columns(["doc_id"])


def q_compact_shards(sf_dir: str):
    """Parquet small-file compaction (stages/compact.py): documents are
    written as many tiny hive-partitioned shards (the shape a long
    resumable crawl leaves behind), then compacted to target-size files
    — metadata-only planning, map-only rewrites, deterministic
    bin-identity names (idempotent under at-least-once retries),
    partition-layout preserved. Returns the per-bin manifest with
    relativized paths. Rows-only (filesystem state is not
    SQL-expressible; idempotence/resume proven in t:test_compact)."""
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.compact import compact_parquet

    root = "/tmp/siren_ray_runs/q_compact_shards"
    shutil.rmtree(root, ignore_errors=True)
    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def _shard(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.parquet as pq

        ids = np.asarray(t["doc_id"], dtype=np.int64)
        for part in np.unique(ids % 4):
            sub = t.filter(pa.array(ids % 4 == part))
            d = os.path.join(root, f"part={int(part)}")
            os.makedirs(d, exist_ok=True)
            # one tiny shard per (batch, partition): the small-file mess
            name = f"part-{int(ids.min())}-{int(part)}.parquet"
            pq.write_table(sub, os.path.join(d, name))
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    docs.map_batches(_shard, batch_format="pyarrow",
                     batch_size=256).materialize()
    manifest = compact_parquet(root, target_mb=64).to_pandas()
    manifest["out_file"] = [os.path.relpath(p, root)
                            for p in manifest.out_file]
    manifest = manifest.sort_values("out_file").reset_index(drop=True)
    return rd.from_pandas(manifest)


def q_meta_tags(sf_dir: str):
    """Page metadata extraction (stages/maincontent.py:meta_tags_batch):
    title / OpenGraph / description / canonical from synthesized pages
    that vary attribute order, quote style, tag case and entity
    escaping by doc_id — the DuckDB oracle states the expected decoded
    strings directly, so the parse is exact by construction."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.maincontent import meta_tags_batch

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls, htmls = [], []
        for d in ids:
            og_t = (f"<meta content='OG {d}' property=og:title>"
                    if d % 3 == 0 else
                    f'<meta property="og:title" content="OG {d}">')
            og_d = ("" if d % 4 == 0 else
                    f'<META NAME="og:description" CONTENT="OD {d}">')
            htmls.append(
                f"<html><head><title>Doc {d} &amp; co</title>{og_t}{og_d}"
                f'<meta name=description content=plain{d} />'
                f'<link rel="canonical" href="https://ex.org/c/{d}">'
                f"</head><body><p>x</p></body></html>".encode())
            urls.append(f"https://ex.org/p/{d}")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    pages = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    out = pages.map_batches(
        lambda t: meta_tags_batch(t).append_column("doc_id", t["doc_id"]),
        batch_format="pyarrow")
    return out.select_columns(
        ["doc_id", "url", "title", "og_title", "og_description",
         "description", "canonical"])


def q_robots_meta(sf_dir: str):
    """Robots-meta directive extraction
    (stages/maincontent.py:robots_meta_batch): page-level REP controls
    (noindex/nofollow/noarchive/nosnippet, `none` expansion, `all`
    no-op, multi-tag most-restrictive union) from synthesized pages
    varying tag case, quote style, attribute order and whitespace by
    doc_id%6 — the DuckDB oracle states the expected booleans directly,
    so the parse is exact by construction."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.maincontent import robots_meta_batch

    CASES = [
        "",                                                   # no tag
        '<META NAME="ROBOTS" CONTENT="NOINDEX, NOFOLLOW">',   # case
        "<meta content='none' name='robots'>",                # order/quote
        '<meta name="robots" content="all">',                 # no-op
        '<meta name="robots" content="noarchive">'
        '<meta name="robots" content=" NOFOLLOW ">',          # union+ws
        "<meta name=robots content=nosnippet>",               # unquoted
    ]

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls = [f"https://ex.org/p/{d}" for d in ids]
        htmls = [(f"<html><head>{CASES[d % 6]}</head>"
                  f"<body><p>x</p></body></html>").encode()
                 for d in ids]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    pages = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    return pages.map_batches(
        lambda t: robots_meta_batch(t).append_column("doc_id",
                                                     t["doc_id"]),
        batch_format="pyarrow")


def q_follow_edges(sf_dir: str):
    """Frontier link hygiene
    (stages/maincontent.py:follow_edges_batch): anchor edges minus
    rel=nofollow/ugc/sponsored links and minus ALL links from pages
    whose robots meta says nofollow. Each synthesized page carries one
    plain link, one rel="nofollow" link and one rel="UGC sponsored"
    link; every third page adds a page-level meta nofollow — the
    DuckDB oracle states the surviving (src, dst, anchor) edges
    directly (only the plain link, only on non-meta-nofollow pages)."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.maincontent import follow_edges_batch

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls, htmls = [], []
        for d in ids:
            meta = ('<meta name="robots" content="nofollow">'
                    if d % 3 == 0 else "")
            urls.append(f"https://ex.org/p/{d}")
            htmls.append(
                f"<html><head>{meta}</head><body>"
                f'<a href="/keep{d}.html">K {d}</a>'
                f'<a href="/nf{d}" rel="nofollow">N</a>'
                f'<a href="/ugc{d}" rel="UGC sponsored">U</a>'
                f"</body></html>".encode())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    pages = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    return pages.map_batches(
        lambda t: follow_edges_batch(t, drop_noise=False),
        batch_format="pyarrow")


def q_recrawl_plan(sf_dir: str):
    """Sitemap-freshness recrawl planning
    (sources/sitemap.py:plan_recrawl): real urlset XML is synthesized
    per doc (lastmod cycles through date-only / Z / +02:00 / absent /
    malformed W3C forms), parsed back through the real sitemap parser,
    lastmod-normalized to epoch, LEFT-joined against a synthetic crawl
    store (every third URL never crawled), and the new/stale/fresh/
    unknown verdict is emitted — the freshness loop a production
    crawler runs between full recrawls. The DuckDB oracle replays the
    construction arithmetic and the verdict CASE directly — exact."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.sources.sitemap import plan_recrawl, sitemap_batch

    LASTMOD = [None, "2024-03-01", "2024-03-01T12:00:00Z",
               "2024-03-01T12:00:00+02:00", "not-a-date"]

    def _mk_sitemap(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls, xmls = [], []
        for d in ids:
            lm = LASTMOD[d % 5]
            lm_tag = f"<lastmod>{lm}</lastmod>" if lm else ""
            urls.append(f"https://ex.org/sitemap/{d}.xml")
            xmls.append(
                f'<urlset><url><loc>https://ex.org/p/{d}</loc>'
                f"{lm_tag}</url></urlset>".encode())
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(xmls, pa.binary())})

    def _mk_crawled(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        keep = ids % 3 != 0
        ids = ids[keep]
        return pa.table({
            "url": pa.array([f"https://ex.org/p/{d}" for d in ids],
                            pa.string()),
            "ts": pa.array(1709280000 + (ids % 7) * 3600, pa.int64()),
        })

    docs = _docs(sf_dir).select_columns(["doc_id"])
    entries = docs.map_batches(_mk_sitemap, batch_format="pyarrow") \
                  .map_batches(sitemap_batch, batch_format="pyarrow")
    crawled = docs.map_batches(_mk_crawled, batch_format="pyarrow")
    return plan_recrawl(entries, crawled, ts_col="ts")


def q_maincontent_golden(sf_dir: str):
    """Byte-exact main-content-extraction oracle
    (stages/maincontent.py:extract_main_content): pages constructed so
    the readability recipe's verdict is statable in SQL — a nav link
    farm (noise-stripped), a 3-paragraph content div (the ancestor-
    credit winner), a short footer div outside the winner, and on odd
    doc_ids a link-only paragraph INSIDE the winner that the
    link-density rule must drop. DuckDB states the expected title,
    main_text (the three paragraphs newline-joined) and n_paragraphs
    directly. Complements the rows-only corpus run (q:main_content)."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.maincontent import main_content_batch

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls, htmls = [], []
        for d in ids:
            ps = "".join(
                f"<p>Paragraph {i} of document {d} carries enough "
                f"plain text for the extractor to score it.</p>"
                for i in (1, 2, 3))
            linky = (f'<p><a href="/z/{d}">a promotional link row longer'
                     f" than the paragraph floor</a></p>"
                     if d % 2 else "")
            urls.append(f"https://ex.org/p/{d}")
            htmls.append(
                f"<html><head><title>T {d}</title></head><body>"
                f'<nav><a href="/x">Home</a><a href="/y">About</a></nav>'
                f'<div id="main">{ps}{linky}</div>'
                f'<div class="foot"><p>tiny</p></div>'
                f"</body></html>".encode())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    pages = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    out = pages.map_batches(
        lambda t: main_content_batch(t).append_column("doc_id",
                                                      t["doc_id"]),
        batch_format="pyarrow")
    return out.select_columns(
        ["doc_id", "url", "title", "main_text", "n_paragraphs"])


def q_xrobots_header(sf_dir: str):
    """X-Robots-Tag header parsing
    (stages/maincontent.py:parse_x_robots_tag/x_robots_batch): the
    HTTP-level REP control — agent scoping, valued-directive colons,
    `none` expansion, multi-header union with per-header scope reset —
    over header values synthesized by doc_id%6; the DuckDB oracle
    states the expected booleans directly. The live-socket delivery
    path (HttpTransport.fetch_many_with_meta) is covered in
    t:test_http."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.maincontent import x_robots_batch

    CASES = [
        None,                                       # no header
        "noindex, nofollow",                        # plain list
        "googlebot: noindex",                       # scoped, not us
        "max-snippet:50, noarchive",                # valued colon
        "otherbot: noindex\nnosnippet",             # multi-header
        "none",                                     # expansion
    ]

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array([f"https://ex.org/p/{d}" for d in ids],
                            pa.string()),
            "x_robots_tag": pa.array([CASES[d % 6] for d in ids],
                                     pa.string()),
        })

    pages = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    return pages.map_batches(
        lambda t: x_robots_batch(t).append_column("doc_id", t["doc_id"]),
        batch_format="pyarrow")


def q_url_templates(sf_dir: str):
    """URL template mining (functions/urlnorm.py:url_template_batch):
    query-strip + long-hex + digit-run generalization exposes the URL
    families a site generates — vectorized RE2 shared VERBATIM with
    DuckDB, grouped family counts. URLs synthesized from doc_id across
    four families (query param, md5-hex tile path, calendar, slug);
    the oracle replays the construction and the same regexp_replace
    chain — exact."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from siren_ray.functions.urlnorm import url_template_batch

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls = []
        for d in ids:
            f = d % 4
            if f == 0:
                urls.append(f"https://ex{d % 2}.org/story/{d}?utm=x")
            elif f == 1:
                hx = hashlib.md5(str(d).encode()).hexdigest()[:16]
                urls.append(f"https://ex{d % 2}.org/tile/{hx}/{d % 5}")
            elif f == 2:
                urls.append(
                    f"https://cal.ex.org/{2000 + d % 30}/{1 + d % 12}"
                    "/page")
            else:
                urls.append(f"https://ex.org/p/{d}-slug")
        return pa.table({"url": pa.array(urls, pa.string())})

    ds = (_docs(sf_dir).select_columns(["doc_id"])
          .map_batches(_mk, batch_format="pyarrow")
          .map_batches(url_template_batch, batch_format="pyarrow"))
    counts = ds.groupby("template").count()
    return counts.map_batches(
        lambda t: pa.table({"template": t["template"],
                            "n_urls": t["count()"]}),
        batch_format="pyarrow")


def q_compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio (functions/textstats.py:
    compression_ratio_batch) — the whole-document repetition proxy
    Dolma/Gopher pipelines screen on; map-only. Rows-only (no zlib in
    SQL; separability + edge cases pinned in t:test_ops)."""
    from siren_ray.functions.textstats import compression_ratio_batch

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        compression_ratio_batch, batch_format="pyarrow",
    ).select_columns(["doc_id", "zlib_ratio"])


def q_chunk_dedup(sf_dir: str):
    """Storage-dedup factor under content-defined vs fixed-size
    chunking (stages/cdc.py): gear-hash CDC re-aligns shifted
    redundancy that fixed blocks miss. Two rows (policy, total_chunks,
    unique_chunks, total_bytes, unique_bytes); only pre-combined
    (hash, len, count) partials shuffle — rows-only (the gear rolling
    hash is not SQL-expressible)."""
    import ray.data as rd

    from siren_ray.stages.cdc import chunk_dedup_stats
    from siren_ray.util import pin_for_multipass

    docs = pin_for_multipass(
        _docs(sf_dir).select_columns(["doc_id", "text"]))
    cdc = chunk_dedup_stats(docs, chunker="cdc", avg_bits=8)
    fixed = chunk_dedup_stats(docs, chunker="fixed", size=256)
    return cdc.union(fixed).sort("policy")


def q_chunk_documents(sf_dir: str):
    """Context-window chunking: 64-token windows at stride 48 (flat-map
    row explosion inside the batch; functions/textstats.py:
    chunk_documents)."""
    from siren_ray.functions.textstats import chunk_documents

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        lambda t: chunk_documents(t, size=64, stride=48),
        batch_format="pyarrow",
    )


def q_pii_redact(sf_dir: str):
    """PII redaction (functions/pii.py): deterministic synthetic PII is
    appended per doc (so the redaction provably fires on every row),
    then email/IP/phone are redacted sequentially and counted
    independently — all RE2 kernels shared verbatim with the oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from siren_ray.functions.pii import pii_counts, redact_pii

    def _f(t: pa.Table) -> pa.Table:
        did = t["doc_id"].cast(pa.string())
        import numpy as np
        ip_oct = pa.array(
            np.asarray(t["doc_id"], dtype=np.int64) % 200
        ).cast(pa.string())
        aug = pc.binary_join_element_wise(
            t["text"], " contact user", did, "@example.com from 10.",
            ip_oct, ".0.1 call +1 415-555-0123", "")
        out = {"doc_id": t["doc_id"], "clean": redact_pii(aug)}
        out.update(pii_counts(aug))
        return pa.table(out)

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _f, batch_format="pyarrow")


def q_normalized_dedup(sf_dir: str):
    """Case/punct/whitespace-folding normalization (functions/pii.py:
    normalize_text) feeding first-wins exact dedup on the normalized
    form — the canonical pre-fuzzy-dedup fold at corpus scale (map-only
    normalize, then the one hash-partition dedup shuffle)."""
    import pyarrow as pa

    from siren_ray.functions.pii import normalize_text
    from siren_ray.stages.dedup import dedup_exact

    ds = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "norm": normalize_text(t["text"])}),
        batch_format="pyarrow",
    )
    return dedup_exact(ds, "norm", "doc_id")


def q_jsonl_roundtrip(sf_dir: str):
    """Corpus-interchange edge (sources/jsonl.py): serialize the
    documents table into gzipped JSONL shards (Dolma/C4/Pile layout:
    one JSON object per line, one shard per block, written by the
    owning task), read them back through read_binary_files + per-file
    line split, and recover (doc_id, text). Oracle = the original
    table: proves str/int values survive the JSON round-trip exactly
    (escaped newlines, unicode, sorted-key canonical lines)."""
    import shutil

    import pyarrow as pa

    from siren_ray.sources.jsonl import read_jsonl, write_jsonl_shards

    out_dir = "/tmp/siren_ray_runs/jsonl_rt_q"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    write_jsonl_shards(_docs(sf_dir).select_columns(["doc_id", "text"]),
                       out_dir)
    return read_jsonl(out_dir, columns=["doc_id", "text"]).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                            "text": t["text"].cast(pa.string())}),
        batch_format="pyarrow")


def q_warc_roundtrip(sf_dir: str):
    """Common-Crawl-shaped ingest edge (sources/warc.py): serialize the
    documents table into per-record-gzip WARC shards (one shard per
    block, written by the owning task), read them back through
    read_binary_files + member/record splitting, and recover (doc_id,
    text) from the archive. Oracle = the original table: proves the
    archive round-trip is lossless."""
    import tempfile
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.compute as pc

    from siren_ray.sources.warc import read_warc, write_warc_shards

    def _to_pages(t: pa.Table) -> pa.Table:
        url = pc.binary_join_element_wise(
            pa.array(["https://docs.example.com/d/"] * t.num_rows),
            t["doc_id"].cast(pa.string()), "")
        ts = pa.array([datetime(2024, 1, 1, tzinfo=timezone.utc)]
                      * t.num_rows).cast(pa.timestamp("us"))
        return pa.table({"url": url, "warc_ts": ts, "html": t["text"]})

    import shutil

    out_dir = "/tmp/siren_ray_runs/warc_rt_q"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    pages = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _to_pages, batch_format="pyarrow")
    write_warc_shards(pages, out_dir, content_type="text/plain")

    def _back(t: pa.Table) -> pa.Table:
        doc_id = pc.cast(pc.replace_substring_regex(
            t["url"], pattern=r"^https://docs\.example\.com/d/",
            replacement=""), pa.int64())
        return pa.table({"doc_id": doc_id, "text": t["text"]})

    return read_warc(out_dir, text=True).map_batches(
        _back, batch_format="pyarrow")


def q_warc_to_corpus(sf_dir: str):
    """Archive -> crawlable corpus composite (sources/warc.py:
    warc_to_corpus): documents serialize into WARC shards, then ingest
    into the hive ``bucket=hash64(url)%N`` partitioned pages layout that
    ``fetch_mode="bucketed"`` partition-prunes — the path a real
    Common-Crawl drop takes into the fetch join. Returns (url, bucket)
    for every ingested page; rows-only (the bucket assignment is the
    engine's SipHash, no SQL form). Crawl-over-ingested-corpus
    conformance is tested end-to-end (t:test_warc)."""
    import tempfile
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from siren_ray.sources.warc import warc_to_corpus, write_warc_shards

    def _to_pages(t: pa.Table) -> pa.Table:
        url = pc.binary_join_element_wise(
            pa.array(["https://docs.example.com/d/"] * t.num_rows),
            t["doc_id"].cast(pa.string()), "")
        ts = pa.array([datetime(2024, 1, 1, tzinfo=timezone.utc)]
                      * t.num_rows).cast(pa.timestamp("us"))
        return pa.table({"url": url, "warc_ts": ts, "html": t["text"]})

    # fixed, pre-cleared scratch paths: repeated bench/test runs reuse
    # (not accumulate) the ~2x-corpus-size staging on this I/O-fragile
    # host
    import shutil

    warc_dir = "/tmp/siren_ray_runs/warc_ingest_q/archive"
    pages_dir = "/tmp/siren_ray_runs/warc_ingest_q/pages"
    for d in (warc_dir, pages_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    pages = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _to_pages, batch_format="pyarrow")
    write_warc_shards(pages, warc_dir, content_type="text/plain")
    warc_to_corpus(warc_dir, pages_dir, num_buckets=32)
    return rd.read_parquet(pages_dir).map_batches(
        lambda t: pa.table({
            "url": t["url"],
            "bucket": t["bucket"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def q_repetition_stats(sf_dir: str):
    """Gopher-style intra-document repetition screen (textstats.py:
    line_repetition_batch — Rae et al. 2021 Table A1 judges a doc by
    how much of it is its own duplicated lines): map-only per-doc line
    counts, distinct-line counts, and characters inside duplicated
    lines, emitted as INTEGER counts so the DuckDB oracle compares
    hash-exactly (ratios derive downstream)."""
    from siren_ray.functions.textstats import line_repetition_batch

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        line_repetition_batch, batch_format="pyarrow")


def q_gopher_rules(sf_dir: str):
    """Gopher quality-rule line AND word signals (textstats.py:
    gopher_rules_batch — bullet/ellipsis line fractions, word count,
    alphabetic-word and stopword-hit counts from Rae et al. 2021 Table
    A1) as per-doc INTEGER counts, map-only — all six columns
    oracle-checked hash-exactly (the corpus text is ASCII with
    space-only whitespace, so Python-split tokenization == DuckDB
    string_split-and-drop-empties; verified length==strlen). The
    kernel's top-n-gram char-coverage signals are word-hash based and
    stay reference-tested in t:test_classifier."""
    import pyarrow as pa

    from siren_ray.functions.textstats import gopher_rules_batch

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        lambda t: gopher_rules_batch(t).select(
            ["doc_id", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
             "n_words", "n_alpha_words", "n_stopword_hits"]),
        batch_format="pyarrow",
    )


def q_dup_ngrams(sf_dir: str):
    """Gopher duplicate-n-gram screen (textstats.py:
    dup_ngram_chars_batch — "fraction of characters in duplicate
    5..10-grams", Rae et al. 2021 Table A1): per-doc positional-union
    char coverage of repeated word n-grams as integers, plus the
    word_chars denominator. Map-only, one shared word-hash pass for all
    six n-gram orders. Rows-only: python-split word semantics aren't
    SQL-expressible; the kernel is reference-tested per doc incl.
    overlapping repeats in t:test_classifier."""
    from siren_ray.functions.textstats import dup_ngram_chars_batch

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        dup_ngram_chars_batch, batch_format="pyarrow")


def q_quality_classifier(sf_dir: str):
    """Model-based quality filtering (stages/classifier.py) — the
    CCNet/GPT-3-recipe stage (train a linear classifier on labeled
    docs, broadcast it, keep/sample by score) with a feature-hashed
    logistic regression standing in for fastText (not in this
    container): distributed full-batch GD whose per-epoch gradient
    partials tree-merge through a chunk groupby (driver receives dim+1
    floats per epoch regardless of block count), then map-only scoring.
    The label DISTILLS an existing heuristic into the model (the
    standard replicate-the-expensive-filter move): 1 where the doc's
    stopword per-mille exceeds the EXACT corpus median (distributed
    bounded-histogram quantile, relational.py:exact_quantiles_int) —
    deterministic, data-dependent, linearly learnable from bag-of-words
    (train accuracy ~0.89 at these settings). Rows-only (model weights
    have no SQL form); the training math is unit-tested at 1e-8 parity
    with a single-array numpy reference and for repartition invariance
    (t:test_classifier)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from siren_ray.functions.textstats import quality_batch
    from siren_ray.stages.classifier import (score_quality,
                                             train_quality_classifier)
    from siren_ray.stages.relational import exact_quantiles_int
    from siren_ray.util import pin_for_multipass

    def _permille(t: pa.Table) -> pa.Table:
        q = quality_batch(t)
        pm = (np.asarray(q["stopword_ratio"], dtype=np.float64)
              * 1000).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "text": t["text"],
            "stop_pm": pa.array(pm, pa.int64()),
        })

    ds = pin_for_multipass(  # consumed by quantile, training, scoring
        _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
            _permille, batch_format="pyarrow"))
    med = int(exact_quantiles_int(ds, "stop_pm", [0.5])["stop_pm"][0]
              .as_py())
    labeled = ds.map_batches(
        lambda t: t.append_column(
            "label",
            pc.cast(pc.greater(t["stop_pm"], pa.scalar(med)), pa.int64())),
        batch_format="pyarrow",
    )
    model = train_quality_classifier(labeled, label_col="label",
                                     dim=256, epochs=12)
    return score_quality(ds, model).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "label": pc.cast(pc.greater(t["stop_pm"], pa.scalar(med)),
                             pa.int64()),
            "quality_prob": pc.round(t["quality_prob"], ndigits=4),
        }),
        batch_format="pyarrow",
    )


def q_lm_perplexity(sf_dir: str):
    """Hashed bigram-LM quality scoring (stages/lm.py): train the
    bounded-memory count model on the documents table in one streaming
    pass, broadcast it, score every doc with add-alpha perplexity —
    the CCNet-recipe shape with a hashed bigram model standing in for
    KenLM (not in the container). Rows-only: perplexity is a float
    model score with no SQL equivalent."""
    from siren_ray.stages.lm import bigram_lm_train, perplexity_score

    ds = _docs(sf_dir).select_columns(["doc_id", "text"])
    lm = bigram_lm_train(ds, uni_bits=18, big_bits=20)
    return perplexity_score(ds, lm)


def q_dsir_select(sf_dir: str):
    """DSIR data selection (stages/lm.py:dsir_select — Xie et al. 2023
    importance resampling): the 'en' documents are the in-domain
    target, the whole table is the raw pool; hashed bigram models
    train in two streaming passes, every raw doc gets a map-only
    log importance weight, and 100 docs are drawn without replacement
    by deterministic md5-Gumbel-top-k. Rows-only: the weight is a
    model score with no SQL equivalent; parity against a naive
    reference implementation is unit-tested (t:test_lm)."""
    import pyarrow.compute as pc

    from siren_ray.stages.lm import dsir_select

    docs = _docs(sf_dir).select_columns(["doc_id", "text", "lang"])
    target = docs.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")).drop_columns(["lang"]),
        batch_format="pyarrow")
    raw = docs.map_batches(lambda t: t.drop_columns(["lang"]),
                           batch_format="pyarrow")
    return dsir_select(raw, target, 100, uni_bits=16, big_bits=18,
                       temperature=0.25)


def q_incremental_neardup(sf_dir: str):
    """NEAR-duplicate-aware incremental ingest
    (dedup.py:incremental_ingest_neardup): even-id docs are the base
    corpus, odd-id docs the increment; increment rows whose Jaccard-
    verified MinHash matches anything in the base are dropped via the
    driver-free anti-join. Rows-only (LSH candidate generation has no
    SQL form); semantics unit-tested with planted near-dups."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.dedup import incremental_ingest_neardup

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def _side(par: int):
        return docs.map_batches(
            lambda t: t.filter(pa.array(
                np.asarray(t["doc_id"], dtype=np.int64) % 2 == par)),
            batch_format="pyarrow")

    return incremental_ingest_neardup(
        _side(0), _side(1), id_col="doc_id", verify_jaccard=0.5)


def q_duplicate_passages(sf_dir: str):
    """Passage-level duplication screen (lines.py:duplicate_passages —
    the Lee et al. 2021 shape at n-gram granularity): per doc, how many
    sliding 3-gram positions are covered by a gram occurring in >= 2
    DISTINCT documents. Two streaming passes, one (gram, df) shuffle,
    broadcast dup-set membership; oracle = DuckDB gram explode + df
    join."""
    from siren_ray.stages.lines import duplicate_passages

    ds = _docs(sf_dir).select_columns(["doc_id", "text"])
    return duplicate_passages(ds, n=3, min_docs=2)


def q_data_mixture(sf_dir: str):
    """Deterministic corpus-mixture construction
    (relational.py:mixture_sample): 50/30/20 target proportions over
    three sources, 40 rows total, md5-order draw per source — the
    'hit a target training mixture' step, exact-oracle-checkable."""
    from siren_ray.stages.relational import mixture_sample

    docs = _docs(sf_dir).select_columns(["doc_id", "source"])
    return mixture_sample(
        docs, group_col="source", id_col="doc_id", target_rows=40,
        proportions={"src0": 0.5, "src1": 0.3, "src2": 0.2},
    )


def q_text_embed_neardup(sf_dir: str):
    """Raw-text -> vector -> near-dup removal END-TO-END: feature-
    hashing embeddings (textstats.py:hashed_text_embedding, the
    model-free stand-in with a neural encoder's pipeline shape) feed the
    driver-free vector dedup chain (multi-probe LSH -> distributed
    connected components -> anti-join). Rows-only: LSH bucketing has no
    SQL equivalent; the component kernels are individually tested."""
    from siren_ray.functions.textstats import hashed_text_embedding
    from siren_ray.stages.dedup import remove_embedding_neardups

    ds = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        hashed_text_embedding, batch_format="pyarrow")
    return remove_embedding_neardups(ds, id_col="doc_id",
                                     threshold=0.98)


def q_adaptive_quality_gate(sf_dir: str):
    """Data-dependent quality gate: the filter threshold is COMPUTED
    from the corpus (exact discrete p10 of per-doc token counts via the
    bounded (value, count) histogram — relational.py:exact_quantiles_int)
    then broadcast into a map-only filter. The adaptive-threshold shape
    every curation pipeline needs (fixed cutoffs drift across corpora);
    fully oracle-checkable because the quantile is exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from siren_ray.functions.textstats import token_count_ws
    from siren_ray.stages.relational import exact_quantiles_int

    ds = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "n_tokens": token_count_ws(t["text"])}),
        batch_format="pyarrow",
    )
    thr_tbl = exact_quantiles_int(ds, "n_tokens", [0.10])
    thr = int(thr_tbl["n_tokens"][0].as_py())
    return ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_tokens"],
                                            pa.scalar(thr))),
        batch_format="pyarrow",
    )


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement
    (relational.py:weighted_sample — Efraimidis-Spirakis keys from
    md5-derived uniforms, selection via the sort-free global top-k).
    Longer documents (weight = n_chars) are proportionally likelier."""
    from siren_ray.stages.relational import weighted_sample

    docs = _docs(sf_dir).select_columns(["doc_id", "n_chars"])
    return weighted_sample(docs, 100, weight_col="n_chars",
                           id_col="doc_id")


def q_window_ops(sf_dir: str):
    """Generic per-key ordered window functions (events.py:window_ops):
    LAG/LEAD/running-SUM/ROW_NUMBER in ONE shuffle + one sorted pass per
    partition. Integer cents keep the running sum association-free."""
    import pyarrow as pa

    from siren_ray.stages.events import window_ops

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "ts": t["ts"],
            "user_id": t["user_id"],
            "value_c": pa.array(_cents(t["value"]), pa.int64()),
        })

    out = window_ops(ds.map_batches(_prep, batch_format="pyarrow"),
                     value_col="value_c")
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "lag_v", "lead_v",
                            "cumsum_v", "row_number"]),
        batch_format="pyarrow",
    )


def q_grouped_agg(sf_dir: str):
    """Generic partial-combine grouped aggregation
    (relational.py:grouped_agg): count/sum/min/max/mean in one reusable
    operator — each batch reduces to <= one row per group before the
    shuffle. Integer cents for exact cross-engine sums."""
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.relational import grouped_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty_c": pa.array(_cents(t["l_quantity"]), pa.int64()),
            "price_c": pa.array(_cents(t["l_extendedprice"]), pa.int64()),
        })

    return grouped_agg(
        ds.map_batches(_prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "n_rows": ("qty_c", "count"),
            "sum_qty_c": ("qty_c", "sum"),
            "min_price_c": ("price_c", "min"),
            "max_price_c": ("price_c", "max"),
            "avg_qty_c": ("qty_c", "mean"),
        },
    )


def q_full_outer_join(sf_dir: str):
    """FULL OUTER distributed hash join (relational.py:hash_join
    how='outer'): customers missing from one side and orders missing
    from the other both survive with null padding; per-partition outer
    merges over disjoint key ranges compose exactly."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.relational import hash_join

    import ray.data as rd

    left = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"]).map_batches(
        lambda t: t.filter(pa.array(
            np.asarray(t["c_custkey"], dtype=np.int64) % 3 != 0)),
        batch_format="pyarrow")
    right = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pa.array(
            np.asarray(t["o_custkey"], dtype=np.int64) % 2 == 0)),
        batch_format="pyarrow")
    joined = hash_join(left, right, on="c_custkey", right_on="o_custkey",
                       how="outer", broadcast=False)

    def _project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = pc.coalesce(t["c_custkey"].cast(pa.int64(), safe=False)
                        if t["c_custkey"].type != pa.int64()
                        else t["c_custkey"],
                        t["o_custkey"].cast(pa.int64(), safe=False)
                        if t["o_custkey"].type != pa.int64()
                        else t["o_custkey"])
        return pa.table({
            "k": k,
            "c_name": t["c_name"],
            "o_orderkey_d": t["o_orderkey"].cast(pa.float64()),
            "o_totalprice": t["o_totalprice"].cast(pa.float64()),
        })

    return joined.map_batches(_project, batch_format="pyarrow")


def q_pack_sequences(sf_dir: str):
    """Training-sequence packing (functions/packing.py): token-count the
    documents, FFD-pack each block into 256-token sequences. Map-only,
    block-local bins (see module docstring). Rows-only: the packing
    ASSIGNMENT has no SQL equivalent; coverage/capacity invariants are
    unit-tested in t:test_packing."""
    import pyarrow as pa

    from siren_ray.functions.packing import pack_sequences
    from siren_ray.functions.textstats import token_count_ws

    ds = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "n_tokens": token_count_ws(t["text"])}),
        batch_format="pyarrow",
    )
    return pack_sequences(ds, seq_len=256)


def q_curation_report(sf_dir: str):
    """Flagship LLM-data curation composite: quality gate -> exact-text
    first-wins dedup -> token count -> per-source corpus report
    (n_docs, total_tokens). Chains the individually-oracle-checked
    kernels; the whole chain is itself oracle-checked as ONE CTE query."""
    import pandas as pd
    import pyarrow as pa

    from siren_ray.functions.textstats import quality_batch, token_count_ws
    from siren_ray.stages.dedup import dedup_exact

    ds = _docs(sf_dir).select_columns(["doc_id", "source", "text"])
    def _gate(t: pa.Table) -> pa.Table:
        qb = quality_batch(t)
        return qb.filter(qb["quality_ok"]).select(
            ["doc_id", "source", "text"])

    gated = ds.map_batches(_gate, batch_format="pyarrow")
    kept = dedup_exact(gated, "text", "doc_id")
    toks = kept.map_batches(
        lambda t: pa.table({"source": t["source"],
                            "n_tokens": token_count_ws(t["text"])}),
        batch_format="pyarrow",
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("source", sort=False).agg(
            n_docs=("n_tokens", "size"), total_tokens=("n_tokens", "sum"))
        return pa.Table.from_pandas(df.reset_index(), preserve_index=False)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).agg(
            n_docs=("n_docs", "sum"), total_tokens=("total_tokens", "sum"))
        return g.reset_index()

    return (
        toks.map_batches(_partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(_final, batch_format="pandas")
    )


def q_snapshot_diff(sf_dir: str):
    """Recrawl snapshot diff: added/removed/changed/unchanged per doc
    between two deterministic snapshot views of the documents table
    (old = doc_id%10!=0; new = doc_id%7!=0 with every doc_id%3==0 page
    'edited'). Full-outer co-partitioned fingerprint join —
    stages/relational.py:snapshot_diff."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.relational import snapshot_diff

    def _snap(mod: int, bump: bool):
        def _f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = ids % mod != 0
            # one bulk filter+to_pylist, not per-element Arrow access
            texts = t.filter(pa.array(keep))["text"].to_pylist()
            ids = ids[keep]
            fps = [
                hashlib.md5(
                    (" ".join((x or "").split())
                     + (" v2" if bump and int(i) % 3 == 0 else "")).encode()
                ).hexdigest()
                for i, x in zip(ids, texts)
            ]
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "fp": pa.array(fps, pa.string())})
        return _f

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    old_ds = docs.map_batches(_snap(10, False), batch_format="pyarrow")
    new_ds = docs.map_batches(_snap(7, True), batch_format="pyarrow")
    return snapshot_diff(old_ds, new_ds, key="doc_id", fp_col="fp",
                         num_partitions=16)


def q_kmeans_clusters(sf_dir: str):
    """Distributed full-corpus spherical k-means (Lloyd's over streaming
    per-batch partial sums; see stages/ann.py:kmeans_train) -> per-cluster
    member counts. Rows-only: cluster identities depend on the seeded
    random init, not SQL-expressible."""
    import ray.data as rd

    from siren_ray.stages.ann import kmeans_predict, kmeans_train

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    cents = kmeans_train(ds, 8, iters=6, train_sample=512)
    assigned = kmeans_predict(ds, cents)
    return (
        assigned.groupby("ivf_list").count()
        .sort("ivf_list")
        .rename_columns({"count()": "n"})
    )


def q_lang_id(sf_dir: str):
    from siren_ray.functions.textstats import lang_id_batch

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        lang_id_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "lang_pred"])


def q_multimodal_frames(sf_dir: str):
    """Video-shaped pipeline: frame-sample binary blobs (row explosion +
    metadata carry) -> per-frame feature extraction in an actor pool
    (fixed-dim normalized vectors). Codec-free deterministic kernels;
    the Ray plumbing (flat-map shape, actor init-once, payload dropped
    after embed) is the production shape."""
    import ray.data as rd

    from siren_ray.stages.multimodal import (
        BinaryFeatures,
        frame_sample,
        make_tiles,
    )

    tiles = rd.from_arrow(make_tiles(30))
    frames = tiles.map_batches(
        frame_sample, fn_kwargs={"n_frames": 3, "frame_size": 16},
        batch_format="pyarrow",
    )
    return frames.map_batches(
        BinaryFeatures, fn_constructor_kwargs={"data_col": "frame"},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 2),
    ).select_columns(["page_id", "url", "frame_idx", "frame_offset"])


def q_ocr_tiles(sf_dir: str):
    """Multimodal actor-pool stage (P8/T2 shape, fake OCR engine)."""
    import ray.data as rd

    from siren_ray.stages.multimodal import OcrTiles, make_tiles

    tiles = rd.from_arrow(make_tiles(40))
    out = tiles.map_batches(
        OcrTiles, batch_format="pyarrow", batch_size=64, concurrency=(1, 2)
    )
    return out.map_batches(
        lambda t: t.filter(
            __import__("pyarrow").compute.not_equal(t["ocr_text"], "")
        ),
        batch_format="pyarrow",
    )


def q_scraper_mirror(sf_dir: str):
    from siren_ray.corpus import WINDOW_END, WINDOW_START, ensure_corpus
    from siren_ray.pipelines.scrapers import mirror_pipeline

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    return mirror_pipeline(corpus, start=WINDOW_START, end=WINDOW_END)


def q_scraper_ht(sf_dir: str):
    from siren_ray.corpus import KEYWORDS as CK
    from siren_ray.corpus import ensure_corpus
    from siren_ray.pipelines.scrapers import ht_pipeline

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    return ht_pipeline(corpus, keywords=CK[:2])


def q_scraper_tg_epaper(sf_dir: str):
    from siren_ray.corpus import KEYWORDS as CK
    from siren_ray.corpus import ensure_corpus
    from siren_ray.pipelines.scrapers import telegraph_epaper_pipeline

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    return telegraph_epaper_pipeline(corpus, keywords=CK[:2])


def q_scraper_newsminute(sf_dir: str):
    """S3 two-phase offset pagination e2e (online/newsminute.py:44-112)."""
    from siren_ray.corpus import KEYWORDS as CK
    from siren_ray.corpus import WINDOW_END, WINDOW_START, ensure_corpus
    from siren_ray.pipelines.newsminute import newsminute_pipeline

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    return newsminute_pipeline(corpus, start=WINDOW_START, end=WINDOW_END,
                               keywords=CK[:2])


def q_scraper_tg_online(sf_dir: str):
    """S4 HTML-paginated search e2e (online/telegraph.py:105-150)."""
    from siren_ray.corpus import KEYWORDS as CK
    from siren_ray.corpus import WINDOW_END, WINDOW_START, ensure_corpus
    from siren_ray.pipelines.telegraph_online import telegraph_online_pipeline

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    return telegraph_online_pipeline(corpus, start=WINDOW_START,
                                     end=WINDOW_END, keywords=CK[:2])


def q_scraper_readwhere(sf_dir: str):
    """S7/S8 publishdates -> issue-search -> parent-field merge e2e
    (epaper/readwhere/core.py:137-214)."""
    from siren_ray.corpus import KEYWORDS as CK
    from siren_ray.corpus import ensure_corpus
    from siren_ray.pipelines.readwhere import readwhere_pipeline

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    return readwhere_pipeline(corpus, "tie", keywords=CK[:3])


def q_scraper_readwhere_ocr(sf_dir: str):
    """S12/P8/T2: pagemeta tile pyramid -> tile fetch -> stateful OCR
    actor pool -> non-empty filter (epaper/readwhere/ocr.py:140-214)."""
    from siren_ray.corpus import ensure_corpus
    from siren_ray.pipelines.readwhere import readwhere_ocr_pipeline

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    return readwhere_ocr_pipeline(corpus, "tie")


def q_toi_boolean(sf_dir: str):
    """S5 full boolean query spec (epaper/toi.py:101-147) as a vectorized
    filter over the documents table (oracle-checked)."""
    from siren_ray.pipelines.scrapers import ToiQuerySpec, toi_query_filter

    spec = ToiQuerySpec(
        include_all=("spark",),
        include_any=("window", "join"),
        exclude_all=("merge",),
    )
    ds = _docs(sf_dir).select_columns(["doc_id", "text"])
    return toi_query_filter(ds, spec).select_columns(["doc_id"])


def q_url_canonicalize(sf_dir: str):
    """URL canonicalization as frontier dedup leverage: every corpus
    page URL is expanded into 3 deterministic variant spellings
    (uppercase scheme/host, :443 port + fragment, tracking params),
    canonicalized back, and counted. The invariant the result shows:
    variants collapse to exactly the original distinct-URL count.
    Rows-only (urlsplit semantics aren't DuckDB-expressible)."""
    import pyarrow as pa

    from siren_ray.corpus import ensure_corpus
    from siren_ray.functions.urlnorm import canonicalize_urls

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    import ray.data as rd

    pages = rd.read_parquet(os.path.join(corpus, "pages"),
                            columns=["url"])

    def _variants(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        out = []
        for u in urls:
            rest = u.split("://", 1)[1]
            host, _, path = rest.partition("/")
            out.append("HTTPS://" + host.upper() + "/" + path)
            out.append(f"https://{host}:443/{path}#frag")
            out.append(f"https://{host}/{path}?utm_source=feed&gclid=g1")
        return pa.table({"url": pa.array(out, pa.string())})

    def _partial(t: pa.Table) -> pa.Table:
        canon = canonicalize_urls(t["url"])
        return pa.table({
            "n_variant_rows": pa.array([t.num_rows], pa.int64()),
            "n_roundtrip_ok": pa.array(
                [pa.compute.sum(
                    pa.compute.equal(canon, canonicalize_urls(canon))
                ).as_py() or 0], pa.int64()),
        })

    import pandas as pd

    stats = pages.map_batches(_variants, batch_format="pyarrow").map_batches(
        _partial, batch_format="pyarrow").to_pandas().sum()
    n_orig = pages.map_batches(
        lambda t: pa.table({"c": canonicalize_urls(t["url"])}),
        batch_format="pyarrow").unique("c")
    return pd.DataFrame({
        "n_variant_rows": [int(stats["n_variant_rows"])],
        "n_roundtrip_ok": [int(stats["n_roundtrip_ok"])],
        "n_distinct_canonical": [len(n_orig)],
    })


def q_mimetype_counts(sf_dir: str):
    """W7 mimetype inference over the corpus pages (magic bytes first,
    extension fallback), grouped counts. Rows-only."""
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.corpus import ensure_corpus
    from siren_ray.functions.urlnorm import infer_mimetypes

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    pages = rd.read_parquet(os.path.join(corpus, "pages"),
                            columns=["url", "html"])
    return (
        pages.map_batches(
            lambda t: pa.table(
                {"mimetype": infer_mimetypes(t["url"], t["html"])}),
            batch_format="pyarrow",
        )
        .groupby("mimetype")
        .count()
    )


def q_jaccard_neardup(sf_dir: str):
    """n-gram Jaccard near-dup: MinHash+LSH candidate pairs screened by
    TRUE word-5-shingle Jaccard (two distributed equi-joins ship each
    pair its texts; per-batch each distinct doc shingles once). Rows-only
    (the LSH candidate set isn't SQL-expressible); the verify kernel is
    exactness-tested against the set-based jaccard() reference."""
    import pyarrow as pa

    from siren_ray.stages.dedup import (
        minhash_duplicate_pairs,
        verify_pairs_jaccard,
    )

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    pairs = minhash_duplicate_pairs(docs, "doc_id", num_perm=32, bands=8)
    out = verify_pairs_jaccard(pairs, docs, id_col="doc_id",
                               threshold=0.4)
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("jaccard"), "jaccard",
            pa.compute.round(t["jaccard"], ndigits=6)),
        batch_format="pyarrow",
    )


def q_antijoin(sf_dir: str):
    """Distributed hash anti-join: customers with NO URGENT-priority
    order (the exact complement of q_semijoin). Both sides
    hash-co-partition on the key via raw tasks (the key set never ships
    to the driver — the case a broadcast isin filter can't cover).
    Oracle = NOT EXISTS."""
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.dedup import hash_antijoin

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"])
    keys = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(
        lambda t: pa.table({
            "id": t.filter(
                pa.compute.equal(t["o_orderpriority"], "1-URGENT")
            )["o_custkey"]
        }),
        batch_format="pyarrow",
    )
    return hash_antijoin(cust, keys, "c_custkey")


def q_semijoin(sf_dir: str):
    """Distributed hash semi-join (existence filter): customers with at
    least one URGENT-priority order — same co-partitioned shape as the
    anti-join, keep-matches polarity. Oracle = EXISTS."""
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.dedup import hash_semijoin

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"])
    keys = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(
        lambda t: pa.table({
            "id": t.filter(
                pa.compute.equal(t["o_orderpriority"], "1-URGENT")
            )["o_custkey"]
        }),
        batch_format="pyarrow",
    )
    return hash_semijoin(cust, keys, "c_custkey")


def q_rolling_sum(sf_dir: str):
    """Per-user rolling 7-row window sum over the event stream (SQL ROWS
    BETWEEN 6 PRECEDING AND CURRENT ROW): one hash shuffle on user
    bucket, one grouped C-level rolling kernel per partition. Values go
    through the integer-cents contract (round-half-away per row) so the
    window sums are exact int64 and hash-comparable."""
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.events import rolling_sum

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"],
    ).map_batches(
        lambda t: t.append_column(
            "value_c", pa.array(_cents(t["value"].to_numpy()), pa.int64())
        ).drop_columns(["value"]),
        batch_format="pyarrow",
    )
    out = rolling_sum(ev, value_col="value_c", window_rows=7,
                      out_col="roll_sum_c")
    return out.select_columns(["event_id", "user_id", "roll_sum_c"])


def q_pivot_counts(sf_dir: str):
    """Pivoted contingency counts: orders per (priority row, status
    column), per-batch exact partial counts -> one small two-key groupby
    -> driver pivot. Oracle = count(*) FILTER per category."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.relational import pivot_counts

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_orderstatus"],
    )
    df = pivot_counts(orders, "o_orderpriority", "o_orderstatus")
    return pa.Table.from_pandas(df, preserve_index=False)


def q_exact_quantiles(sf_dir: str):
    """EXACT discrete quantiles (DuckDB quantile_disc semantics) of the
    per-doc token count: per-batch value-count histogram, one groupby
    over DISTINCT values, driver cumsum scan. Complement of the KLL
    sketch for small integer domains."""
    import pyarrow as pa

    from siren_ray.functions.textstats import token_count_ws
    from siren_ray.stages.relational import exact_quantiles_int

    counts = _docs(sf_dir).map_batches(
        lambda t: pa.table({"n_tokens": token_count_ws(t["text"])}),
        batch_format="pyarrow",
    )
    return exact_quantiles_int(counts, "n_tokens",
                               [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def q_pagerank(sf_dir: str):
    """PageRank centrality over the embedding cosine-similarity graph
    (edges = exact all-pairs cosine >= 0.3, both directions): the
    iterative co-partitioned raw-task fixpoint — rank vectors and edges
    never leave their hash partition; only pre-aggregated (dst, sum)
    contribution shards move per iteration. Rows-only (iterative
    fixpoint); exactness is unit-tested against a dense numpy reference
    (t:test_graph)."""
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.ann import cosine_pairs_exact
    from siren_ray.stages.graph import pagerank
    from siren_ray.stages.relational import topk_global

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    pairs = cosine_pairs_exact(emb, threshold=0.3)
    edges = pairs.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([
                t["id_a"].combine_chunks().cast(pa.int64()),
                t["id_b"].combine_chunks().cast(pa.int64())]),
            "dst": pa.concat_arrays([
                t["id_b"].combine_chunks().cast(pa.int64()),
                t["id_a"].combine_chunks().cast(pa.int64())]),
        }),
        batch_format="pyarrow",
    )
    nodes = emb.map_batches(
        lambda t: pa.table({"id": t["vec_id"].combine_chunks().cast(
            pa.int64())}),
        batch_format="pyarrow",
    )
    ranks = pagerank(edges, nodes, num_partitions=16)
    top = topk_global(ranks, "rank", 20, tie_col="id").to_pandas()
    top["rank"] = top["rank"].round(9)
    return top


def q_hits(sf_dir: str):
    """HITS hub/authority over the DIRECTED cosine graph (edge
    id_a -> id_b only, so hubs and authorities genuinely differ —
    unlike PageRank's symmetrized graph above): the two-sided
    link-analysis score a crawl scheduler uses for frontier (hub) vs
    content (authority) priority. Rows-only (iterative fixpoint);
    exactness is unit-tested against a dense numpy reference
    (t:test_graph::test_hits_matches_dense_reference)."""
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.ann import cosine_pairs_exact
    from siren_ray.stages.graph import hits
    from siren_ray.stages.relational import topk_global

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    pairs = cosine_pairs_exact(emb, threshold=0.3)
    edges = pairs.map_batches(
        lambda t: pa.table({
            "src": t["id_a"].combine_chunks().cast(pa.int64()),
            "dst": t["id_b"].combine_chunks().cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )
    nodes = emb.map_batches(
        lambda t: pa.table({"id": t["vec_id"].combine_chunks().cast(
            pa.int64())}),
        batch_format="pyarrow",
    )
    scores = hits(edges, nodes, num_partitions=16)
    top = topk_global(scores, "authority", 20, tie_col="id").to_pandas()
    top["hub"] = top["hub"].round(9)
    top["authority"] = top["authority"].round(9)
    return top


def q_bpe_word_freq(sf_dir: str):
    """The BPE trainer's input: exact global top-200 (word, count) over
    the documents corpus, ordered (count DESC, word ASC). ONE
    vocabulary-sized shuffle — per-batch value-count partials
    hash-partition on the word (each word's global count completes in
    exactly one partition), per-partition combine + local top-k, driver
    merges P x k candidate rows. Oracle-exact: DuckDB computes the
    identical split/lower/count/order."""
    from siren_ray.stages.tokenizer import word_frequencies

    return word_frequencies(_docs(sf_dir), top_k=200)


def q_bpe_tokenize(sf_dir: str):
    """Full distributed BPE pipeline: corpus -> exact word-frequency
    table (one vocab-sized shuffle) -> driver merge loop on that BOUNDED
    table (the SentencePiece/HF recipe — merge decisions need only
    (word, count)) -> map-only tokenize with the model broadcast once
    and per-worker word caches. Rows-only (BPE is not SQL-expressible);
    merge determinism, parallelism invariance, and id-roundtrip are
    unit-tested (t:test_tokenizer)."""
    from siren_ray.stages.tokenizer import (bpe_tokenize, bpe_train,
                                            word_frequencies)

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    wf = word_frequencies(docs, top_k=20000)
    model = bpe_train(wf, vocab_size=512)
    return bpe_tokenize(docs, model, include_ids=False)


def q_uniform_sample(sf_dir: str):
    """Deterministic uniform sample of 200 events by md5(event_id)
    order (engine-independent pseudo-randomness, same contract as
    q_stratified_sample) — implemented as the sort-free global top-k in
    ASC mode, so only <= 200 rows per block ever move."""
    import hashlib as _hl

    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.relational import topk_global

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "event_type"])

    def _md5(t: pa.Table) -> pa.Table:
        hs = [_hl.md5(str(x).encode()).hexdigest()
              for x in t["event_id"].to_pylist()]
        return t.append_column("h", pa.array(hs, pa.string()))

    out = topk_global(ev.map_batches(_md5, batch_format="pyarrow"),
                      "h", 200, ascending=True, tie_col="event_id")
    return out.select(["event_id", "event_type"])


def q_distinct_per_group(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event type: per-batch unique-pair
    partials, one (type, user) groupby collapses duplicates across
    blocks, then a partial-combined count per type — the distinct set
    itself never materializes anywhere."""
    import pyarrow as pa
    import ray.data as rd

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])

    def _pairs(t: pa.Table) -> pa.Table:
        import numpy as np

        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        uid = np.asarray(t["user_id"], dtype=np.int64)
        fused = np.char.add(np.char.add(et.astype(str), "\x1f"),
                            uid.astype(str))
        _, idx = np.unique(fused, return_index=True)
        return pa.table({"event_type": pa.array(et[idx].astype(str)),
                         "user_id": pa.array(uid[idx], pa.int64())})

    distinct_pairs = (
        ev.map_batches(_pairs, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .count()
    )

    def _partial(t: pa.Table) -> pa.Table:
        import numpy as np

        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        vals, counts = np.unique(et.astype(str), return_counts=True)
        return pa.table({"event_type": pa.array(vals),
                         "n_users": pa.array(counts.astype("int64"))})

    import pandas as pd

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [df["event_type"].iloc[0]],
            "n_users": [int(df["n_users"].sum())],
        })

    return (
        distinct_pairs.map_batches(_partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(_merge, batch_format="pandas")
    )


def q_grouped_quantiles(sf_dir: str):
    """Per-source exact token-count quantiles (grouped quantile_disc):
    (group, value) histogram partials, two-key groupby bounded by
    groups x distinct values, per-group cumsum scan."""
    import pyarrow as pa

    from siren_ray.functions.textstats import token_count_ws
    from siren_ray.stages.relational import grouped_quantiles_int

    counts = _docs(sf_dir).map_batches(
        lambda t: pa.table({"source": t["source"],
                            "n_tokens": token_count_ws(t["text"])}),
        batch_format="pyarrow",
    )
    return grouped_quantiles_int(counts, "source", "n_tokens",
                                 [0.25, 0.5, 0.9])


def q_topk_global(sf_dir: str):
    """Global ORDER BY ... LIMIT k without a full sort: mergeable
    per-batch prune (<= k rows per block move), driver-side final merge.
    Top-100 orders by (o_totalprice DESC, o_orderkey ASC)."""
    import ray.data as rd

    from siren_ray.stages.relational import topk_global

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_totalprice"])
    return topk_global(orders, "o_totalprice", 100, tie_col="o_orderkey")


def q_left_join_agg(sf_dir: str):
    """Distributed LEFT equi-join + grouped count: per-customer order
    count INCLUDING zero-order customers (the null-preserving case an
    inner join can't express). Both sides shuffle; counts are of
    non-null right keys, so unmatched left rows contribute 0."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.relational import hash_join

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_orderkey"])
    joined = hash_join(cust, orders, on="c_custkey", right_on="o_custkey",
                       how="left", broadcast=False)

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            df.groupby("c_custkey", sort=False)["o_orderkey"]
            .count()  # pandas count skips NaN: unmatched rows add 0
            .reset_index(name="n_orders")
        )
        g["n_orders"] = g["n_orders"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": [df["c_custkey"].iloc[0]],
            "n_orders": [int(df["n_orders"].sum())],
        })

    return (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .map_groups(_merge, batch_format="pandas")
    )


def q_shipping_priority(sf_dir: str):
    """TPC-H-Q3-shaped composite pipeline (the 'could a reference user
    run their reporting here' demo): BUILDING-segment customers filter
    orders via a distributed semi-join, lineitems join the surviving
    orders via a distributed hash join, revenue aggregates with per-batch
    partial combiners, and the global top-10 merges without a full sort.
    Every stage is one of this engine's named operators."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.dedup import hash_semijoin
    from siren_ray.stages.relational import hash_join, topk_global

    cust_keys = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).map_batches(
        lambda t: pa.table({"id": t.filter(
            pa.compute.equal(t["c_mktsegment"], "BUILDING")
        )["c_custkey"]}),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    sel_orders = hash_semijoin(orders, cust_keys, "o_custkey")
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "revenue_c": pa.array(_cents(
                t["l_extendedprice"].to_numpy()
                * (1.0 - t["l_discount"].to_numpy())), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    joined = hash_join(li, sel_orders, on="l_orderkey",
                       right_on="o_orderkey", how="inner", broadcast=False)

    def _partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (
            df.groupby(["l_orderkey", "o_orderpriority"], sort=False)
            ["revenue_c"].sum().reset_index(name="revenue_c")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": [df["l_orderkey"].iloc[0]],
            "o_orderpriority": [df["o_orderpriority"].iloc[0]],
            "revenue_c": [int(df["revenue_c"].sum())],
        })

    per_order = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .map_groups(_merge, batch_format="pandas")
    )
    return topk_global(per_order, "revenue_c", 10, tie_col="l_orderkey")


def q_crawl_rank_seeds(sf_dir: str):
    """The adaptive-recrawl loop (north-rule frontier prioritization):
    crawl -> PageRank over the discovered link graph -> seeds
    reprioritized by host-level rank mass. Returns the reprioritized
    seeds table (conformance of the recrawl itself is covered in
    t:test_graph). Rows-only: iterative float fixpoint, not SQL."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from siren_ray.corpus import ensure_corpus
    from siren_ray.pipelines.frontier import CrawlConfig, run_crawl
    from siren_ray.stages.graph import crawl_pagerank, reprioritize_seeds

    sf = min(_sf_of(sf_dir), 0.01)
    corpus = ensure_corpus(sf)
    out = f"/tmp/siren_ray_runs/rank_seeds_sf{sf:g}"
    res = run_crawl(CrawlConfig(
        corpus_dir=corpus, out_dir=out, budget_per_round=5000,
        round_ms=100_000, max_rounds=3, max_depth=4,
        fetch_concurrency=4,
    ))
    ranks = crawl_pagerank(rd.read_parquet(res.extracted_path))
    seeds = pq.read_table(os.path.join(corpus, "seeds.parquet"))
    return reprioritize_seeds(seeds, ranks, by="host").to_pandas()


def q_contamination(sf_dir: str):
    """Benchmark decontamination screen: per-document sliding word
    3-gram overlap counts against a benchmark set (here: the src0
    slice). Benchmark gram fingerprints broadcast once; the corpus side
    is map-only — text never shuffles. Exact int64 counts."""
    import pyarrow.compute as pc
    import ray.data as rd

    from siren_ray.stages.lines import ngram_contamination

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "source", "text"])
    bench = docs.map_batches(
        lambda t: t.filter(pc.equal(t["source"], "src0"))
        .select(["doc_id", "text"]),
        batch_format="pyarrow")
    return ngram_contamination(docs, bench, n=3)


_BM25_QUERIES = ["spark join", "window agg stream", "customer order"]


def q_bm25_topk(sf_dir: str):
    """BM25 ranked retrieval: top-10 doc ids per keyword query in one
    streaming pass (no inverted index). Ids-only output like knn_brute,
    so float ordering is oracle-comparable; ties break on doc_id."""
    import ray.data as rd

    from siren_ray.stages.retrieval import bm25_topk

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return bm25_topk(docs, _BM25_QUERIES, k=10)


def q_warc_wet(sf_dir: str):
    """WARC -> WET extraction composite (the Common Crawl wet-file
    shape): serialize the synthetic pages corpus into per-record-gzip
    WARC shards, read them back, charset-decode (stages/maincontent.py
    WHATWG chain), and main-content-extract into WET-style records
    (url, title, text, n_chars). Before returning, the WARC-ingested
    extraction is asserted byte-identical to extracting the same pages
    directly — the archive hop neither loses nor alters training text.
    Rows-only: HTML heuristics are not SQL-expressible; the component
    stages carry their own oracles/goldens (q:warc_roundtrip,
    q:charset_decode, t:test_extract main-content goldens)."""
    import shutil
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from siren_ray.corpus import ensure_corpus
    from siren_ray.sources.warc import read_warc, write_warc_shards
    from siren_ray.stages.maincontent import (decode_html_batch,
                                              main_content_batch)

    corpus = ensure_corpus(min(_sf_of(sf_dir), 0.01))
    pages = rd.read_parquet(os.path.join(corpus, "pages"),
                            columns=["url", "html"])

    def _stamp(t: pa.Table) -> pa.Table:
        ts = pa.array([datetime(2024, 1, 1, tzinfo=timezone.utc)]
                      * t.num_rows).cast(pa.timestamp("us"))
        return t.append_column("warc_ts", ts)

    out_dir = "/tmp/siren_ray_runs/warc_wet_q"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    write_warc_shards(pages.map_batches(_stamp, batch_format="pyarrow"),
                      out_dir)

    def _decode(t: pa.Table) -> pa.Table:
        d = decode_html_batch(t, payload_col="html", out_col="html_text")
        return pa.table({"url": d["url"], "html": d["html_text"]})

    def _wet(t: pa.Table) -> pa.Table:
        m = main_content_batch(t)
        return m.append_column(
            "n_chars", pc.utf8_length(m["main_text"]).cast(pa.int64()))

    got = (read_warc(out_dir).map_batches(_decode, batch_format="pyarrow")
           .map_batches(_wet, batch_format="pyarrow")
           .select_columns(["url", "title", "main_text", "n_chars"])
           .to_pandas().sort_values("url").reset_index(drop=True))

    # archive-hop identity: direct extraction of the same pages
    direct = (pages.map_batches(_wet, batch_format="pyarrow")
              .select_columns(["url", "title", "main_text", "n_chars"])
              .to_pandas().sort_values("url").reset_index(drop=True))
    assert got.equals(direct), "WARC hop altered extracted text"
    shutil.rmtree(out_dir, ignore_errors=True)
    return got


def q_bloom_ingest(sf_dir: str):
    """Cross-snapshot ingest screen via a distributed Bloom filter
    (stages/bloom.py): build the filter over the base corpus texts
    (doc_id even), then keep only increment docs (doc_id odd) whose
    text is DEFINITELY new. No false negatives ever (a known text can
    never survive); at these parameters (2^24 bits, k=4, ~2.5k base
    texts) the analytic false-positive mass over the whole increment is
    ~1e-10, and the query asserts the screen equals the exact NOT-IN
    result before returning — a genuine false positive would surface as
    a query error, never a silent mismatch. Oracle = the NOT-IN SQL."""
    import pyarrow as pa

    from siren_ray.stages.bloom import bloom_screen, build_bloom

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def _half(parity: int):
        def _f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == parity))
        return _f

    base = docs.map_batches(_half(0), batch_format="pyarrow")
    inc = docs.map_batches(_half(1), batch_format="pyarrow")
    bloom = build_bloom(base, "text", n_bits_log2=24, k=4)
    got = (bloom_screen(inc, bloom, "text", keep="new")
           .select_columns(["doc_id"]).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # exact-screen equality: proves zero FPs on THIS input, so the
    # DuckDB NOT-IN oracle is safe by construction (cdx_merge idiom)
    base_texts = set(base.select_columns(["text"]).to_pandas()["text"])
    inc_df = inc.to_pandas()
    exact = (inc_df.loc[~inc_df["text"].isin(base_texts), ["doc_id"]]
             .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(exact), "bloom screen diverged from exact NOT-IN"
    return got


_INDEX_TERMS = ["spark", "join", "merge", "scan"]


def q_inverted_index(sf_dir: str):
    """Materialized inverted index (stages/invindex.py): explode the
    documents table into exact (word, doc_id, tf) postings written
    hive-partitioned on hash64(word) % 32, then look up a fixed term
    set reading ONLY those terms' bucket directories with the word
    filter pushed into the Parquet scan. Bucket pruning is asserted
    before returning (buckets_read < num_buckets). Oracle = the same
    postings stated by a split/unnest GROUP BY in DuckDB."""
    import shutil
    import tempfile

    from siren_ray.stages.invindex import (build_inverted_index,
                                           lookup_postings)

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    out = tempfile.mkdtemp(prefix="inv_idx_")
    try:
        idx = build_inverted_index(docs, out, num_buckets=32)
        ds, info = lookup_postings(idx, _INDEX_TERMS)
        assert 0 < info["buckets_read"] < info["num_buckets"], info
        return ds.to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


_CHUNK_RE = r'((?:\S+ ){2}\S+) '  # every 3 words -> one "line"


def q_dedup_lines(sf_dir: str):
    """CCNet-style corpus boilerplate removal: drop every line occurring
    >= 5 times across the corpus (ALL occurrences), keep the rest in
    document order. The documents table has no newlines, so the query
    first derives lines by chunking every 3 words (the identical regex
    runs in the DuckDB oracle). Two streaming passes; only
    (line_hash, count) pairs shuffle; the frequent set broadcasts."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from siren_ray.stages.lines import remove_frequent_lines

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def _chunk(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pc.replace_substring_regex(
                t["text"], pattern=_CHUNK_RE, replacement="\\1\n"),
        })

    chunked = docs.map_batches(_chunk, batch_format="pyarrow")
    return remove_frequent_lines(chunked, text_col="text", min_count=5)


def q_word_stats(sf_dir: str):
    """Per-document word-repetition stats (Gopher-rules family):
    exact integer (n_words, n_distinct_words, top_word_count) — the
    inputs to repetition-based quality filters. Map-only, no shuffle."""
    import ray.data as rd

    from siren_ray.stages.lines import word_stats

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return word_stats(docs, id_col="doc_id", text_col="text")


def q_doc_freq(sf_dir: str):
    """Corpus document-frequency (word -> #docs containing it), the IDF
    denominator. Per-batch (doc, word) dedup + partial counts; the one
    shuffle is vocabulary-sized, not corpus-sized."""
    import ray.data as rd

    from siren_ray.stages.lines import doc_frequency

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return doc_frequency(docs, text_col="text")


def q_dataset_split(sf_dir: str):
    """Deterministic leakage-safe train/val/test assignment
    (relational.py:dataset_split): split membership is a pure function
    of md5(doc_id) bucketed mod 10000 against 90/5/5 cumulative
    thresholds, so re-runs and incremental ingests can never move a row
    across the holdout boundary. Map-only; exact-oracle-checkable
    (DuckDB computes the identical md5 arithmetic)."""
    from siren_ray.stages.relational import dataset_split

    return dataset_split(_docs(sf_dir).select_columns(["doc_id"]))


def q_domain_cap(sf_dir: str):
    """C4-style per-domain document cap (relational.py:group_cap): at
    most 10 docs per source, chosen in md5(doc_id) pseudo-random order
    — the balancing step that stops giant domains from dominating a
    training mix. Rides grouped_topk (per-batch prune before the one
    hash shuffle)."""
    from siren_ray.stages.relational import group_cap

    return group_cap(_docs(sf_dir).select_columns(["doc_id", "source"]),
                     group_col="source", id_col="doc_id", k=10)


def q_shuffle_shards(sf_dir: str):
    """Deterministic training-export shuffle
    (relational.py:shuffle_shards): md5-route every doc to one of 8
    internally-shuffled shards with an explicit within-shard position —
    the reproducible global-permutation layout a training exporter
    writes. ONE hash shuffle; positions are oracle-exact
    (row_number over the identical md5 order)."""
    from siren_ray.stages.relational import shuffle_shards

    return shuffle_shards(_docs(sf_dir).select_columns(["doc_id"]),
                          num_shards=8)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic deduplication (dedup.py:semantic_dedup):
    distributed spherical k-means -> within-cluster chunked cosine
    pairs -> keep the least-centroid-similar member per duplicate
    component -> distributed anti-join. Rows-only: cluster geometry
    depends on the seeded k-means, not SQL-expressible; the keep-rule
    and planted-duplicate recall are unit-tested
    (tests/test_dedup.py-family)."""
    import ray.data as rd

    from siren_ray.stages.dedup import semantic_dedup

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    out = semantic_dedup(ds, n_clusters=8, threshold=0.98,
                         kmeans_iters=6)
    return out.select_columns(["vec_id"])


def q_remove_spans(sf_dir: str):
    """Duplicated-passage REMOVAL (lines.py:remove_duplicate_spans, the
    Lee et al. ExactSubstr family): delete every word covered by a
    10-gram occurring in >= 2 distinct documents and rebuild the text.
    Rows-only: the text surgery has no SQL equivalent; the coverage
    arithmetic and round-trip behavior are unit-tested
    (tests/test_lines.py)."""
    from siren_ray.stages.lines import remove_duplicate_spans

    return remove_duplicate_spans(
        _docs(sf_dir).select_columns(["doc_id", "text"]), n=10)


def q_corpus_pipeline(sf_dir: str):
    """Flagship crawl->training-corpus composite — the engine's whole
    north-star story as ONE pipeline: frontier crawl (politeness +
    seen-set) -> extracted text -> language ID gate -> quality gate ->
    C4-style line/page cleaning -> zlib repetition gate ->
    corpus-wide first-occurrence paragraph dedup -> Jaccard-verified
    MinHash near-dup removal -> whitespace token count -> fixed-length
    sequence packing. Returns the per-stage lineage table (stage,
    rows) a production run would emit for run accounting — every stage
    is individually oracle-/conformance-checked elsewhere; this query
    evidences the INTEGRATION. Rows-only (the chain embeds the crawl
    and MinHash, not SQL-expressible)."""
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.functions.packing import pack_sequences
    from siren_ray.functions.textstats import (
        lang_id_batch, quality_batch, token_count_ws,
    )
    from siren_ray.stages.dedup import remove_near_duplicates
    from siren_ray.stages.lines import dedup_paragraphs
    from siren_ray.util import hash_strings

    import pyarrow.dataset as pads

    from siren_ray.corpus import ensure_corpus
    from siren_ray.pipelines.frontier import CrawlConfig, run_crawl

    # Run the crawl and hand the corpus stages its PARQUET output —
    # never a driver-side Arrow table (VERDICT r4 #2: q_crawl's
    # return-a-table contract is a harness requirement; the composite's
    # intermediate must stream). The crawl itself streams per round.
    sf = min(_sf_of(sf_dir), 0.01)
    res = run_crawl(CrawlConfig(
        corpus_dir=ensure_corpus(sf),
        out_dir=f"/tmp/siren_ray_runs/entry_corpus_crawl_sf{sf:g}",
        budget_per_round=5000, round_ms=100_000, max_rounds=12,
        max_depth=6, fetch_concurrency=4,
        ckpt_every=0,  # no per-round seen checkpoints inside a bench line
    ))
    # metadata-only count: no row funnel
    crawled_n = pads.dataset(res.extracted_path).count_rows()
    lineage = [("crawled", crawled_n)]

    def _docs_of(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        keep = pc.and_(t["found"], t["parse_ok"])
        kept = t.filter(pc.fill_null(keep, False))
        # 43-bit ids: dedup_paragraphs packs (doc_id << 20 | para_idx)
        # into an int64, so ids must be non-negative < 2^43. A masked
        # url-hash is collision-safe to ~millions of docs; a production
        # run at larger cardinality would assign dense ids instead.
        ids = hash_strings(
            kept["url"].to_numpy(zero_copy_only=False)).view("int64") \
            & ((1 << 43) - 1)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": kept["text"].combine_chunks().cast(pa.string()),
        })

    docs = (
        rd.read_parquet(res.extracted_path,
                        columns=["url", "found", "parse_ok", "text"])
        .map_batches(_docs_of, batch_format="pyarrow")
        .repartition(8).materialize()
    )
    lineage.append(("extracted", docs.count()))

    def _lang_gate(t: pa.Table) -> pa.Table:
        lt = lang_id_batch(t)
        import pyarrow.compute as pc

        return lt.filter(pc.equal(lt["lang_pred"], "en")).select(
            ["doc_id", "text"])

    def _quality_gate(t: pa.Table) -> pa.Table:
        qt = quality_batch(t)
        return qt.filter(qt["quality_ok"]).select(["doc_id", "text"])

    gated = (docs.map_batches(_lang_gate, batch_format="pyarrow")
             .map_batches(_quality_gate, batch_format="pyarrow")
             .materialize())
    lineage.append(("lang_quality_gated", gated.count()))

    from siren_ray.functions.c4 import c4_clean_batch
    from siren_ray.functions.textstats import compression_ratio_batch

    def _zlib_gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        zt = compression_ratio_batch(t)
        keep = pc.greater(zt["zlib_ratio"], 0.2)  # drop loop-y text
        return zt.filter(pc.fill_null(keep, False)).select(
            ["doc_id", "text"])

    cleaned = (gated.map_batches(c4_clean_batch, batch_format="pyarrow")
               .map_batches(_zlib_gate, batch_format="pyarrow")
               .materialize())
    lineage.append(("c4_repetition_gated", cleaned.count()))

    paradeduped = dedup_paragraphs(cleaned,
                                   num_partitions=16).materialize()
    lineage.append(("paragraph_deduped", paradeduped.count()))

    neardeduped = remove_near_duplicates(
        paradeduped, "doc_id", num_partitions=16).materialize()
    lineage.append(("neardup_removed", neardeduped.count()))

    toks = neardeduped.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "n_tokens": token_count_ws(t["text"])}),
        batch_format="pyarrow")
    packed = pack_sequences(toks, seq_len=512)
    lineage.append(("packed_sequences", packed.count()))

    return pa.table({
        "stage": pa.array([s for s, _ in lineage], pa.string()),
        "rows": pa.array([int(r) for _, r in lineage], pa.int64()),
    })


def q_url_blocklist(sf_dir: str):
    """UT1-style URL blocklist filtering
    (functions/urlnorm.py:blocklist_filter): drop URLs whose
    registrable domain (PSL eTLD+1 — subdomains of a blocked domain
    are blocked too) is listed, or whose path contains a blocked term.
    URLs are synthesized deterministically from doc_id over four fixed
    hosts covering both PSL depths; the DuckDB oracle replays the
    construction and states each literal host's registrable domain
    directly — exact."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from siren_ray.functions.urlnorm import blocklist_filter

    HOSTS = ["news.example.co.uk", "ads.tracker.com",
             "blog.example.com", "stats.co.uk"]

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        urls = []
        for d in ids:
            tail = ("-casino-night"
                    if int(hashlib.md5(str(d).encode()).hexdigest()[:8],
                           16) % 7 == 0 else "-news")
            urls.append(f"https://{HOSTS[d % 4]}/p/{d}{tail}")
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string())})

    ds = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _mk, batch_format="pyarrow")
    return blocklist_filter(
        ds, blocked_domains=("tracker.com", "stats.co.uk"),
        blocked_terms=("casino",))


def _mk_surt_urls(t):
    """Deterministic messy-URL synth shared by the SURT/CDX queries:
    four host classes (www+case, deep subdomain, explicit port,
    multi-label public suffix), unsorted query + tracking param on
    every doc_id % 3 == 0 row — each canonicalization rule is hit."""
    import numpy as np
    import pyarrow as pa

    ids = np.asarray(t["doc_id"], dtype=np.int64)
    hosts = ["www.Example.com", "news.site.org", "example.com:8080",
             "br.example.co.uk"]
    schemes = ["https", "https", "http", "https"]
    urls = []
    for d in ids:
        h = int(d) % 4
        q = "?b=9&utm_source=x&a=1" if d % 3 == 0 else ""
        urls.append(f"{schemes[h]}://{hosts[h]}/p/{d}{q}")
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "url": pa.array(urls, pa.string())})


def q_surt_keys(sf_dir: str):
    """SURT keys (stages/cdxindex.py:surt_keys) — Common Crawl's
    sort-friendly URL transform: canonicalize (case, default ports,
    tracking params, query sort), strip one leading www., reverse host
    labels, re-attach a surviving port, ')' before the path. The
    DuckDB oracle replays the deterministic URL construction and
    states each host class's SURT directly — exact. The reference has
    no index artifact at all; SURT is what makes per-domain lookups a
    key-range scan at 10^10 URLs."""
    from siren_ray.stages.cdxindex import surt_keys

    def _key(t):
        return t.append_column("surt_key", surt_keys(t["url"]))

    return (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(_mk_surt_urls, batch_format="pyarrow")
            .map_batches(_key, batch_format="pyarrow"))


def q_cdx_prefix_scan(sf_dir: str):
    """CDX-style sorted URL index + range-pruned domain lookup
    (stages/cdxindex.py:build_cdx_index/cdx_prefix_scan): one global
    sort by SURT key into Parquet shards, per-file min/max manifest
    from the footers, then a prefix scan for 'com,example)' that reads
    only intersecting shards with the filter pushed into the Parquet
    scan. Note the port class 'com,example:8080)…' sorts OUTSIDE the
    ')'-terminated prefix — the oracle states the exact surviving
    class. Oracle = same construction + LIKE prefix."""
    import shutil
    import tempfile

    from siren_ray.stages.cdxindex import build_cdx_index, cdx_prefix_scan

    urls = (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(_mk_surt_urls, batch_format="pyarrow"))
    out = tempfile.mkdtemp(prefix="cdx_idx_")
    try:
        manifest = build_cdx_index(urls, out, url_col="url",
                                   carry_cols=("doc_id",), num_shards=8)
        hits, _, _ = cdx_prefix_scan(manifest, "com,example)")
        return hits.select_columns(
            ["doc_id", "url", "surt_key"]).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_cdx_merge(sf_dir: str):
    """Incremental CDX maintenance (stages/cdxindex.py:merge_cdx_index
    — the LSM-style loop a continuously-crawling index needs): build on
    the even doc_ids, merge the odd ones as a delta (only the delta
    shuffles; base shards rewrite in place, untouched shards carry
    over), then prefix-scan the merged index. The scan result is
    asserted equal to a from-scratch full build before returning —
    rows-only for the driver, exact-equality inside."""
    import shutil
    import tempfile

    from siren_ray.stages.cdxindex import (build_cdx_index,
                                           cdx_prefix_scan,
                                           merge_cdx_index)

    urls = (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(_mk_surt_urls, batch_format="pyarrow")
            .materialize())  # consumed by three builds

    def _half(parity):
        import pyarrow as pa

        def f(t: pa.Table, p=parity) -> pa.Table:
            import numpy as np

            ids = np.asarray(t["doc_id"], dtype=np.int64)
            return t.filter(pa.array(ids % 2 == p))

        return urls.map_batches(f, batch_format="pyarrow")

    dirs = [tempfile.mkdtemp(prefix=f"cdx_m_{i}_") for i in range(3)]
    try:
        full = build_cdx_index(urls, dirs[0], url_col="url",
                               carry_cols=("doc_id",), num_shards=8)
        base = build_cdx_index(_half(0), dirs[1], url_col="url",
                               carry_cols=("doc_id",), num_shards=8)
        merged = merge_cdx_index(base, _half(1), dirs[2],
                                 url_col="url", carry_cols=("doc_id",))
        prefix = "com,example)"
        a, _, _ = cdx_prefix_scan(merged, prefix)
        b, _, _ = cdx_prefix_scan(full, prefix)
        cols = ["doc_id", "url", "surt_key"]
        pa_ = a.select_columns(cols).to_pandas().sort_values(
            cols).reset_index(drop=True)
        pb = b.select_columns(cols).to_pandas().sort_values(
            cols).reset_index(drop=True)
        if not pa_.equals(pb):
            raise AssertionError("merged index scan != full rebuild")
        return pa_
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


def q_c4_clean(sf_dir: str):
    """C4-style page cleaning (functions/c4.py — Raffel et al. 2020
    line/page screens): terminal-punctuation + min-words + javascript
    line filters, lorem-ipsum / curly-brace / min-sentences page
    screens, all vectorized Arrow kernels with the RE2 patterns shared
    VERBATIM with the oracle. The query synthesizes multi-line pages
    deterministically (text thirds with ./!/? endings, a javascript
    boilerplate line and a too-short line injected everywhere, a
    curly-brace line when doc_id%7==0 and a Lorem Ipsum line when
    doc_id%11==3) so every rule provably fires; DuckDB replays the
    identical construction — exact oracle."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.functions.c4 import c4_clean_batch

    JS_LINE = ("Please enable javascript to continue reading "
               "this page now.")
    BRACE_LINE = "code sample with braces { inside this line."
    LOREM_LINE = "Filler Lorem Ipsum text appears on this page."

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        texts = t["text"].combine_chunks().to_numpy(zero_copy_only=False)
        out = []
        for d, tx in zip(ids, texts):
            k = len(tx) // 3
            lines = [tx[:k] + ".", JS_LINE, "tiny line.",
                     tx[k:2 * k] + "!", tx[2 * k:] + "?"]
            if d % 7 == 0:
                lines.append(BRACE_LINE)
            if d % 11 == 3:
                lines.append(LOREM_LINE)
            out.append("\n".join(lines))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(out, pa.string())})

    docs = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _mk, batch_format="pyarrow")
    return docs.map_batches(c4_clean_batch, batch_format="pyarrow")


def q_dedup_paragraphs(sf_dir: str):
    """Corpus-wide first-occurrence paragraph dedup
    (lines.py:dedup_paragraphs, the RefinedWeb/Dolma recipe): a
    paragraph survives only at its globally-first (doc_id, idx)
    position; docs are rebuilt from kept paragraphs. The query
    synthesizes multi-paragraph docs deterministically (text thirds
    joined by blank lines, the middle third replaced by a fixed
    boilerplate paragraph when md5(doc_id)%4==0) so exactly one
    boilerplate copy survives; DuckDB replays the identical
    construction and dedups with a window function — exact oracle."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.lines import dedup_paragraphs

    BOILER = "subscribe to our newsletter for daily updates"

    def _mk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        texts = t["text"].combine_chunks().to_numpy(zero_copy_only=False)
        out = []
        for d, tx in zip(ids, texts):
            k = len(tx) // 3
            boiler = int(hashlib.md5(str(d).encode()).hexdigest()[:8],
                         16) % 4 == 0
            mid = BOILER if boiler else tx[k:2 * k]
            out.append(tx[:k] + "\n\n" + mid + "\n\n" + tx[2 * k:])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(out, pa.string())})

    docs = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _mk, batch_format="pyarrow")
    return dedup_paragraphs(docs, num_partitions=16)


def q_redirect_resolve(sf_dir: str):
    """Redirect-chain canonicalization (graph.py:resolve_chains):
    every URL in an alias-edge table resolved to its chain end by
    distributed pointer doubling — ceil(log2 k) co-partitioned rounds
    for length-k chains, shipping only (owner, pointer) pairs for
    still-unfinished nodes. The alias forest is derived
    deterministically from doc_id (parent (d-1)//3, terminal cut at
    md5(d)%5==0), so the DuckDB oracle's recursive CTE walks the
    identical graph. Live-socket sibling: stages/redirects.py."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from siren_ray.stages.graph import resolve_chains

    def _edges(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"], dtype=np.int64)
        cut = np.array([
            int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) % 5 == 0
            for x in d], dtype=bool)
        term = (d == 0) | cut
        src = np.array([f"https://ex.org/d{x}" for x in d], dtype=object)
        dst = np.array([
            None if t_ else f"https://ex.org/d{(x - 1) // 3}"
            for x, t_ in zip(d, term)], dtype=object)
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string())})

    edges = _docs(sf_dir).select_columns(["doc_id"]).map_batches(
        _edges, batch_format="pyarrow")
    return resolve_chains(edges, num_partitions=16)


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------

def entry() -> Any:
    """Flagship: full crawl (frontier + politeness + fetch + extract) on
    the sf0.001 corpus; returns extracted rows."""
    return q_crawl("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "date_window": q_date_window,
        "keyword_or": q_keyword_or,
        "keyword_exclude": q_keyword_exclude,
        "dedup_first_wins": q_dedup_first_wins,
        "dedup_exact_text": q_dedup_exact_text,
        "flatten_union": q_flatten_union,
        "count_by_group": q_count_by_group,
        "hash_partition_counts": q_hash_partition_counts,
        "projection_serialize": q_projection_serialize,
        "serialize_dates": q_serialize_dates,
        "token_count": q_token_count,
        "quality_filter": q_quality_filter,
        "fingerprint": q_fingerprint,
        "pagination_expand": q_pagination_expand,
        "window_agg": q_window_agg,
        "lineitem_pricing": q_lineitem_pricing,
        "broadcast_join": q_broadcast_join,
        "hash_join": q_hash_join,
        "knn_brute": q_knn_brute,
        "toi_boolean": q_toi_boolean,
        "connected_components": q_connected_components,
        "cosine_pairs": q_cosine_pairs,
        "sessionize": q_sessionize,
        "grouped_topk": q_grouped_topk,
        "asof_join": q_asof_join,
        "stratified_sample": q_stratified_sample,
        "range_join": q_range_join,
        "antijoin": q_antijoin,
        "semijoin": q_semijoin,
        "rolling_sum": q_rolling_sum,
        "pivot_counts": q_pivot_counts,
        "exact_quantiles": q_exact_quantiles,
        "topk_global": q_topk_global,
        "grouped_quantiles": q_grouped_quantiles,
        "uniform_sample": q_uniform_sample,
        "distinct_per_group": q_distinct_per_group,
        "left_join_agg": q_left_join_agg,
        "shipping_priority": q_shipping_priority,
        "dedup_lines": q_dedup_lines,
        "word_stats": q_word_stats,
        "doc_freq": q_doc_freq,
        "bm25_topk": q_bm25_topk,
        "inverted_index": q_inverted_index,
        "bloom_ingest": q_bloom_ingest,
        "warc_wet": q_warc_wet,
        "contamination": q_contamination,
        "snapshot_diff": q_snapshot_diff,
        "curation_report": q_curation_report,
        "pii_redact": q_pii_redact,
        "normalized_dedup": q_normalized_dedup,
        "warc_roundtrip": q_warc_roundtrip,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "warc_to_corpus": q_warc_to_corpus,
        "chunk_documents": q_chunk_documents,
        "chunk_dedup": q_chunk_dedup,
        "chunk_dedup_fixed": q_chunk_dedup_fixed,
        "compact_shards": q_compact_shards,
        "compression_ratio": q_compression_ratio,
        "incremental_ingest": q_incremental_ingest,
        # rows-only (non-SQL-expressible)
        "crawl": q_crawl,
        "main_content": q_main_content,
        "html_markdown": q_html_markdown,
        "anchor_text": q_anchor_text,
        "charset_decode": q_charset_decode,
        "sitemap": q_sitemap,
        "feed": q_feed,
        "normalize_text": q_normalize_text,
        "soft404": q_soft404,
        "registrable_domain": q_registrable_domain,
        "revalidate": q_revalidate,
        "robots_rules": q_robots_rules,
        "url_traps": q_url_traps,
        "minhash_pairs": q_minhash_pairs,
        "neardup_removed": q_neardup_removed,
        "simhash": q_simhash,
        "simhash_neardup": q_simhash_neardup,
        "simhash_neardup_removed": q_simhash_neardup_removed,
        "hamming_pairs_synth": q_hamming_pairs_synth,
        "embedding_neardup": q_embedding_neardup,
        "knn_ivf": q_knn_ivf,
        "knn_pq": q_knn_pq,
        "kmeans_clusters": q_kmeans_clusters,
        "lang_id": q_lang_id,
        "ocr_tiles": q_ocr_tiles,
        "multimodal_frames": q_multimodal_frames,
        "embedding_neardup_removed": q_embedding_neardup_removed,
        "approx_distinct": q_approx_distinct,
        "lm_perplexity": q_lm_perplexity,
        "dsir_select": q_dsir_select,
        "quality_classifier": q_quality_classifier,
        "repetition_stats": q_repetition_stats,
        "gopher_rules": q_gopher_rules,
        "dup_ngrams": q_dup_ngrams,
        "pack_sequences": q_pack_sequences,
        "text_embed_neardup": q_text_embed_neardup,
        "full_outer_join": q_full_outer_join,
        "grouped_agg": q_grouped_agg,
        "window_ops": q_window_ops,
        "weighted_sample": q_weighted_sample,
        "adaptive_quality_gate": q_adaptive_quality_gate,
        "data_mixture": q_data_mixture,
        "dataset_split": q_dataset_split,
        "domain_cap": q_domain_cap,
        "shuffle_shards": q_shuffle_shards,
        "semantic_dedup": q_semantic_dedup,
        "remove_spans": q_remove_spans,
        "duplicate_passages": q_duplicate_passages,
        "jaccard_neardup": q_jaccard_neardup,
        "incremental_neardup": q_incremental_neardup,
        "url_canonicalize": q_url_canonicalize,
        "pagerank": q_pagerank,
        "hits": q_hits,
        "redirect_resolve": q_redirect_resolve,
        "c4_clean": q_c4_clean,
        "meta_tags": q_meta_tags,
        "robots_meta": q_robots_meta,
        "follow_edges": q_follow_edges,
        "xrobots_header": q_xrobots_header,
        "maincontent_golden": q_maincontent_golden,
        "recrawl_plan": q_recrawl_plan,
        "url_templates": q_url_templates,
        "markdown_golden": q_markdown_golden,
        "anchor_golden": q_anchor_golden,
        "mimetype_golden": q_mimetype_golden,
        "canonical_golden": q_canonical_golden,
        "langid_golden": q_langid_golden,
        "cdx_merge": q_cdx_merge,
        "dedup_paragraphs": q_dedup_paragraphs,
        "url_blocklist": q_url_blocklist,
        "surt_keys": q_surt_keys,
        "cdx_prefix_scan": q_cdx_prefix_scan,
        "corpus_pipeline": q_corpus_pipeline,
        "bpe_word_freq": q_bpe_word_freq,
        "bpe_tokenize": q_bpe_tokenize,
        "crawl_rank_seeds": q_crawl_rank_seeds,
        "mimetype_counts": q_mimetype_counts,
        "token_quantiles": q_token_quantiles,
        "heavy_hitters": q_heavy_hitters,
        "scraper_mirror": q_scraper_mirror,
        "scraper_ht": q_scraper_ht,
        "scraper_tg_epaper": q_scraper_tg_epaper,
        "scraper_newsminute": q_scraper_newsminute,
        "scraper_tg_online": q_scraper_tg_online,
        "scraper_readwhere": q_scraper_readwhere,
        "scraper_readwhere_ocr": q_scraper_readwhere_ocr,
    }


def oracle_sql() -> dict[str, str]:
    # RE2 pattern strings shared VERBATIM with the engine kernels
    # (functions/pii.py) — Arrow and DuckDB both compile them with RE2,
    # so redaction parity is by construction, not by reimplementation.
    from siren_ray.functions.c4 import (C4_JS_SUBSTR, C4_LOREM_SUBSTR,
                                        C4_SENTENCE_RE, C4_TERMINAL_RE,
                                        C4_WORD_RE)
    from siren_ray.functions.pii import (EMAIL_RE, IPV4_RE, NORM_STRIP_RE,
                                         PHONE_RE)
    from siren_ray.functions.urlnorm import (TEMPLATE_HEX_RE,
                                             TEMPLATE_NUM_RE,
                                             TEMPLATE_QUERY_RE)

    return {
        "date_window": (
            "SELECT event_id, ts FROM events "
            "WHERE ts > TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'"
        ),
        "keyword_or": (
            "SELECT doc_id, source FROM documents "
            "WHERE contains(lower(text), 'spark') "
            "OR contains(lower(text), 'window')"
        ),
        "keyword_exclude": (
            "SELECT doc_id, source FROM documents "
            "WHERE (contains(lower(text), 'spark') "
            "OR contains(lower(text), 'window')) "
            "AND NOT contains(lower(text), 'merge')"
        ),
        "dedup_first_wins": (
            "SELECT min(doc_id) AS doc_id, source FROM documents "
            "GROUP BY source"
        ),
        "dedup_exact_text": (
            "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"
        ),
        "flatten_union": (
            "SELECT doc_id FROM documents WHERE contains(lower(text),'spark') "
            "UNION ALL "
            "SELECT doc_id FROM documents WHERE contains(lower(text),'join')"
        ),
        "count_by_group": (
            "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
        ),
        "hash_partition_counts": (
            "SELECT user_id % 16 AS bucket, count(*) AS n FROM events "
            "GROUP BY 1"
        ),
        "projection_serialize": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, source, "
            "'- no data -' AS thumbnail FROM documents"
        ),
        "serialize_dates": (
            "SELECT event_id, strftime(ts, '%Y-%m-%d') AS ts_day, "
            "CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events"
        ),
        "token_count": (
            "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens "
            "FROM documents"
        ),
        "quality_filter": (
            "SELECT doc_id FROM documents WHERE len(text) >= 20 "
            "AND (CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END) >= 5 "
            "AND CAST(len(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)"
            " / greatest(len(text), 1) <= 0.3"
        ),
        "fingerprint": (
            "SELECT doc_id, md5(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
            " AS fp FROM documents"
        ),
        "charset_decode": (
            "SELECT doc_id, CASE WHEN doc_id % 3 = 2 THEN "
            "'<meta charset=''latin-1''>' || coalesce(text, '') "
            "ELSE coalesce(text, '') END AS html_text, "
            "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'utf-8' "
            "WHEN 1 THEN 'utf-16-le' ELSE 'latin-1' END AS encoding "
            "FROM documents"
        ),
        "sitemap": (
            "SELECT 'https://' || source || '.example.org/p/' || "
            "CAST(doc_id AS VARCHAR) AS loc, '2024-01-' || "
            "lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod "
            "FROM documents"
        ),
        "feed": (
            "SELECT 'https://' || source || '.example.org/a/' || "
            "CAST(doc_id AS VARCHAR) AS link, "
            "'doc ' || CAST(doc_id AS VARCHAR) AS title, "
            "CAST(1704067200 + (doc_id % 28) * 86400 + "
            "(doc_id % 24) * 3600 AS BIGINT) AS published_ts, "
            "CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END "
            "AS kind FROM documents"
        ),
        "normalize_text": (
            "SELECT doc_id, trim(regexp_replace(regexp_replace("
            "nfc_normalize(coalesce(text, '') || "
            "CASE CAST(doc_id % 3 AS INT) "
            "WHEN 0 THEN ' e' || chr(769) || chr(9) || chr(9) || 'q' "
            "WHEN 1 THEN chr(8203) || ' x' || chr(1) || chr(10) || "
            "chr(10) || 'y ' ELSE '' END), "
            "'[\\x00-\\x08\\x0e-\\x1f\\x7f' || chr(8203) || chr(8204) "
            "|| chr(8205) || chr(65279) || ']', '', 'g'), "
            "'[ \\t\\n\\r\\f\\v]+', ' ', 'g'), ' ') AS norm_text "
            "FROM documents"
        ),
        "soft404": (
            "WITH d AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INT) "
            "WHEN 0 THEN 'Sorry, error 404 - the page could not be "
            "found.' WHEN 1 THEN 'ok' WHEN 3 THEN coalesce(text, '') "
            "|| ' This article is no longer available.' "
            "ELSE coalesce(text, '') END AS t FROM documents) "
            "SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars, "
            "regexp_matches(t, '(?i)(page not found|error 404|"
            "404 not found|not be found|no longer available|"
            "does not exist)') AS has_404_phrase, "
            "(regexp_matches(t, '(?i)(page not found|error 404|"
            "404 not found|not be found|no longer available|"
            "does not exist)') OR length(t) < 64) AS is_soft404 "
            "FROM d"
        ),
        "registrable_domain": (
            "WITH h AS (SELECT doc_id, CASE CAST(doc_id % 8 AS INT) "
            "WHEN 0 THEN 'news.h' || CAST(doc_id AS VARCHAR) || '.co.uk' "
            "WHEN 1 THEN 'a.b.h' || CAST(doc_id AS VARCHAR) || '.com' "
            "WHEN 2 THEN 'example.org' WHEN 3 THEN 'co.uk' "
            "WHEN 4 THEN 'h' || CAST(doc_id AS VARCHAR) || '.unknowntld' "
            "WHEN 5 THEN 'h' || CAST(doc_id AS VARCHAR) || '.gov.in' "
            "WHEN 6 THEN 'uk' "
            "ELSE 'x.h' || CAST(doc_id AS VARCHAR) || '.io' END AS host "
            "FROM documents), "
            "p AS (SELECT doc_id, host, "
            "nullif(regexp_extract(host, '([^.]+)$', 1), '') AS l1, "
            "nullif(regexp_extract(host, '([^.]+\\.[^.]+)$', 1), '') "
            "AS l2, "
            "nullif(regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
            ", '') AS l3 FROM h), "
            "s AS (SELECT doc_id, host, l1, l2, l3, "
            "CASE WHEN l2 IN ('co.uk', 'org.uk', 'ac.uk', 'gov.uk', "
            "'com.au', 'net.au', 'org.au', 'co.jp', 'ne.jp', 'or.jp', "
            "'co.in', 'net.in', 'org.in', 'ac.in', 'gov.in', 'com.br', "
            "'com.cn', 'com.mx', 'co.za', 'com.sg', 'com.tr') THEN l2 "
            "WHEN l1 IN ('com', 'org', 'net', 'edu', 'gov', 'mil', "
            "'int', 'io', 'co', 'ai', 'app', 'dev', 'info', 'biz', "
            "'uk', 'in', 'jp', 'au', 'de', 'fr', 'br', 'cn', 'ru', "
            "'us', 'ca', 'es', 'it', 'nl', 'se', 'no') THEN l1 END "
            "AS public_suffix FROM p) "
            "SELECT doc_id, host, public_suffix, "
            "CASE WHEN public_suffix IS NULL THEN NULL "
            "WHEN public_suffix = l2 THEN "
            "(CASE WHEN host <> l2 THEN l3 END) "
            "ELSE (CASE WHEN host <> l1 THEN l2 END) END "
            "AS registrable_domain FROM s"
        ),
        "robots_rules": (
            "SELECT doc_id, CASE CAST(doc_id % 5 AS INT) "
            "WHEN 0 THEN '/p/' || CAST(doc_id AS VARCHAR) || '.html' "
            "WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR) "
            "WHEN 2 THEN '/private/public/' || CAST(doc_id AS VARCHAR) "
            "WHEN 3 THEN '/files/' || CAST(doc_id AS VARCHAR) || '.pdf' "
            "ELSE '/files/' || CAST(doc_id AS VARCHAR) || '.pdf.html' "
            "END AS path, "
            "CAST(doc_id % 5 AS INT) IN (0, 2, 4) AS allowed "
            "FROM documents"
        ),
        "url_traps": (
            "WITH u AS (SELECT 'https://' || source || '.example.org' || "
            "repeat('/d', CAST(doc_id % 12 AS INT)) || '/p/' || "
            "CAST(doc_id AS VARCHAR) || "
            "CASE WHEN doc_id % 5 = 0 THEN '?a=1&b=2&c=3&d=4&e=5&f=6&g=7' "
            "WHEN doc_id % 3 = 0 THEN '?q=' || CAST(doc_id AS VARCHAR) "
            "ELSE '' END AS url FROM documents), "
            "p AS (SELECT url, CAST(length(url) AS BIGINT) AS url_len, "
            "regexp_replace(url, '^[a-z]+://[^/]*', '') AS rest FROM u), "
            "pq AS (SELECT url, url_len, "
            "regexp_replace(rest, '\\?.*$', '') AS path, "
            "regexp_replace(rest, '^[^?]*\\??', '') AS query FROM p), "
            "base AS (SELECT url, url_len, CAST(length(path) - "
            "length(replace(path, '/', '')) AS BIGINT) AS path_depth, "
            "CAST(CASE WHEN query = '' THEN 0 ELSE length(query) - "
            "length(replace(query, '&', '')) + 1 END AS BIGINT) "
            "AS n_params, path FROM pq), "
            "rep AS (SELECT url, max(c) AS max_seg_repeat FROM "
            "(SELECT url, seg, count(*) AS c FROM (SELECT url, "
            "unnest(string_split(path, '/')) AS seg FROM base) "
            "WHERE seg <> '' GROUP BY url, seg) GROUP BY url) "
            "SELECT b.url, b.url_len, b.path_depth, b.n_params, "
            "CAST(coalesce(r.max_seg_repeat, 0) AS BIGINT) "
            "AS max_seg_repeat, (b.path_depth > 8 OR "
            "coalesce(r.max_seg_repeat, 0) > 2 OR b.n_params > 6 OR "
            "b.url_len > 200) AS is_trap "
            "FROM base b LEFT JOIN rep r USING (url)"
        ),
        "pagination_expand": (
            "WITH totals AS (SELECT event_type, count(*) AS total "
            "FROM events GROUP BY event_type) "
            "SELECT event_type, 100 * unnest(generate_series(1, "
            "total // 100 - 3)) AS \"offset\" FROM totals"
        ),
        "window_agg": (
            "SELECT date_trunc('day', ts) AS day, event_type, "
            "count(*) AS n, "
            "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_value_c FROM events GROUP BY 1, 2"
        ),
        "lineitem_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c, "
            "CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c, "
            "count(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "hash_join": (
            "SELECT o.o_orderpriority, "
            "CAST(SUM(CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT)"
            " AS sum_qty_c, count(*) AS n_rows "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "GROUP BY o.o_orderpriority"
        ),
        "broadcast_join": (
            "SELECT c_mktsegment, count(*) AS n_orders FROM orders "
            "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
        ),
        "toi_boolean": (
            "SELECT doc_id FROM documents "
            "WHERE contains(lower(text), 'spark') "
            "AND (contains(lower(text), 'window') "
            "OR contains(lower(text), 'join')) "
            "AND NOT contains(lower(text), 'merge')"
        ),
        "connected_components": (
            "SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster "
            "FROM documents"
        ),
        "cosine_pairs": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding::DOUBLE[], "
            "b.embedding::DOUBLE[]) >= 0.3"
        ),
        "range_join": (
            "SELECT e.event_id, count(o.o_orderdate) AS n_matches "
            "FROM events e LEFT JOIN orders o ON o.o_orderdate "
            "BETWEEN e.ts - INTERVAL 7 DAY AND e.ts "
            "GROUP BY e.event_id"
        ),
        "stratified_sample": (
            "SELECT event_id, event_type FROM ("
            "SELECT event_id, event_type, row_number() OVER ("
            "PARTITION BY event_type ORDER BY "
            "md5(CAST(event_id AS VARCHAR)), event_id) AS rn "
            "FROM events) WHERE rn <= 50"
        ),
        "asof_join": (
            "SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS o_date "
            "FROM events e ASOF LEFT JOIN orders o "
            "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
        ),
        "grouped_topk": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, row_number() "
            "OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, "
            "o_orderkey) AS rn FROM orders) WHERE rn <= 3"
        ),
        "sessionize": (
            "WITH g AS (SELECT event_id, user_id, ts, CASE WHEN "
            "lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > "
            "INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS new_s FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT event_id, user_id, CAST(sum(new_s) OVER (PARTITION BY "
            "user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) "
            "AS BIGINT) AS session_seq FROM g"
        ),
        "antijoin": (
            "SELECT c_custkey, c_mktsegment FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderpriority = '1-URGENT')"
        ),
        "semijoin": (
            "SELECT c_custkey, c_mktsegment FROM customer c "
            "WHERE EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderpriority = '1-URGENT')"
        ),
        "rolling_sum": (
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS roll_sum_c FROM events"
        ),
        "pivot_counts": (
            "SELECT o_orderpriority, "
            "count(*) FILTER (WHERE o_orderstatus = 'F') AS n_F, "
            "count(*) FILTER (WHERE o_orderstatus = 'O') AS n_O, "
            "count(*) FILTER (WHERE o_orderstatus = 'P') AS n_P "
            "FROM orders GROUP BY o_orderpriority"
        ),
        "exact_quantiles": (
            "WITH tc AS (SELECT CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens "
            "FROM documents) "
            + " UNION ALL ".join(
                f"SELECT CAST({q} AS DOUBLE) AS q, "
                f"quantile_disc(n_tokens, {q}) AS n_tokens FROM tc"
                for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
            )
        ),
        "topk_global": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
        ),
        "grouped_quantiles": (
            "WITH tc AS (SELECT source, CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS "
            "n_tokens FROM documents) "
            + " UNION ALL ".join(
                f"SELECT source, CAST({q} AS DOUBLE) AS q, "
                f"quantile_disc(n_tokens, {q}) AS n_tokens "
                f"FROM tc GROUP BY source"
                for q in (0.25, 0.5, 0.9)
            )
        ),
        "uniform_sample": (
            "SELECT event_id, event_type FROM events "
            "ORDER BY md5(CAST(event_id AS VARCHAR)), event_id LIMIT 200"
        ),
        "distinct_per_group": (
            "SELECT event_type, count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type"
        ),
        "left_join_agg": (
            "SELECT c_custkey, count(o_orderkey) AS n_orders "
            "FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
            "GROUP BY c_custkey"
        ),
        "shipping_priority": (
            "SELECT l_orderkey, o_orderpriority, "
            "CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)"
            " AS BIGINT)) AS BIGINT) AS revenue_c "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "GROUP BY l_orderkey, o_orderpriority "
            "ORDER BY revenue_c DESC, l_orderkey LIMIT 10"
        ),
        "dedup_lines": (
            "WITH ch0 AS (SELECT doc_id, regexp_replace(text, "
            "'((?:\\S+ ){2}\\S+) ', '\\1' || chr(10), 'g') AS t "
            "FROM documents), "
            "lines AS (SELECT doc_id, "
            "unnest(string_split(t, chr(10))) AS line, "
            "unnest(generate_series(1, len(string_split(t, chr(10))))) "
            "AS ord FROM ch0), "
            "freq AS (SELECT line FROM lines GROUP BY line "
            "HAVING count(*) >= 5), "
            "kept AS (SELECT doc_id, ord, line FROM lines "
            "WHERE line NOT IN (SELECT line FROM freq)) "
            "SELECT d.doc_id, coalesce("
            "string_agg(k.line, chr(10) ORDER BY k.ord), '') AS text "
            "FROM documents d LEFT JOIN kept k USING (doc_id) "
            "GROUP BY d.doc_id"
        ),
        "word_stats": (
            "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS word FROM documents), "
            "c AS (SELECT doc_id, word, count(*) AS cnt FROM w "
            "GROUP BY doc_id, word) "
            "SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words, "
            "CAST(count(*) AS BIGINT) AS n_distinct_words, "
            "CAST(max(cnt) AS BIGINT) AS top_word_count "
            "FROM c GROUP BY doc_id"
        ),
        "doc_freq": (
            "SELECT word, CAST(count(*) AS BIGINT) AS df FROM "
            "(SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) "
            "AS word FROM documents) GROUP BY word"
        ),
        "bpe_word_freq": (
            "SELECT word, CAST(count(*) AS BIGINT) AS count FROM "
            "(SELECT unnest(string_split_regex(lower(text), '\\s+')) "
            "AS word FROM documents) WHERE word <> '' "
            "GROUP BY word ORDER BY count DESC, word ASC LIMIT 200"
        ),
        "incremental_ingest": (
            "SELECT doc_id FROM documents WHERE doc_id % 2 = 1 "
            "AND text NOT IN "
            "(SELECT text FROM documents WHERE doc_id % 2 = 0)"
        ),
        "chunk_documents": (
            "WITH ws AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS w "
            "FROM documents WHERE trim(text) <> ''), "
            "n AS (SELECT doc_id, w, len(w) AS nw FROM ws), "
            "idx AS (SELECT doc_id, w, nw, "
            "unnest(generate_series(0, CASE WHEN nw <= 64 THEN 0 ELSE "
            "CAST(ceil((nw - 64) / 48.0) AS BIGINT) END)) AS chunk_id "
            "FROM n) "
            "SELECT doc_id, chunk_id, "
            "array_to_string(w[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')"
            " AS chunk_text, "
            "CAST(least(64, nw - chunk_id * 48) AS BIGINT) AS n_tokens "
            "FROM idx"
        ),
        "curation_report": (
            "WITH gated AS (SELECT doc_id, source, text FROM documents "
            "WHERE len(text) >= 20 "
            "AND (CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END) >= 5 "
            "AND CAST(len(regexp_replace(text, '[\\w\\s]', '', 'g')) "
            "AS DOUBLE) / greatest(len(text), 1) <= 0.3), "
            "kept AS (SELECT min(doc_id) AS doc_id, "
            "arg_min(source, doc_id) AS source, text "
            "FROM gated GROUP BY text), "
            "tok AS (SELECT source, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens "
            "FROM kept) "
            "SELECT source, count(*) AS n_docs, "
            "CAST(sum(n_tokens) AS BIGINT) AS total_tokens "
            "FROM tok GROUP BY source"
        ),
        "pii_redact": (
            "WITH aug AS (SELECT doc_id, text || ' contact user' || doc_id"
            " || '@example.com from 10.' || (doc_id % 200) || "
            "'.0.1 call +1 415-555-0123' AS a FROM documents) "
            "SELECT doc_id, "
            "regexp_replace(regexp_replace(regexp_replace(a, '"
            + EMAIL_RE + "', '<EMAIL>', 'g'), '" + IPV4_RE
            + "', '<IP>', 'g'), '" + PHONE_RE + "', '<PHONE>', 'g') "
            "AS clean, "
            "len(regexp_extract_all(a, '" + EMAIL_RE + "')) AS n_email, "
            "len(regexp_extract_all(a, '" + IPV4_RE + "')) AS n_ip, "
            "len(regexp_extract_all(a, '" + PHONE_RE + "')) AS n_phone "
            "FROM aug"
        ),
        "normalized_dedup": (
            "WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(text)"
            ", '" + NORM_STRIP_RE + "', ' ', 'g')) AS norm FROM documents)"
            " SELECT min(doc_id) AS doc_id, norm FROM norm GROUP BY norm"
        ),
        "warc_roundtrip": "SELECT doc_id, text FROM documents",
        "jsonl_roundtrip": "SELECT doc_id, text FROM documents",
        "gopher_rules": """
            WITH L AS (
                SELECT doc_id,
                       UNNEST(string_split(coalesce(text, ''), chr(10)))
                           AS line
                FROM documents
            ),
            lin AS (
                SELECT doc_id,
                       CAST(COUNT(*) AS BIGINT) AS n_lines,
                       CAST(SUM(CASE WHEN ltrim(line, ' ' || chr(9))
                                          LIKE '-%'
                                     OR ltrim(line, ' ' || chr(9))
                                          LIKE '*%'
                                     OR ltrim(line, ' ' || chr(9))
                                          LIKE '•%'
                                THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_bullet_lines,
                       CAST(SUM(CASE WHEN rtrim(line, ' ' || chr(9))
                                          LIKE '%...'
                                     OR rtrim(line, ' ' || chr(9))
                                          LIKE '%…'
                                THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_ellipsis_lines
                FROM L GROUP BY doc_id
            ),
            -- tokenization == Python str.split on this corpus: text is
            -- ASCII with space-only whitespace (length==strlen holds),
            -- so split-on-space + drop-empties is exact
            W AS (
                SELECT doc_id,
                       UNNEST(string_split(lower(coalesce(text, '')),
                                           ' ')) AS w
                FROM documents
            ),
            wrd AS (
                SELECT doc_id,
                       CAST(COUNT(*) FILTER (w <> '') AS BIGINT)
                           AS n_words,
                       CAST(COUNT(*) FILTER (w <> ''
                            AND regexp_matches(w, '[a-z]')) AS BIGINT)
                           AS n_alpha_words,
                       CAST(COUNT(*) FILTER (w IN (
                            'the','a','an','and','or','of','to','in',
                            'is','was','were','be','for','on','with',
                            'as','by','at','it','this','that','from',
                            'are','said','he','she','they','his','her',
                            'its','not','have','has','had','but'))
                            AS BIGINT) AS n_stopword_hits
                FROM W GROUP BY doc_id
            )
            SELECT l.doc_id, l.n_lines, l.n_bullet_lines,
                   l.n_ellipsis_lines,
                   coalesce(w.n_words, 0) AS n_words,
                   coalesce(w.n_alpha_words, 0) AS n_alpha_words,
                   coalesce(w.n_stopword_hits, 0) AS n_stopword_hits
            FROM lin l LEFT JOIN wrd w USING (doc_id)
        """,
        "hamming_pairs_synth": """
            WITH f AS (
                SELECT doc_id,
                       xor(('0x' || substr(md5(CAST(doc_id // 4
                                AS VARCHAR)), 1, 16))::UBIGINT,
                            CASE doc_id % 4
                              WHEN 1 THEN (1::UBIGINT <<
                                   CAST((doc_id // 4) % 64 AS INTEGER))
                              WHEN 2 THEN xor(
                                   1::UBIGINT << CAST((doc_id // 4) % 64
                                        AS INTEGER),
                                   1::UBIGINT <<
                                        CAST(((doc_id // 4) * 7 + 13)
                                             % 64 AS INTEGER))
                              WHEN 3 THEN (1::UBIGINT <<
                                   CAST(((doc_id // 4) * 31 + 5) % 64
                                        AS INTEGER))
                              ELSE 0::UBIGINT
                            END) AS fp
                FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
            FROM f a JOIN f b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3
        """,
        "chunk_dedup_fixed": """
            WITH c AS (
                SELECT substr(d.text, CAST(1 + 256 * r.i AS BIGINT), 256)
                           AS chunk
                FROM documents d, range(0, 65536) r(i)
                WHERE length(d.text) > 0
                  AND r.i < (length(d.text) + 255) // 256
            )
            SELECT 'fixed' AS policy,
                   CAST(COUNT(*) AS BIGINT) AS total_chunks,
                   CAST(COUNT(DISTINCT chunk) AS BIGINT) AS unique_chunks,
                   CAST(SUM(length(chunk)) AS BIGINT) AS total_bytes,
                   CAST((SELECT SUM(length(chunk))
                         FROM (SELECT DISTINCT chunk FROM c) u)
                        AS BIGINT) AS unique_bytes
            FROM c
        """,
        "repetition_stats": """
            WITH L AS (
                SELECT doc_id,
                       UNNEST(string_split(text, chr(10))) AS line
                FROM documents
            ), G AS (
                SELECT doc_id, line, COUNT(*) AS c,
                       LENGTH(line) AS len
                FROM L GROUP BY doc_id, line
            )
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_lines,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_lines,
                   CAST(SUM(CASE WHEN c > 1 THEN c * len ELSE 0 END)
                        AS BIGINT) AS dup_line_chars
            FROM G GROUP BY doc_id
        """,
        "duplicate_passages": (
            "WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w "
            "FROM documents), "
            "g AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram "
            "FROM ws, unnest(generate_series(1, len(w) - 2)) AS t(i)), "
            "df AS (SELECT gram, count(DISTINCT doc_id) AS df FROM g "
            "GROUP BY gram), "
            "c AS (SELECT g.doc_id, count(*) AS nd FROM g "
            "JOIN df USING (gram) WHERE df.df >= 2 GROUP BY g.doc_id) "
            "SELECT d.doc_id, "
            "CAST(greatest(len(string_split(d.text, ' ')) - 2, 0) "
            "AS BIGINT) AS n_grams, "
            "CAST(coalesce(c.nd, 0) AS BIGINT) AS n_dup_grams "
            "FROM documents d LEFT JOIN c USING (doc_id)"
        ),
        "url_blocklist": (
            "WITH u AS (SELECT doc_id, "
            "'https://' || CASE doc_id % 4 "
            "WHEN 0 THEN 'news.example.co.uk' "
            "WHEN 1 THEN 'ads.tracker.com' "
            "WHEN 2 THEN 'blog.example.com' "
            "ELSE 'stats.co.uk' END "
            "|| '/p/' || CAST(doc_id AS VARCHAR) || "
            "CASE WHEN CAST(concat('0x', "
            "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) "
            "% 7 = 0 THEN '-casino-night' ELSE '-news' END AS url "
            "FROM documents) "
            "SELECT doc_id, url FROM u "
            "WHERE doc_id % 4 NOT IN (1, 3) "  # tracker.com, stats.co.uk
            "AND url NOT LIKE '%casino%'"
        ),
        "surt_keys": (
            "WITH u AS (SELECT doc_id, "
            "CASE doc_id % 4 WHEN 2 THEN 'http' ELSE 'https' END || '://' "
            "|| CASE doc_id % 4 WHEN 0 THEN 'www.Example.com' "
            "WHEN 1 THEN 'news.site.org' WHEN 2 THEN 'example.com:8080' "
            "ELSE 'br.example.co.uk' END "
            "|| '/p/' || CAST(doc_id AS VARCHAR) || "
            "CASE WHEN doc_id % 3 = 0 THEN '?b=9&utm_source=x&a=1' "
            "ELSE '' END AS url, "
            "CASE doc_id % 4 WHEN 0 THEN 'com,example' "
            "WHEN 1 THEN 'org,site,news' WHEN 2 THEN 'com,example:8080' "
            "ELSE 'uk,co,example,br' END "
            "|| ')/p/' || CAST(doc_id AS VARCHAR) || "
            "CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=9' ELSE '' END "
            "AS surt_key FROM documents) "
            "SELECT doc_id, url, surt_key FROM u"
        ),
        "cdx_prefix_scan": (
            "WITH u AS (SELECT doc_id, "
            "'https://www.Example.com/p/' || CAST(doc_id AS VARCHAR) || "
            "CASE WHEN doc_id % 3 = 0 THEN '?b=9&utm_source=x&a=1' "
            "ELSE '' END AS url, "
            "'com,example)/p/' || CAST(doc_id AS VARCHAR) || "
            "CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=9' ELSE '' END "
            "AS surt_key FROM documents WHERE doc_id % 4 = 0) "
            "SELECT doc_id, url, surt_key FROM u"
        ),
        "url_templates": (
            "WITH u AS (SELECT CASE doc_id % 4 "
            "WHEN 0 THEN 'https://ex' || CAST(doc_id % 2 AS VARCHAR) || "
            "'.org/story/' || CAST(doc_id AS VARCHAR) || '?utm=x' "
            "WHEN 1 THEN 'https://ex' || CAST(doc_id % 2 AS VARCHAR) || "
            "'.org/tile/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) "
            "|| '/' || CAST(doc_id % 5 AS VARCHAR) "
            "WHEN 2 THEN 'https://cal.ex.org/' || "
            "CAST(2000 + doc_id % 30 AS VARCHAR) || '/' || "
            "CAST(1 + doc_id % 12 AS VARCHAR) || '/page' "
            "ELSE 'https://ex.org/p/' || CAST(doc_id AS VARCHAR) || "
            "'-slug' END AS url FROM documents), "
            "t AS (SELECT regexp_replace(regexp_replace(regexp_replace("
            f"url, '{TEMPLATE_QUERY_RE}', '', 'g'), "
            f"'{TEMPLATE_HEX_RE}', '<H>', 'g'), "
            f"'{TEMPLATE_NUM_RE}', '<N>', 'g') AS template FROM u) "
            "SELECT template, count(*) AS n_urls FROM t GROUP BY template"
        ),
        "langid_golden": (
            "SELECT doc_id, CASE doc_id % 4 WHEN 0 THEN 'en' "
            "WHEN 1 THEN 'es' WHEN 2 THEN 'fr' ELSE 'de' END "
            "AS lang_pred FROM documents"
        ),
        "canonical_golden": (
            "SELECT doc_id, CASE doc_id % 4 "
            "WHEN 0 THEN 'https://www.ex.org/a/' || "
            "CAST(doc_id AS VARCHAR) "
            "WHEN 1 THEN 'https://ex.org/b/' || CAST(doc_id AS VARCHAR) "
            "WHEN 2 THEN 'https://ex.org:8080/c/' || "
            "CAST(doc_id AS VARCHAR) "
            "ELSE 'https://ex.org/d/' || CAST(doc_id AS VARCHAR) || "
            "'?a=1&z=2' END AS canonical FROM documents"
        ),
        "mimetype_golden": (
            "SELECT doc_id, CASE doc_id % 6 "
            "WHEN 0 THEN 'application/pdf' "
            "WHEN 1 THEN 'image/png' "
            "WHEN 2 THEN 'image/jpeg' "
            "WHEN 3 THEN 'application/gzip' "
            "WHEN 4 THEN 'text/html' "
            "ELSE 'text/css' END AS mimetype FROM documents"
        ),
        "anchor_golden": (
            "WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS s, "
            "'https://h' || CAST(doc_id % 3 AS VARCHAR) || '.ex.org/sec/'"
            " || CAST(doc_id AS VARCHAR) || '/page.html' AS src "
            "FROM documents) "
            "SELECT src, 'https://abs.ex.org/x/' || s AS dst, "
            "'Abs ' || s AS anchor FROM d "
            "UNION ALL SELECT src, "
            "'https://h' || CAST(doc_id % 3 AS VARCHAR) || '.ex.org/sec/'"
            " || s || '/rel' || s || '.html', 'Rel' FROM d "
            "UNION ALL SELECT src, "
            "'https://h' || CAST(doc_id % 3 AS VARCHAR) || "
            "'.ex.org/sec/up/' || s, 'Up ' || s FROM d"
        ),
        "markdown_golden": (
            "WITH m AS (SELECT doc_id, "
            "'https://ex.org/p/' || CAST(doc_id AS VARCHAR) AS url, "
            "'# Doc & ' || CAST(doc_id AS VARCHAR) || "
            "chr(10) || chr(10) || "
            "'Para **bold' || CAST(doc_id AS VARCHAR) || '** and *it*.'"
            " || chr(10) || chr(10) || "
            "'See [link ' || CAST(doc_id AS VARCHAR) || "
            "'](https://ex.org/' || CAST(doc_id AS VARCHAR) || ').'"
            " || chr(10) || chr(10) || "
            "CASE WHEN doc_id % 2 = 1 THEN "
            "'1. first ' || CAST(doc_id AS VARCHAR) || chr(10) || "
            "'2. second' ELSE "
            "'- first ' || CAST(doc_id AS VARCHAR) || chr(10) || "
            "'- second' END AS markdown FROM documents) "
            "SELECT doc_id, url, markdown, "
            "CAST(length(markdown) AS BIGINT) AS n_chars FROM m"
        ),
        "robots_meta": (
            "SELECT doc_id, "
            "'https://ex.org/p/' || CAST(doc_id AS VARCHAR) AS url, "
            "doc_id % 6 IN (1, 2) AS noindex, "
            "doc_id % 6 IN (1, 2, 4) AS nofollow, "
            "doc_id % 6 = 4 AS noarchive, "
            "doc_id % 6 = 5 AS nosnippet "
            "FROM documents"
        ),
        "recrawl_plan": (
            "WITH e AS (SELECT doc_id, "
            "'https://ex.org/p/' || CAST(doc_id AS VARCHAR) AS url, "
            "CASE doc_id % 5 "
            "WHEN 1 THEN CAST(1709251200 AS BIGINT) "
            "WHEN 2 THEN CAST(1709294400 AS BIGINT) "
            "WHEN 3 THEN CAST(1709287200 AS BIGINT) "
            "ELSE NULL END AS lastmod_ts, "
            "CASE WHEN doc_id % 3 <> 0 THEN "
            "CAST(1709280000 + (doc_id % 7) * 3600 AS BIGINT) "
            "ELSE NULL END AS crawl_ts FROM documents) "
            "SELECT url, lastmod_ts, crawl_ts, "
            "CASE WHEN crawl_ts IS NULL THEN 'new' "
            "WHEN lastmod_ts IS NULL THEN 'unknown' "
            "WHEN lastmod_ts > crawl_ts THEN 'stale' "
            "ELSE 'fresh' END AS verdict FROM e"
        ),
        "maincontent_golden": (
            "SELECT doc_id, "
            "'https://ex.org/p/' || CAST(doc_id AS VARCHAR) AS url, "
            "'T ' || CAST(doc_id AS VARCHAR) AS title, "
            "'Paragraph 1 of document ' || CAST(doc_id AS VARCHAR) || "
            "' carries enough plain text for the extractor to score "
            "it.' || chr(10) || "
            "'Paragraph 2 of document ' || CAST(doc_id AS VARCHAR) || "
            "' carries enough plain text for the extractor to score "
            "it.' || chr(10) || "
            "'Paragraph 3 of document ' || CAST(doc_id AS VARCHAR) || "
            "' carries enough plain text for the extractor to score "
            "it.' AS main_text, "
            "CAST(3 AS INTEGER) AS n_paragraphs "
            "FROM documents"
        ),
        "xrobots_header": (
            "SELECT doc_id, "
            "'https://ex.org/p/' || CAST(doc_id AS VARCHAR) AS url, "
            "doc_id % 6 IN (1, 5) AS noindex, "
            "doc_id % 6 IN (1, 5) AS nofollow, "
            "doc_id % 6 = 3 AS noarchive, "
            "doc_id % 6 = 4 AS nosnippet "
            "FROM documents"
        ),
        "follow_edges": (
            "SELECT 'https://ex.org/p/' || CAST(doc_id AS VARCHAR) "
            "AS src, "
            "'https://ex.org/keep' || CAST(doc_id AS VARCHAR) || "
            "'.html' AS dst, "
            "'K ' || CAST(doc_id AS VARCHAR) AS anchor "
            "FROM documents WHERE doc_id % 3 <> 0"
        ),
        "meta_tags": (
            "SELECT doc_id, "
            "'https://ex.org/p/' || CAST(doc_id AS VARCHAR) AS url, "
            "'Doc ' || CAST(doc_id AS VARCHAR) || ' & co' AS title, "
            "'OG ' || CAST(doc_id AS VARCHAR) AS og_title, "
            "CASE WHEN doc_id % 4 = 0 THEN NULL "
            "ELSE 'OD ' || CAST(doc_id AS VARCHAR) END AS og_description, "
            "'plain' || CAST(doc_id AS VARCHAR) AS description, "
            "'https://ex.org/c/' || CAST(doc_id AS VARCHAR) AS canonical "
            "FROM documents"
        ),
        "c4_clean": (
            "WITH base AS (SELECT doc_id, text, length(text) // 3 AS k "
            "FROM documents), "
            "built AS (SELECT doc_id, "
            "substr(text, 1, k) || '.' || chr(10) || "
            "'Please enable javascript to continue reading this page "
            "now.' || chr(10) || "
            "'tiny line.' || chr(10) || "
            "substr(text, k + 1, k) || '!' || chr(10) || "
            "substr(text, 2 * k + 1) || '?' || "
            "CASE WHEN doc_id % 7 = 0 THEN chr(10) || "
            "'code sample with braces { inside this line.' ELSE '' END || "
            "CASE WHEN doc_id % 11 = 3 THEN chr(10) || "
            "'Filler Lorem Ipsum text appears on this page.' ELSE '' END "
            "AS text FROM base), "
            "cleaned AS (SELECT doc_id, "
            "array_to_string(list_filter(string_split(text, chr(10)), "
            f"l -> regexp_matches(l, '{C4_TERMINAL_RE}') "
            f"AND length(regexp_extract_all(l, '{C4_WORD_RE}')) >= 5 "
            f"AND NOT contains(lower(l), '{C4_JS_SUBSTR}')), chr(10)) "
            "AS text FROM built "
            f"WHERE NOT contains(lower(text), '{C4_LOREM_SUBSTR}') "
            "AND NOT contains(text, chr(123))) "
            "SELECT doc_id, text FROM cleaned "
            f"WHERE length(regexp_extract_all(text, '{C4_SENTENCE_RE}')) "
            ">= 3"
        ),
        "dedup_paragraphs": (
            "WITH base AS (SELECT doc_id, text, length(text) // 3 AS k, "
            "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), "
            "1, 8)) AS BIGINT) % 4 = 0 AS boiler FROM documents), "
            "d AS (SELECT doc_id, "
            "substr(text, 1, k) || chr(10) || chr(10) || "
            "CASE WHEN boiler "
            "THEN 'subscribe to our newsletter for daily updates' "
            "ELSE substr(text, k + 1, k) END || chr(10) || chr(10) || "
            "substr(text, 2 * k + 1) AS text2 FROM base), "
            "paras AS (SELECT doc_id, "
            "generate_subscripts(arr, 1) AS idx, unnest(arr) AS para "
            "FROM (SELECT doc_id, "
            "string_split(text2, chr(10) || chr(10)) AS arr FROM d)), "
            "ranked AS (SELECT doc_id, idx, para, "
            "row_number() OVER (PARTITION BY para "
            "ORDER BY doc_id, idx) AS rn FROM paras) "
            "SELECT doc_id, "
            "coalesce(string_agg(para, chr(10) || chr(10) "
            "ORDER BY idx) FILTER (WHERE rn = 1), '') AS text "
            "FROM ranked GROUP BY doc_id"
        ),
        "redirect_resolve": (
            "WITH RECURSIVE e AS ("
            "SELECT concat('https://ex.org/d', CAST(doc_id AS VARCHAR))"
            " AS src, "
            "CASE WHEN doc_id = 0 OR CAST(concat('0x', "
            "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) "
            "% 5 = 0 THEN NULL "
            "ELSE concat('https://ex.org/d', "
            "CAST((doc_id - 1) // 3 AS VARCHAR)) END AS dst "
            "FROM documents), "
            "nodes AS (SELECT DISTINCT url FROM ("
            "SELECT src AS url FROM e "
            "UNION SELECT dst AS url FROM e WHERE dst IS NOT NULL)), "
            "walk(url, cur, hops) AS ("
            "SELECT url, url, 0 FROM nodes "
            "UNION ALL "
            "SELECT w.url, e2.dst, w.hops + 1 "
            "FROM walk w JOIN e e2 "
            "ON e2.src = w.cur AND e2.dst IS NOT NULL) "
            "SELECT w.url, w.cur AS final_url, "
            "CAST(w.hops AS BIGINT) AS hops, TRUE AS resolved "
            "FROM walk w WHERE NOT EXISTS (SELECT 1 FROM e e3 "
            "WHERE e3.src = w.cur AND e3.dst IS NOT NULL)"
        ),
        "dataset_split": (
            "SELECT doc_id, CASE WHEN b < 9000 THEN 'train' "
            "WHEN b < 9500 THEN 'val' ELSE 'test' END AS split "
            "FROM (SELECT doc_id, "
            "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), "
            "1, 15)) AS BIGINT) % 10000 AS b FROM documents)"
        ),
        "domain_cap": (
            "SELECT doc_id, source FROM ("
            "SELECT doc_id, source, row_number() OVER ("
            "PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
            "FROM documents) WHERE rn <= 10"
        ),
        "shuffle_shards": (
            "WITH t AS (SELECT doc_id, "
            "md5(CAST(doc_id AS VARCHAR)) AS h, "
            "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), "
            "1, 15)) AS BIGINT) % 8 AS shard FROM documents) "
            "SELECT doc_id, shard, row_number() OVER ("
            "PARTITION BY shard ORDER BY h, doc_id) AS pos FROM t"
        ),
        "data_mixture": (
            "WITH t AS (SELECT doc_id, source, "
            "md5(CAST(doc_id AS VARCHAR)) AS h, "
            "CASE source WHEN 'src0' THEN 20 WHEN 'src1' THEN 12 "
            "WHEN 'src2' THEN 8 ELSE 0 END AS k FROM documents "
            "WHERE source IN ('src0', 'src1', 'src2')) "
            "SELECT doc_id, source FROM ("
            "SELECT doc_id, source, k, row_number() OVER ("
            "PARTITION BY source ORDER BY h, doc_id) AS rn FROM t) "
            "WHERE rn <= k"
        ),
        "adaptive_quality_gate": (
            "WITH tok AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END "
            "AS n_tokens FROM documents), "
            "thr AS (SELECT quantile_disc(n_tokens, 0.10) AS t FROM tok) "
            "SELECT doc_id, n_tokens FROM tok, thr WHERE n_tokens >= t"
        ),
        "weighted_sample": (
            "WITH t AS (SELECT doc_id, n_chars, "
            "pow((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), "
            "1, 15)) AS BIGINT) + 1) / 1152921504606846976.0, "
            "1.0 / n_chars) AS k FROM documents) "
            "SELECT doc_id, n_chars FROM t ORDER BY k DESC, doc_id LIMIT 100"
        ),
        "window_ops": (
            "WITH t AS (SELECT event_id, user_id, ts, "
            "CAST(round(value * 100) AS BIGINT) AS value_c FROM events) "
            "SELECT event_id, user_id, "
            "CAST(LAG(value_c) OVER w AS DOUBLE) AS lag_v, "
            "CAST(LEAD(value_c) OVER w AS DOUBLE) AS lead_v, "
            "CAST(SUM(value_c) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS cumsum_v, "
            "ROW_NUMBER() OVER w AS row_number "
            "FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "grouped_agg": (
            "WITH t AS (SELECT l_returnflag, l_linestatus, "
            "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c "
            "FROM lineitem) "
            "SELECT l_returnflag, l_linestatus, count(*) AS n_rows, "
            "CAST(sum(qty_c) AS BIGINT) AS sum_qty_c, "
            "min(price_c) AS min_price_c, max(price_c) AS max_price_c, "
            "CAST(sum(qty_c) AS DOUBLE) / count(*) AS avg_qty_c "
            "FROM t GROUP BY l_returnflag, l_linestatus"
        ),
        "full_outer_join": (
            "SELECT COALESCE(c.c_custkey, o.o_custkey) AS k, c.c_name, "
            "CAST(o.o_orderkey AS DOUBLE) AS o_orderkey_d, "
            "CAST(o.o_totalprice AS DOUBLE) AS o_totalprice "
            "FROM (SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey % 3 <> 0) c "
            "FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice "
            "FROM orders WHERE o_custkey % 2 = 0) o "
            "ON c.c_custkey = o.o_custkey"
        ),
        "snapshot_diff": (
            "WITH osnap AS (SELECT doc_id, "
            "md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp "
            "FROM documents WHERE doc_id % 10 <> 0), "
            "nsnap AS (SELECT doc_id, "
            "md5(regexp_replace(trim(text), '\\s+', ' ', 'g') || "
            "CASE WHEN doc_id % 3 = 0 THEN ' v2' ELSE '' END) AS fp "
            "FROM documents WHERE doc_id % 7 <> 0) "
            "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, "
            "CASE WHEN o.doc_id IS NULL THEN 'added' "
            "WHEN n.doc_id IS NULL THEN 'removed' "
            "WHEN o.fp <> n.fp THEN 'changed' "
            "ELSE 'unchanged' END AS status, "
            "COALESCE(o.fp, '') AS fp_old, "
            "COALESCE(n.fp, '') AS fp_new "
            "FROM osnap o FULL OUTER JOIN nsnap n ON o.doc_id = n.doc_id"
        ),
        "contamination": (
            "WITH ws AS (SELECT doc_id, source, "
            "string_split(text, ' ') AS w FROM documents), "
            "g AS (SELECT doc_id, source, "
            "array_to_string(w[i:i+2], ' ') AS gram "
            "FROM ws, unnest(generate_series(1, len(w) - 2)) AS t(i)), "
            "bench AS (SELECT DISTINCT gram FROM g "
            "WHERE source = 'src0'), "
            "c AS (SELECT doc_id, count(*) AS nc FROM g "
            "WHERE gram IN (SELECT gram FROM bench) GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CAST(greatest(len(string_split(d.text, ' ')) - 2, 0) "
            "AS BIGINT) AS n_grams, "
            "CAST(coalesce(c.nc, 0) AS BIGINT) AS n_contaminated "
            "FROM documents d LEFT JOIN c USING (doc_id)"
        ),
        "bloom_ingest": (
            "SELECT doc_id FROM documents WHERE doc_id % 2 = 1 "
            "AND text NOT IN "
            "(SELECT text FROM documents WHERE doc_id % 2 = 0) "
            "ORDER BY doc_id"
        ),
        "inverted_index": (
            "SELECT word, doc_id, CAST(count(*) AS BIGINT) AS tf FROM "
            "(SELECT doc_id, unnest(string_split(text, ' ')) AS word "
            "FROM documents) "
            "WHERE word IN ('spark', 'join', 'merge', 'scan') "
            "GROUP BY word, doc_id"
        ),
        "bm25_topk": (
            "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS word FROM documents), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id), "
            "stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl), "
            "terms(query_id, word) AS (VALUES "
            "(0, 'spark'), (0, 'join'), "
            "(1, 'window'), (1, 'agg'), (1, 'stream'), "
            "(2, 'customer'), (2, 'order')), "
            "tf AS (SELECT t.query_id, w.doc_id, w.word, count(*) AS tf "
            "FROM w JOIN terms t USING (word) GROUP BY 1, 2, 3), "
            "df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w "
            "WHERE word IN (SELECT word FROM terms) GROUP BY word), "
            "sc AS (SELECT tf.query_id, tf.doc_id, "
            "sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) "
            "* tf.tf * (1.2 + 1.0) "
            "/ (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))"
            ") AS score "
            "FROM tf JOIN df USING (word) JOIN dl USING (doc_id) "
            "CROSS JOIN stats GROUP BY 1, 2) "
            "SELECT CAST(query_id AS BIGINT) AS query_id, doc_id FROM sc "
            "QUALIFY row_number() OVER (PARTITION BY query_id "
            "ORDER BY score DESC, doc_id) <= 10"
        ),
        "knn_brute": (
            "WITH q AS (SELECT vec_id AS query_rank, embedding FROM ("
            "SELECT vec_id, embedding, row_number() OVER (ORDER BY vec_id) - 1"
            " AS rn FROM embeddings) WHERE rn < 5), "
            "qq AS (SELECT row_number() OVER (ORDER BY query_rank) - 1 AS "
            "query_id, embedding FROM q) "
            "SELECT qq.query_id, e.vec_id FROM qq, embeddings e "
            "QUALIFY row_number() OVER (PARTITION BY qq.query_id ORDER BY "
            "list_cosine_similarity(e.embedding, qq.embedding) DESC, e.vec_id)"
            " <= 10"
        ),
    }
