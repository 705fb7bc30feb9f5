"""Unit tests for operators: dedup, ANN, text stats, projection, scalars,
multimodal actor-pool plumbing."""

from datetime import datetime

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


# --- scalars (X1-X10) -----------------------------------------------------

def test_transform_value():
    from siren_ray.functions.scalars import transform_value

    assert transform_value(datetime(2024, 3, 4, 5)) == "2024-03-04"
    assert transform_value(3.5) == "3.5"
    assert transform_value(None) == "None"


def test_pagination_arithmetics():
    from siren_ray.functions.scalars import (
        expand_offsets_newsminute,
        expand_pages_telegraph,
        expand_pages_toi,
        pages_newsminute,
        pages_telegraph,
        pages_toi,
    )

    # online/telegraph.py:109-114
    assert pages_telegraph(100) == 5
    assert expand_pages_telegraph(100) == [1, 2, 3, 4, 5]
    # newsminute.py:84-90 off-by-quirk: (total//100)-1 then range(1, pages-1)
    assert pages_newsminute(1000) == 9
    assert expand_offsets_newsminute(1000) == [100 * i for i in range(1, 8)]
    assert expand_offsets_newsminute(250) == []
    # toi.py:190: totalDocs//limit + 2, pages from 2
    assert pages_toi(100, 50) == 4
    assert expand_pages_toi(100, 50) == [2, 3, 4]


def test_string_carving():
    from siren_ray.functions.scalars import carve_onclick, last_token_int

    # ht.py:207-209
    assert carve_onclick("showArticle('x','ABC123' );") == "ABC123"
    # online/telegraph.py:141
    assert last_token_int("About 120 results found 47") == 47


def test_toi_image_url():
    from siren_ray.functions.scalars import toi_image_url

    url = toi_image_url(datetime(2024, 3, 7), "4", "TOI", "BOM")
    assert url.endswith("/2024/03/07/Page/07_03_2024_004_BOM.jpg")


# --- projection (W1-W4) ---------------------------------------------------

def test_projection_fields_override_and_missing():
    from siren_ray.functions.project import MISSING, ProjectionSpec, project_batch

    t = pa.table({"b": [1, 2], "a": ["x", "y"],
                  "d": pa.array([datetime(2024, 1, 2)] * 2,
                                pa.timestamp("us"))})
    spec = ProjectionSpec(fields=("a", "missing", "d"),
                          aliases={"a": "alpha"})
    out = project_batch(t, spec)
    assert out.column_names == ["alpha", "missing", "d"]
    assert out["missing"].to_pylist() == [MISSING, MISSING]
    assert out["d"].to_pylist() == ["2024-01-02", "2024-01-02"]


def test_projection_sorted_default_and_include_exclude():
    from siren_ray.functions.project import ProjectionSpec, project_batch

    t = pa.table({"b": [1], "a": [2], "c": [3]})
    spec = ProjectionSpec(include=frozenset({"z"}), exclude=frozenset({"b"}))
    out = project_batch(t, spec)
    assert out.column_names == ["a", "c", "z"]  # sorted, deterministic


def test_flatten_struct_wide_row():
    """W3 (toi.py:228-240): Article fields then flattened Edition fields,
    struct column kept, projector serializes the wide row."""
    import pyarrow as pa

    from siren_ray.functions.project import (
        MISSING,
        ProjectionSpec,
        flatten_struct,
        project_batch,
    )

    ed_type = pa.struct([
        ("date", pa.string()),
        ("edition_code", pa.string()),
        ("publication_code", pa.string()),
        ("edition_name", pa.string()),
    ])
    batch = pa.table({
        "title": pa.array(["t1", "t2"]),
        "body": pa.array(["b1", "b2"]),
        "edition_details": pa.array(
            [{"date": "2024-01-02", "edition_code": "E1",
              "publication_code": "TOI", "edition_name": "Mumbai"},
             {"date": "2024-01-03", "edition_code": "E2",
              "publication_code": "TOI", "edition_name": "Delhi"}],
            ed_type),
    })
    wide = flatten_struct(batch, "edition_details")
    # parent fields first (struct kept), children appended in declared order
    assert wide.column_names == [
        "title", "body", "edition_details",
        "date", "edition_code", "publication_code", "edition_name",
    ]
    assert wide["edition_name"].to_pylist() == ["Mumbai", "Delhi"]

    # collision with an existing column is an error, not a dup header
    with pytest.raises(ValueError):
        flatten_struct(wide, "edition_details")

    # generic projector serializes the wide row; missing -> "- no data -"
    spec = ProjectionSpec(fields=(
        "title", "body", "page", "date", "edition_name",
    ))
    out = project_batch(wide.drop_columns(["edition_details"]), spec)
    assert out.column_names == ["title", "body", "page", "date",
                                "edition_name"]
    assert out["page"].to_pylist() == [MISSING, MISSING]


def test_write_resumable_parquet_skips_finished(ray_session, tmp_path):
    """Crash-resume: finished partitions (with _SUCCESS) are untouched
    byte-for-byte; a partial partition (no marker) is cleaned and
    rewritten; total rows come back exactly once."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from siren_ray.functions.project import write_resumable_parquet

    items = [{"origin": f"s{i % 3}", "n": i} for i in range(30)]
    ds = rd.from_items(items).repartition(4)
    out = str(tmp_path / "resume")

    r1 = write_resumable_parquet(ds, out, partition_col="origin")
    assert sorted(r1["written"]) == ["s0", "s1", "s2"] and not r1["skipped"]

    # simulate a crash that finished s0/s1 but died mid-s2: drop s2's
    # marker and leave a stray partial part behind
    import os as _os
    s2 = _os.path.join(out, "origin=s2")
    _os.remove(_os.path.join(s2, "_SUCCESS"))
    with open(_os.path.join(s2, "junk-partial.parquet"), "w") as f:
        f.write("not parquet")
    before = {
        d: sorted(_os.listdir(_os.path.join(out, d)))
        for d in ("origin=s0", "origin=s1")
    }

    r2 = write_resumable_parquet(ds, out, partition_col="origin")
    assert r2["skipped"] == ["s0", "s1"] and r2["written"] == ["s2"]
    after = {
        d: sorted(_os.listdir(_os.path.join(out, d)))
        for d in ("origin=s0", "origin=s1")
    }
    assert before == after  # finished partitions never rewritten
    back = pads.dataset(out, partitioning="hive",
                        ignore_prefixes=["_", "."]).to_table()
    assert back.num_rows == 30  # no duplicates from the resume
    assert sorted(back["n"].to_pylist()) == list(range(30))


def test_write_routed_parquet(ray_session, tmp_path):
    """W6: rows route into one hive folder per origin value; re-read
    recovers the full set per partition."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from siren_ray.functions.project import write_routed_parquet

    ds = rd.from_items(
        [{"origin": ["HTScraper", "TOIScraper"][i % 2], "n": i}
         for i in range(10)]
    )
    out = str(tmp_path / "routed")
    write_routed_parquet(ds, out, ("origin",))
    import os

    subdirs = sorted(os.listdir(out))
    assert subdirs == ["origin=HTScraper", "origin=TOIScraper"]
    back = pads.dataset(out, partitioning="hive").to_table()
    assert back.num_rows == 10
    ht = back.filter(
        pa.compute.equal(back["origin"], "HTScraper"))["n"].to_pylist()
    assert sorted(ht) == [0, 2, 4, 6, 8]


def test_output_filename():
    from siren_ray.functions.project import output_filename

    s, e = datetime(2024, 1, 1), datetime(2024, 1, 2)
    assert output_filename("X", s, e) == "X_2024-01-02.csv"
    e2 = datetime(2024, 2, 1)
    assert output_filename("X", s, e2) == "X_2024-01-01_2024-02-01.csv"
    # TOI variant (toi.py:245-250)
    assert output_filename("TOI", s, e2, fmt="%d-%m-%Y") == (
        "TOI_01-01-2024_01-02-2024.csv"
    )


# --- text stats -----------------------------------------------------------

def test_token_counts():
    from siren_ray.functions.textstats import token_count_bpeish, token_count_ws

    t = pa.table({"text": ["a b  c", "", "one"]})
    assert token_count_ws(t["text"]).to_pylist() == [3, 0, 1]
    assert list(token_count_bpeish(["don't stop", ""])) == [4, 0]


def test_quality_and_langid():
    from siren_ray.functions.textstats import lang_id, quality_batch

    t = pa.table({"text": ["the quick brown fox jumps over the lazy dog "
                           "and keeps running through the field",
                           "x"]})
    out = quality_batch(t)
    assert out["quality_ok"].to_pylist() == [True, False]
    assert lang_id([
        "the cat and the dog went to the house of the king and the queen",
        "",
    ]) == ["en", "und"]


# --- dedup ----------------------------------------------------------------

def test_simhash_similarity():
    from siren_ray.stages.dedup import simhash64

    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a + "extra"
    ha, hb = simhash64(a), simhash64(b)
    assert bin(ha ^ hb).count("1") <= 16  # near-dup -> small hamming dist
    assert simhash64("") == 0


def test_jaccard():
    from siren_ray.stages.dedup import jaccard

    assert jaccard("a b c d e f", "a b c d e f") == 1.0
    assert jaccard("a b c d e", "v w x y z") == 0.0


def test_connected_components_matches_union_find(ray_session):
    """Distributed min-label propagation == driver union-find on a random
    graph with chains, triangles and singletons."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.dedup import connected_components, neardup_losers

    n = 160
    edges = []
    # stars and triangles (small diameter keeps iterations test-friendly;
    # deep chains only stretch the iteration count, not the semantics)
    for start in range(0, 120, 4):
        edges.append((start, start + 1))
        edges.append((start, start + 2))
        if start % 8 == 0:
            edges.append((start + 1, start + 2))
    # merge three star pairs (diameter 3: multi-hop propagation exercised)
    for start in (0, 40, 80):
        edges.append((start + 2, start + 5))
    edf = pd.DataFrame(edges, columns=["id_a", "id_b"]).astype("int64")
    edges_ds = rd.from_pandas(edf)
    nodes_ds = rd.from_items([{"id": i} for i in range(n)])
    got = connected_components(edges_ds, nodes_ds,
                               num_partitions=8).to_pandas()
    got = dict(zip(got["id"], got["cluster"]))

    # reference: union-find (keep-min roots)
    losers = neardup_losers(edf)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    expect = {i: find(i) for i in range(n)}
    assert got == expect
    # loser set consistency with the driver path
    assert {i for i, c in got.items() if c != i} == losers


def test_hash_antijoin(ray_session):
    """Raw-task hash anti-join drops exactly the listed keys and keeps
    full rows; empty key side is a no-op."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.dedup import hash_antijoin

    left = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(50), "val": [f"v{i}" for i in range(50)]}
    ).astype({"doc_id": "int64"}))
    keys = rd.from_pandas(
        pd.DataFrame({"id": [3, 7, 7, 41, 999]}).astype("int64")
    )
    out = hash_antijoin(left, keys, "doc_id", num_partitions=4).to_pandas()
    assert set(out["doc_id"]) == set(range(50)) - {3, 7, 41}
    assert dict(zip(out["doc_id"], out["val"]))[5] == "v5"

    none = rd.from_pandas(pd.DataFrame({"id": pd.Series(dtype="int64")}))
    out2 = hash_antijoin(left, none, "doc_id", num_partitions=4).to_pandas()
    assert len(out2) == 50


def test_embedding_multiprobe_recall(ray_session):
    """probes=1 (one-bit-flip buckets) strictly improves recall over
    single-probe hyperplane LSH on planted near-dup pairs, with the
    exact block-matmul join as ground truth; both emit only true pairs
    (verification is exact) and single-probe pairs are a subset."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.ann import cosine_pairs_exact
    from siren_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.RandomState(3)
    base = rng.standard_normal((150, 32)).astype(np.float64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # |noise|^2 = 0.04^2 * 32 = 0.05 -> cosine ~ 1/sqrt(1.05) ~ 0.975
    jit = base + 0.04 * rng.standard_normal(base.shape)
    vecs = np.concatenate([base, jit])
    df = pd.DataFrame(
        {"vec_id": np.arange(300, dtype="int64"),
         "embedding": [list(map(float, v)) for v in vecs]}
    )
    ds = rd.from_pandas(df)
    truth = cosine_pairs_exact(ds, threshold=0.95, num_blocks=4).to_pandas()
    truth = set(zip(truth["id_a"], truth["id_b"]))
    assert len(truth) >= 100  # planted pairs survive the threshold

    def pairs(probes):
        p = embedding_neardup_pairs(ds, threshold=0.95,
                                    probes=probes).to_pandas()
        return set(zip(p["id_a"], p["id_b"]))

    s0, s1 = pairs(0), pairs(1)
    assert s0 <= truth and s1 <= truth
    assert s0 <= s1
    r0, r1 = len(s0) / len(truth), len(s1) / len(truth)
    # deterministic (seeded data + seeded planes): measured ~0.3 vs ~0.9
    assert r1 > r0
    assert r1 >= 0.7

    # end-to-end removal: LSH pairs -> CC -> anti-join keeps exactly one
    # member per found cluster (the minimum id)
    from siren_ray.stages.dedup import remove_embedding_neardups

    kept = remove_embedding_neardups(
        ds, threshold=0.95, probes=1, num_partitions=4
    ).to_pandas()
    kept_ids = set(kept["vec_id"])
    assert len(kept_ids) == 300 - len({max(p) for p in s1})
    for a, b in s1:
        assert not (a in kept_ids and b in kept_ids)
        assert a in kept_ids or b in kept_ids


def test_range_join_count(ray_session):
    """Inclusive [ts-width, ts] window, counts across band boundaries,
    zero-match rows kept with 0."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import range_join_count

    left = pd.DataFrame({
        "id": pd.array([1, 2, 3], dtype="int64"),
        "t": pd.to_datetime(["2024-01-10 00:00:00",
                             "2024-01-10 12:00:00",
                             "2024-03-01 00:00:00"]),
    })
    right = pd.DataFrame({
        "rt": pd.to_datetime([
            "2024-01-08 00:00:00",   # == id1 window start (inclusive)
            "2024-01-10 00:00:00",   # == id1 ts (inclusive), within id2
            "2024-01-10 12:00:00",   # after id1, == id2 ts (inclusive)
            "2024-01-07 23:59:59",   # outside id1's 2d window by 1 s
        ]),
    })
    out = range_join_count(
        rd.from_pandas(left), rd.from_pandas(right),
        left_ts="t", right_ts="rt", width_s=2 * 86400.0,
        band_s=86400.0, num_partitions=3,
    ).to_pandas()
    got = dict(zip(out["id"], out["n_matches"]))
    # id1 [01-08, 01-10]: rt1, rt2; id2 [01-08 12:00, 01-10 12:00]:
    # rt2, rt3; id3: none
    assert got == {1: 2, 2: 2, 3: 0}
    """Backward as-of: latest right <= left per key; exact ts matches
    included; keys with no earlier right row get nulls; left int dtypes
    survive the null-padded union."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import asof_join

    left = pd.DataFrame({
        "id": pd.array([1, 2, 3, 4], dtype="int64"),
        "k": pd.array([1, 1, 2, 9], dtype="int64"),
        "t": pd.to_datetime(["2024-01-05", "2024-01-10",
                             "2024-01-05", "2024-01-05"]),
    })
    right = pd.DataFrame({
        "k": pd.array([1, 1, 2], dtype="int64"),
        "t": pd.to_datetime(["2024-01-01", "2024-01-10", "2024-01-06"]),
        "val": pd.array([100, 200, 300], dtype="int64"),
    })
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="t", by="k", right_cols=("val",),
                    num_partitions=3).to_pandas()
    got = {r.id: (None if pd.isna(r.val) else int(r.val))
           for r in out.itertuples()}
    # id1: k=1, t=01-05 -> 100; id2: exact match 01-10 -> 200;
    # id3: k=2 right is LATER (01-06 > 01-05) -> null; id4: k=9 -> null
    assert got == {1: 100, 2: 200, 3: None, 4: None}
    assert out["id"].dtype == "int64" and out["k"].dtype == "int64"


def test_approx_distinct(ray_session):
    """HLL estimate within ~5% of exact on 60k values / 20k uniques;
    register merge across datasets equals the union sketch."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import approx_distinct

    ids = np.arange(60_000) % 20_000
    ds = rd.from_pandas(pd.DataFrame({"u": [f"user-{i}" for i in ids]}))
    r = approx_distinct(ds, "u")
    assert abs(r["estimate"] - 20_000) / 20_000 < 0.05

    # mergeability: sketch(A) merged with sketch(B) == sketch(A ∪ B)
    a = approx_distinct(
        rd.from_pandas(pd.DataFrame({"u": [f"user-{i}" for i in range(0, 10_000)]})), "u")
    b = approx_distinct(
        rd.from_pandas(pd.DataFrame({"u": [f"user-{i}" for i in range(5_000, 15_000)]})), "u")
    both = approx_distinct(
        rd.from_pandas(pd.DataFrame({"u": [f"user-{i}" for i in range(0, 15_000)]})), "u")
    merged = np.maximum(a["registers"], b["registers"])
    assert np.array_equal(merged, both["registers"])


def test_grouped_topk(ray_session):
    """Per-group top-k: ties break on tie_col ASC, groups smaller than k
    keep all rows, string group keys route correctly."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import grouped_topk

    df = pd.DataFrame({
        "g": ["a", "a", "a", "a", "b", "c", "c"],
        "v": [5.0, 9.0, 9.0, 1.0, 2.0, 3.0, 3.0],
        "id": [10, 11, 12, 13, 20, 30, 31],
    }).astype({"id": "int64"})
    out = grouped_topk(rd.from_pandas(df), "g", "v", 2, tie_col="id",
                       num_partitions=4).to_pandas()
    got = {(r.g, r.id) for r in out.itertuples()}
    # a: 9.0@11 (tie, lower id), 9.0@12; b: all; c: both ties
    assert got == {("a", 11), ("a", 12), ("b", 20), ("c", 30), ("c", 31)}


def test_sessionize_boundaries(ray_session):
    """Gap exactly == threshold does NOT break (strict >); user change
    always does; ties order by event_id."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.events import sessionize

    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: gaps 1800s (no break), 1801s (break)
        (0, base, 1),
        (1, base + pd.Timedelta(seconds=1800), 1),
        (2, base + pd.Timedelta(seconds=1800 + 1801), 1),
        # user 2: single event
        (3, base, 2),
        # user 7 (same partition as 1 mod small P): tie on ts
        (4, base, 7),
        (5, base, 7),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"]).astype(
        {"event_id": "int64", "user_id": "int64"}
    )
    out = sessionize(rd.from_pandas(df), gap_s=1800,
                     num_partitions=3).to_pandas()
    got = dict(zip(out["event_id"], out["session_seq"]))
    assert got == {0: 1, 1: 1, 2: 2, 3: 1, 4: 1, 5: 1}


def test_minhash_family_no_uint64_wrap():
    """The (a*h + b) mod p family must be EXACT in uint64: numpy result ==
    Python big-int arithmetic for every (perm, shingle) cell."""
    import numpy as np

    from siren_ray.stages.dedup import _MERSENNE, _minhash_params
    from siren_ray.util import hash_strings

    a, b = _minhash_params(64)
    assert int(a.max()) < 1 << 31
    sh = [f"shingle-{i}" for i in range(200)]
    h = hash_strings(sh).astype(np.uint64) >> np.uint64(32)
    vals = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    for pi in range(0, 64, 7):
        for si in range(0, 200, 31):
            expect = (int(a[pi]) * int(h[si]) + int(b[pi])) % _MERSENNE
            assert int(vals[pi, si]) == expect


def test_minhash_finds_near_duplicates(ray_session):
    import ray.data as rd

    from siren_ray.stages.dedup import minhash_duplicate_pairs

    base = ("the state capital police report officials said district "
            "court order health family farmer student school " * 4)
    texts = [base, base + " tail", "completely different words here now " * 6]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    pairs = minhash_duplicate_pairs(ds, "doc_id").to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_dedup_exact_first_wins(ray_session):
    import ray.data as rd

    from siren_ray.stages.dedup import dedup_exact

    ds = rd.from_items(
        [{"k": "a", "o": 3}, {"k": "a", "o": 1}, {"k": "b", "o": 2}]
    )
    out = dedup_exact(ds, "k", "o").to_pandas().sort_values("k")
    assert list(out["o"]) == [1, 2]


# --- ANN ------------------------------------------------------------------

def test_brute_force_topk_exact(ray_session):
    import ray.data as rd

    from siren_ray.stages.ann import brute_force_topk

    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]
    )
    q = vecs[:2]
    out = brute_force_topk(ds, q, k=5).to_pandas()
    # oracle: numpy
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ qn.T
    for qi in range(2):
        expected = list(np.argsort(-sims[:, qi], kind="stable")[:5])
        got = list(
            out[out["query_id"] == qi]
            .sort_values(["cosine", "vec_id"], ascending=[False, True])["vec_id"]
        )
        assert got == expected
    # each query vector's own top-1 is itself
    assert set(out[out["query_id"] == 0].head(1)["vec_id"]) == {0}


def test_ivf_topk_recall(ray_session):
    import ray.data as rd

    from siren_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.RandomState(1)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    )
    q = vecs[:3]
    exact = brute_force_topk(ds, q, k=5).to_pandas()
    approx = ivf_topk(ds, q, k=5, n_lists=8, nprobe=4,
                      train_sample=300).to_pandas()
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5  # probing half the lists


def test_pq_encode_codes_shape_and_determinism(ray_session):
    import ray.data as rd

    from siren_ray.stages.ann import pq_encode, pq_train

    rng = np.random.RandomState(2)
    vecs = rng.standard_normal((120, 16)).astype(np.float32)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(120)]
    )
    books = pq_train(vecs, m=4, nbits=6)
    assert books.shape == (4, 64, 4) and books.dtype == np.float32
    out = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    assert len(out) == 120
    codes = np.stack(out["pq_code"].to_numpy())
    assert codes.shape == (120, 4) and codes.dtype == np.uint8
    # 4 uint8 codes replace 16 float32 = 64 B -> 4 B (16x)
    # deterministic and partitioning-invariant
    out2 = (pq_encode(ds.repartition(7), books)
            .to_pandas().sort_values("vec_id"))
    assert np.array_equal(codes, np.stack(out2["pq_code"].to_numpy()))


def test_pq_topk_recall_vs_brute(ray_session):
    import ray.data as rd

    from siren_ray.stages.ann import (brute_force_topk, pq_encode,
                                      pq_topk, pq_train)

    rng = np.random.RandomState(3)
    # clustered corpus: PQ codebooks should capture the cluster structure
    centers = rng.standard_normal((10, 16)).astype(np.float32) * 4
    vecs = (centers[rng.randint(0, 10, 300)]
            + rng.standard_normal((300, 16)).astype(np.float32))
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    )
    q = vecs[:4]
    books = pq_train(vecs, m=4, nbits=8)
    codes = pq_encode(ds, books)
    exact = brute_force_topk(ds, q, k=5).to_pandas()
    approx = pq_topk(codes, q, books, k=5).to_pandas()
    assert (approx.groupby("query_id").size() == 5).all()
    recalls = []
    for qi in range(4):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.7, recalls
    # ADC scores approximate true cosine: top-1 of each query (itself)
    # must survive quantization on clustered data
    for qi in range(4):
        top = (approx[approx["query_id"] == qi]
               .sort_values(["cosine", "vec_id"],
                            ascending=[False, True]).iloc[0])
        assert top["vec_id"] == qi


def test_pq_topk_rerank_exact_scores(ray_session):
    import ray.data as rd

    from siren_ray.stages.ann import (brute_force_topk, pq_encode,
                                      pq_topk_rerank, pq_train)

    rng = np.random.RandomState(5)
    centers = rng.standard_normal((10, 16)).astype(np.float32) * 4
    vecs = (centers[rng.randint(0, 10, 300)]
            + rng.standard_normal((300, 16)).astype(np.float32))
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    )
    q = vecs[:4]
    books = pq_train(vecs, m=4, nbits=8)
    codes = pq_encode(ds, books)
    exact = brute_force_topk(ds, q, k=5).to_pandas()
    got = pq_topk_rerank(ds, codes, q, books, k=5,
                         shortlist=60).to_pandas()
    assert (got.groupby("query_id").size() == 5).all()
    # re-ranked cosines are EXACT: every returned (query, vec) score
    # equals the brute-force cosine for that pair (quantization only
    # picks candidates, never scores them)
    emb = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    for _, row in got.iterrows():
        want = float(emb[int(row["vec_id"])] @ qn[int(row["query_id"])])
        assert abs(row["cosine"] - want) < 1e-6
    # and recall beats ADC-alone: shortlist 60/300 captures the top-5
    recalls = []
    for qi in range(4):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        recalls.append(len(e & set(
            got[got["query_id"] == qi]["vec_id"])) / len(e))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_chunk_documents_boundaries():
    from siren_ray.functions.textstats import chunk_documents

    w = lambda n: " ".join(f"t{i}" for i in range(n))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([w(3), w(10), w(14), "", "   "], pa.string()),
    })
    out = chunk_documents(t, size=10, stride=4)
    df = out.to_pandas()
    # doc 1: 3 < size -> one chunk of 3; doc 2: exactly size -> one chunk
    # doc 3: 14 tokens -> chunks at 0 (10) and 4 (10, covers to 14)
    # docs 4/5: empty/whitespace -> no chunks
    assert df[df.doc_id == 1]["n_tokens"].tolist() == [3]
    assert df[df.doc_id == 2]["n_tokens"].tolist() == [10]
    assert df[df.doc_id == 3]["n_tokens"].tolist() == [10, 10]
    assert df[df.doc_id == 3]["chunk_id"].tolist() == [0, 1]
    assert df[df.doc_id == 3]["chunk_text"].tolist()[1].startswith("t4 ")
    assert set(df.doc_id) == {1, 2, 3}
    # exact stride multiple: 18 = 10 + 2*4 -> last chunk starts at 8
    t2 = pa.table({"doc_id": pa.array([9], pa.int64()),
                   "text": pa.array([w(18)], pa.string())})
    df2 = chunk_documents(t2, size=10, stride=4).to_pandas()
    assert df2["chunk_id"].tolist() == [0, 1, 2]
    assert df2["n_tokens"].tolist() == [10, 10, 10]


def test_hash_join_salt_hot_keys(ray_session):
    """Zipf-skewed left side: salted join equals the broadcast join and
    actually spreads the hot key over multiple output partitions."""
    import ray.data as rd

    from siren_ray.stages.relational import hash_join

    rng = np.random.RandomState(5)
    # 4000 rows of key 7 (one Zipf host), 1000 uniform cold keys
    keys = np.concatenate([np.full(4000, 7), rng.randint(100, 200, 1000)])
    left = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(np.arange(len(keys)), pa.int64()),
    })).repartition(8)
    right = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(300, dtype=np.int64), pa.int64()),
        "label": pa.array([f"L{i}" for i in range(300)], pa.string()),
    })).repartition(4)

    base = hash_join(left, right, on="k", how="inner",
                     broadcast=True).to_pandas()
    salted = hash_join(left, right, on="k", how="inner", broadcast=False,
                       num_partitions=8, salt_hot=True,
                       hot_salt=4).to_pandas()
    cols = ["k", "v", "label"]
    a = base[cols].sort_values(["k", "v"]).reset_index(drop=True)
    b = salted[cols].sort_values(["k", "v"]).reset_index(drop=True)
    assert a.equals(b)

    # balance: without salting the hot key pins 4000 rows to ONE
    # partition; salted, no output partition may hold more than the hot
    # count / hot_salt + the cold share (with slack)
    import ray as _ray

    out = hash_join(left, right, on="k", how="inner", broadcast=False,
                    num_partitions=8, salt_hot=True, hot_salt=4)
    sizes = [b.num_rows for b in _ray.get(out.to_arrow_refs())]
    assert sum(sizes) == 5000
    assert max(sizes) < 4000  # the hot key no longer lands in one task


def test_snapshot_diff_classifies(ray_session):
    import ray.data as rd

    from siren_ray.stages.relational import snapshot_diff

    old = rd.from_items([
        {"doc_id": 1, "fp": "a"},   # unchanged
        {"doc_id": 2, "fp": "b"},   # changed
        {"doc_id": 3, "fp": "c"},   # removed
    ]).repartition(2)
    new = rd.from_items([
        {"doc_id": 1, "fp": "a"},
        {"doc_id": 2, "fp": "B"},
        {"doc_id": 4, "fp": "d"},   # added
    ]).repartition(3)
    out = (snapshot_diff(old, new, key="doc_id", fp_col="fp",
                         num_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["status"].tolist() == [
        "unchanged", "changed", "removed", "added"]
    assert out.loc[3, "fp_old"] == "" and out.loc[2, "fp_new"] == ""
    assert out.loc[1, "fp_old"] == "b" and out.loc[1, "fp_new"] == "B"


def test_kmeans_train_recovers_separated_clusters(ray_session):
    import ray.data as rd

    from siren_ray.stages.ann import kmeans_predict, kmeans_train

    rng = np.random.RandomState(7)
    # 3 well-separated directions in 8-dim; 120 points each with small noise
    dirs = np.eye(8, dtype=np.float64)[:3] * 10.0
    pts, truth = [], []
    for c in range(3):
        pts.append(dirs[c] + 0.05 * rng.standard_normal((120, 8)))
        truth.extend([c] * 120)
    vecs = np.concatenate(pts)
    order = rng.permutation(len(vecs))
    vecs, truth = vecs[order], np.array(truth)[order]
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()}
         for i in range(len(vecs))]
    ).repartition(6)

    cents = kmeans_train(ds, 3, iters=10, train_sample=64)
    assert cents.shape == (3, 8)
    # each ground-truth direction matches exactly one centroid closely
    dn = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
    sims = dn @ cents.T.astype(np.float64)  # (3 truth, 3 cents)
    best = sims.argmax(axis=1)
    assert sorted(best.tolist()) == [0, 1, 2]
    assert (sims.max(axis=1) > 0.99).all()

    # predict: cluster ids agree with ground truth up to the permutation
    out = kmeans_predict(ds, cents).to_pandas().sort_values("vec_id")
    pred = out["ivf_list"].to_numpy()
    remap = {c: int(best[c]) for c in range(3)}
    expect = np.array([remap[t] for t in truth])
    ids = out["vec_id"].to_numpy()
    assert (pred == expect[ids]).all()


def test_kmeans_train_partition_invariant(ray_session):
    """Well-separated data: identical centroids regardless of block
    layout / combine fan-in (partial sums are per-cluster exact; float64
    addition-order effects are below tolerance on separated clusters)."""
    import ray.data as rd

    from siren_ray.stages.ann import kmeans_train

    rng = np.random.RandomState(3)
    dirs = np.eye(6, dtype=np.float64)[:2] * 8.0
    vecs = np.concatenate(
        [dirs[c] + 0.05 * rng.standard_normal((80, 6)) for c in range(2)]
    )
    items = [{"vec_id": i, "embedding": vecs[i].tolist()}
             for i in range(len(vecs))]
    a = kmeans_train(rd.from_items(items).repartition(2), 2,
                     iters=6, combine_partitions=2, train_sample=32)
    b = kmeans_train(rd.from_items(items).repartition(9), 2,
                     iters=6, combine_partitions=5, train_sample=32)
    # block layout changes the Bernoulli init sample -> centroid ORDER may
    # permute; the converged centroid SET must agree
    a = a[np.argsort(a[:, 0])]
    b = b[np.argsort(b[:, 0])]
    assert np.allclose(a, b, atol=1e-5)


# --- multimodal -----------------------------------------------------------

def test_ocr_actor_pool(ray_session):
    import ray.data as rd

    from siren_ray.stages.multimodal import FakeOcrEngine, OcrTiles, make_tiles

    tiles = make_tiles(10)
    ds = rd.from_arrow(tiles).map_batches(
        OcrTiles, batch_format="pyarrow", batch_size=32, concurrency=(1, 2)
    )
    df = ds.to_pandas()
    assert "data" not in df.columns  # payload dropped after decode
    assert len(df) == tiles.num_rows
    # deterministic engine: recompute expected
    eng = FakeOcrEngine(init_cost_s=0)
    expected = [eng.image_to_string(d) for d in tiles["data"].to_pylist()]
    got = dict(zip(df["url"], df["ocr_text"]))
    want = dict(zip(tiles["url"].to_pylist(), expected))
    assert got == want


def test_decode_stub_raises():
    from siren_ray.stages.multimodal import (
        decode_image_stub,
        resize_image_stub,
    )

    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x00")
    with pytest.raises(NotImplementedError):
        resize_image_stub(b"\x00", 64, 64)


def test_binary_features_stage(ray_session):
    """Feature-extract actor stage: fixed-dim normalized vectors, payload
    dropped, deterministic across actors."""
    import ray.data as rd

    from siren_ray.stages.multimodal import BinaryFeatures, make_tiles

    tiles = rd.from_arrow(make_tiles(6))
    out = tiles.map_batches(
        BinaryFeatures, batch_format="pyarrow", batch_size=16,
        concurrency=(1, 2),
    ).to_pandas()
    assert "data" not in out.columns and "features" in out.columns
    vecs = np.array(out["features"].tolist(), dtype=np.float32)
    assert vecs.shape == (72, 256)
    norms = np.linalg.norm(vecs, axis=1)
    assert np.allclose(norms[norms > 0], 1.0, atol=1e-5)
    # deterministic: same blob -> same vector regardless of actor
    out2 = rd.from_arrow(make_tiles(6)).map_batches(
        BinaryFeatures, batch_format="pyarrow", batch_size=8,
        concurrency=(1, 2),
    ).to_pandas()
    a = {u: v for u, v in zip(out["url"], out["features"])}
    b = {u: v for u, v in zip(out2["url"], out2["features"])}
    assert all(np.allclose(a[u], b[u]) for u in a)


def test_frame_sample():
    """Frame sampling: even spacing, metadata carry, short/null blobs."""
    import pyarrow as pa

    from siren_ray.stages.multimodal import frame_sample

    batch = pa.table({
        "vid": pa.array([1, 2, 3], pa.int64()),
        "data": pa.array([bytes(range(100)), b"abc", None], pa.binary()),
    })
    out = frame_sample(batch, n_frames=4, frame_size=16)
    # blob 1: 4 frames; blob 2 (3 bytes): 1 truncated frame; null: none
    assert out["vid"].to_pylist() == [1, 1, 1, 1, 2]
    assert out["frame_idx"].to_pylist() == [0, 1, 2, 3, 0]
    offs = out["frame_offset"].to_pylist()
    assert offs[0] == 0 and offs[3] == 84  # last frame ends at blob end
    frames = out["frame"].to_pylist()
    assert frames[0] == bytes(range(16))
    assert frames[3] == bytes(range(84, 100))
    assert frames[4] == b"abc"


def test_remove_near_duplicates(ray_session):
    import ray.data as rd

    from siren_ray.stages.dedup import neardup_losers, remove_near_duplicates

    base = ("the state capital police report officials said district "
            "court order health family farmer student school " * 4)
    texts = {
        0: base,
        1: base + " tail",           # near-dup of 0 -> dropped
        2: "completely different words here now " * 6,
        3: base + " tail",           # exact dup of 1 -> dropped
    }
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in texts.items()]
    )
    kept = remove_near_duplicates(ds, "doc_id").to_pandas()
    assert set(kept["doc_id"]) == {0, 2}

    # the distributed path (CC + hash_antijoin, no driver-side pairs or
    # loser set) keeps exactly the same documents
    kept_dist = remove_near_duplicates(
        ds, "doc_id", method="distributed", num_partitions=4
    ).to_pandas()
    assert set(kept_dist["doc_id"]) == {0, 2}

    import pandas as pd

    losers = neardup_losers(pd.DataFrame({"id_a": [1, 5], "id_b": [2, 6]}))
    assert losers == {2, 6}
    # transitive cluster keeps only the minimum
    losers2 = neardup_losers(
        pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
    )
    assert losers2 == {2, 3}


def test_embedding_neardup_degenerate_bucket_capped(ray_session):
    """A corpus of near-identical vectors (the dedup pathology: one LSH
    bucket holds everything) must verify in O(n*cap), not O(n^2), yet
    keep the cluster CONNECTED via the pivot subset so removal still
    drops all but one member."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.dedup import (
        embedding_neardup_pairs,
        remove_embedding_neardups,
    )

    rng = np.random.RandomState(9)
    base = rng.standard_normal(16)
    base /= np.linalg.norm(base)
    n = 4000
    vecs = base[None, :] + 0.001 * rng.standard_normal((n, 16))
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"),
         "embedding": [list(map(float, v)) for v in vecs]}
    )
    ds = rd.from_pandas(df)
    cap = 32
    pairs = embedding_neardup_pairs(
        ds, threshold=0.95, probes=0, max_bucket=cap
    ).to_pandas()
    # O(n*cap) output bound, not O(n^2): n_planes=12 + probes=0 means at
    # most a handful of buckets, each emitting <= cap*n pairs
    assert len(pairs) <= cap * n
    assert len(pairs) >= n - 50  # every member pairs with a pivot
    # every member still connects: removal keeps ~1 representative
    kept = remove_embedding_neardups(
        ds, threshold=0.95, probes=0, num_partitions=4
    ).to_pandas()
    assert len(kept) <= 5  # one per connected component (few buckets)


def test_ivf_random_training_sample_on_clustered_input(ray_session):
    """ids arrive SORTED BY CLUSTER (at scale: the first file is one
    domain/day shard). A prefix training sample would see only cluster 0
    and collapse the centroids; the uniform random sample must keep
    recall and pruning on the untouched clusters."""
    import ray.data as rd

    from siren_ray.stages.ann import brute_force_topk, ivf_topk, kmeans_fit

    rng = np.random.RandomState(5)
    n_clusters, per = 8, 250
    centers = rng.standard_normal((n_clusters, 16)).astype(np.float32) * 4
    vecs = np.concatenate([
        centers[c] + rng.standard_normal((per, 16)).astype(np.float32)
        for c in range(n_clusters)
    ])  # ids 0..249 cluster 0, 250..499 cluster 1, ... (NOT shuffled)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()}
         for i in range(len(vecs))]
    ).repartition(16)
    # query one vector from each of the four LAST clusters — a prefix
    # sample has never seen their region
    q = vecs[[per * c + 7 for c in range(4, 8)]]
    exact = brute_force_topk(ds, q, k=5).to_pandas()
    approx = ivf_topk(ds, q, k=5, n_lists=8, nprobe=2,
                      train_sample=256).to_pandas()
    recalls = []
    for qi in range(len(q)):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # well-separated clusters + unbiased centroids: the home list is
    # always probed first
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    # and the prefix pathology really is a pathology: centroids trained
    # on the first 256 rows (cluster 0 only) are near-duplicates
    prefix_cents = kmeans_fit(vecs[:256], 8)
    spread_prefix = np.linalg.norm(
        prefix_cents - prefix_cents.mean(0), axis=1).mean()
    rand_idx = rng.choice(len(vecs), 256, replace=False)
    rand_cents = kmeans_fit(vecs[rand_idx], 8)
    spread_rand = np.linalg.norm(
        rand_cents - rand_cents.mean(0), axis=1).mean()
    assert spread_rand > 2 * spread_prefix


def test_hash_join_inner_left_and_broadcast_equivalence(ray_session):
    """General distributed equi-join: inner and left, int and string
    keys, shuffle path == broadcast path == pandas ground truth."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import hash_join

    rng = np.random.RandomState(2)
    left = pd.DataFrame({
        "k": rng.randint(0, 40, size=200).astype("int64"),
        "lv": np.arange(200, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": np.arange(0, 30, dtype="int64"),  # keys 30..39 unmatched
        "rv": np.arange(100, 130, dtype="int64"),
    })
    lds = rd.from_pandas(left).repartition(7)
    rds = rd.from_pandas(right).repartition(3)

    for how in ("inner", "left"):
        want = left.merge(right, how=how, on="k")
        got_sh = hash_join(lds, rds, on="k", how=how, broadcast=False,
                           num_partitions=8).to_pandas()
        got_bc = hash_join(lds, rds, on="k", how=how,
                           broadcast=True).to_pandas()
        for got in (got_sh, got_bc):
            g = got.sort_values(["k", "lv"]).reset_index(drop=True)
            w = want.sort_values(["k", "lv"]).reset_index(drop=True)
            assert len(g) == len(w), how
            assert (g["lv"].to_numpy() == w["lv"].to_numpy()).all()
            pd.testing.assert_series_equal(
                g["rv"].astype("float64"), w["rv"].astype("float64"),
                check_names=False)

    # string keys + right_on with different column name
    lefts = pd.DataFrame({"host": [f"h{i % 5}" for i in range(40)],
                          "lv": np.arange(40, dtype="int64")})
    rights = pd.DataFrame({"hname": [f"h{i}" for i in range(4)],
                           "score": np.arange(4, dtype="int64")})
    got = hash_join(rd.from_pandas(lefts), rd.from_pandas(rights),
                    on="host", right_on="hname", how="inner",
                    broadcast=False, num_partitions=4).to_pandas()
    want = lefts.merge(rights, how="inner", left_on="host",
                       right_on="hname")
    assert len(got) == len(want) == 32
    assert (got.sort_values("lv")["score"].to_numpy()
            == want.sort_values("lv")["score"].to_numpy()).all()


def test_hash_join_full_outer(ray_session):
    """FULL OUTER: unmatched rows from BOTH sides survive exactly once
    across partitions; salt_hot+outer is rejected."""
    import pandas as pd
    import pytest as _pytest
    import ray.data as rd

    from siren_ray.stages.relational import hash_join

    left = pd.DataFrame({"k": np.arange(0, 25, dtype="int64"),
                         "lv": np.arange(25, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(15, 40, dtype="int64"),
                          "rv": np.arange(100, 125, dtype="int64")})
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(4)
    got = hash_join(lds, rds, on="k", how="outer",
                    num_partitions=6).to_pandas()
    want = left.merge(right, how="outer", on="k")
    assert len(got) == len(want) == 40
    g = got.sort_values("k").reset_index(drop=True)
    w = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_series_equal(g["lv"].astype("float64"),
                                   w["lv"].astype("float64"),
                                   check_names=False)
    pd.testing.assert_series_equal(g["rv"].astype("float64"),
                                   w["rv"].astype("float64"),
                                   check_names=False)
    with _pytest.raises(ValueError):
        hash_join(lds, rds, on="k", how="outer", salt_hot=True)


def test_hashed_text_embedding():
    """Feature-hashing embedding: unit norm, near-identical texts have
    cosine ~1, unrelated texts don't; empty text -> zero vector."""
    import pyarrow as pa

    from siren_ray.functions.textstats import hashed_text_embedding

    t = pa.table({"doc_id": [1, 2, 3, 4], "text": [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog today",
        "completely different subject matter entirely unrelated words",
        "",
    ]})
    out = hashed_text_embedding(t)
    assert out.column_names == ["doc_id", "embedding"]
    m = np.array(out["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    assert np.allclose(norms[:3], 1.0) and norms[3] == 0.0
    cos = m @ m.T
    assert cos[0, 1] > 0.9
    assert cos[0, 2] < 0.5
    # deterministic
    m2 = np.array(hashed_text_embedding(t)["embedding"].to_pylist())
    assert np.array_equal(m, m2)


def test_weighted_sample_properties(ray_session):
    """A-Res weighted sampling: deterministic, exactly k rows, and a
    dominant-weight item is selected across every salt while a
    negligible-weight item almost never is."""
    import ray.data as rd

    from siren_ray.stages.relational import weighted_sample

    items = [{"id": i, "w": 1.0} for i in range(200)]
    items[7]["w"] = 1e6   # dominant
    items[13]["w"] = 1e-6  # negligible
    ds = rd.from_items(items, override_num_blocks=4)
    a = weighted_sample(ds, 20, weight_col="w", id_col="id")
    b = weighted_sample(ds, 20, weight_col="w", id_col="id")
    assert a.num_rows == 20
    assert sorted(a["id"].to_pylist()) == sorted(b["id"].to_pylist())
    hits7 = hits13 = 0
    for salt in map(str, range(10)):
        got = set(weighted_sample(ds, 20, weight_col="w", id_col="id",
                                  seed_salt=salt)["id"].to_pylist())
        hits7 += 7 in got
        hits13 += 13 in got
    assert hits7 == 10
    assert hits13 <= 1
    import pytest as _pytest

    with _pytest.raises(Exception):
        weighted_sample(
            rd.from_items([{"id": 1, "w": 0.0}]), 1,
            weight_col="w", id_col="id")


def test_window_ops_matches_pandas(ray_session):
    """lag/lead/cumsum/row_number == whole-frame pandas ground truth;
    group edges null; block layout does not change results."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.events import window_ops

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "user_id": rng.randint(0, 9, size=300).astype("int64"),
        "ts": rng.permutation(300).astype("int64"),
        "event_id": np.arange(300, dtype="int64"),
        "value": rng.randint(-5, 20, size=300).astype("int64"),
    })
    ref = df.sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True)
    g = ref.groupby("user_id", sort=False)
    ref["lag_v"] = g["value"].shift(1)
    ref["lead_v"] = g["value"].shift(-1)
    ref["cumsum_v"] = g["value"].cumsum()
    ref["row_number"] = (g.cumcount() + 1).astype("int64")
    for blocks in (1, 6):
        got = window_ops(rd.from_pandas(df).repartition(blocks),
                         num_partitions=5).to_pandas()
        got = got.sort_values("event_id").reset_index(drop=True)
        w = ref.sort_values("event_id").reset_index(drop=True)
        for c in ("lag_v", "lead_v"):
            a, b = got[c].to_numpy(float), w[c].to_numpy(float)
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
        assert (got["cumsum_v"].to_numpy("int64")
                == w["cumsum_v"].to_numpy("int64")).all()
        assert (got["row_number"].to_numpy("int64")
                == w["row_number"].to_numpy("int64")).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        window_ops(rd.from_pandas(df), ops=("median",))


def test_grouped_agg_matches_pandas(ray_session):
    """Generic partial-combine aggregation == whole-frame pandas groupby
    for count/sum/min/max/mean, at two block layouts (invariance)."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import grouped_agg

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=400),
        "h": rng.randint(0, 2, size=400).astype("int64"),
        "v": rng.randint(-50, 50, size=400).astype("int64"),
    })
    want = df.groupby(["g", "h"]).agg(
        n=("v", "count"), s=("v", "sum"), lo=("v", "min"),
        hi=("v", "max"), avg=("v", "mean")).reset_index()
    for blocks in (1, 7):
        got = grouped_agg(
            rd.from_pandas(df).repartition(blocks), ["g", "h"],
            {"n": ("v", "count"), "s": ("v", "sum"), "lo": ("v", "min"),
             "hi": ("v", "max"), "avg": ("v", "mean")},
        ).to_pandas().sort_values(["g", "h"]).reset_index(drop=True)
        w = want.sort_values(["g", "h"]).reset_index(drop=True)
        for c in ("n", "s", "lo", "hi"):
            assert (got[c].to_numpy() == w[c].to_numpy()).all(), c
        assert np.allclose(got["avg"], w["avg"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        grouped_agg(rd.from_pandas(df), "g", {"x": ("v", "median")})

    # SQL GROUP BY keeps the NULL group — so must we
    dfn = pd.DataFrame({"g": ["a", None, None], "v": [1, 2, 3]})
    got = grouped_agg(rd.from_pandas(dfn), "g",
                      {"s": ("v", "sum")}).to_pandas()
    assert len(got) == 2
    assert int(got[got["g"].isna()]["s"].iloc[0]) == 5


def test_kll_quantile_sketch_accuracy_and_merge(ray_session):
    """Rank error <= ~2% at k=200 on 200k values (normal + zipf), and
    merging per-block sketches equals sketching the whole stream within
    the same bound (mergeability)."""
    import ray.data as rd

    from siren_ray.stages.relational import KLLSketch, quantile_sketch

    rng = np.random.RandomState(11)
    data = {
        "normal": rng.standard_normal(200_000) * 40 + 7,
        "zipf": rng.zipf(1.3, 200_000).astype(np.float64),
    }
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    for name, vals in data.items():
        sk = KLLSketch(k=200).update(vals)
        est = sk.quantiles(qs)
        sv = np.sort(vals)
        def rank_err(sv, e, q):
            # tied values occupy a rank INTERVAL; error is the distance
            # from q to [lo, hi]
            lo = np.searchsorted(sv, e, side="left") / len(sv)
            hi = np.searchsorted(sv, e, side="right") / len(sv)
            return max(lo - q, q - hi, 0.0)

        for q, e in zip(qs, est):
            assert rank_err(sv, e, q) <= 0.02, (name, q, e)
        # merge of 8 partial sketches ~ one sketch
        merged = KLLSketch(k=200)
        for part in np.array_split(vals, 8):
            merged.merge(KLLSketch(k=200).update(part))
        for q, e in zip(qs, merged.quantiles(qs)):
            assert rank_err(sv, e, q) <= 0.02, ("merged", name, q, e)
        assert merged.n == len(vals)

    # distributed path over a Dataset
    import pandas as pd

    ds = rd.from_pandas(
        pd.DataFrame({"x": data["normal"]})).repartition(16)
    est = quantile_sketch(ds, "x", qs, k=200)
    sv = np.sort(data["normal"])
    for q, e in zip(qs, est):
        lo = np.searchsorted(sv, e, side="left") / len(sv)
        hi = np.searchsorted(sv, e, side="right") / len(sv)
        assert max(lo - q, q - hi, 0.0) <= 0.02, (q, e)


def test_misra_gries_heavy_hitters_bounds(ray_session):
    """MG guarantees: count_lo <= true <= count_lo + max_undercount for
    every reported item, and every item with true count > n/(k+1) is
    reported. Zipf-distributed hosts over 16 blocks."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import heavy_hitters

    rng = np.random.RandomState(5)
    hosts = np.array([f"h{z}.example.org" for z in rng.zipf(1.5, 100_000)],
                     dtype=object)
    true = pd.Series(hosts).value_counts()
    k = 20
    ds = rd.from_pandas(pd.DataFrame({"host": hosts})).repartition(16)
    out = heavy_hitters(ds, "host", k=k)
    assert len(out) <= k
    under = int(out["max_undercount"].iloc[0])
    for _, row in out.iterrows():
        t = int(true[row["item"]])
        assert row["count_lo"] <= t <= row["count_lo"] + under, row
    n = len(hosts)
    must_report = set(true[true > n / (k + 1)].index)
    assert must_report <= set(out["item"])
    # top-1 exact item identified first
    assert out["item"].iloc[0] == true.index[0]


def test_hash_semijoin_complements_antijoin(ray_session):
    """semijoin(keep) + antijoin(drop) exactly partition the left side,
    and match a pandas isin reference."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.dedup import hash_antijoin, hash_semijoin

    rng = np.random.RandomState(11)
    left = pd.DataFrame({"k": rng.randint(0, 500, 2000).astype("int64"),
                         "payload": np.arange(2000, dtype="int64")})
    keys = pd.DataFrame({"id": rng.randint(0, 500, 300).astype("int64")})
    lds = rd.from_pandas(left).repartition(8)
    kds = rd.from_pandas(keys).repartition(4)
    semi = hash_semijoin(lds, kds, "k", num_partitions=16).to_pandas()
    anti = hash_antijoin(lds, kds, "k", num_partitions=16).to_pandas()
    want = left["k"].isin(set(keys["id"]))
    assert sorted(semi["payload"]) == sorted(left.loc[want, "payload"])
    assert sorted(anti["payload"]) == sorted(left.loc[~want, "payload"])
    assert len(semi) + len(anti) == len(left)


def test_rolling_sum_matches_pandas_window(ray_session):
    """rolling_sum == per-key pandas rolling reference, including ties on
    ts (broken by order col) and keys split across input blocks."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.events import rolling_sum

    rng = np.random.RandomState(3)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.randint(0, 40, n).astype("int64"),
        # coarse seconds => plenty of (user, ts) ties
        "ts": pd.to_datetime(rng.randint(0, 500, n), unit="s"),
        "value": rng.randint(-50, 50, n).astype("int64"),
    })
    out = rolling_sum(
        rd.from_pandas(df).repartition(8), value_col="value",
        window_rows=5, out_col="rs", num_partitions=8,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    ref = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ref["rs"] = (
        ref.groupby("user_id")["value"].rolling(5, min_periods=1).sum()
        .reset_index(level=0, drop=True)
    )
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert (out["rs"].to_numpy() == ref["rs"].to_numpy(dtype="int64")).all()


def test_pivot_counts_matches_crosstab(ray_session):
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import pivot_counts

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "prio": rng.choice(["a", "b", "c"], 5000),
        "status": rng.choice(["X", "Y"], 5000),
    })
    out = pivot_counts(rd.from_pandas(df).repartition(8), "prio", "status")
    ct = pd.crosstab(df["prio"], df["status"])
    for _, row in out.iterrows():
        for s in ("X", "Y"):
            assert row[f"n_{s}"] == ct.loc[row["prio"], s]


def test_exact_quantiles_int_disc_semantics(ray_session):
    """quantile_disc semantics: value at sorted index max(0, ceil(q*n)-1),
    pinned against DuckDB's own output for 1..10."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import exact_quantiles_int

    ds = rd.from_pandas(
        pd.DataFrame({"x": np.arange(1, 11, dtype="int64")})).repartition(4)
    out = exact_quantiles_int(
        ds, "x", [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]).to_pandas()
    assert list(out["x"]) == [1, 1, 3, 5, 8, 9, 10]  # DuckDB quantile_disc


def test_verify_pairs_jaccard_exact_and_filtering(ray_session):
    """verify_pairs_jaccard attaches the TRUE set-based jaccard (exact
    vs the scalar reference kernel) and drops sub-threshold candidate
    pairs — including a planted spurious candidate."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.dedup import jaccard, verify_pairs_jaccard

    base = ("the quick brown fox jumps over the lazy dog "
            "while the band plays on and on ")
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [
            base + "alpha beta gamma delta",
            base + "alpha beta gamma epsilon",      # near-dup of 0
            base + "zeta eta theta iota",            # near-dup-ish of 0
            "completely different content about ray data pipelines "
            "and arrow batches flowing through actor pools",
            "another unrelated document mentioning shuffles joins "
            "and partitions in a distributed engine",
            base + "alpha beta gamma delta",          # exact dup of 0
        ],
    })
    # candidate list includes a SPURIOUS pair (0, 3): unrelated docs that
    # a band-key coincidence could propose — verification must kill it
    pairs = pd.DataFrame({
        "id_a": np.array([0, 0, 0, 0, 3], dtype="int64"),
        "id_b": np.array([1, 2, 3, 5, 4], dtype="int64"),
    })
    out = verify_pairs_jaccard(
        rd.from_pandas(pairs).repartition(3),
        rd.from_pandas(docs).repartition(2),
        id_col="doc_id", threshold=0.5, num_partitions=8,
    ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    txt = dict(zip(docs["doc_id"], docs["text"]))
    for _, row in out.iterrows():
        want = jaccard(txt[row["id_a"]], txt[row["id_b"]], k=5)
        assert abs(row["jaccard"] - want) < 1e-12
    got_pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 5) in got_pairs          # exact dup: jaccard 1.0
    assert (0, 1) in got_pairs          # near dup above threshold
    assert (0, 3) not in got_pairs      # spurious candidate killed
    assert (3, 4) not in got_pairs


def test_remove_near_duplicates_verified(ray_session):
    """verify_jaccard screening keeps removal equal to the unverified
    path on a corpus of genuine near-dups (planted clusters survive as
    one representative each)."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.dedup import remove_near_duplicates

    rng = np.random.RandomState(9)
    words = [f"w{i}" for i in range(300)]
    texts, gold_keep = [], set()
    did = 0
    for c in range(10):
        base_words = [words[rng.randint(300)] for _ in range(60)]
        for v in range(3):
            t = list(base_words)
            if v:
                t[v] = "variant" + str(v)
            texts.append(" ".join(t))
            if v == 0:
                gold_keep.add(did)
            did += 1
    for i in range(30):
        texts.append(" ".join(words[rng.randint(300)] for _ in range(60)))
        gold_keep.add(did)
        did += 1
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts})
    kept = remove_near_duplicates(
        rd.from_pandas(docs).repartition(4), "doc_id",
        verify_jaccard=0.5, method="distributed", num_partitions=8,
    ).to_pandas()
    # every planted cluster keeps exactly its min id; uniques all survive
    assert set(kept["doc_id"]) == gold_keep


def test_grouped_quantiles_int_matches_reference(ray_session):
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import grouped_quantiles_int

    rng = np.random.RandomState(13)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 20_000),
        "x": rng.poisson(40, 20_000).astype("int64"),
    })
    qs = [0.25, 0.5, 0.9]
    out = grouped_quantiles_int(
        rd.from_pandas(df).repartition(8), "g", "x", qs)
    for g, sub in df.groupby("g"):
        sv = np.sort(sub["x"].to_numpy())
        for q in qs:
            want = sv[max(0, int(np.ceil(q * len(sv))) - 1)]
            got = out[(out["g"] == g) & (out["q"] == q)]["x"].iloc[0]
            assert got == want, (g, q)


def test_incremental_ingest_neardup(ray_session):
    """Increment rows near-duplicating a base doc are dropped; novel
    rows survive; increment-internal near-dups are NOT removed here."""
    import ray.data as rd

    from siren_ray.stages.dedup import incremental_ingest_neardup

    base_text = ("the quick brown fox jumps over the lazy dog and then "
                 "runs far away into the deep dark forest tonight again")
    base = rd.from_items([{"doc_id": 1, "text": base_text}])
    inc = rd.from_items([
        # near-dup of base (one word changed)
        {"doc_id": 10, "text": base_text.replace("dark", "cold")},
        # novel
        {"doc_id": 11, "text": ("completely unrelated subject matter "
                                "with its own distinct vocabulary and "
                                "no shared shingles whatsoever here")},
        # near-dup of 11 (internal pair: must BOTH survive)
        {"doc_id": 12, "text": ("completely unrelated subject matter "
                                "with its own distinct vocabulary and "
                                "no shared shingles whatsoever there")},
    ], override_num_blocks=2)
    out = incremental_ingest_neardup(
        base, inc, id_col="doc_id", verify_jaccard=0.5)
    kept = sorted(out.to_pandas()["doc_id"])
    assert kept == [11, 12]


# --- SimHash Hamming-band near-dup --------------------------------------

def _brute_simhash_pairs(texts, max_hamming):
    from siren_ray.stages.dedup import simhash64

    sims = {i: simhash64(t) for i, t in enumerate(texts) if t.strip()}
    out = set()
    ids = sorted(sims)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if bin(sims[a] ^ sims[b]).count("1") <= max_hamming:
                out.add((a, b))
    return out


def test_simhash_neardup_pairs_exact_vs_bruteforce(ray_session):
    """Pigeonhole banding + in-bucket verify is EXACT (not a candidate
    superset): operator output must EQUAL the brute-force Hamming-ball
    pair set, including planted near-identical docs and empty-doc
    drops."""
    import ray.data as rd

    from siren_ray.stages.dedup import simhash_neardup_pairs

    rng = np.random.RandomState(42)
    vocab = ("state court police report officials district health "
             "family farmer student school village city council budget "
             "order minister election market water road power land "
             "crop rain bank loan tax census survey scheme").split()
    texts = [" ".join(rng.choice(vocab, size=60)) for _ in range(40)]
    # planted near-dups: a couple of single-word edits on shared bases
    texts.append(texts[0].replace(texts[0].split()[3], "perturbed", 1))
    texts.append(texts[5] + " extra")
    texts.append("")  # wordless: must be dropped, never paired
    texts.append("   ")
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)],
        override_num_blocks=4,
    )
    for max_hamming in (0, 3, 7):
        got_df = simhash_neardup_pairs(
            ds, "doc_id", max_hamming=max_hamming).to_pandas()
        got = (set(zip(got_df["id_a"], got_df["id_b"]))
               if len(got_df) else set())
        want = _brute_simhash_pairs(texts, max_hamming)
        assert got == want, (max_hamming, got ^ want)
        # reported distances are the true Hamming distances
        from siren_ray.stages.dedup import simhash64
        for _, r in got_df.iterrows():
            d = bin(simhash64(texts[int(r["id_a"])])
                    ^ simhash64(texts[int(r["id_b"])])).count("1")
            assert d == int(r["hamming"])
    assert len(_brute_simhash_pairs(texts, 7)) > 0  # test isn't vacuous


def test_remove_simhash_neardups_keeps_min_per_cluster(ray_session):
    import ray.data as rd

    from siren_ray.stages.dedup import remove_simhash_neardups

    base = ("the state capital police report officials said district "
            "court order health family farmer student school " * 4)
    other = ("completely different vocabulary about astronomy physics "
             "galaxies telescopes spectra orbital mechanics " * 4)
    items = [
        {"doc_id": 3, "text": base},
        {"doc_id": 1, "text": base + " tail"},        # near-dup of 3
        {"doc_id": 2, "text": other},
        {"doc_id": 7, "text": other.replace("physics", "chemistry")},
    ]
    out = remove_simhash_neardups(
        rd.from_items(items, override_num_blocks=2), "doc_id",
        max_hamming=8)
    kept = sorted(out.to_pandas()["doc_id"])
    # min id survives each duplicate cluster
    assert 1 in kept and 2 in kept
    assert 3 not in kept and 7 not in kept


def test_normalize_text_batch():
    import pyarrow as pa

    from siren_ray.functions.textstats import normalize_text_batch

    t = pa.table({"text": [
        "é composed",          # NFC: e + U+0301 -> é
        "a​b‌c﻿d",    # zero-width chars stripped
        "x\x01y\x7fz",               # control chars stripped
        "  a\t\tb\n\nc\x0b\x0cd  ",  # ws runs collapse, ends trim
        None,
        "",
    ]})
    got = normalize_text_batch(t)["norm_text"].to_pylist()
    assert got == ["é composed", "abcd", "xyz", "a b c d", None, ""]


def test_compression_ratio_signal():
    """zlib ratio separates repetitive boilerplate from varied prose and
    handles empty/null docs."""
    import numpy as np
    import pyarrow as pa

    from siren_ray.functions.textstats import compression_ratio_batch

    rng = np.random.default_rng(3)
    varied = " ".join("w%d" % v for v in rng.integers(0, 10_000, 400))
    looped = "subscribe now click here " * 100
    t = pa.table({"text": pa.array([varied, looped, "", None])})
    out = compression_ratio_batch(t)
    r = out["zlib_ratio"].to_pylist()
    assert r[0] > 2 * r[1]  # prose compresses far less than loops
    assert 0 < r[1] < 0.2 and 0.2 < r[0] <= 1.2
    assert np.isnan(r[2]) and np.isnan(r[3])
    assert out.column_names[-1] == "zlib_ratio"


def test_snapshot_diff_string_keys(ray_session):
    """URL (string) keys — the crawl-native case — must work end to
    end: the key partitioner already hashed strings, but the per-
    partition diff used to force int64 and crash."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import snapshot_diff

    old = rd.from_pandas(pd.DataFrame({
        "url": [f"https://ex.org/p/{i}" for i in range(40)],
        "fp": [f"f{i % 7}" for i in range(40)],
    })).repartition(4)
    new = rd.from_pandas(pd.DataFrame({
        "url": [f"https://ex.org/p/{i}" for i in range(10, 50)],
        "fp": [f"f{(i + (1 if i % 5 == 0 else 0)) % 7}" for i in
               range(10, 50)],
    })).repartition(3)
    got = snapshot_diff(old, new, key="url", fp_col="fp",
                        num_partitions=4).to_pandas()
    assert len(got) == 50
    by = got.set_index("url")["status"]
    assert (by.loc[[f"https://ex.org/p/{i}" for i in range(10)]]
            == "removed").all()
    assert (by.loc[[f"https://ex.org/p/{i}" for i in range(40, 50)]]
            == "added").all()
    mid = [f"https://ex.org/p/{i}" for i in range(10, 40)]
    assert set(by.loc[mid]) <= {"changed", "unchanged"}
    changed = {u for u in mid
               if int(u.rsplit("/", 1)[1]) % 5 == 0}
    assert set(by.loc[list(changed)]) == {"changed"}


def test_hash_join_empty_string_keyed_right(ray_session):
    """A left join whose right side is fully empty (columnless blocks
    after upstream filters) must pass left rows through — the old
    int64-typed fallback crashed pandas on string keys."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.relational import hash_join

    left = rd.from_pandas(pd.DataFrame({
        "url": [f"https://ex.org/{i}" for i in range(20)],
        "v": list(range(20)),
    })).repartition(3)
    right = rd.from_pandas(pd.DataFrame({
        "url": pd.Series(dtype=object),
        "w": pd.Series(dtype="int64"),
    })).map_batches(lambda t: t, batch_format="pyarrow")
    got = hash_join(left, right, on="url", how="left",
                    broadcast=False,  # force the shuffle path
                    num_partitions=4).to_pandas()
    assert len(got) == 20
    assert sorted(got["v"]) == list(range(20))


def test_pivot_counts_separator_in_values(ray_session):
    """Row/category values containing the old fused-key separator
    (\\x1f) must not misattribute counts."""
    import pandas as pd
    import ray.data as rd

    from siren_ray.stages.relational import pivot_counts

    df = pd.DataFrame({
        "r": ["a\x1fb", "a\x1fb", "a", "a"],
        "c": ["x", "y", "b\x1fx", "x"],
    })
    got = pivot_counts(rd.from_pandas(df).repartition(2), "r", "c")
    wide = got.set_index("r")
    assert wide.loc["a\x1fb", "n_x"] == 1
    assert wide.loc["a\x1fb", "n_y"] == 1
    assert wide.loc["a", "n_b\x1fx"] == 1
    assert wide.loc["a", "n_x"] == 1
    # no phantom rows/categories from mis-splitting
    assert set(wide.index) == {"a", "a\x1fb"}


def test_topk_ties_invariant_under_partitioning(ray_session):
    """Duplicate embeddings tied at the k boundary: the per-batch
    prune must keep the SMALLEST ids (the documented cosine DESC,
    id ASC order), so the result is identical at any block layout."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from siren_ray.stages.ann import brute_force_topk

    rng = np.random.default_rng(5)
    base = rng.normal(size=(4, 8)).astype(np.float32)
    # 30 copies of vector 0 (all tied), plus distinct others
    embs = np.vstack([np.tile(base[0], (30, 1)),
                      base[1:],
                      rng.normal(size=(30, 8)).astype(np.float32)])
    ids = np.arange(len(embs), dtype=np.int64)
    rng.shuffle(ids)  # ids uncorrelated with row order
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in embs]),
    })
    q = base[0:1]
    results = []
    for parts in (1, 3, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        got = brute_force_topk(ds, q, k=10).to_pandas()
        results.append(list(zip(got["vec_id"], got["cosine"].round(9))))
    assert results[0] == results[1] == results[2]
    # the tied block (30 copies of the query vector) fills all of k=10
    # with its SMALLEST ids
    tied_ids = sorted(ids[:30])
    assert [r[0] for r in results[0]] == tied_ids[:10]
