"""Sub-document operators: frequent-line removal, word stats, doc freq."""
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from siren_ray.stages.lines import (
    doc_frequency,
    remove_frequent_lines,
    word_stats,
)


def test_remove_frequent_lines_semantics(ray_session):
    boiler = "subscribe to our newsletter"
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "extra": list("abcdef"),
        "text": [
            f"unique alpha\n{boiler}\nunique beta",
            f"{boiler}\nanother line here",
            f"middle one\n{boiler}",
            boiler,                       # whole doc is boilerplate
            "only original content",
            "",                           # empty doc passes through
        ],
    })
    out = (
        remove_frequent_lines(rd.from_pandas(docs).repartition(3),
                              text_col="text", min_count=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # the boilerplate line occurs 4 times -> ALL occurrences removed
    assert out["text"].tolist() == [
        "unique alpha\nunique beta",
        "another line here",
        "middle one",
        "",
        "only original content",
        "",  # "" line occurs twice (<3): doc 5 splits to [""], kept as ""
    ]
    # non-text columns pass through untouched
    assert out["extra"].tolist() == list("abcdef")


def test_remove_frequent_lines_empty_lines_frequent(ray_session):
    # empty lines themselves count: blank-line separators occurring
    # >= min_count times are stripped like any boilerplate
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype="int64"),
        "text": ["a\n\nb", "c\n\nd", "e\n\nf"],
    })
    out = (
        remove_frequent_lines(rd.from_pandas(docs), text_col="text",
                              min_count=3)
        .to_pandas().sort_values("doc_id")
    )
    assert out["text"].tolist() == ["a\nb", "c\nd", "e\nf"]


def test_remove_frequent_lines_max_frequent_guard(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["x\ny", "x\nz", "x\nw", "x\nv"],
    })
    with pytest.raises(ValueError, match="max_frequent"):
        remove_frequent_lines(rd.from_pandas(docs), text_col="text",
                              min_count=2, max_frequent=0)


def test_word_stats_matches_python(ray_session):
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(vocab[rng.randint(12)]
                      for _ in range(rng.randint(1, 40)))
             for _ in range(50)]
    texts.append("")  # empty doc -> one empty "word", matching SQL split
    docs = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
    })
    out = (
        word_stats(rd.from_pandas(docs).repartition(4))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for _, row in out.iterrows():
        words = texts[int(row["doc_id"])].split(" ")
        assert row["n_words"] == len(words)
        assert row["n_distinct_words"] == len(set(words))
        assert row["top_word_count"] == max(words.count(w)
                                            for w in set(words))
    assert len(out) == len(texts)


def test_doc_frequency_matches_python(ray_session):
    texts = ["a b a", "b c", "c", "a a a a", ""]
    docs = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
    })
    out = (
        doc_frequency(rd.from_pandas(docs).repartition(3))
        .to_pandas().set_index("word")["df"].to_dict()
    )
    from collections import Counter
    want = Counter()
    for t in texts:
        for w in set(t.split(" ")):
            want[w] += 1
    assert out == dict(want)
    # min_df filter
    out2 = (
        doc_frequency(rd.from_pandas(docs), min_df=2)
        .to_pandas().set_index("word")["df"].to_dict()
    )
    assert out2 == {w: c for w, c in want.items() if c >= 2}


def test_ngram_contamination_matches_python(ray_session):
    from siren_ray.stages.lines import ngram_contamination

    rng = np.random.RandomState(5)
    vocab = [f"v{i}" for i in range(15)]
    texts = [" ".join(vocab[rng.randint(15)]
                      for _ in range(rng.randint(1, 30)))
             for _ in range(60)]
    docs = pd.DataFrame({"doc_id": np.arange(60, dtype="int64"),
                         "text": texts})
    bench_texts = texts[:5]
    bench = pd.DataFrame({"doc_id": np.arange(5, dtype="int64"),
                          "text": bench_texts})

    def grams(t, n=3):
        w = t.split(" ")
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    bset = {g for t in bench_texts for g in grams(t)}
    out = (
        ngram_contamination(rd.from_pandas(docs).repartition(4),
                            rd.from_pandas(bench))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for _, row in out.iterrows():
        gs = grams(texts[int(row["doc_id"])])
        assert row["n_grams"] == len(gs)
        assert row["n_contaminated"] == sum(g in bset for g in gs)
    # benchmark docs are fully contaminated; short docs have 0 grams
    full = out[out["doc_id"] < 5]
    assert (full["n_contaminated"] == full["n_grams"]).all()


def test_ngram_contamination_empty_bench(ray_session):
    from siren_ray.stages.lines import ngram_contamination

    docs = pd.DataFrame({"doc_id": np.arange(3, dtype="int64"),
                         "text": ["a b c d", "x y", ""]})
    bench = docs.head(0)
    out = (
        ngram_contamination(rd.from_pandas(docs),
                            rd.from_pandas(bench))
        .to_pandas().sort_values("doc_id")
    )
    assert out["n_grams"].tolist() == [2, 0, 0]
    assert out["n_contaminated"].tolist() == [0, 0, 0]


def test_duplicate_passages_planted(ray_session):
    """Docs sharing a verbatim passage get every gram position inside
    it flagged; unique text is untouched; short docs report 0 grams."""
    import ray.data as rd

    from siren_ray.stages.lines import duplicate_passages

    passage = "alpha beta gamma delta epsilon zeta"
    docs = [
        {"doc_id": 0, "text": f"unique lead {passage} unique tail0"},
        {"doc_id": 1, "text": f"other start {passage} other end1"},
        {"doc_id": 2, "text": "totally distinct words only here now"},
        {"doc_id": 3, "text": "ab"},
    ]
    out = (duplicate_passages(rd.from_items(docs, override_num_blocks=2),
                              n=3, min_docs=2)
           .to_pandas().set_index("doc_id").sort_index())
    # the shared passage has 6 words -> 4 shared 3-gram positions
    assert out.loc[0, "n_dup_grams"] == 4
    assert out.loc[1, "n_dup_grams"] == 4
    assert out.loc[2, "n_dup_grams"] == 0
    assert out.loc[3, "n_grams"] == 0 and out.loc[3, "n_dup_grams"] == 0
    assert out.loc[0, "n_grams"] == len(docs[0]["text"].split()) - 2


def test_remove_duplicate_spans_planted(ray_session):
    """Every word covered by a corpus-duplicated n-gram is cut from
    BOTH documents; unique docs round-trip byte-identical; a second
    pass is a no-op (the duplicated text is gone)."""
    import ray.data as rd

    from siren_ray.stages.lines import remove_duplicate_spans

    passage = " ".join(f"w{i}" for i in range(12))
    docs = [
        {"doc_id": 0, "text": f"alpha beta {passage} gamma"},
        {"doc_id": 1, "text": f"start {passage} end words here"},
        {"doc_id": 2, "text": "totally unique text with no shared run"},
        {"doc_id": 3, "text": ""},
    ]
    out = (remove_duplicate_spans(
        rd.from_items(docs, override_num_blocks=2), n=10)
        .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[0, "text"] == "alpha beta gamma"
    assert out.loc[1, "text"] == "start end words here"
    assert out.loc[0, "n_removed_words"] == 12
    assert out.loc[1, "n_removed_words"] == 12
    assert out.loc[2, "text"] == docs[2]["text"]
    assert out.loc[2, "n_removed_words"] == 0
    assert out.loc[3, "text"] == "" and out.loc[3, "n_removed_words"] == 0

    again = (remove_duplicate_spans(
        rd.from_pandas(out.reset_index()[["doc_id", "text"]]), n=10)
        .to_pandas().set_index("doc_id").sort_index())
    assert (again["n_removed_words"] == 0).all()
    assert (again["text"] == out["text"]).all()


def test_remove_duplicate_spans_whole_doc(ray_session):
    """A document that is nothing but duplicated text empties out."""
    import ray.data as rd

    from siren_ray.stages.lines import remove_duplicate_spans

    passage = " ".join(f"t{i}" for i in range(10))
    docs = [
        {"doc_id": 0, "text": passage},
        {"doc_id": 1, "text": passage},
    ]
    out = (remove_duplicate_spans(rd.from_items(docs), n=10)
           .to_pandas().set_index("doc_id").sort_index())
    assert (out["text"] == "").all()
    assert (out["n_removed_words"] == 10).all()


def test_dedup_paragraphs_first_occurrence(ray_session):
    """First-occurrence keep ordered by (doc_id, idx): boilerplate
    survives exactly once at its earliest position, intra-doc repeats
    collapse, fully-deduped docs come back with text '' (row kept),
    and non-text columns pass through."""
    import ray.data as rd

    from siren_ray.stages.lines import dedup_paragraphs

    SEP = "\n\n"
    docs = [
        {"doc_id": 0, "lang": "en",
         "text": SEP.join(["alpha one", "BOILER", "omega zero"])},
        {"doc_id": 1, "lang": "de",
         "text": SEP.join(["beta two", "BOILER", "gamma three"])},
        {"doc_id": 2, "lang": "fr", "text": SEP.join(["BOILER", "x y"])},
        {"doc_id": 3, "lang": "es", "text": "BOILER"},
        {"doc_id": 4, "lang": "it",
         "text": SEP.join(["alpha one", "alpha one"])},
    ]
    out = dedup_paragraphs(
        rd.from_items(docs).repartition(3), num_partitions=4,
    ).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "text"] == SEP.join(
        ["alpha one", "BOILER", "omega zero"])
    assert out.loc[1, "text"] == SEP.join(["beta two", "gamma three"])
    assert out.loc[2, "text"] == "x y"
    assert out.loc[3, "text"] == ""
    assert out.loc[4, "text"] == ""
    assert list(out.lang) == ["en", "de", "fr", "es", "it"]


def test_dedup_paragraphs_parallelism_invariance(ray_session):
    """Same result at different input partitionings and partition
    counts (winner election is a pure (doc_id, idx) min)."""
    import ray.data as rd

    from siren_ray.stages.lines import dedup_paragraphs

    SEP = "\n\n"
    docs = [{"doc_id": i,
             "text": SEP.join([f"p{i % 7}", f"q{i % 3}", f"u{i}"])}
            for i in range(40)]

    def run(parts, P):
        return (dedup_paragraphs(rd.from_items(docs).repartition(parts),
                                 num_partitions=P)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    a, b = run(2, 4), run(8, 16)
    assert a.equals(b)
    # only docs 0..6 keep their p-para, only 0..2 their q-para
    kept = a.set_index("doc_id").text
    assert kept[0] == SEP.join(["p0", "q0", "u0"])
    assert kept[10] == "u10"
