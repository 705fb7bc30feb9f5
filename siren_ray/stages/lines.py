"""Line/word-level corpus statistics and boilerplate removal.

The LLM-training-data operators that work BELOW the document level:

- :func:`remove_frequent_lines` — CCNet-style boilerplate removal:
  drop every line that occurs at least ``min_count`` times across the
  whole corpus (navigation chrome, cookie banners, licence footers).
  Two streaming passes over the corpus, ONE shuffle of pre-aggregated
  ``(line_hash:int64, count:int64)`` pairs, and a broadcast of the
  (small) frequent-line set — document text itself never enters a
  shuffle.
- :func:`word_stats` — per-document repetition statistics in the
  Gopher-rules family (word count, distinct words, top-word count).
  Map-only: each document's stats complete inside its own batch.
- :func:`doc_frequency` — corpus document-frequency table
  (word -> number of documents containing it), the IDF building block.
  Per-batch (doc, word) dedup + partial counts, then one small
  groupby-sum over words.

Reference parity note: the reference engine (CMHLP/siren) has no
sub-document operators at all; these exist for the 100 TB
training-data design point the north rule targets.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import hash_strings

logger = logging.getLogger(__name__)

# Refuse to broadcast a "frequent lines" set above this many entries:
# at that point the boilerplate set itself is corpus-scale and the
# caller should raise min_count (or the corpus needs the distributed
# anti-join variant — see the docstring note).
_MAX_FREQUENT = 5_000_000


def _split_lines(tbl: pa.Table, text_col: str, separator: str):
    """Split a text column into (flat lines, parent row indices)."""
    txt = pc.coalesce(tbl[text_col], pa.scalar(""))
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lst = pc.split_pattern(txt, separator)
    flat = pc.list_flatten(lst)
    parents = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
    return flat, parents


def _line_hashes(flat: pa.Array) -> np.ndarray:
    return hash_strings(flat.to_numpy(zero_copy_only=False))


def remove_frequent_lines(ds, *, text_col: str = "text",
                          separator: str = "\n", min_count: int = 3,
                          max_frequent: int = _MAX_FREQUENT,
                          pin_input: bool = True):
    """Remove every line occurring ``>= min_count`` times corpus-wide
    (ALL occurrences — boilerplate is noise wherever it appears, the
    CCNet/C4 paragraph-dedup semantics). Returns the dataset with
    ``text_col`` rewritten; rows whose lines are all removed keep an
    empty string. All other columns pass through unchanged.

    Scale shape (100 TB): pass 1 streams the corpus through a per-batch
    ``np.unique`` partial count, so the only shuffle moves 16-byte
    ``(line_hash, count)`` pairs — bounded by distinct-lines-per-batch,
    never by text bytes. The surviving frequent set (lines are "frequent"
    precisely because many docs share them, so the set is orders of
    magnitude smaller than the corpus) broadcasts once via ``ray.put``
    as a sorted uint64 array; pass 2 is map-only — split, hash,
    ``searchsorted`` membership, vectorized list rebuild + join. If the
    frequent set exceeds ``max_frequent`` this raises rather than
    silently OOMing the driver; the escape hatch at that scale is a
    distributed ``hash_antijoin`` on the exploded lines plus a doc-key
    regroup (one extra text shuffle), which no real boilerplate
    threshold should need.

    Line identity is the 64-bit SipHash of the exact line string;
    a cross-line collision could remove one innocent line per
    ~2^64/|distinct| docs — negligible against the removal rate itself.
    """
    import ray

    from ..util import pin_for_multipass

    # two passes (count stats, then rewrite): pin the input once
    ds = pin_for_multipass(ds, enabled=pin_input)

    def _partial_counts(t: pa.Table) -> pa.Table:
        flat, _ = _split_lines(t, text_col, separator)
        h, c = np.unique(_line_hashes(flat), return_counts=True)
        return pa.table({
            "line_hash": pa.array(h.view(np.int64), pa.int64()),
            "cnt": pa.array(c.astype(np.int64), pa.int64()),
        })

    counts = (
        ds.map_batches(_partial_counts, batch_format="pyarrow")
        .groupby("line_hash").sum("cnt")
    )

    def _keep_frequent(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t["sum(cnt)"], pa.scalar(min_count))
        return pa.table({"line_hash": t.filter(keep)["line_hash"]})

    from ..util import ensure_arrow as _ea

    freq_tbls = [
        t for t in map(_ea, ray.get(
            counts.map_batches(_keep_frequent, batch_format="pyarrow")
            .to_arrow_refs()))
        if t.num_rows and "line_hash" in t.schema.names
    ]
    frequent = (np.sort(np.concatenate(
        [np.asarray(t["line_hash"], dtype=np.int64) for t in freq_tbls]
    ).view(np.uint64)) if freq_tbls else np.empty(0, dtype=np.uint64))
    if len(frequent) > max_frequent:
        raise ValueError(
            f"remove_frequent_lines: frequent set has {len(frequent)} "
            f"entries (> max_frequent={max_frequent}); raise min_count "
            "or use a distributed anti-join variant")
    logger.info("remove_frequent_lines: %d frequent lines (min_count=%d)",
                len(frequent), min_count)
    freq_ref = ray.put(frequent)

    # TASK pool (CLAUDE.md tiny-state rule): the state is one broadcast
    # sorted uint64 array, fetched zero-copy per task — same shape as
    # remove_duplicate_spans' _strip in this file; an actor pool paid
    # spin-up page faults for nothing
    return ds.map_batches(
        _strip_frequent_task,
        fn_kwargs={"freq_ref": freq_ref, "text_col": text_col,
                   "separator": separator},
        batch_format="pyarrow",
    )


def _strip_frequent_task(t: pa.Table, *, freq_ref, text_col: str,
                         separator: str) -> pa.Table:
    import ray

    frequent = ray.get(freq_ref) if isinstance(freq_ref, ray.ObjectRef) \
        else freq_ref
    flat, parents = _split_lines(t, text_col, separator)
    if len(frequent):
        h = _line_hashes(flat)
        pos = np.searchsorted(frequent, h)
        pos[pos >= len(frequent)] = 0
        keep = frequent[pos] != h
    else:
        keep = np.ones(len(flat), dtype=bool)
    flat_k = flat.filter(pa.array(keep))
    cnt = np.bincount(parents[keep], minlength=t.num_rows)
    offsets = np.zeros(t.num_rows + 1, dtype=np.int32)
    np.cumsum(cnt, out=offsets[1:])
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                  flat_k)
    joined = pc.binary_join(la, pa.scalar(separator))
    idx = t.schema.get_field_index(text_col)
    return t.set_column(idx, text_col, joined)


def word_stats(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document word-repetition statistics (the Gopher-rules
    family): total words, distinct words, and the count of the most
    repeated word. A downstream quality filter keys off the ratios
    (e.g. drop documents where ``n_distinct_words / n_words`` is low —
    machine-generated spam repeats).

    Map-only: one document is one row, so its stats complete inside its
    own batch — no shuffle at any scale. Counts are exact integers
    (ratio thresholds belong to the caller) so the result is
    engine-independent and oracle-hashable. Per-batch the word explode
    is Arrow kernels; the per-doc distinct/top counts are one pandas
    ``groupby(size)`` over (row, word) — vectorized, no Python row loop.
    """

    def _stats(t: pa.Table) -> pa.Table:
        flat, parents = _split_lines(t, text_col, " ")
        df = pd.DataFrame({
            "row": parents,
            "word": flat.to_numpy(zero_copy_only=False),
        })
        per = df.groupby(["row", "word"], sort=False).size()
        g = per.groupby(level="row")
        n_words = g.sum()
        n_distinct = g.size()
        top = g.max()
        rows = n_words.index.to_numpy()
        ids = np.asarray(t[id_col], dtype=np.int64)[rows]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words.to_numpy(np.int64), pa.int64()),
            "n_distinct_words": pa.array(n_distinct.to_numpy(np.int64),
                                         pa.int64()),
            "top_word_count": pa.array(top.to_numpy(np.int64), pa.int64()),
        })

    return ds.map_batches(_stats, batch_format="pyarrow")


def doc_frequency(ds, *, text_col: str = "text", min_df: int = 1):
    """Corpus document-frequency table: ``(word, df)`` where ``df`` is
    the number of DISTINCT documents containing the word — the IDF
    denominator and the vocabulary report over a new crawl.

    Per-batch: explode to (row, word), vectorized pandas
    ``drop_duplicates`` (each input row is one document, so within-batch
    dedup is exact), then partial counts per word. The one shuffle is a
    groupby-sum over ``(word, partial_count)`` — cardinality is the
    vocabulary, not the corpus.
    """

    def _partial(t: pa.Table) -> pa.Table:
        flat, parents = _split_lines(t, text_col, " ")
        df = pd.DataFrame({
            "row": parents,
            "word": flat.to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        c = df.groupby("word", sort=False).size()
        return pa.table({
            "word": pa.array(c.index.to_numpy(object), pa.string()),
            "cnt": pa.array(c.to_numpy(np.int64), pa.int64()),
        })

    agg = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby("word").sum("cnt"))

    def _final(t: pa.Table) -> pa.Table:
        out = pa.table({"word": t["word"],
                        "df": t["sum(cnt)"].cast(pa.int64())})
        if min_df > 1:
            out = out.filter(pc.greater_equal(out["df"],
                                              pa.scalar(min_df)))
        return out

    return agg.map_batches(_final, batch_format="pyarrow")


# polynomial weights for composing word hashes into n-gram fingerprints
# (wrapping uint64 multiplies; same determinism argument as MinHash's
# band keys — a cross-gram collision needs ~2^64 distinct grams)
_GRAM_P1 = np.uint64(0x9E3779B97F4A7C15)
_GRAM_P2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _gram_hashes(tbl: pa.Table, text_col: str, n: int):
    """Sliding word n-gram fingerprints: (gram_hashes, parent_rows,
    words_per_row). Vectorized: one word-hash pass, then a wrapping
    polynomial combine over each length-n window that stays inside one
    row. No gram strings are ever built."""
    _, parents, gh, starts, counts = _gram_hashes_full(tbl, text_col, n)
    return gh, parents[starts], counts


def _gram_hashes_full(tbl: pa.Table, text_col: str, n: int):
    """Like :func:`_gram_hashes` but additionally returns the flat word
    array and each surviving gram's START index into it — what span
    REMOVAL needs (a gram at start ``s`` covers flat words
    ``[s, s+n)``, guaranteed within one row by the same-row mask)."""
    flat, parents = _split_lines(tbl, text_col, " ")
    wh = hash_strings(flat.to_numpy(zero_copy_only=False))
    counts = np.bincount(parents, minlength=tbl.num_rows)
    if len(wh) < n:
        return (flat, parents, np.empty(0, np.uint64),
                np.empty(0, np.int64), counts)
    gh = wh[: len(wh) - n + 1].copy()
    for j in range(1, n):
        gh *= _GRAM_P1
        gh += wh[j: len(wh) - n + 1 + j] * _GRAM_P2
    same_row = parents[: len(wh) - n + 1] == parents[n - 1:]
    starts = np.flatnonzero(same_row)
    return flat, parents, gh[same_row], starts, counts


def _corpus_dup_grams(ds, *, text_col: str, n: int, min_docs: int,
                      max_frequent: int, op: str) -> np.ndarray:
    """Pass 1 shared by :func:`duplicate_passages` and
    :func:`remove_duplicate_spans`: the sorted uint64 fingerprints of
    every word ``n``-gram appearing in >= ``min_docs`` DISTINCT
    documents. Per-batch (gram, distinct-doc-count) partials -> one
    groupby-sum on the 64-bit fingerprint -> guarded driver collect of
    only the duplicated grams (document text never shuffles)."""
    import ray

    def _df_partial(t: pa.Table) -> pa.Table:
        gh, gpar, _ = _gram_hashes(t, text_col, n)
        if not len(gh):
            return pa.table({"g": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        order = np.lexsort((gh, gpar))
        gs, ps = gh[order], gpar[order]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = (gs[1:] != gs[:-1]) | (ps[1:] != ps[:-1])
        ug, uc = np.unique(gs[first], return_counts=True)
        return pa.table({"g": pa.array(ug.view(np.int64), pa.int64()),
                         "df": pa.array(uc.astype(np.int64), pa.int64())})

    counts = (
        ds.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("g").sum("df")
    )

    def _keep_dup(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t["sum(df)"], pa.scalar(min_docs))
        return pa.table({"g": t.filter(keep)["g"]})

    from ..util import ensure_arrow as _ea

    tbls = [t for t in map(_ea, ray.get(
        counts.map_batches(_keep_dup, batch_format="pyarrow")
        .to_arrow_refs())) if t.num_rows and "g" in t.schema.names]
    dup = (np.sort(np.concatenate(
        [np.asarray(t["g"], dtype=np.int64) for t in tbls]
    ).view(np.uint64)) if tbls else np.empty(0, np.uint64))
    if len(dup) > max_frequent:
        raise ValueError(
            f"{op}: {len(dup)} duplicated grams exceed the "
            f"broadcast guard ({max_frequent}); raise min_docs/n or use "
            "the anti-join removal path")
    logger.info("%s: %d corpus-duplicated %d-grams", op, len(dup), n)
    return dup


def remove_duplicate_spans(ds, *, id_col: str = "doc_id",
                           text_col: str = "text", n: int = 10,
                           min_docs: int = 2,
                           max_frequent: int = _MAX_FREQUENT,
                           pin_input: bool = True):
    """Duplicated-passage REMOVAL (the surgical step past
    :func:`duplicate_passages`'s screen, in the Lee et al. 2021
    ExactSubstr family at word-n-gram granularity): delete from every
    document each word whose position is covered by a word ``n``-gram
    occurring in >= ``min_docs`` DISTINCT documents, and rebuild the
    text from the surviving words. This is the aggressive every-
    occurrence variant — deterministic, order-independent and therefore
    idempotent-safe under re-runs (a keep-one-copy rule would make the
    output depend on which copy a scheduler visits first).

    Scale shape: pass 1 is :func:`_corpus_dup_grams` (pre-aggregated
    fingerprint partials, one small shuffle, guarded broadcast); pass 2
    is map-only — coverage is a vectorized difference-array over each
    batch's flat word stream and the text rebuild is one Arrow
    ``binary_join`` over a rebuilt list column, never per-row Python.

    Returns (id_col, text_col, n_removed_words); a fully-duplicated
    document keeps an empty string (the caller's filter policy).
    """
    import ray

    from ..util import pin_for_multipass

    ds = pin_for_multipass(ds, enabled=pin_input)  # two passes
    dup = _corpus_dup_grams(ds, text_col=text_col, n=n,
                            min_docs=min_docs, max_frequent=max_frequent,
                            op="remove_duplicate_spans")
    dup_ref = ray.put(dup)

    def _strip(t: pa.Table) -> pa.Table:
        d = ray.get(dup_ref)  # zero-copy local read per task
        flat, parents, gh, starts, counts = _gram_hashes_full(
            t, text_col, n)
        words = flat.to_numpy(zero_copy_only=False)
        if len(gh) and len(d):
            pos = np.searchsorted(d, gh)
            pos[pos >= len(d)] = 0
            hit = d[pos] == gh
            s = starts[hit]
            delta = np.zeros(len(words) + 1, np.int64)
            np.add.at(delta, s, 1)
            np.add.at(delta, s + n, -1)
            cover = np.cumsum(delta[:-1]) > 0
        else:
            cover = np.zeros(len(words), bool)
        keepw = ~cover
        kept_counts = np.bincount(
            parents[keepw], minlength=t.num_rows).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(kept_counts)))
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            pa.array(words[keepw], pa.large_string()))
        text = pc.binary_join(lst, pa.scalar(" ", pa.large_string()))
        removed = (counts - kept_counts).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            text_col: pc.cast(text, pa.string()),
            "n_removed_words": pa.array(removed, pa.int64()),
        })

    return ds.map_batches(_strip, batch_format="pyarrow")


def ngram_contamination(docs_ds, bench_ds, *, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3):
    """Benchmark decontamination check: for every document, how many of
    its sliding word ``n``-grams appear ANYWHERE in a benchmark set —
    the standard screen before training-data release (drop or flag docs
    whose overlap fraction is high).

    Scale shape: the benchmark set is small by nature (eval suites,
    not corpora) — its DISTINCT gram fingerprints collect once and
    broadcast via ``ray.put`` as a sorted uint64 array; the corpus side
    is then map-only (one word-hash pass per batch, wrapping-polynomial
    window combine, ``searchsorted`` membership). Corpus text never
    shuffles and the driver never sees more than the benchmark grams.

    Returns (id_col, n_grams, n_contaminated) with exact int64 counts
    (thresholding is the caller's policy decision); docs shorter than
    ``n`` words have ``n_grams == 0``.
    """
    import ray

    def _bench_partial(t: pa.Table) -> pa.Table:
        gh, _, _ = _gram_hashes(t, text_col, n)
        return pa.table({"g": pa.array(np.unique(gh).view(np.int64),
                                       pa.int64())})

    from ..util import ensure_arrow as _ea

    tbls = [t for t in map(_ea, ray.get(
        bench_ds.map_batches(_bench_partial, batch_format="pyarrow")
        .to_arrow_refs())) if t.num_rows and "g" in t.schema.names]
    bench = (np.unique(np.concatenate(
        [np.asarray(t["g"], dtype=np.int64) for t in tbls]
    ).view(np.uint64)) if tbls else np.empty(0, np.uint64))
    logger.info("ngram_contamination: %d distinct benchmark %d-grams",
                len(bench), n)
    bench_ref = ray.put(bench)

    # TASK pool (CLAUDE.md tiny-state rule), like _strip_frequent_task
    return docs_ds.map_batches(
        _contamination_score_task,
        fn_kwargs={"bench_ref": bench_ref, "id_col": id_col,
                   "text_col": text_col, "n": n},
        batch_format="pyarrow",
    )


def _contamination_score_task(t: pa.Table, *, bench_ref, id_col: str,
                              text_col: str, n: int) -> pa.Table:
    import ray

    bench = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) \
        else bench_ref
    gh, gpar, counts = _gram_hashes(t, text_col, n)
    n_grams = np.maximum(counts - (n - 1), 0).astype(np.int64)
    if len(gh) and len(bench):
        pos = np.searchsorted(bench, gh)
        pos[pos >= len(bench)] = 0
        hit = bench[pos] == gh
        contaminated = np.bincount(
            gpar[hit], minlength=t.num_rows).astype(np.int64)
    else:
        contaminated = np.zeros(t.num_rows, np.int64)
    return pa.table({
        id_col: t[id_col],
        "n_grams": pa.array(n_grams, pa.int64()),
        "n_contaminated": pa.array(contaminated, pa.int64()),
    })


def duplicate_passages(ds, *, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 10,
                       min_docs: int = 2,
                       max_frequent: int = _MAX_FREQUENT,
                       pin_input: bool = True):
    """Passage-level duplication screen (the Lee et al. 2021
    'Deduplicating Training Data' shape, approximated at n-gram
    granularity): for every document, count how many of its sliding
    word ``n``-gram positions are covered by a gram that occurs in at
    least ``min_docs`` DISTINCT documents — i.e. text shared verbatim
    across documents (mirror paragraphs, syndicated passages), which
    exact-doc dedup misses and MinHash only catches when whole docs are
    similar.

    Scale shape (two passes, like :func:`remove_frequent_lines`):
    pass 1 streams per-batch (gram, distinct-doc-count) PARTIALS —
    within a batch each (doc, gram) pair counts once — through one
    groupby-sum keyed by the 64-bit gram fingerprint; grams with
    document frequency >= ``min_docs`` broadcast once via ``ray.put``
    as a sorted uint64 array (guarded by ``max_frequent``; a corpus
    whose duplicated-gram set exceeds the guard needs passage REMOVAL
    via the anti-join machinery, not a broadcast screen). Pass 2 is
    map-only membership. Document text never shuffles.

    Returns (id_col, n_grams, n_dup_grams); docs shorter than ``n``
    words have ``n_grams == 0``.
    """
    import ray

    from ..util import pin_for_multipass

    ds = pin_for_multipass(ds, enabled=pin_input)  # two passes
    dup = _corpus_dup_grams(ds, text_col=text_col, n=n,
                            min_docs=min_docs, max_frequent=max_frequent,
                            op="duplicate_passages")
    dup_ref = ray.put(dup)

    def _score(t: pa.Table) -> pa.Table:
        d = ray.get(dup_ref)  # zero-copy local read per task
        gh, gpar, counts_ = _gram_hashes(t, text_col, n)
        n_grams = np.maximum(counts_ - (n - 1), 0).astype(np.int64)
        if len(gh) and len(d):
            pos = np.searchsorted(d, gh)
            pos[pos >= len(d)] = 0
            hit = d[pos] == gh
            ndup = np.bincount(gpar[hit],
                               minlength=t.num_rows).astype(np.int64)
        else:
            ndup = np.zeros(t.num_rows, np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_dup_grams": pa.array(ndup, pa.int64()),
        })

    return ds.map_batches(_score, batch_format="pyarrow")


_PARA_IDX_BITS = 20  # packed key: doc_id << 20 | paragraph index


def dedup_paragraphs(ds, *, id_col: str = "doc_id",
                     text_col: str = "text", separator: str = "\n\n",
                     num_partitions: int = 64):
    """Corpus-wide FIRST-OCCURRENCE paragraph dedup (the RefinedWeb /
    Dolma recipe): a paragraph appearing in many documents survives
    only at its globally-first position — ordered by (doc id, index
    within doc) — and is deleted everywhere else; each document's text
    is rebuilt from its kept paragraphs. Complements
    :func:`remove_frequent_lines` (threshold-based, removes ALL
    occurrences) — first-occurrence keep preserves one copy of
    boilerplate instead of erasing it from the corpus.

    Scale shape: the winner election ships only (paragraph-hash,
    packed (doc,idx)) int64 fingerprints through ONE pre-aggregated
    min-groupby (:func:`..relational.grouped_agg` — at most one
    partial row per (batch, hash)); winner keys then co-partition with
    the documents by doc-id hash (the `_hash_key_filter` raw-task
    template), so document TEXT moves in exactly one exchange and the
    rebuild is one vectorized Arrow-split + pandas-groupby pass per
    partition. Paragraph equality is 64-bit SipHash fingerprint
    equality (same corpus-scale assumption as the MinHash band keys);
    doc ids must be non-negative < 2^43 with < 2^20 paragraphs per doc
    (packing bounds — violations raise). A document whose every
    paragraph loses comes back with text "" (row kept, not dropped).
    """
    import ray
    import ray.data as rd

    from ..util import ensure_arrow, pin_for_multipass
    from .relational import grouped_agg

    P = max(2, int(num_partitions))
    bits = _PARA_IDX_BITS
    ds = pin_for_multipass(ds)  # consumed by the fps AND rebuild passes

    def _pack(ids: np.ndarray, parents: np.ndarray) -> np.ndarray:
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << (63 - bits))):
            raise ValueError(
                f"dedup_paragraphs: {id_col} out of packing range")
        # paragraph index within its doc from the flat parent run
        first = np.ones(len(parents), dtype=bool)
        first[1:] = parents[1:] != parents[:-1]
        starts = np.flatnonzero(first)
        idx = np.arange(len(parents), dtype=np.int64)
        idx -= np.repeat(starts, np.diff(np.append(starts, len(parents))))
        if len(idx) and idx.max() >= (1 << bits):
            raise ValueError(
                "dedup_paragraphs: more than 2^20 paragraphs in one doc")
        return (ids[parents] << bits) | idx

    def _fps(t: pa.Table) -> pa.Table:
        flat, parents = _split_lines(t, text_col, separator)
        ids = np.asarray(t[id_col], dtype=np.int64)
        return pa.table({
            "ph": pa.array(_line_hashes(flat).view(np.int64), pa.int64()),
            "packed": pa.array(_pack(ids, parents), pa.int64()),
        })

    winners = grouped_agg(
        ds.select_columns([id_col, text_col]).map_batches(
            _fps, batch_format="pyarrow"),
        "ph", {"packed": ("packed", "min")},
    ).select_columns(["packed"])

    @ray.remote
    def _split_docs(tbl):
        tbl = ensure_arrow(tbl)
        if tbl.num_rows == 0 or id_col not in tbl.schema.names:
            return [tbl.slice(0, 0)] * P
        keys = np.asarray(tbl[id_col], dtype=np.int64) % P
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        bounds = np.searchsorted(ks, np.arange(P + 1))
        return [tbl.take(pa.array(order[bounds[p]:bounds[p + 1]]))
                for p in range(P)]

    @ray.remote
    def _split_winners(tbl):
        tbl = ensure_arrow(tbl)
        if tbl.num_rows == 0 or "packed" not in tbl.schema.names:
            return [np.empty(0, dtype=np.int64)] * P
        packed = np.asarray(tbl["packed"], dtype=np.int64)
        pk = (packed >> bits) % P
        order = np.argsort(pk, kind="stable")
        ks = pk[order]
        bounds = np.searchsorted(ks, np.arange(P + 1))
        return [packed[order[bounds[p]:bounds[p + 1]]] for p in range(P)]

    @ray.remote
    def _rebuild(n_win, *shards):
        import pandas as pd

        win_shards = shards[:n_win]
        doc_shards = shards[n_win:]
        if not doc_shards:
            # zero-block input dataset: no shards at all — indexing
            # doc_shards[0] used to raise on an empty corpus
            return pa.table({id_col: pa.array([], pa.int64()),
                             text_col: pa.array([], pa.string())})
        tbl = pa.concat_tables(
            [s for s in doc_shards if s.num_rows],
            promote_options="default",
        ) if any(s.num_rows for s in doc_shards) else doc_shards[0]
        if tbl.num_rows == 0:
            return tbl
        keys = np.sort(np.concatenate(list(win_shards))) if win_shards \
            else np.empty(0, dtype=np.int64)
        flat, parents = _split_lines(tbl, text_col, separator)
        ids = np.asarray(tbl[id_col], dtype=np.int64)
        packed = _pack(ids, parents)
        keep = np.isin(packed, keys)
        flat_np = flat.to_numpy(zero_copy_only=False)
        kept = pd.Series(flat_np[keep]).groupby(
            parents[keep]).agg(separator.join)
        texts = kept.reindex(range(tbl.num_rows), fill_value="")
        i = tbl.schema.names.index(text_col)
        return tbl.set_column(
            i, text_col, pa.array(texts.to_numpy(), pa.string()))

    doc_sh = [_split_docs.options(num_returns=P).remote(b)
              for b in ds.to_arrow_refs()]
    win_sh = [_split_winners.options(num_returns=P).remote(b)
              for b in winners.to_arrow_refs()]
    parts = []
    for p in range(P):
        parts.append(_rebuild.remote(
            len(win_sh),
            *[win_sh[i][p] for i in range(len(win_sh))],
            *[doc_sh[i][p] for i in range(len(doc_sh))],
        ))
    return rd.from_arrow_refs(parts)
