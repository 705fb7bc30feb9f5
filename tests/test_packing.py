"""Sequence packing (functions/packing.py): exactly-once coverage,
capacity invariants, oversized handling, determinism, fill quality."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from siren_ray.functions.packing import pack_batch, pack_sequences

SEQ = 128


def _table(tokens):
    return pa.table({"doc_id": pa.array(range(len(tokens)), pa.int64()),
                     "n_tokens": pa.array(tokens, pa.int64())})


def test_exactly_once_and_capacity():
    rng = np.random.RandomState(7)
    tokens = rng.randint(1, 100, size=500).tolist()
    out = pack_batch(_table(tokens), seq_len=SEQ)
    all_ids = [i for d in out["doc_ids"].to_pylist() for i in d]
    assert sorted(all_ids) == list(range(500))
    assert (np.asarray(out["total_tokens"]) <= SEQ).all()
    assert (np.asarray(out["n_pad"])
            == SEQ - np.asarray(out["total_tokens"])).all()
    # untruncated bins: total == sum of member tokens
    for d, tot, tr in zip(out["doc_ids"].to_pylist(),
                          out["total_tokens"].to_pylist(),
                          out["truncated"].to_pylist()):
        if not tr:
            assert tot == sum(tokens[i] for i in d)


def test_oversized_isolated_and_truncated():
    out = pack_batch(_table([SEQ + 50, 10, 20, SEQ]), seq_len=SEQ)
    df = out.to_pandas()
    big = df[df["truncated"]]
    assert len(big) == 1
    assert big.iloc[0]["doc_ids"].tolist() == [0]
    assert big.iloc[0]["total_tokens"] == SEQ and big.iloc[0]["n_pad"] == 0
    exact = df[[d == [3] for d in df["doc_ids"].map(list)]]
    assert len(exact) == 1 and not exact.iloc[0]["truncated"]


def test_ffd_fill_quality_and_determinism():
    rng = np.random.RandomState(3)
    tokens = rng.randint(10, 60, size=1000).tolist()
    a = pack_batch(_table(tokens), seq_len=SEQ)
    b = pack_batch(_table(tokens), seq_len=SEQ)
    assert a.equals(b)
    fill = np.asarray(a["total_tokens"]).sum() / (a.num_rows * SEQ)
    assert fill >= 0.9  # FFD on uniform small items packs tightly


def test_dataset_packing_covers_all_rows():
    items = [{"doc_id": i, "n_tokens": int(5 + (i * 37) % 90)}
             for i in range(777)]
    out = pack_sequences(rd.from_items(items, override_num_blocks=4),
                         seq_len=SEQ).to_pandas()
    got = sorted(i for d in out["doc_ids"] for i in d)
    assert got == list(range(777))
    assert (out["total_tokens"] <= SEQ).all()


def test_zero_token_docs_never_join_truncated_bins():
    """A need=0 doc fits any residual>=0 bin; it must NOT attach to a
    truncated (oversized) sequence's doc_ids (ADVICE r3)."""
    out = pack_batch(_table([SEQ + 50, 0, 0]), seq_len=SEQ).to_pandas()
    trunc = out[out["truncated"]]
    assert len(trunc) == 1
    assert trunc.iloc[0]["doc_ids"].tolist() == [0]
    # the zero-token docs share one all-pad bin of their own
    zeros = out[~out["truncated"]]
    assert sorted(i for d in zeros["doc_ids"] for i in d) == [1, 2]
    assert (zeros["total_tokens"] == 0).all()
