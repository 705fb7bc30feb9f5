"""Event-stream operators over the events table (engine additions per the
task brief — the reference has no event processing).

Sessionization is the canonical one: assign each event a per-user session
sequence number, where a new session starts after an inactivity gap. The
scale shape is ONE hash shuffle on a coarse user bucket, then fully
vectorized pandas per partition (sort + diff + cumsum) — never a
map_groups per user (group sizes are small; per-key dispatch is the
anti-pattern this engine eliminated in round 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SESSION_PARTITIONS = 64


def sessionize(ds, *, user_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id", gap_s: float = 1800.0,
               num_partitions: int = _SESSION_PARTITIONS):
    """Add ``session_seq``: 1-based per-user session index; a new session
    starts when the gap to the previous event (user order = ``ts_col``,
    tie-broken by ``order_col``) exceeds ``gap_s`` seconds (strict >).

    Equivalent SQL (the oracle): lag/sum window functions partitioned by
    user. Partitioning: hash(user) % num_partitions co-locates each
    user's stream; within a partition everything is vectorized
    (mergesort + diff + boundary cumsum over the whole partition frame).
    """

    def _bucket(t: pa.Table) -> pa.Table:
        u = np.asarray(t[user_col], dtype=np.int64)
        return t.append_column(
            "_pk", pa.array(u % num_partitions, pa.int64())
        )

    gap_ns = np.int64(gap_s * 1e9)

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col, order_col],
                            kind="mergesort").reset_index(drop=True)
        ts = df[ts_col].to_numpy(dtype="datetime64[ns]").view(np.int64)
        user = df[user_col].to_numpy()
        new_user = np.ones(len(df), dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        gap_break = np.zeros(len(df), dtype=bool)
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_ns
        boundary = (new_user | gap_break).astype(np.int64)
        seq = np.cumsum(boundary)
        # per-user re-base: subtract the running count just before each
        # user's first event (vectorized; users are contiguous after sort)
        first_idx = np.flatnonzero(new_user)
        base = np.repeat(seq[first_idx] - 1,
                         np.diff(np.append(first_idx, len(df))))
        df["session_seq"] = (seq - base).astype("int64")
        return df.drop(columns=["_pk"])

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_assign, batch_format="pandas")
    )
