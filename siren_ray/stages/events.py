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


def rolling_sum(ds, *, by_col: str = "user_id", ts_col: str = "ts",
                order_col: str = "event_id", value_col: str = "value",
                window_rows: int = 7, out_col: str = "rolling_sum",
                num_partitions: int = _SESSION_PARTITIONS):
    """Per-key row-window rolling sum: for each row, the sum of
    ``value_col`` over the last ``window_rows`` rows of the same
    ``by_col`` key, ordered by (``ts_col``, ``order_col``) — SQL
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, id
    ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``.

    Same scale shape as :func:`sessionize`: ONE hash shuffle on a coarse
    key bucket, then one mergesort + pandas grouped ``rolling`` (C-level
    per-group kernel, no per-key dispatch) per partition. ``value_col``
    must be integral (window sums stay exact in the float64 rolling
    accumulator below 2^53 and are cast back to int64); callers with
    float payloads fix a unit first — see ``q_rolling_sum``'s
    integer-cents contract.
    """

    def _bucket(t: pa.Table) -> pa.Table:
        u = np.asarray(t[by_col], dtype=np.int64)
        return t.append_column(
            "_pk", pa.array(u % num_partitions, pa.int64())
        )

    def _roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([by_col, ts_col, order_col],
                            kind="mergesort").reset_index(drop=True)
        rolled = (
            df.groupby(by_col, sort=False)[value_col]
            .rolling(window_rows, min_periods=1)
            .sum()
            .reset_index(level=0, drop=True)
            .sort_index()
        )
        df[out_col] = rolled.to_numpy().astype("int64")
        return df.drop(columns=["_pk"])

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_roll, batch_format="pandas")
    )


def window_ops(ds, *, by_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id", value_col: str = "value",
               ops: tuple[str, ...] = ("lag", "lead", "cumsum",
                                       "row_number"),
               num_partitions: int = _SESSION_PARTITIONS):
    """Generic per-key ordered window functions in one pass: any subset
    of lag / lead / cumsum / row_number over ``value_col``, ordered by
    (``ts_col``, ``order_col``) within ``by_col`` — SQL
    ``LAG(v)/LEAD(v)/SUM(v)/ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY ts, id)``.

    Same scale shape as :func:`sessionize`/:func:`rolling_sum`: ONE hash
    shuffle on a coarse key bucket, one mergesort per partition, then
    C-level grouped shift/cumsum/cumcount kernels — never per-key
    dispatch. lag/lead are null at group edges (SQL default); cumsum is
    the RUNNING total including the current row. All requested columns
    come from the same sorted frame, so one shuffle serves every op.
    """
    allowed = {"lag", "lead", "cumsum", "row_number"}
    bad = set(ops) - allowed
    if bad:
        raise ValueError(f"window_ops: unknown ops {sorted(bad)}")

    def _bucket(t: pa.Table) -> pa.Table:
        u = np.asarray(t[by_col], dtype=np.int64)
        return t.append_column(
            "_pk", pa.array(u % num_partitions, pa.int64())
        )

    def _win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([by_col, ts_col, order_col],
                            kind="mergesort").reset_index(drop=True)
        g = df.groupby(by_col, sort=False)
        if "lag" in ops:
            df["lag_v"] = g[value_col].shift(1)
        if "lead" in ops:
            df["lead_v"] = g[value_col].shift(-1)
        if "cumsum" in ops:
            df["cumsum_v"] = g[value_col].cumsum()
        if "row_number" in ops:
            df["row_number"] = (g.cumcount() + 1).astype("int64")
        return df.drop(columns=["_pk"])

    return (
        ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(_win, batch_format="pandas")
    )
