"""Windowed / sessionized aggregation over the events stream table.

Ray Data has no event-time windowing; per the batch model (SURVEY.md
§2.11 — the reference is strictly batch too) windows are expressed as
grouped aggregates: tumbling windows via a computed window id, sessions
via per-user sorted gap analysis inside map_groups. Ordering assumption:
within a user's group the kernel sorts by ts itself, so input order
never matters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

US_PER_S = 1_000_000


def _combine_partials(partials_ds):
    """groupby-sum of (user_id, window_id, value_sum, n) partials ->
    (user_id, window_id, n_events, sum_value) with the 6-decimal
    rounding the oracles replicate."""
    from ray.data.aggregate import Sum

    out = (partials_ds.groupby(["user_id", "window_id"])
           .aggregate(Sum("n", alias_name="n_events"),
                      Sum("value_sum", alias_name="sum_value")))

    def round_sum(batch: pa.Table) -> pa.Table:
        sv = np.round(batch.column("sum_value").to_numpy(), 6)
        return batch.set_column(batch.schema.get_field_index("sum_value"),
                                "sum_value", pa.array(sv))

    return out.map_batches(round_sum, batch_format="pyarrow")


def _partial_agg(t: pa.Table) -> pa.Table:
    return (pa.TableGroupBy(t, ["user_id", "window_id"])
            .aggregate([("value", "sum"), ("value", "count")])
            .rename_columns(["user_id", "window_id", "value_sum", "n"]))


def window_agg(events_ds, width_s: int = 3600):
    """-> Dataset(user_id, window_id, n_events, sum_value) — tumbling
    windows of width_s; window_id = floor(epoch_seconds / width_s).

    Map-side combiner: each batch pre-aggregates to (user, window)
    partials before the groupby, so the all-to-all shuffle moves one row
    per (user, window, block) instead of one per event. (Float addition
    order differs from a single-pass sum only below the 6-decimal
    rounding both the output and the oracle apply.)"""
    width_us = width_s * US_PER_S

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        return _partial_agg(pa.table({
            "user_id": batch.column("user_id"),
            "window_id": pa.array(ts // width_us, type=pa.int64()),
            "value": batch.column("value"),
        }))

    return _combine_partials(
        events_ds.map_batches(partial, batch_format="pyarrow"))


def sliding_window_agg(events_ds, width_s: int = 3600,
                       slide_s: int = 900):
    """Hopping/sliding windows: window k covers
    [k*slide_s, k*slide_s + width_s); every event lands in
    width_s/slide_s windows. -> Dataset(user_id, window_id, n_events,
    sum_value), window_id = k.

    The expansion is vectorized (np.repeat over the batch, no Python
    per-row loop) and immediately pre-aggregated per batch, so the
    shuffle still moves (user, window, block) partials — the
    width/slide fan-out factor never crosses the exchange."""
    if width_s % slide_s:
        raise ValueError("width_s must be a multiple of slide_s")
    nwin = width_s // slide_s
    slide_us = slide_s * US_PER_S

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        k_hi = ts // slide_us                 # newest window holding ts
        off = np.arange(nwin, dtype=np.int64)
        return _partial_agg(pa.table({
            "user_id": np.repeat(batch.column("user_id").to_numpy(), nwin),
            "window_id": (k_hi[:, None] - off[None, :]).ravel(),
            "value": np.repeat(batch.column("value").to_numpy(), nwin),
        }))

    return _combine_partials(
        events_ds.map_batches(partial, batch_format="pyarrow"))


def sessionize(events_ds, gap_s: int = 1800):
    """-> Dataset(user_id, n_sessions, n_events): sessions split when the
    gap between consecutive events of a user exceeds gap_s.

    Scale path: global sort by (user_id, ts), then a VECTORIZED
    run-compression kernel per block — one numpy pass emits one partial
    row per (user, block) with (first_ts, last_ts, n, inner_breaks).
    The heavy event data is never touched by per-group Python; only the
    O(users) partials table goes through map_groups, where each group
    merges its ≤ #blocks partial rows (sorted by first_ts, counting
    block-boundary gaps)."""
    gap_us = gap_s * US_PER_S

    def block_partials(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "first_ts": pa.array([], pa.int64()),
                             "last_ts": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "inner": pa.array([], pa.int64())})
        same = uid[1:] == uid[:-1]
        starts = np.r_[0, np.flatnonzero(~same) + 1]
        ends = np.r_[starts[1:], n]
        brk = ((ts[1:] - ts[:-1] > gap_us) & same).astype(np.int64)
        cum = np.r_[0, np.cumsum(brk)]
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "first_ts": pa.array(ts[starts]),
            "last_ts": pa.array(ts[ends - 1]),
            "n": pa.array(ends - starts),
            "inner": pa.array(cum[ends - 1] - cum[starts]),
        })

    partials = (events_ds.select_columns(["user_id", "ts"])
                .sort(["user_id", "ts"])
                .map_batches(block_partials, batch_format="pyarrow"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("first_ts")
        ft, lt = df["first_ts"].to_numpy(), df["last_ts"].to_numpy()
        breaks = int(df["inner"].sum()) + int((ft[1:] - lt[:-1] > gap_us).sum())
        return pd.DataFrame({"user_id": [df["user_id"].iloc[0]],
                             "n_sessions": [breaks + 1],
                             "n_events": [int(df["n"].sum())]})

    return (partials.groupby("user_id")
            .map_groups(merge, batch_format="pandas")
            .select_columns(["user_id", "n_sessions", "n_events"]))
