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


def window_agg(events_ds, width_s: int = 3600):
    """-> Dataset(user_id, window_id, n_events, sum_value) — tumbling
    windows of width_s; window_id = floor(epoch_seconds / width_s)."""
    from ray.data.aggregate import Count, Sum

    width_us = width_s * US_PER_S

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        return pa.table({
            "user_id": batch.column("user_id"),
            "window_id": pa.array(ts // width_us, type=pa.int64()),
            "value": batch.column("value"),
        })

    out = (events_ds.map_batches(add_window, batch_format="pyarrow")
           .groupby(["user_id", "window_id"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))

    def round_sum(batch: pa.Table) -> pa.Table:
        sv = np.round(batch.column("sum_value").to_numpy(), 6)
        return batch.set_column(batch.schema.get_field_index("sum_value"),
                                "sum_value", pa.array(sv))

    return out.map_batches(round_sum, batch_format="pyarrow")


def sessionize(events_ds, gap_s: int = 1800):
    """-> Dataset(user_id, n_sessions, n_events): sessions split when the
    gap between consecutive events of a user exceeds gap_s."""
    gap_us = gap_s * US_PER_S

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(df["ts"].to_numpy().astype("datetime64[us]")
                     .astype(np.int64))
        breaks = int((np.diff(ts) > gap_us).sum()) if len(ts) > 1 else 0
        return pd.DataFrame({"user_id": [df["user_id"].iloc[0]],
                             "n_sessions": [breaks + 1],
                             "n_events": [len(ts)]})

    return (events_ds.select_columns(["user_id", "ts"])
            .groupby("user_id")
            .map_groups(per_user, batch_format="pandas"))
