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
import pyarrow as pa

US_PER_S = 1_000_000


def _combine_partials(partials_ds, n_coarse: int | None = None):
    """Combine (user_id, window_id, value_sum, n) partials ->
    (user_id, window_id, n_events, sum_value) with the 6-decimal
    rounding the oracles replicate.

    COARSE-hash shuffle + one lexsort/reduceat kernel per group instead
    of ``groupby(keys).aggregate(Sum)``: Ray's native aggregate builds
    each of the O(users × windows) groups individually (measured 6.2 s
    vs 0.7 s on 383k partial rows at 32 cpus) — the house kernel
    pattern keeps the reduce whole-group vectorized at any group
    count."""
    import ray
    from .._util import hash_u64

    if n_coarse is None:
        n_coarse = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    def add_gkey(t: pa.Table) -> pa.Table:
        gk = (hash_u64(t.column("user_id").to_numpy().astype(np.uint64),
                       t.column("window_id").to_numpy().astype(np.uint64))
              % np.uint64(n_coarse)).astype(np.int64)
        return t.append_column("gkey", pa.array(gk))

    def agg_group(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        w = t.column("window_id").to_numpy()
        n = t.column("n").to_numpy()
        v = t.column("value_sum").to_numpy()
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "window_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "sum_value": pa.array([], pa.float64())})
        o = np.lexsort((w, u))
        u, w, n, v = u[o], w[o], n[o], v[o]
        starts = np.r_[0, np.flatnonzero((np.diff(u) != 0)
                                         | (np.diff(w) != 0)) + 1]
        return pa.table({
            "user_id": pa.array(u[starts]),
            "window_id": pa.array(w[starts]),
            "n_events": pa.array(np.add.reduceat(n, starts)),
            "sum_value": pa.array(np.round(np.add.reduceat(v, starts), 6)),
        })

    return (partials_ds.map_batches(add_gkey, batch_format="pyarrow")
            .groupby("gkey")
            .map_groups(agg_group, batch_format="pyarrow")
            .select_columns(["user_id", "window_id",
                             "n_events", "sum_value"]))


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


def sessionize(events_ds, gap_s: int = 1800, n_coarse: int | None = None):
    """-> Dataset(user_id, n_sessions, n_events): sessions split when the
    gap between consecutive events of a user exceeds gap_s.

    ONE all-to-all: (user_id, ts) pairs are hash-partitioned by a
    COARSE user-hash key (default 4 x cluster CPUs — NOT one group per
    user), and each group task sessionizes ALL of its users in a single
    lexsort + run-compression numpy pass (the house kernel pattern; no
    per-row or per-user Python anywhere). Replaces the r3 sort-then-
    merge-partials design: the global sort was itself an exchange plus
    a sample pass, so this is strictly one less wide step at identical
    semantics (VERDICT r3 item 2). Group working set = events/n_coarse
    rows of two int64 columns — raise ``n_coarse`` at 100-TB scale so a
    group fits a worker (any value gives identical results)."""
    import ray

    gap_us = gap_s * US_PER_S
    if n_coarse is None:
        n_coarse = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    def add_gkey(t: pa.Table) -> pa.Table:
        from .._util import hash_u64
        uid = t.column("user_id").to_numpy()
        gk = (hash_u64(uid.astype(np.uint64))
              % np.uint64(n_coarse)).astype(np.int64)
        return pa.table({
            "user_id": t.column("user_id"),
            "ts": t.column("ts").cast(pa.int64()),
            "gkey": pa.array(gk),
        })

    def sessions_group(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy()
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        o = np.lexsort((ts, u))
        u, ts = u[o], ts[o]
        same = u[1:] == u[:-1]
        starts = np.r_[0, np.flatnonzero(~same) + 1]
        ends = np.r_[starts[1:], len(u)]
        brk = ((ts[1:] - ts[:-1] > gap_us) & same).astype(np.int64)
        cbrk = np.r_[0, np.cumsum(brk)]
        return pa.table({
            "user_id": pa.array(u[starts]),
            "n_sessions": pa.array(cbrk[ends - 1] - cbrk[starts] + 1),
            "n_events": pa.array(ends - starts),
        })

    return (events_ds.select_columns(["user_id", "ts"])
            .map_batches(add_gkey, batch_format="pyarrow")
            .groupby("gkey")
            .map_groups(sessions_group, batch_format="pyarrow")
            .select_columns(["user_id", "n_sessions", "n_events"]))
