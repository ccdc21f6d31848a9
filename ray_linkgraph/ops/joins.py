"""Distributed temporal joins Ray Data lacks natively: as-of join and
band (range) join.

The reference has no general join operator (SURVEY.md §2.8 — its joins
are merge-joins over id-sorted partition files); these are the two
join shapes a training-data/event pipeline needs that neither the
reference nor Ray Data provides, built as compositions of map_batches
+ union + groupby().map_groups per the custom-operator guidance.

Partitioning assumptions (documented per the north-star scale notes):

* ``asof_join`` hash-partitions BOTH sides by the ``by`` key, so all
  rows of one key meet in one group task. Skew bound = rows per key
  bucket; at 100 TB raise ``n_buckets`` so the largest bucket fits a
  worker (the per-group work is a vectorized ``pandas.merge_asof``).
* ``band_join_count`` range-partitions by time bucket of width
  ``band_us`` and replicates each right row to its 3 adjacent buckets
  (classic band-join replication), so a left row's whole ±band window
  is co-located with it. Replication factor is exactly 3 regardless of
  band width; group size = events per band window — pick ``band_us``
  (or pre-aggregate the right side) so one window fits a worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._util import hash_u64


def _ts_us(col) -> np.ndarray:
    """timestamp (any unit) or int64 column -> int64 microseconds.
    Non-us timestamp units are normalized FIRST so band widths given in
    microseconds always mean microseconds (ADVICE.md: a timestamp[ns]
    column would otherwise be interpreted at 1000x the band width)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        if col.type.unit != "us":
            col = col.cast(pa.timestamp("us", tz=col.type.tz))
        return col.cast(pa.int64()).to_numpy()
    return col.to_numpy().astype(np.int64)


def asof_join(left_ds, right_ds, by: str = "user_id", on: str = "ts",
              right_val: str = "event_id", out_col: str = "prior_event_id",
              n_buckets: int = 32, unmatched: int = -1):
    """For every left row, the ``right_val`` of the LATEST right row of
    the same ``by`` key with ``right.on <= left.on`` (backward as-of).

    Tie rule (deterministic): among right rows sharing the maximal
    ``on``, the one with the largest ``right_val`` wins — the right
    side is pre-deduplicated to max(right_val) per (by, on), which is
    exactly what a SQL oracle's ``ORDER BY ts DESC, val DESC LIMIT 1``
    (or an ASOF JOIN over the deduped side) computes.

    Key requirements (ADVICE.md): ``by`` and ``right_val`` must be
    INTEGER columns (``by`` is hashed with a uint64 kernel and
    ``right_val`` is carried as int64 with ``unmatched`` as the
    sentinel). Hash a string key to int64 upstream (e.g. with
    ``pyarrow.compute`` hash kernels or ``_util.hash_u64`` over a
    dictionary-encoded id) before calling.

    Returns Dataset(left columns..., ``out_col``:int64) with
    ``unmatched`` as the sentinel where no right row qualifies (keeps
    the output schema non-nullable so value hashing is stable).
    """
    nb = np.uint64(n_buckets)
    lschema = left_ds.schema()
    left_cols = list(lschema.names)
    left_types = dict(zip(lschema.names, lschema.types))

    def _bucket(t: pa.Table) -> pa.Array:
        b = (hash_u64(t.column(by).to_numpy().astype(np.uint64))
             % nb).astype(np.int64)
        return pa.array(b, type=pa.int64())

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in left_cols}
        cols["_rv"] = pa.array(np.full(len(t), unmatched, dtype=np.int64))
        cols["_b"] = _bucket(t)
        cols["_side"] = pa.array(np.ones(len(t), dtype=np.int64))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        # same schema (and column order) as tag_left so union blocks
        # unify. Left-only INTEGER columns get a zero FILLER (never
        # read: group() drops right rows) rather than nulls — nulls
        # would upcast the combined pandas frame to float64, silently
        # corrupting int64 values above 2^53; other types keep nulls
        # (NaN/NaT/None round-trip without loss for dropped rows).
        def filler(c):
            typ = left_types[c]
            if pa.types.is_integer(typ):
                return pa.array(np.zeros(len(t), dtype=np.int64)).cast(typ)
            return pa.nulls(len(t), type=typ)

        cols = {c: (t.column(c) if c in (by, on) else filler(c))
                for c in left_cols}
        cols["_rv"] = t.column(right_val).cast(pa.int64())
        cols["_b"] = _bucket(t)
        cols["_side"] = pa.array(np.zeros(len(t), dtype=np.int64))
        return pa.table(cols)

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow")
    rt = (right_ds.select_columns([by, on, right_val])
          .map_batches(tag_right, batch_format="pyarrow"))

    def group(df: pd.DataFrame) -> pd.DataFrame:
        l = (df[df["_side"] == 1]
             .drop(columns=["_rv", "_b", "_side"])
             .sort_values([on, by], kind="stable"))
        r = df[df["_side"] == 0]
        if len(r) == 0:
            out = l[left_cols].copy()
            out[out_col] = np.full(len(l), unmatched, dtype=np.int64)
            return out
        # deterministic tie-break: keep max _rv per (by, on)
        r = (r.sort_values([by, on, "_rv"], kind="stable")
             .drop_duplicates([by, on], keep="last")
             .sort_values([on, by], kind="stable")
             .reset_index(drop=True))
        # merge on the right ROW POSITION, not _rv: merge_asof emits
        # NaN for unmatched rows, and a float64 round-trip would corrupt
        # int64 values above 2^53. Positions are small, so their float
        # round-trip is exact; _rv is then gathered losslessly.
        r = r.assign(_ridx=np.arange(len(r), dtype=np.int64))
        m = pd.merge_asof(l, r[[by, on, "_ridx"]], on=on, by=by,
                          direction="backward", allow_exact_matches=True)
        out = m[left_cols].copy()
        ridx = m["_ridx"].to_numpy()
        miss = np.isnan(ridx)
        safe = np.where(miss, 0, ridx).astype(np.int64)
        rv = r["_rv"].to_numpy()[safe]
        out[out_col] = np.where(miss, unmatched, rv).astype(np.int64)
        return out

    return (lt.union(rt)
            .groupby("_b")
            .map_groups(group, batch_format="pandas"))


def band_join_count(left_ds, right_ds, on: str = "ts",
                    band_us: int = 300_000_000,
                    left_key: str = "event_id",
                    out_col: str = "n_in_band",
                    n_coarse: int = 64):
    """For every left row, COUNT of right rows with
    ``|right.on - left.on| <= band_us`` (inclusive band/range join,
    aggregated — the join output itself would be quadratic in dense
    windows, so the operator folds it to a count per left row).

    Right rows are replicated to their home time bucket ±1 (bucket
    width = band_us, so a left row's band spans at most its own and
    the two adjacent buckets); each left row is evaluated in exactly
    one bucket, so no double counting. Buckets shuffle under a COARSE
    hash key (n_coarse groups — one group per time bucket would cost a
    Python call per bucket), and the per-group count is ONE pair of
    composite-key searchsorteds over all of the group's buckets at
    once: rows within bucket b carry offsets ts − (b−1)·bw ∈ [0, 3·bw),
    so key = b·2bw + ts + bw is monotone in (bucket, ts) and per-row
    band bounds never leave their own bucket's key range.
    """
    bw = np.int64(band_us)
    from .._util import hash_u64

    def _gk(b: np.ndarray) -> pa.Array:
        return pa.array((hash_u64(b.astype(np.uint64))
                         % np.uint64(n_coarse)).astype(np.int64))

    def rep_right(t: pa.Table) -> pa.Table:
        ts = _ts_us(t.column(on))
        home = ts // bw
        buckets = np.concatenate([home - 1, home, home + 1])
        return pa.table({
            "_b": pa.array(buckets, type=pa.int64()),
            "_ts": pa.array(np.tile(ts, 3), type=pa.int64()),
            "_side": pa.array(np.zeros(3 * len(ts), dtype=np.int64)),
            left_key: pa.array(np.full(3 * len(ts), -1, dtype=np.int64)),
            "_g": _gk(buckets),
        })

    def tag_left(t: pa.Table) -> pa.Table:
        ts = _ts_us(t.column(on))
        b = ts // bw
        return pa.table({
            "_b": pa.array(b, type=pa.int64()),
            "_ts": pa.array(ts, type=pa.int64()),
            "_side": pa.array(np.ones(len(ts), dtype=np.int64)),
            left_key: t.column(left_key),
            "_g": _gk(b),
        })

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow")
    rt = right_ds.select_columns([on]).map_batches(rep_right,
                                                   batch_format="pyarrow")

    def comp(b: np.ndarray, ts: np.ndarray) -> np.ndarray:
        return b * (2 * bw) + ts + bw

    def group(t: pa.Table) -> pa.Table:
        side = t.column("_side").to_numpy()
        b = t.column("_b").to_numpy()
        ts = t.column("_ts").to_numpy()
        L = side == 1
        if not L.any():
            return pa.table({left_key: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.int64())})
        lkey = t.column(left_key).to_numpy()[L]
        rkeys = np.sort(comp(b[~L], ts[~L]))
        lb, lts = b[L], ts[L]
        n = (np.searchsorted(rkeys, comp(lb, lts + bw), side="right")
             - np.searchsorted(rkeys, comp(lb, lts - bw), side="left"))
        return pa.table({left_key: pa.array(lkey),
                         out_col: pa.array(n.astype(np.int64))})

    return (lt.union(rt)
            .groupby("_g")
            .map_groups(group, batch_format="pyarrow"))
