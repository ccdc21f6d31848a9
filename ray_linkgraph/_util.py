"""Deterministic vectorized hashing + small shared helpers.

All synthetic-data generation and sampling in this repo is driven by
counter-based hashing (splitmix64) so results are bit-identical across
runs, chunk sizes, and parallelism levels (FIXTURES.md §5 determinism
requirement; mirrors the reference's seeded-sampling determinism note,
SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays (public domain
    algorithm, Steele et al.)."""
    with np.errstate(over="ignore"):
        z = (x.astype(_U64) + _U64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def _strip_schema_meta(t):
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_nm(paths, **kwargs):
    """``ray.data.read_parquet`` that strips schema-level metadata.

    Parquet written by pandas carries a ``b'pandas'`` schema-metadata
    blob; pyarrow schemas with schema-level metadata are UNHASHABLE
    (``hash(schema)`` -> "unhashable type: 'dict'"), which defeats Ray
    Data's schema dedup at every reduce task ("Failed to hash the
    schemas" log spam) and can block operator fusion.

    The strip happens AT THE SOURCE: an explicit metadata-free
    ``schema=`` makes the read stage itself emit clean blocks (a
    downstream strip map still leaves the warning firing inside the
    fused ReadParquet stage). Falls back to the post-read strip map if
    the schema can't be derived up front.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        full = pq.read_schema(first).remove_metadata()
        cols = kwargs.get("columns")
        schema = pa.schema([full.field(c) for c in cols]) if cols else full
        return ray.data.read_parquet(paths, schema=schema, **kwargs)
    except Exception:
        return ray.data.read_parquet(paths, **kwargs).map_batches(
            _strip_schema_meta, batch_format="pyarrow", batch_size=None)


def vec_matrix(batch, vec_col: str):
    """list<float> column -> (n, d) float64 matrix via zero-copy flatten
    (no per-row Python lists). Shared by the similarity and dedup ops.

    Rejects null / ragged rows explicitly: ``flatten()`` silently drops
    null list entries, which would misalign every following row if the
    flattened size happened to still divide (ADVICE.md)."""
    import pyarrow as pa
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(f"{vec_col!r} contains {col.null_count} null "
                         f"embeddings; drop or impute them upstream")
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(batch)
    if n and flat.size % n:
        raise ValueError(f"{vec_col!r} rows have varying dimensions "
                         f"({flat.size} values / {n} rows)")
    return flat.reshape(n, -1)


def hash_u64(*streams: "np.ndarray | int") -> np.ndarray:
    """Combine integer streams (broadcastable arrays / scalars) into one
    deterministic uint64 stream."""
    acc = None
    with np.errstate(over="ignore"):
        for s in streams:
            a = np.asarray(s, dtype=np.uint64)
            h = splitmix64(a)
            acc = h if acc is None else splitmix64(acc ^ (h + _U64(0x9E3779B97F4A7C15)))
    return acc


def uniform01(*streams) -> np.ndarray:
    """Deterministic uniform [0,1) doubles from integer streams."""
    return (hash_u64(*streams) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def agg_by_int_keys(ds, keys: list, val: str, out_val: str,
                    reduce: str = "sum", n_coarse: int = 64):
    """groupby(int keys).sum/min(val) as a COARSE-hash shuffle with a
    map-side combiner and one lexsort/reduceat kernel per group.

    Ray's native ``groupby(keys).aggregate(...)`` materializes every
    group individually (measured 6.2 s vs 0.7 s on 383k rows / 382k
    groups at 32 cpus), so any high-cardinality aggregate should go
    through this instead: per-batch partials shrink the exchange to one
    row per (key, block), the shuffle has n_coarse groups regardless of
    key cardinality, and the reduce stays whole-group vectorized.
    Deterministic for integer-valued data; float sums can differ in
    reduction order (round on output where an oracle compares).
    Returns Dataset(keys..., out_val)."""
    import pyarrow as pa

    red = np.add.reduceat if reduce == "sum" else np.minimum.reduceat

    def _combine(t, val_col):
        ks = [t.column(k).to_numpy() for k in keys]
        v = t.column(val_col).to_numpy()
        if len(v) == 0:
            cols = {k: pa.array(a) for k, a in zip(keys, ks)}
            cols[out_val] = pa.array(v)
            return pa.table(cols)
        order = np.lexsort(tuple(reversed(ks)))
        kss = [k[order] for k in ks]
        vs = v[order]
        change = np.zeros(len(vs), dtype=bool)
        change[0] = True
        for k in kss:
            change[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        cols = {keys[i]: pa.array(kss[i][starts]) for i in range(len(keys))}
        cols[out_val] = pa.array(red(vs, starts))
        return pa.table(cols)

    def pre(t):
        pt = _combine(t, val)
        gk = (hash_u64(*[pt.column(k).to_numpy().astype(np.uint64)
                         for k in keys])
              % np.uint64(n_coarse)) if len(pt) else np.zeros(0, np.uint64)
        return pt.append_column("_g", pa.array(
            np.asarray(gk, dtype=np.int64)))

    def merge(t):
        return _combine(t, out_val)

    return (ds.map_batches(pre, batch_format="pyarrow")
            .groupby("_g").map_groups(merge, batch_format="pyarrow")
            .select_columns(list(keys) + [out_val]))


def drop_empty_blocks(ds):
    """Rebuild ``ds`` without empty blocks (metadata-only check, blocks
    stay in the object store).

    Ray 2.49 ``map_batches`` skips the UDF on empty input blocks and
    forwards schema-LESS empty blocks; pyarrow's join then fails with
    "No match ... for key field reference" when such a block lands in a
    hash partition. Call this on any map output that feeds a join.
    Materializes the dataset; returns None if every block is empty.
    """
    import ray
    import ray.data

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)
