"""Composed training-data pipelines — the end-to-end shapes a 100-TB
corpus job actually runs, built from the ops/ stages.

``clean_corpus`` is the flagship: quality filter → language filter →
exact dedup → MinHash near-dup dedup → kept corpus + a per-stage audit
of drop counts. Everything streams: filters are vectorized batch
predicates, the dedup keep-sets are sparse by construction and
broadcast once (ray.put) for the final semi-join — the corpus itself is
never collected.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from . import dedup, text


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


def dedup_keep_ids(docs_ds, near_threshold: float = 0.8,
                   id_col: str = "doc_id"):
    """Exact + MinHash near-dup dedup: keep the min-id representative of
    every duplicate cluster. Returns a sorted numpy array of kept ids
    (sparse relative to the corpus only when duplication is heavy; at
    extreme scale keep it as a Dataset and semi-join instead)."""
    near = dedup.minhash_lsh_dedup(docs_ds, threshold=near_threshold)

    def reps(t: pa.Table) -> pa.Table:
        keep = t.column("cluster").to_numpy() == \
            t.column(id_col).to_numpy()
        return t.filter(pa.array(keep)).select([id_col])

    keep_ds = near.map_batches(reps, batch_format="pyarrow")
    tabs = [t for t in ray.get(keep_ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return np.zeros(0, dtype=np.int64)
    return np.sort(pa.concat_tables(tabs).column(id_col).to_numpy())


def clean_corpus(docs_ds, min_quality: float = 0.5, min_tokens: int = 5,
                 langs: tuple = ("en",), near_threshold: float = 0.8,
                 id_col: str = "doc_id"):
    """-> (kept Dataset, audit dict). Quality/language filter, then
    exact+near dedup keeping cluster representatives."""
    n0 = docs_ds.count()
    filtered = quality_filter(docs_ds, min_quality, min_tokens, langs,
                              id_col=id_col).materialize()
    n1 = filtered.count()
    keep_ids = dedup_keep_ids(filtered, near_threshold, id_col)
    ref = ray.put(keep_ids)

    class Keep:
        def __init__(self):
            self.ids = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy()
            return batch.filter(pa.array(np.isin(ids, self.ids)))

    kept = filtered.map_batches(Keep, batch_format="pyarrow",
                                concurrency=(1, 8)).materialize()
    n2 = kept.count()
    audit = {"input_docs": n0, "after_quality_lang": n1,
             "after_dedup": n2, "dropped_quality_lang": n0 - n1,
             "dropped_duplicates": n1 - n2}
    return kept, audit
