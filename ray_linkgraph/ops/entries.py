"""queries()/oracle_sql() entries for the training-data operators
(documents / embeddings / events tables). SQL-expressible ops get a
DuckDB oracle; MinHash/SimHash/fingerprint/ANN are rows-only checks
(hash functions are not reasonably expressible in SQL) but are covered
by pytest unit tests instead."""

from __future__ import annotations

import os

import numpy as np
import ray.data

from . import dedup, events, similarity, text

US_HOUR = 3_600_000_000
US_GAP = 1_800_000_000


def _docs(sf_dir):
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])


def _emb(sf_dir):
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _events(sf_dir):
    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                 columns=["user_id", "ts", "value"])


# ---------------------------------------------------------------------------

def q_exact_dedup(sf_dir):
    return dedup.exact_dedup(_docs(sf_dir))


def q_token_stats(sf_dir):
    return _docs(sf_dir).map_batches(text.token_stats, batch_format="pyarrow")


def q_quality(sf_dir):
    return _docs(sf_dir).map_batches(text.quality_stats,
                                     batch_format="pyarrow")


def q_langid(sf_dir):
    return _docs(sf_dir).map_batches(text.LangId, batch_format="pyarrow",
                                     concurrency=(1, 4))


def q_fingerprint(sf_dir):
    return _docs(sf_dir).map_batches(text.fingerprint,
                                     batch_format="pyarrow")


def q_events_window(sf_dir):
    return events.window_agg(_events(sf_dir), width_s=3600)


def q_sessionize(sf_dir):
    return events.sessionize(_events(sf_dir), gap_s=1800)


def q_minhash_dedup(sf_dir):
    return dedup.minhash_lsh_dedup(_docs(sf_dir), threshold=0.8)


def q_simhash_dedup(sf_dir):
    return dedup.simhash_neardup(_docs(sf_dir), max_hamming=3)


def q_embedding_neardup(sf_dir):
    return dedup.embedding_neardup(_emb(sf_dir), threshold=0.95)


def _query_matrix(sf_dir, n=3):
    t = _emb(sf_dir).filter(lambda r: r["vec_id"] < n).take_all()
    t.sort(key=lambda r: r["vec_id"])
    return np.stack([np.asarray(r["embedding"], dtype=np.float64)
                     for r in t])


def q_knn_brute(sf_dir):
    return similarity.knn_brute(_emb(sf_dir), _query_matrix(sf_dir), k=5)


def q_knn_ivf(sf_dir):
    return similarity.knn_ivf(_emb(sf_dir), _query_matrix(sf_dir), k=5,
                              n_centroids=8, nprobe=8)  # nprobe=all: exact


# ---------------------------------------------------------------------------

def _langid_sql():
    pats = {lang: r"\b(" + "|".join(ws) + r")\b"
            for lang, ws in text.STOPWORDS.items()}
    h = {lang: f"CAST(len(regexp_extract_all(lower(text), '{p}')) AS BIGINT)"
         for lang, p in pats.items()}
    return f"""
SELECT doc_id,
  CASE WHEN {h['en']} > 0 AND {h['en']} >= {h['de']} AND {h['en']} >= {h['fr']} THEN 'en'
       WHEN {h['de']} > 0 AND {h['de']} > {h['en']} AND {h['de']} >= {h['fr']} THEN 'de'
       WHEN {h['fr']} > 0 AND {h['fr']} > {h['en']} AND {h['fr']} > {h['de']} THEN 'fr'
       ELSE 'und' END AS lang_pred,
  greatest({h['en']}, {h['de']}, {h['fr']}) AS stop_hits
FROM documents ORDER BY doc_id"""


def queries():
    return {
        "exact_dedup": q_exact_dedup,
        "token_stats": q_token_stats,
        "text_quality": q_quality,
        "langid": q_langid,
        "doc_fingerprint": q_fingerprint,
        "events_window_1h": q_events_window,
        "sessionize_30m": q_sessionize,
        "minhash_lsh_dedup": q_minhash_dedup,
        "simhash_neardup": q_simhash_dedup,
        "embedding_neardup": q_embedding_neardup,
        "knn_cosine_brute": q_knn_brute,
        "knn_cosine_ivf": q_knn_ivf,
    }


def oracle_sql():
    return {
        "exact_dedup": """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
       count(*) AS dup_count
FROM documents GROUP BY md5(text) ORDER BY content_hash""",
        "token_stats": r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY doc_id""",
        "text_quality": r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
       CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
       CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
       ROUND((CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
              / greatest(length(text), 1))
             * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                      / greatest(length(text), 1)), 10) AS quality
FROM documents ORDER BY doc_id""",
        "langid": _langid_sql(),
        "events_window_1h": """
SELECT user_id, epoch_us(ts) // 3600000000 AS window_id,
       count(*) AS n_events, ROUND(sum(value), 6) AS sum_value
FROM events GROUP BY user_id, epoch_us(ts) // 3600000000
ORDER BY user_id, window_id""",
        "sessionize_30m": """
WITH x AS (SELECT user_id,
                  epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
           FROM events)
SELECT user_id,
       CAST(sum(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) + 1 AS BIGINT)
         AS n_sessions,
       count(*) AS n_events
FROM x GROUP BY user_id ORDER BY user_id""",
    }
