"""queries()/oracle_sql() entries for the training-data operators
(documents / embeddings / events tables). EVERY op has a DuckDB
oracle: the text hashing contracts (texthash.py) are modular BIGINT
arithmetic expressible verbatim in SQL, the near-dup clustering is an
iterated min-label CTE, and ANN cosine uses list_cosine_similarity +
a row_number window."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from .._util import read_parquet_nm

from . import dedup, events, joins, multimodal, pipelines, sample, similarity, text, texthash  # noqa: F401 — imported at module scope so __ray_entry__'s by-value cloudpickle registration covers every worker-visible module

EMB_NEARDUP_T = 0.45   # gate threshold (test embeddings max pair cos ~0.51)
KNN_K = 5
KNN_NQ = 3

US_HOUR = 3_600_000_000
US_GAP = 1_800_000_000


def _docs(sf_dir):
    return read_parquet_nm(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])


def _emb(sf_dir):
    return read_parquet_nm(os.path.join(sf_dir, "embeddings.parquet"))


def _events(sf_dir):
    return read_parquet_nm(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "value"])


# ---------------------------------------------------------------------------

def q_exact_dedup(sf_dir):
    return dedup.exact_dedup(_docs(sf_dir))


def q_exact_dedup_fp(sf_dir):
    """Fingerprint-key mode: vectorized M31 fold instead of per-row
    md5 — the scale-default content key, gated by its own oracle."""
    return dedup.exact_dedup(_docs(sf_dir), key="fingerprint")


def q_token_stats(sf_dir):
    return _docs(sf_dir).map_batches(text.token_stats, batch_format="pyarrow")


def q_quality(sf_dir):
    return _docs(sf_dir).map_batches(text.quality_stats,
                                     batch_format="pyarrow")


def q_langid(sf_dir):
    return _docs(sf_dir).map_batches(text.LangId(), batch_format="pyarrow")


def q_fingerprint(sf_dir):
    return _docs(sf_dir).map_batches(text.fingerprint,
                                     batch_format="pyarrow")


def q_events_window(sf_dir):
    return events.window_agg(_events(sf_dir), width_s=3600)


def q_sessionize(sf_dir):
    return events.sessionize(_events(sf_dir), gap_s=1800)


def q_sliding_window(sf_dir):
    return events.sliding_window_agg(_events(sf_dir), width_s=3600,
                                     slide_s=900)


def _events_of_type(sf_dir, kind: str):
    ds = read_parquet_nm(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "user_id", "event_type"])
    import pyarrow.compute as pc
    return (ds.map_batches(
        lambda t, k=kind: t.filter(pc.equal(t.column("event_type"), k)),
        batch_format="pyarrow")
        .select_columns(["event_id", "ts", "user_id"]))


def q_asof_purchase_click(sf_dir):
    """Backward as-of join: each purchase event -> the latest prior
    click event of the same user (-1 when none)."""
    out = joins.asof_join(_events_of_type(sf_dir, "purchase"),
                          _events_of_type(sf_dir, "click"),
                          by="user_id", on="ts", right_val="event_id",
                          out_col="prior_event_id")
    return out.select_columns(["event_id", "user_id", "prior_event_id"])


def q_range_join_5m(sf_dir):
    """Band/range join (aggregated): per purchase event, the number of
    error events (any user) within +-5 minutes."""
    return joins.band_join_count(_events_of_type(sf_dir, "purchase"),
                                 _events_of_type(sf_dir, "error"),
                                 on="ts", band_us=300_000_000,
                                 left_key="event_id",
                                 out_col="n_near_errors")


VOCAB_K = 50
SAMPLE_RATES = {"en": 40, "de": 25, "fr": 10}
SAMPLE_SEED = 73


def q_vocab_topk(sf_dir):
    return text.vocab_topk(_docs(sf_dir), k=VOCAB_K)


TOPK_PER_LANG = 3


def q_topk_per_lang(sf_dir):
    """Top-3 documents per language by n_chars (ties -> min doc_id)."""
    ds = read_parquet_nm(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "lang", "n_chars"])
    return text.topk_per_group(ds, group_col="lang", order_col="n_chars",
                               k=TOPK_PER_LANG, id_col="doc_id")


def q_stratified_sample(sf_dir):
    ds = read_parquet_nm(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "lang"])
    return sample.stratified_hash_sample(ds, SAMPLE_RATES, SAMPLE_SEED)


def q_minhash_dedup(sf_dir):
    return dedup.minhash_lsh_dedup(_docs(sf_dir), threshold=0.8)


def q_ngram_jaccard(sf_dir):
    """Exact 3-gram Jaccard of every adjacent doc-id pair."""
    return dedup.ngram_jaccard_adjacent(_docs(sf_dir))


def q_simhash_dedup(sf_dir):
    return dedup.simhash_neardup(_docs(sf_dir), max_hamming=3)


def q_embedding_neardup(sf_dir):
    return dedup.embedding_neardup(_emb(sf_dir), threshold=EMB_NEARDUP_T)


def _query_matrix(sf_dir, n=KNN_NQ):
    t = _emb(sf_dir).filter(expr=f"vec_id < {n}").take_all()
    t.sort(key=lambda r: r["vec_id"])
    return np.stack([np.asarray(r["embedding"], dtype=np.float64)
                     for r in t])


def _round_sim(ds):
    def rnd(t: pa.Table) -> pa.Table:
        i = t.column_names.index("sim")
        return t.set_column(i, "sim",
                            pa.array(np.round(t.column("sim").to_numpy(), 6)))
    return ds.map_batches(rnd, batch_format="pyarrow")


def q_knn_brute(sf_dir):
    return _round_sim(
        similarity.knn_brute(_emb(sf_dir), _query_matrix(sf_dir), k=KNN_K))


MEDIA_N, MEDIA_SEED = 200, 11


def media_fixture_path(kind: str = "bmp") -> str:
    """Write-once deterministic media fixture parquet shared by the
    media query AND its DuckDB oracle (the testdata has no media table;
    the table is a pure function of (n, seed), so whichever side runs
    first creates identical bytes). Atomic rename guards concurrent
    callers."""
    import pyarrow.parquet as pq
    path = (f"/tmp/ray_linkgraph_cache/"
            f"media_{kind}_n{MEDIA_N}_s{MEDIA_SEED}.parquet")
    if not os.path.exists(path):
        from . import multimodal
        os.makedirs(os.path.dirname(path), exist_ok=True)
        t = multimodal.synthetic_media_table(MEDIA_N, seed=MEDIA_SEED,
                                             media_type=kind)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path


def q_media_decode(sf_dir):
    """Real BMP decode through the actor-pool stage over the
    deterministic media fixture (input independent of sf_dir). The gated
    output is fully SQL-checkable: width/height come from the BMP header
    (little-endian int32 at byte offsets 18/22), byte_size from
    octet_length, and sum_r/sum_g are exact integer channel sums over
    the DECODED pixels, which the oracle reproduces in closed form from
    the generator's gradient (entries.py `_media_sql`) — a wrong
    channel order, row padding or bottom-up flip in the decoder breaks
    the match. Float pixel statistics stay pytest-covered."""
    from . import multimodal
    ds = ray.data.read_parquet(media_fixture_path())
    out = multimodal.decode_media(ds, codec="image", batch_size=32,
                                  concurrency=(1, 4), channel_sums=True)
    return out.select_columns(
        ["media_id", "width", "height", "byte_size", "sum_r", "sum_g"])


def _media_sql() -> str:
    """Width/height parsed from the BMP header blob via hex-string
    slicing (this DuckDB has no BLOB subscript); sum_r/sum_g in closed
    form from the deterministic gradient the fixture encodes:
    r(x,y) = x*255 // (w-1), g(x,y) = y*255 // (h-1)."""
    path = media_fixture_path()
    # 1-based hex-char offset of byte k = 2*k + 1: width bytes 18..21,
    # height bytes 22..25, little-endian -> reverse the pairs
    w_hex = "||".join(f"substr(hx,{2 * k + 1},2)" for k in (21, 20, 19, 18))
    h_hex = "||".join(f"substr(hx,{2 * k + 1},2)" for k in (25, 24, 23, 22))
    return f"""
WITH m AS (SELECT media_id, hex(payload) AS hx,
                  CAST(octet_length(payload) AS BIGINT) AS byte_size
           FROM read_parquet('{path}')),
d AS (SELECT media_id, byte_size,
             CAST(('0x' || {w_hex}) AS BIGINT) AS width,
             CAST(('0x' || {h_hex}) AS BIGINT) AS height
      FROM m)
SELECT media_id, width, height, byte_size,
  CAST(height * list_sum(list_transform(range(0, width),
       x -> (x * 255) // (width - 1))) AS BIGINT) AS sum_r,
  CAST(width * list_sum(list_transform(range(0, height),
       y -> (y * 255) // (height - 1))) AS BIGINT) AS sum_g
FROM d ORDER BY media_id"""


def q_media_decode_wav(sf_dir):
    """Real RIFF/WAVE 16-bit PCM decode through the actor-pool stage.
    Gated output: header fields (n_samples, sample_rate) plus the exact
    integer sum of the DECODED channel-0 samples — the oracle
    independently re-decodes the PCM int16 stream from the payload blob
    in SQL (hex slicing), so a wrong byte order, chunk walk or sign
    convention breaks the match."""
    from . import multimodal
    ds = ray.data.read_parquet(media_fixture_path("wav"))
    out = multimodal.decode_media(ds, codec="audio", batch_size=32,
                                  concurrency=(1, 4), channel_sums=True)
    return out.select_columns(
        ["media_id", "n_samples", "sample_rate", "byte_size", "sum_ch0"])


def _media_wav_sql() -> str:
    """Independent SQL WAV decoder over the fixture blob: header ints
    from the canonical single fmt+data layout (ch @22, rate @24,
    data_size @40, PCM @44), then the signed-int16 sample sum via
    hex-sliced little-endian pairs."""
    path = media_fixture_path("wav")

    def le(off, nbytes):                      # 1-based hex-char slicing
        return ("'0x' || " + " || ".join(
            f"substr(hx,{2 * k + 1},2)"
            for k in range(off + nbytes - 1, off - 1, -1)))

    return f"""
WITH m AS (SELECT media_id, hex(payload) AS hx,
                  CAST(octet_length(payload) AS BIGINT) AS byte_size
           FROM read_parquet('{path}')),
h AS (SELECT media_id, byte_size, hx,
             CAST(({le(22, 2)}) AS BIGINT) AS ch,
             CAST(({le(24, 4)}) AS BIGINT) AS sample_rate,
             CAST(({le(40, 4)}) AS BIGINT) AS data_size
      FROM m),
d AS (SELECT media_id, byte_size, sample_rate, ch, hx,
             data_size // (2 * ch) AS n_samples
      FROM h)
SELECT media_id, n_samples, sample_rate, byte_size,
  CAST(list_sum(list_transform(
    list_transform(range(0, n_samples),
      k -> CAST(('0x' || substr(hx, 2 * (44 + 2 * k * ch) + 3, 2)
                       || substr(hx, 2 * (44 + 2 * k * ch) + 1, 2))
                AS BIGINT)),
    v -> v - CASE WHEN v >= 32768 THEN 65536 ELSE 0 END)) AS BIGINT)
    AS sum_ch0
FROM d ORDER BY media_id"""


def q_knn_ivf(sf_dir):
    return _round_sim(
        similarity.knn_ivf(_emb(sf_dir), _query_matrix(sf_dir), k=KNN_K,
                           n_centroids=8, nprobe=8))  # nprobe=all: exact


def q_clean_corpus(sf_dir):
    """Composed flagship pipeline: quality/token/language filter →
    MinHash near-dup dedup keeping cluster representatives. The gated
    output is the kept corpus itself (doc_id + text pass-through);
    the per-stage audit counts are pytest-covered."""
    kept, _audit = pipelines.clean_corpus(_docs(sf_dir))
    return kept.select_columns(["doc_id", "text"])


# ---------------------------------------------------------------------------

def _langid_exprs():
    """(CASE expression predicting the language, stop-hit max expr) —
    shared by the langid oracle and the composed clean_corpus oracle."""
    pats = {lang: r"\b(" + "|".join(ws) + r")\b"
            for lang, ws in text.STOPWORDS.items()}
    h = {lang: f"CAST(len(regexp_extract_all(lower(text), '{p}')) AS BIGINT)"
         for lang, p in pats.items()}
    case = f"""CASE WHEN {h['en']} > 0 AND {h['en']} >= {h['de']} AND {h['en']} >= {h['fr']} THEN 'en'
       WHEN {h['de']} > 0 AND {h['de']} > {h['en']} AND {h['de']} >= {h['fr']} THEN 'de'
       WHEN {h['fr']} > 0 AND {h['fr']} > {h['en']} AND {h['fr']} > {h['de']} THEN 'fr'
       ELSE 'und' END"""
    return case, f"greatest({h['en']}, {h['de']}, {h['fr']})"


_QUALITY_EXPR = r"""ROUND((CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
              / greatest(length(text), 1))
             * (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                      / greatest(length(text), 1)), 10)"""


def _langid_sql():
    case, hits = _langid_exprs()
    return f"""
SELECT doc_id,
  {case} AS lang_pred,
  {hits} AS stop_hits
FROM documents ORDER BY doc_id"""


def _cluster_select(labels_cte: str, table: str, id_col: str) -> str:
    return f"""
SELECT t.{id_col}, COALESCE(l.lab, t.{id_col}) AS cluster,
       COALESCE(l.lab, t.{id_col}) <> t.{id_col} AS is_duplicate
FROM {table} t LEFT JOIN {labels_cte} l ON l.node = t.{id_col}
ORDER BY t.{id_col}"""


def _minhash_cc_ctes(threshold: float, cc_rounds: int) -> str:
    """Band-collision candidate pairs -> exact shingle-set Jaccard
    verify -> iterated min-label connected components (emits
    cl{cc_rounds}). Assumes texthash.sql_minhash_ctes' tables (bands,
    shl) are in scope."""
    return f"""
cp AS MATERIALIZED (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM bands b1 JOIN bands b2
    ON b2.band = b1.band AND b2.bh = b1.bh AND b2.doc_id > b1.doc_id),
vp AS MATERIALIZED (
  SELECT cp.a, cp.b FROM cp
  JOIN shl sa ON sa.doc_id = cp.a
  JOIN shl sb ON sb.doc_id = cp.b
  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles))) >= {threshold}),
vn AS MATERIALIZED (SELECT a AS node FROM vp UNION SELECT b FROM vp),
{texthash.sql_minlabel_ctes("vp", "vn", rounds=cc_rounds)}"""


def _minhash_sql(threshold: float = 0.8, cc_rounds: int = 20) -> str:
    """Full MinHash+LSH replica: band hashes (bit-identical texthash
    CTEs) -> band-collision candidate pairs -> exact shingle-set Jaccard
    verify -> iterated min-label connected components."""
    return f"""
WITH {texthash.sql_minhash_ctes()},
{_minhash_cc_ctes(threshold, cc_rounds)}
{_cluster_select(f"cl{cc_rounds}", "documents", "doc_id")}"""


def _clean_corpus_sql(min_quality: float = 0.5, min_tokens: int = 5,
                      langs: tuple = ("en",), near_threshold: float = 0.8,
                      cc_rounds: int = 20) -> str:
    """Composed clean-corpus replica: quality/token/language filter
    (same expressions as the individually-gated text_quality / langid
    oracles) -> MinHash+LSH near-dup over the FILTERED subset -> keep
    only cluster representatives (min doc_id per cluster)."""
    case, _hits = _langid_exprs()
    langs_sql = ",".join(f"'{l}'" for l in langs)
    return rf"""
WITH filt AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  WHERE {_QUALITY_EXPR} >= {min_quality}
    AND CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) >= {min_tokens}
    AND ({case}) IN ({langs_sql})),
{texthash.sql_minhash_ctes("filt")},
{_minhash_cc_ctes(near_threshold, cc_rounds)}
SELECT f.doc_id, f.text
FROM filt f LEFT JOIN cl{cc_rounds} l ON l.node = f.doc_id
WHERE COALESCE(l.lab, f.doc_id) = f.doc_id
ORDER BY f.doc_id"""


def _simhash_sql(max_hamming: int = 3, cc_rounds: int = 20) -> str:
    """SimHash replica: 62-bit signatures (bit-identical CTEs) -> 4x16
    quarter-band candidate pairs -> Hamming<=h verify via
    bit_count(xor) -> min-label connected components."""
    return f"""
WITH {texthash.sql_simhash_ctes()},
qq AS MATERIALIZED (
  SELECT doc_id, simhash, q.q AS q,
         (simhash >> (16 * q.q)) & 65535 AS qv
  FROM sh, (SELECT unnest(range(4)) AS q) q),
vp AS MATERIALIZED (
  SELECT DISTINCT q1.doc_id AS a, q2.doc_id AS b
  FROM qq q1 JOIN qq q2
    ON q2.q = q1.q AND q2.qv = q1.qv AND q2.doc_id > q1.doc_id
  WHERE bit_count(xor(q1.simhash, q2.simhash)) <= {max_hamming}),
vn AS MATERIALIZED (SELECT a AS node FROM vp UNION SELECT b FROM vp),
{texthash.sql_minlabel_ctes("vp", "vn", rounds=cc_rounds)}
{_cluster_select(f"cl{cc_rounds}", "documents", "doc_id")}"""


def _embedding_neardup_sql(threshold: float = EMB_NEARDUP_T,
                           cc_rounds: int = 20) -> str:
    """Exact cosine all-pairs >= threshold + min-label components
    (brute-force pair SQL — fine at gate scale)."""
    return f"""
WITH vp AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[]))
        >= {threshold}),
vn AS MATERIALIZED (SELECT a AS node FROM vp UNION SELECT b FROM vp),
{texthash.sql_minlabel_ctes("vp", "vn", rounds=cc_rounds)}
{_cluster_select(f"cl{cc_rounds}", "embeddings", "vec_id")}"""


def _knn_sql(k: int = KNN_K, nq: int = KNN_NQ) -> str:
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id AS query_idx, embedding AS qe FROM embeddings
  WHERE vec_id < {nq}),
s AS MATERIALIZED (
  SELECT q.query_idx, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                CAST(q.qe AS DOUBLE[])) AS sim
  FROM embeddings e, q),
r AS MATERIALIZED (
  SELECT query_idx, vec_id, sim,
         row_number() OVER (PARTITION BY query_idx
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM s)
SELECT query_idx, vec_id, ROUND(sim, 6) AS sim, rank
FROM r WHERE rank <= {k} ORDER BY query_idx, rank"""


def _fingerprint_sql() -> str:
    return f"""
SELECT doc_id, {texthash.sql_cp_fold('text')} AS fingerprint
FROM documents ORDER BY doc_id"""


def queries():
    return {
        "exact_dedup": q_exact_dedup,
        "exact_dedup_fp": q_exact_dedup_fp,
        "token_stats": q_token_stats,
        "text_quality": q_quality,
        "langid": q_langid,
        "doc_fingerprint": q_fingerprint,
        "events_window_1h": q_events_window,
        "events_sliding_1h_15m": q_sliding_window,
        "sessionize_30m": q_sessionize,
        "asof_purchase_click": q_asof_purchase_click,
        "range_join_5m": q_range_join_5m,
        "vocab_top50": q_vocab_topk,
        "stratified_sample": q_stratified_sample,
        "topk_per_lang": q_topk_per_lang,
        "minhash_lsh_dedup": q_minhash_dedup,
        "ngram_jaccard_adj": q_ngram_jaccard,
        "simhash_neardup": q_simhash_dedup,
        "embedding_neardup": q_embedding_neardup,
        "knn_cosine_brute": q_knn_brute,
        "knn_cosine_ivf": q_knn_ivf,
        "media_decode_bmp": q_media_decode,
        "media_decode_wav": q_media_decode_wav,
        "clean_corpus": q_clean_corpus,
    }


def oracle_sql():
    return {
        "exact_dedup": """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
       count(*) AS dup_count
FROM documents GROUP BY md5(text) ORDER BY content_hash""",
        "exact_dedup_fp": f"""
SELECT {texthash.sql_cp_fold('text')} AS content_hash,
       min(doc_id) AS keep_doc_id, count(*) AS dup_count
FROM documents GROUP BY content_hash ORDER BY content_hash""",
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
        "events_sliding_1h_15m": """
SELECT user_id, epoch_us(ts) // 900000000 - u.k AS window_id,
       count(*) AS n_events, ROUND(sum(value), 6) AS sum_value
FROM events, (SELECT unnest(range(4)) AS k) u
GROUP BY user_id, epoch_us(ts) // 900000000 - u.k
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
        "asof_purchase_click": """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, max(event_id) AS event_id
           FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id,
       coalesce(c.event_id, -1) AS prior_event_id
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id""",
        "range_join_5m": """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     e AS (SELECT * FROM events WHERE event_type = 'error')
SELECT p.event_id, count(e.event_id) AS n_near_errors
FROM p LEFT JOIN e
  ON e.ts BETWEEN p.ts - INTERVAL 5 MINUTE AND p.ts + INTERVAL 5 MINUTE
GROUP BY p.event_id ORDER BY p.event_id""",
        "vocab_top50": rf"""
WITH tok AS (SELECT unnest(regexp_extract_all(text, '\w+')) AS token
             FROM documents),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
r AS (SELECT token, n,
             row_number() OVER (ORDER BY n DESC, token) AS rank FROM c)
SELECT token, n, rank FROM r WHERE rank <= {VOCAB_K} ORDER BY rank""",
        "stratified_sample": sample.sql_stratified_sample(
            SAMPLE_RATES, SAMPLE_SEED),
        "topk_per_lang": f"""
WITH r AS (SELECT doc_id, lang, n_chars,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY n_chars DESC, doc_id)
                    AS rank
           FROM documents)
SELECT doc_id, lang, n_chars, rank FROM r
WHERE rank <= {TOPK_PER_LANG} ORDER BY lang, rank""",
        "doc_fingerprint": _fingerprint_sql(),
        "minhash_lsh_dedup": _minhash_sql(),
        "ngram_jaccard_adj": f"""
WITH {texthash.sql_shingle_ctes()}
SELECT s1.doc_id AS a, s2.doc_id AS b,
       ROUND(CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
             / len(list_distinct(s1.shingles || s2.shingles)), 10)
         AS jaccard
FROM shl s1 JOIN shl s2 ON s2.doc_id = s1.doc_id + 1
ORDER BY a""",
        "simhash_neardup": _simhash_sql(),
        "embedding_neardup": _embedding_neardup_sql(),
        "knn_cosine_brute": _knn_sql(),
        "knn_cosine_ivf": _knn_sql(),
        "media_decode_bmp": _media_sql(),
        "media_decode_wav": _media_wav_sql(),
        "clean_corpus": _clean_corpus_sql(),
    }
