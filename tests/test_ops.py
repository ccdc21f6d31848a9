"""Unit tests for the training-data operators (dedup, similarity, text,
events, multimodal plumbing) against constructed inputs with known
answers and numpy oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ray_linkgraph.ops import dedup, events, similarity, text
from ray_linkgraph.ops.multimodal import (MediaDecoder, decode_media,
                                          frame_sample_indices,
                                          synthetic_media_table)


def docs_ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))


BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "to the old mill near the river bank where it sleeps")


def test_exact_dedup():
    texts = [BASE, "something else entirely", BASE, "third text", BASE]
    out = dedup.exact_dedup(docs_ds(texts)).to_pandas()
    assert len(out) == 3
    row = out[out["dup_count"] == 3].iloc[0]
    assert row["keep_doc_id"] == 0


def test_minhash_finds_planted_neardups():
    near = BASE.replace("lazy", "sleepy")           # high jaccard
    far = "completely different words in this document nothing shared here"
    texts = [BASE, near, far, "yet another unrelated blob of words"]
    out = dedup.minhash_lsh_dedup(docs_ds(texts), threshold=0.5).to_pandas()
    by_id = dict(zip(out["doc_id"], out["cluster"]))
    assert by_id[0] == by_id[1] == 0                # 0 and 1 clustered
    assert by_id[2] == 2 and by_id[3] == 3          # others untouched
    assert bool(out[out["doc_id"] == 1]["is_duplicate"].iloc[0])


def test_simhash_neardup():
    near = BASE + " extra"
    texts = [BASE, near, "totally unrelated set of tokens apples oranges"]
    out = dedup.simhash_neardup(docs_ds(texts), max_hamming=8).to_pandas()
    by_id = dict(zip(out["doc_id"], out["cluster"]))
    assert by_id[0] == by_id[1]
    assert by_id[2] == 2


def test_jaccard_exact():
    a = dedup._shingle_hashes("a b c d e")
    assert dedup.jaccard(a, a) == 1.0
    b = dedup._shingle_hashes("v w x y z")
    assert dedup.jaccard(a, b) == 0.0


def test_embedding_neardup():
    base = np.eye(4, dtype=np.float32)
    vecs = np.vstack([base, base[0] * 0.999 + 0.001])  # dup of vec 0
    t = pa.table({
        "vec_id": pa.array(range(5), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32()))})
    out = dedup.embedding_neardup(rd.from_arrow(t),
                                  threshold=0.99).to_pandas()
    by_id = dict(zip(out["vec_id"], out["cluster"]))
    assert by_id[4] == by_id[0]
    assert by_id[1] == 1 and by_id[2] == 2
    # LSH-bucketed approximate variant finds the same planted dup
    out2 = dedup.embedding_neardup_lsh(rd.from_arrow(t), threshold=0.99,
                                       n_planes=4).to_pandas()
    by_id2 = dict(zip(out2["vec_id"], out2["cluster"]))
    assert by_id2[4] == by_id2[0]


def test_knn_brute_matches_numpy():
    rng_vals = np.arange(200 * 8, dtype=np.float64).reshape(200, 8)
    vecs = np.cos(rng_vals)                          # deterministic spread
    t = pa.table({"vec_id": pa.array(range(200), type=pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        type=pa.list_(pa.float32()))})
    q = vecs[:3]
    out = similarity.knn_brute(rd.from_arrow(t), q, k=5).to_pandas()
    # numpy oracle (float32 storage, float64 math — same as the op)
    v32 = vecs.astype(np.float32).astype(np.float64)
    vn = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    qn = np.asarray(q) / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ vn.T
    for qi in range(3):
        order = np.lexsort((np.arange(200), -sims[qi]))[:5]
        got = out[out["query_idx"] == qi].sort_values("rank")["vec_id"] \
            .to_numpy()
        assert (got == order).all()
        assert got[0] == qi                          # self is nearest


def test_knn_ivf_full_probe_equals_brute():
    vecs = np.cos(np.arange(100 * 6, dtype=np.float64).reshape(100, 6))
    t = pa.table({"vec_id": pa.array(range(100), type=pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        type=pa.list_(pa.float32()))})
    q = vecs[:2]
    brute = similarity.knn_brute(rd.from_arrow(t), q, k=4).to_pandas()
    ivf = similarity.knn_ivf(rd.from_arrow(t), q, k=4, n_centroids=4,
                             nprobe=4).to_pandas()
    for qi in range(2):
        a = brute[brute["query_idx"] == qi].sort_values("rank")["vec_id"]
        b = ivf[ivf["query_idx"] == qi].sort_values("rank")["vec_id"]
        assert list(a) == list(b)


def test_token_and_quality_stats():
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["Hello, world! 42", ""],
                                   type=pa.string())})
    ts = text.token_stats(t)
    assert ts.column("n_tokens").to_pylist() == [3, 0]
    assert ts.column("n_chars").to_pylist() == [16, 0]
    qs = text.quality_stats(t)
    assert qs.column("n_alpha").to_pylist() == [10, 0]
    assert qs.column("n_digit").to_pylist() == [2, 0]
    assert qs.column("n_punct").to_pylist() == [2, 0]


def test_langid():
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": pa.array([
                      "the cat and the dog of the house",
                      "der hund und die katze ist von den",
                      "xyzzy plugh"], type=pa.string())})
    out = text.LangId()(t)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "und"]


def test_fingerprint_deterministic_and_order_sensitive():
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": pa.array(["a b c", "c b a", "a b c"],
                                   type=pa.string())})
    f = text.fingerprint(t).column("fingerprint").to_pylist()
    assert f[0] == f[2] and f[0] != f[1]


def test_events_window_and_sessionize():
    base = 1_700_000_000_000_000  # us
    rows = [
        (1, base, 1.0), (1, base + 10 * 60 * 10**6, 2.0),          # same hour
        (1, base + 2 * 3600 * 10**6, 3.0),                          # new hour
        (2, base, 4.0),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows])})
    w = events.window_agg(rd.from_arrow(t)).to_pandas() \
        .sort_values(["user_id", "window_id"]).reset_index(drop=True)
    assert w["n_events"].tolist() == [2, 1, 1]
    assert w["sum_value"].tolist() == [3.0, 3.0, 4.0]
    s = events.sessionize(rd.from_arrow(t), gap_s=1800).to_pandas() \
        .sort_values("user_id")
    assert s["n_sessions"].tolist() == [2, 1]       # 2h gap splits user 1
    assert s["n_events"].tolist() == [3, 1]


def test_multimodal_plumbing():
    t = synthetic_media_table(20, seed=7)
    assert t.schema.field("payload").type == pa.binary()
    out = decode_media(rd.from_arrow(t), codec="fake", batch_size=8,
                       concurrency=2).to_pandas().sort_values("media_id")
    assert len(out) == 20
    assert (out["width"] >= 16).all() and (out["height"] >= 16).all()
    assert all(len(f) == 8 for f in out["features"])
    # deterministic across runs
    out2 = decode_media(rd.from_arrow(t), codec="fake", batch_size=5,
                        concurrency=1).to_pandas().sort_values("media_id")
    assert out["width"].tolist() == out2["width"].tolist()
    # real codecs are clearly-marked stubs
    with pytest.raises(NotImplementedError):
        MediaDecoder(codec="image")
    with pytest.raises(NotImplementedError):
        MediaDecoder(codec="audio")
    assert frame_sample_indices(35, 10).tolist() == [0, 10, 20, 30]
