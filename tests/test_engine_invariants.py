"""Engine invariants: layout independence (1D vs 2D grid exchange) and
property-based checks for the message-payload / hashing kernels."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from ray_linkgraph.engine import RaggedCol
from ray_linkgraph.graph import build_graph
from ray_linkgraph.ops import texthash


def test_pagerank_layout_independent(work_dir):
    """Same graph, P=2 (1D exchange) vs P=4 (2x2 grid): identical ranks
    up to float summation order."""
    import os
    edges = [(i, (i * 7 + 3) % 50) for i in range(50)] + \
            [(i, (i + 1) % 50) for i in range(50)]
    t = pa.table({"src": [str(a) for a, b in edges],
                  "dst": [str(b) for a, b in edges]})
    from ray_linkgraph.algorithms import pagerank
    g2 = build_graph(rd.from_arrow(t), os.path.join(work_dir, "li_p2"),
                     n_parts=2)
    g4 = build_graph(rd.from_arrow(t), os.path.join(work_dir, "li_p4"),
                     n_parts=4)
    r2 = pagerank(g2, l1_threshold=0.0, max_supersteps=12).to_arrow() \
        .to_pandas().sort_values("v_id")["rank"].to_numpy()
    r4 = pagerank(g4, l1_threshold=0.0, max_supersteps=12).to_arrow() \
        .to_pandas().sort_values("v_id")["rank"].to_numpy()
    assert np.allclose(r2, r4, atol=1e-12, rtol=0)


@settings(max_examples=5, deadline=None)  # each example runs Ray jobs
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(-5, 5),
                          st.integers(-1000, 1000)),
                min_size=1, max_size=200),
       st.sampled_from(["sum", "min"]))
def test_agg_by_int_keys_matches_plain_groupby(rows, reduce):
    """The coarse-hash reduceat combiner must equal a plain dict
    groupby for any integer data, any chunking, both reductions."""
    from ray_linkgraph._util import agg_by_int_keys
    a = np.array([r[0] for r in rows], dtype=np.int64)
    b = np.array([r[1] for r in rows], dtype=np.int64)
    v = np.array([r[2] for r in rows], dtype=np.int64)
    t = pa.table({"ka": pa.array(a), "kb": pa.array(b), "v": pa.array(v)})
    exp = {}
    for ka, kb, vv in rows:
        key = (ka, kb)
        if reduce == "sum":
            exp[key] = exp.get(key, 0) + vv
        else:
            exp[key] = min(exp.get(key, vv), vv)
    # several block layouts -> identical result
    for nblocks in (1, 3):
        ds = rd.from_arrow([t.slice(i * len(t) // nblocks,
                                    (i + 1) * len(t) // nblocks
                                    - i * len(t) // nblocks)
                            for i in range(nblocks)])
        out = agg_by_int_keys(ds, ["ka", "kb"], "v", "out",
                              reduce=reduce, n_coarse=4).to_pandas()
        got = {(r["ka"], r["kb"]): r["out"] for _, r in out.iterrows()}
        assert got == exp


def test_actor_pool_cache_reuse(work_dir, monkeypatch):
    """RLG_ACTOR_CACHE=1: successive runs on the same graph re-arm one
    retained partition-actor pool (same actor ids) instead of paying a
    fresh pool per query; results are unchanged; release kills it."""
    import os
    import ray
    from ray_linkgraph import engine
    from ray_linkgraph.algorithms import pagerank, wcc
    edges = [(i, (i * 3 + 1) % 20) for i in range(20)]
    t = pa.table({"src": [str(a) for a, b in edges],
                  "dst": [str(b) for a, b in edges]})
    g = build_graph(rd.from_arrow(t), os.path.join(work_dir, "cache_g"),
                    n_parts=2)
    base = pagerank(g, l1_threshold=0.0, max_supersteps=6).to_arrow() \
        .to_pandas().sort_values("v_id")["rank"].to_numpy()
    monkeypatch.setenv("RLG_ACTOR_CACHE", "1")
    try:
        r1 = pagerank(g, l1_threshold=0.0, max_supersteps=6)
        pool1 = [a._actor_id for a in engine._ACTOR_POOL["pool"]["actors"]]
        # different program + different edge MODE on the same pool
        w = wcc(g, max_supersteps=10).to_arrow().to_pandas()
        pool2 = [a._actor_id for a in engine._ACTOR_POOL["pool"]["actors"]]
        assert pool1 == pool2                     # reused, not rebuilt
        r2 = pagerank(g, l1_threshold=0.0, max_supersteps=6)
        pool3 = [a._actor_id for a in engine._ACTOR_POOL["pool"]["actors"]]
        assert pool1 == pool3
        got1 = r1.to_arrow().to_pandas().sort_values("v_id")["rank"] \
            .to_numpy()
        got2 = r2.to_arrow().to_pandas().sort_values("v_id")["rank"] \
            .to_numpy()
        assert np.array_equal(got1, base) and np.array_equal(got2, base)
        assert len(set(w["component"])) >= 1
    finally:
        engine.release_cached_actors()
    assert "pool" not in engine._ACTOR_POOL


def test_degenerate_graphs(work_dir):
    """Self-loop-only and isolated-vertex inputs run end-to-end: loops
    are dropped at canonicalization, isolated vertices still get ranks
    (reference loads isolated vertices; uniform dangling mass)."""
    import os
    from ray_linkgraph.algorithms import pagerank, wcc
    # every edge is a self loop -> E = 0, V = 3; all vertices dangling
    t = pa.table({"src": ["a", "b", "c"], "dst": ["a", "b", "c"]})
    g = build_graph(rd.from_arrow(t), os.path.join(work_dir, "deg_loop"),
                    n_parts=2)
    assert g.V == 3 and g.num_edges("out") == 0
    r = pagerank(g, l1_threshold=1e-9, max_supersteps=30).to_arrow()
    ranks = r.to_pandas().sort_values("v_id")["rank"].to_numpy()
    assert np.allclose(ranks, 1.0 / 3, atol=1e-9)
    w = wcc(g, max_supersteps=10).to_arrow().to_pandas()
    assert sorted(w["component"].tolist()) == [0, 1, 2]  # three singletons
    # extra isolated urls only, single real edge
    t2 = pa.table({"src": ["x"], "dst": ["y"]})
    extra = rd.from_arrow(pa.table({"url": ["x", "y", "z1", "z2"]}))
    g2 = build_graph(rd.from_arrow(t2), os.path.join(work_dir, "deg_iso"),
                     n_parts=2, extra_url_ds=extra)
    assert g2.V == 4 and g2.num_edges("out") == 1
    r2 = pagerank(g2, l1_threshold=1e-12, max_supersteps=60).to_arrow() \
        .to_pandas().sort_values("v_id")["rank"].to_numpy()
    assert abs(r2.sum() - 1.0) < 1e-9


@settings(max_examples=50, deadline=None)
@given(st.lists(st.lists(st.integers(0, 10**12), max_size=6), max_size=20),
       st.data())
def test_raggedcol_gather_roundtrip(seqs, data):
    rc = RaggedCol.from_lists(seqs)
    assert len(rc) == len(seqs)
    if seqs:
        idx = data.draw(st.lists(
            st.integers(0, len(seqs) - 1), max_size=30))
        out = rc[np.array(idx, dtype=np.int64)] if idx else rc[0:0]
        got = [out.flat[out.offsets[i]:out.offsets[i + 1]].tolist()
               for i in range(len(out))]
        assert got == [seqs[i] for i in idx]
        # boolean mask gather
        mask = data.draw(st.lists(st.booleans(), min_size=len(seqs),
                                  max_size=len(seqs)))
        out2 = rc[np.array(mask, dtype=bool)]
        got2 = [out2.flat[out2.offsets[i]:out2.offsets[i + 1]].tolist()
                for i in range(len(out2))]
        assert got2 == [s for s, m in zip(seqs, mask) if m]
    # concat roundtrip
    rc2 = RaggedCol.concat([rc, rc])
    assert len(rc2) == 2 * len(seqs)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=8))
def test_fingerprint_property_matches_fold(texts):
    got = texthash.fingerprints(texts)
    M = texthash.M31
    for s, g in zip(texts, got):
        h = 0
        for ch in s:
            h = (h * 131 + ord(ch)) % M
        assert int(g) == h


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=8),
       st.integers(min_value=0, max_value=5))
def test_codepoints_arrow_path_matches_list_path(texts, off):
    """The zero-copy Arrow-buffer decode (utf-8 continuation-byte
    prefix sums, r4) must be bit-identical to the per-row list path for
    arbitrary unicode, chunked columns, slices and large_string."""
    cols = [pa.array(texts, type=pa.string()),
            pa.array(texts, type=pa.large_string()),
            pa.chunked_array(
                [pa.array(texts[: len(texts) // 2], type=pa.string()),
                 pa.array(texts[len(texts) // 2:], type=pa.string())])]
    off = min(off, len(texts) - 1)
    cols.append(pa.array([""] * off + texts).slice(off, len(texts)))
    for col in cols:
        for fn in (texthash.fingerprints, texthash.simhashes,
                   texthash.minhash_band_hashes):
            assert np.array_equal(np.asarray(fn(texts)),
                                  np.asarray(fn(col)))


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet=" abcdefgh\t\n", max_size=80),
                min_size=1, max_size=6))
def test_simhash_property_matches_fold(texts):
    import re
    got = texthash.simhashes(texts)
    M = texthash.M31

    def fold(s, b):
        h = 0
        for ch in s:
            h = (h * b + ord(ch)) % M
        return h

    for s, g in zip(texts, got):
        toks = [tk for tk in re.split(r"[\t\n\x0b\f\r ]+", s) if tk]
        vals = [fold(tk, 131) * (1 << 31) + fold(tk, 137) for tk in toks]
        exp = 0
        for j in range(62):
            v = sum(1 if (x >> j) & 1 else -1 for x in vals)
            if v > 0:
                exp |= 1 << j
        assert int(g) == exp


def test_actor_pool_cache_invalidated_on_rebuild(work_dir, monkeypatch):
    """A graph REBUILT in-place at the same dir with unchanged P and V
    must not reuse cached actors holding the old adjacency (ADVICE.md
    r4: the pool key now carries meta.json's mtime as a generation
    marker); and a pool marked busy (engine mid-run) is neither
    re-armed nor evicted — a fresh uncached pool serves the new engine."""
    import os
    import shutil
    import ray
    from ray_linkgraph import engine
    from ray_linkgraph.algorithms import pagerank

    def mk(edges, tag):
        t = pa.table({"src": [str(a) for a, b in edges],
                      "dst": [str(b) for a, b in edges]})
        d = os.path.join(work_dir, "regen_g")
        return build_graph(rd.from_arrow(t), d, n_parts=2)

    ring = [(i, (i + 1) % 20) for i in range(20)]
    # same V, same P, different (non-regular) topology -> different ranks
    jump = [(i, (i * 7 + 3) % 20) for i in range(20)] + \
           [(0, j) for j in range(1, 6)]
    monkeypatch.setenv("RLG_ACTOR_CACHE", "1")
    try:
        g1 = mk(ring, "a")
        r1 = pagerank(g1, l1_threshold=0.0, max_supersteps=6).to_arrow() \
            .to_pandas().sort_values("v_id")["rank"].to_numpy()
        pool1 = [a._actor_id for a in engine._ACTOR_POOL["pool"]["actors"]]
        # rebuild IN PLACE: same dir, same P, same V, different edges
        shutil.rmtree(os.path.join(work_dir, "regen_g"))
        g2 = mk(jump, "b")
        r2 = pagerank(g2, l1_threshold=0.0, max_supersteps=6).to_arrow() \
            .to_pandas().sort_values("v_id")["rank"].to_numpy()
        pool2 = [a._actor_id for a in engine._ACTOR_POOL["pool"]["actors"]]
        assert pool1 != pool2            # generation changed -> new pool
        assert not np.allclose(r1, r2)   # genuinely computed on new edges
        # expected ranks from a fresh cache-off run
        monkeypatch.delenv("RLG_ACTOR_CACHE")
        exp = pagerank(g2, l1_threshold=0.0, max_supersteps=6).to_arrow() \
            .to_pandas().sort_values("v_id")["rank"].to_numpy()
        assert np.allclose(r2, exp, atol=1e-12, rtol=0)
        monkeypatch.setenv("RLG_ACTOR_CACHE", "1")
        # re-arm the cache (the cache-off run above evicted the idle
        # pool), then mark it busy: neither re-armed nor evicted; the
        # new engine runs on a fresh uncached pool, still correct
        r2b = pagerank(g2, l1_threshold=0.0, max_supersteps=6).to_arrow() \
            .to_pandas().sort_values("v_id")["rank"].to_numpy()
        assert np.allclose(r2b, exp, atol=1e-12, rtol=0)
        pool2 = [a._actor_id for a in engine._ACTOR_POOL["pool"]["actors"]]
        engine._ACTOR_POOL["pool"]["busy"] = True
        r3 = pagerank(g2, l1_threshold=0.0, max_supersteps=6).to_arrow() \
            .to_pandas().sort_values("v_id")["rank"].to_numpy()
        assert np.allclose(r3, exp, atol=1e-12, rtol=0)
        pool3 = [a._actor_id for a in engine._ACTOR_POOL["pool"]["actors"]]
        assert pool3 == pool2 and engine._ACTOR_POOL["pool"]["busy"]
        engine._ACTOR_POOL["pool"]["busy"] = False
    finally:
        engine.release_cached_actors()
