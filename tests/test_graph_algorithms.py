"""End-to-end conformance: pages -> extract -> graph build -> algorithms,
checked against naive pure-Python implementations of the reference
per-vertex semantics (tests/naive_ref.py) on the SAME inputs, plus an
independent reconstruction of the expected graph from the generator spec
(so the extraction+build pipeline itself is validated, not just the
kernels)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ray_linkgraph.pages import pages_table, out_targets, hash_u64
from ray_linkgraph.extract import extract_links
from ray_linkgraph.graph import Graph, build_graph, sort_key
from ray_linkgraph.algorithms import (pagerank, wcc, lpa, degree_centrality,
                                      sssp, kcore, triangle_count,
                                      clustering_coefficient)

import naive_ref

N = 200
SEED = 42
P = 4


def expected_graph():
    """(url2id, id2url, canonical directed edge set) straight from the
    generator spec — independent of the extraction/build code path."""
    t = pages_table(N, SEED)
    urls = t.column("url").to_pylist()
    raw = []
    all_urls = set(urls)
    for i in range(N):
        for j in out_targets(i, N, SEED):
            raw.append((urls[i], urls[j]))
        if i % 23 == 7:
            comp = 0 if i < max(6, int(N * 0.9)) else 1
            off = int(hash_u64(np.uint64(SEED), np.uint64(i), 9)[()] % 50)
            u = f"https://offsite{comp}.example/x{off}"
            raw.append((urls[i], u))
            all_urls.add(u)
    ordered = sorted(all_urls, key=sort_key)
    url2id = {u: i for i, u in enumerate(ordered)}
    edges = {(url2id[s], url2id[d]) for s, d in raw if s != d}
    return url2id, ordered, edges


@pytest.fixture(scope="module")
def built(work_dir):
    t = pages_table(N, SEED)
    g = build_graph(extract_links(rd.from_arrow(t)),
                    os.path.join(work_dir, "graph_t1"), n_parts=P,
                    extra_url_ds=rd.from_arrow(t.select(["url"])))
    url2id, id2url, edges = expected_graph()
    return g, url2id, id2url, edges


def load_edges(g: Graph, mode="out"):
    E = set()
    for p in range(g.P):
        path = g.edges_path(mode, p)
        if os.path.exists(path):
            t = pq.read_table(path)
            E |= set(zip(t.column("src_id").to_pylist(),
                         t.column("dst_id").to_pylist()))
    return E


def adj_out(V, edges):
    out = [[] for _ in range(V)]
    for s, d in sorted(edges):
        out[s].append(d)
    return out


def adj_both(V, edges):
    a = [set() for _ in range(V)]
    for s, d in edges:
        a[s].add(d)
        a[d].add(s)
    return [sorted(x) for x in a]


# ---------------------------------------------------------------------------

def test_dictionary_id_order(built):
    g, url2id, id2url, _ = built
    assert g.V == len(id2url)
    assert g.ids_to_urls(np.arange(g.V)) == id2url
    d = g.dictionary_ds().to_pandas().sort_values("v_id")
    assert d["url"].tolist() == id2url
    assert d["v_id"].tolist() == list(range(g.V))


def test_canonical_edges(built):
    g, url2id, _, edges = built
    got = load_edges(g, "out")
    assert got == edges                      # deduped, self-loops dropped
    assert g.num_edges("out") == len(edges)
    g.ensure_mode("both")
    both = load_edges(g, "both")
    assert both == edges | {(d, s) for s, d in edges}


def test_pagerank_vs_reference_semantics(built):
    g, _, _, edges = built
    res = pagerank(g, max_supersteps=60).to_arrow().to_pandas() \
        .sort_values("v_id")
    ranks, steps = naive_ref.naive_pagerank(g.V, adj_out(g.V, edges),
                                            max_steps=60)
    got = res["rank"].to_numpy()
    assert np.allclose(got, ranks, atol=1e-6, rtol=0)
    assert np.abs(got - ranks).max() < 1e-10  # same formula, same order
    r2 = pagerank(g, max_supersteps=60)
    assert r2.supersteps == steps             # identical iteration count


def test_pagerank_max_supersteps_bound(built):
    g, _, _, edges = built
    res = pagerank(g, max_supersteps=10).to_arrow().to_pandas() \
        .sort_values("v_id")
    ranks, steps = naive_ref.naive_pagerank(g.V, adj_out(g.V, edges),
                                            max_steps=10)
    assert steps == 10
    assert np.allclose(res["rank"].to_numpy(), ranks, atol=1e-12, rtol=0)


def test_wcc_exact(built):
    g, _, _, edges = built
    res = wcc(g).to_arrow().to_pandas().sort_values("v_id")
    exp = naive_ref.naive_wcc(g.V, adj_both(g.V, edges))
    assert (res["component"].to_numpy() == exp).all()
    assert len(set(exp)) >= 2                 # the two generator components


def test_lpa_exact(built):
    g, _, _, edges = built
    res = lpa(g, max_supersteps=10).to_arrow().to_pandas().sort_values("v_id")
    exp = naive_ref.naive_lpa(g.V, adj_both(g.V, edges), rounds=9)
    assert (res["label"].to_numpy() == exp).all()


def test_degree(built):
    g, _, _, edges = built
    res = degree_centrality(g).to_arrow().to_pandas().sort_values("v_id")
    deg = np.array([len(a) for a in adj_out(g.V, edges)])
    assert (res["degree"].to_numpy() == deg).all()
    res_b = degree_centrality(g, mode="both").to_arrow().to_pandas() \
        .sort_values("v_id")
    degb = np.array([len(a) for a in adj_both(g.V, edges)])
    assert (res_b["degree"].to_numpy() == degb).all()


def test_sssp(built):
    g, _, _, edges = built
    sources = [0, 5]
    res = sssp(g, sources, max_supersteps=10).to_arrow().to_pandas() \
        .sort_values("v_id")
    adj_w = [[(d, 1.0) for d in a] for a in adj_out(g.V, edges)]
    exp = naive_ref.naive_sssp(g.V, adj_w, sources, max_steps=10)
    assert np.allclose(res["distance"].to_numpy(), exp, atol=0)


def test_kcore(built):
    g, _, _, edges = built
    res = kcore(g, k=3).to_arrow().to_pandas().sort_values("v_id")
    exp = naive_ref.naive_kcore(g.V, adj_both(g.V, edges), k=3)
    assert (res["core"].to_numpy() == exp).all()


def test_triangle_count_exact(built):
    g, url2id, _, edges = built
    res = triangle_count(g).to_pandas().sort_values("v_id")
    exp = naive_ref.naive_triangles(g.V, adj_both(g.V, edges))
    assert len(res) == g.V
    assert (res["triangles"].to_numpy() == exp).all()
    # clique-of-6 members participate in >= C(5,2) = 10 triangles
    t = pages_table(N, SEED)
    urls = t.column("url").to_pylist()
    for i in range(6):
        assert exp[url2id[urls[i]]] >= 10


def test_clustering_coefficient(built):
    g, _, _, edges = built
    res = clustering_coefficient(g).to_pandas().sort_values("v_id")
    tri = naive_ref.naive_triangles(g.V, adj_both(g.V, edges))
    deg = np.array([len(a) for a in adj_both(g.V, edges)], dtype=np.float64)
    denom = deg * (deg - 1)
    exp = np.where(denom > 0, 2.0 * tri / denom, 0.0)
    assert np.allclose(res["coefficient"].to_numpy(), exp, atol=0)


def test_ppr(built):
    """PPR vs a naive mirror of the same frontier semantics (update rule
    per PersonalPageRank.java:96-157; honest l1 — see ppr.py docstring)."""
    from ray_linkgraph.algorithms import ppr
    g, _, _, edges = built
    # a source with out-edges (v_id 3 is an edge-only offsite vertex)
    src = next(s for s, _ in sorted(edges) if s > 5)
    res = ppr(g, src, max_supersteps=30).to_arrow().to_pandas() \
        .sort_values("v_id")
    out = adj_out(g.V, edges)
    deg = np.array([len(a) for a in out])
    alpha = 0.85
    rank = np.zeros(g.V)
    rank[src] = 1.0
    cum = 1.0
    senders = {src}
    for s in range(1, 30):
        inbox = {}
        for u in senders:
            if deg[u]:
                c = rank[u] / deg[u]
                for d in out[u]:
                    inbox[d] = inbox.get(d, 0.0) + c
        if not inbox:
            break
        run = set(inbox)
        new = {v: (inbox.get(v, 0.0) * alpha
                   + (1 - alpha) * (1.0 if v == src else 0.0)) / cum
               for v in run}
        l1 = sum(abs(new[v] - rank[v]) for v in run)
        for v in run:
            rank[v] = new[v]
        cum = max(sum(rank[v] for v in run), 1e-300)
        senders = run
        if s > 1 and l1 <= 1e-6:
            break
    assert np.allclose(res["rank"].to_numpy(), rank, atol=1e-9, rtol=0)
    assert res["rank"].to_numpy()[src] > 0


def test_hub_skew_path(work_dir):
    """g_hub (FIXTURES.md §3): a graph containing heavy hub sources with
    out-degree 150 (> the reference's superedge threshold of 100,
    ComputerOptions.java:196-203) goes down the same engine path and still
    matches the naive oracles exactly — the skew treatment (map-side
    combine + degree-oriented wedges) is semantics-preserving."""
    import ray.data as rd
    from ray_linkgraph.pages import out_targets
    n = 2000
    t = pages_table(n, SEED)
    g = build_graph(extract_links(rd.from_arrow(t)),
                    os.path.join(work_dir, "graph_hub"), n_parts=4,
                    extra_url_ds=rd.from_arrow(t.select(["url"])))
    # heavy hub sources exist in this graph
    degs = {i: len(out_targets(i, n, SEED)) for i in range(n)}
    assert max(degs.values()) >= 150
    E = load_edges(g, "out")
    # PageRank at 1e-6 vs naive
    res = pagerank(g, max_supersteps=60).to_arrow().to_pandas() \
        .sort_values("v_id")
    ranks, steps = naive_ref.naive_pagerank(g.V, adj_out(g.V, E),
                                            max_steps=60)
    assert np.allclose(res["rank"].to_numpy(), ranks, atol=1e-9, rtol=0)
    # WCC exact
    comp = wcc(g).to_arrow().to_pandas().sort_values("v_id")["component"]
    assert (comp.to_numpy() == naive_ref.naive_wcc(g.V,
                                                   adj_both(g.V, E))).all()
    # per-vertex triangles exact through the degree-oriented join path
    tri = triangle_count(g).to_pandas().sort_values("v_id")
    exp = naive_ref.naive_triangles(g.V, adj_both(g.V, E))
    assert (tri["triangles"].to_numpy() == exp).all()


def test_closeness_vs_reference_semantics(built):
    from ray_linkgraph.algorithms import closeness_centrality
    g, _, _, edges = built
    res = closeness_centrality(g, max_supersteps=5).to_arrow() \
        .to_pandas().sort_values("v_id")
    adj_w = [[(d, 1.0) for d in nbrs]
             for nbrs in adj_out(g.V, edges)]
    clo, reach = naive_ref.naive_closeness(g.V, adj_w, max_steps=5)
    assert np.allclose(res["closeness"].to_numpy(), clo, atol=1e-12)
    assert (res["reachable"].to_numpy() == reach).all()
    assert max(reach) > 1                    # propagation happened


def test_betweenness_vs_reference_semantics(built):
    from ray_linkgraph.algorithms import betweenness_centrality
    g, _, _, edges = built
    res = betweenness_centrality(g, max_supersteps=5).to_arrow() \
        .to_pandas().sort_values("v_id")
    exp = naive_ref.naive_betweenness(g.V, adj_out(g.V, edges),
                                      max_steps=5)
    assert np.allclose(res["betweenness"].to_numpy(), exp, atol=1e-9)
    assert max(exp) > 0


def test_betweenness_sampled(built):
    """sample_rate < 1 (the 100-TB gate configuration): engine draws
    must replicate the naive per-edge uniform01 counter-hash draws."""
    from ray_linkgraph.algorithms import betweenness_centrality
    g, _, _, edges = built
    res = betweenness_centrality(g, max_supersteps=5, sample_rate=0.5,
                                 seed=107).to_arrow() \
        .to_pandas().sort_values("v_id")
    exp = naive_ref.naive_betweenness(g.V, adj_out(g.V, edges),
                                      max_steps=5, sample_rate=0.5,
                                      seed=107)
    got = res["betweenness"].to_numpy()
    assert np.allclose(got, exp, atol=1e-9)
    full = naive_ref.naive_betweenness(g.V, adj_out(g.V, edges),
                                       max_steps=5)
    assert not np.allclose(got, full)   # sampling actually bit


def test_betweenness_store_perf_cap(built):
    from ray_linkgraph.algorithms import betweenness_centrality
    g, _, _, edges = built
    res = betweenness_centrality(g, max_supersteps=4, store_perf=3) \
        .to_arrow().to_pandas().sort_values("v_id")
    exp = naive_ref.naive_betweenness(g.V, adj_out(g.V, edges),
                                      max_steps=4, store_perf=3)
    assert np.allclose(res["betweenness"].to_numpy(), exp, atol=1e-9)


def test_rings_vs_reference_semantics(built):
    from ray_linkgraph.algorithms import rings_detection
    g, _, _, edges = built
    res = rings_detection(g, max_supersteps=5).to_arrow() \
        .to_pandas().sort_values("v_id")
    exp = naive_ref.naive_rings(g.V, adj_out(g.V, edges), max_steps=5)
    assert (res["ring_count"].to_numpy() ==
            np.array([len(r) for r in exp])).all()
    # ring sequences themselves match (deterministic sorted encoding)
    exp_strs = [";".join(sorted(("-".join(map(str, t)) for t in r),
                                key=lambda x: (len(x), x))) for r in exp]
    assert res["rings"].tolist() == exp_strs
    assert sum(len(r) for r in exp) > 0      # graph has rings


def test_links_vs_reference_semantics(built):
    from ray_linkgraph.algorithms import links
    g, _, _, edges = built
    starts = [0, 1, 2, 3, 4]
    res = links(g, starts, spread="w_out >= w_in",
                end_edge="dst % 11 == 3", end_vertex="node % 7 == 0",
                max_supersteps=4).to_arrow().to_pandas() \
        .sort_values("v_id").reset_index(drop=True)
    adj_w = [[(d, 1.0) for d in nbrs] for nbrs in adj_out(g.V, edges)]
    exp = naive_ref.naive_links(
        g.V, adj_w, starts, spread=lambda wo, wi: wo >= wi,
        end_edge=lambda s, d, w: d % 11 == 3,
        end_vertex=lambda n: n % 7 == 0, max_steps=4)
    assert res["n_paths"].tolist() == [len(p) for p in exp]
    exp_strs = [";".join(sorted(("-".join(map(str, t)) for t in p),
                                key=lambda x: (len(x), x))) for p in exp]
    assert res["paths"].tolist() == exp_strs
    assert sum(len(p) for p in exp) > 0


def test_subgraph_match_diamond(built):
    from ray_linkgraph.algorithms.subgraph import subgraph_match, \
        SubGraphProgram
    g, _, _, edges = built
    pat = [(0, 1), (0, 2), (1, 3), (2, 3)]          # directed diamond
    res = subgraph_match(g, pat, 4).to_arrow().to_pandas() \
        .sort_values("v_id").reset_index(drop=True)
    adj = adj_out(g.V, edges)
    embs = naive_ref.naive_subgraph(adj, pat, 4)
    root_qv = SubGraphProgram(pat, 4).tree.root.qv
    exp = np.zeros(g.V, dtype=np.int64)
    for phi in embs:
        exp[phi[root_qv]] += 1
    assert res["n_matches"].tolist() == exp.tolist()
    assert exp.sum() > 0
    # embedding strings themselves (sorted pattern-node order) match
    by_owner = {}
    for phi in embs:
        s = "-".join(str(phi[q]) for q in sorted(phi))
        by_owner.setdefault(phi[root_qv], []).append(s)
    exp_strs = [";".join(sorted(by_owner.get(v, []))) for v in range(g.V)]
    assert res["matches"].tolist() == exp_strs


def test_subgraph_match_with_predicate(built):
    from ray_linkgraph.algorithms.subgraph import subgraph_match, \
        SubGraphProgram
    g, _, _, edges = built
    pat = [(0, 1), (1, 2)]                           # directed 2-path
    res = subgraph_match(g, pat, 3,
                         node_predicates={2: "node % 3 == 0"}) \
        .to_arrow().to_pandas().sort_values("v_id").reset_index(drop=True)
    adj = adj_out(g.V, edges)
    embs = naive_ref.naive_subgraph(adj, pat, 3,
                                    preds={2: lambda n: n % 3 == 0})
    root_qv = SubGraphProgram(pat, 3).tree.root.qv
    exp = np.zeros(g.V, dtype=np.int64)
    for phi in embs:
        exp[phi[root_qv]] += 1
    assert res["n_matches"].tolist() == exp.tolist()
    assert exp.sum() > 0


def test_louvain_distributed_variant(built):
    from ray_linkgraph.algorithms.louvain import louvain_communities
    g, _, _, edges = built
    res = louvain_communities(g, max_rounds=10).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    both = edges | {(d, s) for s, d in edges}   # deduped, as edges_both
    und = [[] for _ in range(g.V)]
    for s, d in both:
        und[s].append((d, 1.0))
    exp = naive_ref.naive_louvain_one_level(g.V, und, max_rounds=10)
    assert res["community"].tolist() == exp
    # communities actually formed (fewer than V singletons)
    assert len(set(exp)) < g.V


def test_louvain_multilevel_parity(tmp_path):
    """Hierarchical Louvain on a two-scale community graph: level 1
    finds the cliques, the contracted level merges clique pairs —
    engine must equal the naive mirror exactly, and level 2 must merge
    beyond the one-level result."""
    import os
    from ray_linkgraph.graph import build_graph
    from ray_linkgraph.algorithms.louvain import (louvain_communities,
                                                  louvain_multilevel)
    # 4 triangles; pairs (0,1) / (2,3) joined by triple bridges, the two
    # pairs by one weak bridge — strong enough that the CONTRACTED level
    # merges triangle communities level 1 keeps apart
    edges = set()
    for c in range(4):
        b = 3 * c
        edges |= {(b, b + 1), (b, b + 2), (b + 1, b + 2)}
    edges |= {(0, 3), (1, 4), (2, 5), (6, 9), (7, 10), (8, 11), (5, 6)}
    import pyarrow as pa
    t = pa.table({"src": [str(a) for a, b in sorted(edges)],
                  "dst": [str(b) for a, b in sorted(edges)]})
    g = build_graph(rd.from_arrow(t), str(tmp_path / "ml"), n_parts=2)
    both = edges | {(d, s) for s, d in edges}
    und = [[] for _ in range(g.V)]
    for s, d in both:
        und[s].append((d, 1.0))
    res = louvain_multilevel(g, levels=3, max_rounds=10).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    exp = naive_ref.naive_louvain_multilevel(g.V, und, levels=3,
                                             max_rounds=10)
    assert res["community"].tolist() == exp
    l1 = louvain_communities(g, max_rounds=10).to_pandas() \
        .sort_values("node")["community"].tolist()
    assert len(set(exp)) < len(set(l1))       # contraction merged further


def test_louvain_multilevel_distributed_contraction(tmp_path, monkeypatch):
    """Forced join route with LOCAL_EDGES_MAX = -1: every level's
    contraction and moving must stay DISTRIBUTED — ``_collect`` (the
    only way an O(E) table reaches the driver in this module) is
    forbidden outright — and still match the naive mirror exactly
    (VERDICT r3 item 1)."""
    from ray_linkgraph.graph import build_graph
    from ray_linkgraph.algorithms import louvain as lv
    edges = set()
    for c in range(4):
        b = 3 * c
        edges |= {(b, b + 1), (b, b + 2), (b + 1, b + 2)}
    edges |= {(0, 3), (1, 4), (2, 5), (6, 9), (7, 10), (8, 11), (5, 6)}
    import pyarrow as pa
    t = pa.table({"src": [str(a) for a, b in sorted(edges)],
                  "dst": [str(b) for a, b in sorted(edges)]})
    g = build_graph(rd.from_arrow(t), str(tmp_path / "mldist"), n_parts=2)

    monkeypatch.setattr(lv, "LOCAL_EDGES_MAX", -1)

    def no_collect(ds):
        raise AssertionError(
            "_collect called on the forced distributed route — an O(E) "
            "table would have been materialized on the driver")

    monkeypatch.setattr(lv, "_collect", no_collect)
    # levels=2 / num_partitions=2 keeps the wall bounded: every join op
    # pays a fresh shuffle-aggregator pool, and this path runs ~8 of
    # them per moving round — one contracted level exercises the whole
    # distributed route
    res = lv.louvain_multilevel(g, levels=2, max_rounds=10,
                                large_graph=True, num_partitions=2) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    both = edges | {(d, s) for s, d in edges}
    und = [[] for _ in range(g.V)]
    for s, d in both:
        und[s].append((d, 1.0))
    exp = naive_ref.naive_louvain_multilevel(g.V, und, levels=2,
                                             max_rounds=10)
    assert res["community"].tolist() == exp


def test_louvain_join_route_parity(built):
    """The billion-vertex join route (large_graph=True) must be
    bit-identical to the broadcast route / naive oracle."""
    from ray_linkgraph.algorithms.louvain import louvain_communities
    g, _, _, edges = built
    res = louvain_communities(g, max_rounds=10, large_graph=True,
                              num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    both = edges | {(d, s) for s, d in edges}
    und = [[] for _ in range(g.V)]
    for s, d in both:
        und[s].append((d, 1.0))
    exp = naive_ref.naive_louvain_one_level(g.V, und, max_rounds=10)
    assert res["community"].tolist() == exp


def test_empty_inbox_partitions(tmp_path):
    """A partition that receives ZERO messages in a superstep gets an
    inbox with no payload columns (engine ships nothing) — every
    ragged-payload program must tolerate it. Regression: at fine
    partitionings (P comparable to V) rings crashed on the unpack
    (found raising P_GATE 8 -> 32). A 3-path plus isolated vertices
    over P=6 guarantees several silent partitions every step."""
    import pyarrow as pa
    from ray_linkgraph.graph import build_graph
    from ray_linkgraph.algorithms.rings import rings_detection
    from ray_linkgraph.algorithms.betweenness import betweenness_centrality
    from ray_linkgraph.algorithms.subgraph import subgraph_match

    t = pa.table({"src": ["0", "1", "2", "7", "8"],
                  "dst": ["1", "2", "0", "8", "9"]})
    g = build_graph(rd.from_arrow(t), str(tmp_path / "tiny"), n_parts=6)
    r = rings_detection(g, max_supersteps=4).to_arrow()
    # the 0-1-2 triangle is one ring, counted at its min vertex
    assert int(np.asarray(r["ring_count"]).sum()) == 1
    b = betweenness_centrality(g, max_supersteps=4).to_arrow()
    assert b.num_rows == g.V
    m = subgraph_match(g, [(0, 1), (1, 2)], 3)
    assert m.to_arrow().num_rows >= 1
