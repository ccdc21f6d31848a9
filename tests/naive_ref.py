"""Naive pure-Python implementations of the REFERENCE per-vertex
semantics (SURVEY.md §2.10) used as golden oracles. Deliberately slow and
literal — these mirror the Java loops, not our vectorized kernels.

PageRank:   /root/reference/computer-algorithm/.../pagerank/PageRank.java:68-141
WCC:        .../community/wcc/Wcc.java:47-72
LPA:        .../community/lpa/Lpa.java:50-101
Triangles:  .../community/trianglecount/TriangleCount.java:69-195
SSSP:       .../path/sssp/Sssp.java:57-127
KCore:      .../community/kcore/KCore.java:55-92
"""

from __future__ import annotations

import numpy as np


def naive_pagerank(V, out_adj, alpha=0.15, thresh=1e-6, max_steps=10):
    """Returns (ranks, supersteps_executed)."""
    deg = np.array([len(a) for a in out_adj])
    rank = np.full(V, 1.0 / V)
    cum = rank.sum()
    dang = rank[deg == 0].sum()
    steps = 1
    for s in range(1, max_steps):
        inc = np.zeros(V)
        for u in range(V):
            if deg[u]:
                c = rank[u] / deg[u]
                for d in out_adj[u]:
                    inc[d] += c
        new = ((dang / V + inc) * (1 - alpha) + alpha / V) / cum
        l1 = np.abs(new - rank).sum()
        cum = new.sum()
        dang = new[deg == 0].sum()
        rank = new
        steps = s + 1
        if s > 1 and l1 <= thresh:
            break
    return rank, steps


def naive_wcc(V, undirected_adj):
    """Round-synchronous min-label propagation to fixpoint."""
    lab = np.array([min([v] + list(undirected_adj[v]))
                    for v in range(V)], dtype=np.int64)
    while True:
        nl = lab.copy()
        for v in range(V):
            for u in undirected_adj[v]:
                if lab[u] < nl[v]:
                    nl[v] = lab[u]
        if (nl == lab).all():
            return lab
        lab = nl


def naive_lpa(V, undirected_adj, rounds=9):
    """rounds = supersteps - 1 vote rounds (reference runs 10 supersteps:
    compute0 + 9 votes). Vote: max count, tie -> min label."""
    lab = np.arange(V, dtype=np.int64)
    for _ in range(rounds):
        nl = lab.copy()
        for v in range(V):
            if not undirected_adj[v]:
                continue
            counts = {}
            for u in undirected_adj[v]:
                counts[lab[u]] = counts.get(lab[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            # tie -> min label
            mx = best[1]
            nl[v] = min(l for l, c in counts.items() if c == mx)
        lab = nl
    return lab


def naive_triangles(V, undirected_adj):
    """Per-vertex count via the reference's lower-id neighbor-list
    intersection (TriangleCount.java:174-195)."""
    nbr = [set(a) for a in undirected_adj]
    out = np.zeros(V, dtype=np.int64)
    for v in range(V):
        cnt = 0
        for u in nbr[v]:
            lower_u = [w for w in nbr[u] if w < u]
            for w in lower_u:
                if w in nbr[v]:
                    cnt += 1
        out[v] = cnt
    return out


def naive_sssp(V, out_adj_w, sources, max_steps=10):
    """out_adj_w: per-vertex list of (dst, weight). Mirrors the
    reference's rebroadcast-on-receive rule."""
    dist = np.full(V, np.inf)
    for s in sources:
        dist[s] = 0.0
    inbox = {}
    for s in sources:
        for d, w in out_adj_w[s]:
            inbox[d] = min(inbox.get(d, np.inf), dist[s] + w)
    for _ in range(1, max_steps):
        if not inbox:
            break
        nxt = {}
        for v, m in inbox.items():
            if m < dist[v]:
                dist[v] = m
            for d, w in out_adj_w[v]:
                val = dist[v] + w
                if val < nxt.get(d, np.inf):
                    nxt[d] = val
        inbox = nxt
    return np.where(np.isfinite(dist), dist, -1.0)


def naive_kcore(V, undirected_adj, k=3):
    core = np.array([len(a) for a in undirected_adj], dtype=np.int64)
    doomed = [v for v in range(V) if core[v] < k]
    core[[v for v in doomed]] = 0
    while doomed:
        deletions = {}
        for v in doomed:
            for u in undirected_adj[v]:
                deletions[u] = deletions.get(u, 0) + 1
        doomed = []
        for u, c in deletions.items():
            if core[u] > 0:
                core[u] -= c
                if core[u] < k:
                    core[u] = 0
                    doomed.append(u)
    return core


def naive_closeness(V, out_adj_w, max_steps=10):
    """ClosenessCentrality.java:82-173 message semantics, simplified to
    min-per-(dst,start) delivery (state-equivalent — the reference's
    per-message processing only ever adds provably-non-improving extra
    messages). out_adj_w: per vertex list of (target, weight)."""
    maps = [dict() for _ in range(V)]
    msgs = []
    for v in range(V):
        for t, w in out_adj_w[v]:
            if t != v:
                msgs.append((t, v, float(w)))
    for _ in range(1, max_steps):
        if not msgs:
            break
        best = {}
        for d, st, dist in msgs:
            if d == st:
                continue
            k = (d, st)
            if k not in best or dist < best[k]:
                best[k] = dist
        msgs = []
        for (d, st), dist in best.items():
            cur = maps[d].get(st)
            if cur is None or dist < cur:
                maps[d][st] = dist
                for t, w in out_adj_w[d]:
                    if t != st:
                        msgs.append((t, st, dist + float(w)))
    clo = [sum(1.0 / x for x in m.values()) for m in maps]
    reach = [len(m) for m in maps]
    return clo, reach


def naive_betweenness(V, out_adj, max_steps=6, store_perf=None,
                      sample_rate=1.0, seed=107):
    """BetweennessCentrality.java:97-219 exactly (superstep-0 scatter
    unsampled per :99-113; forwards drawn per edge with the engine's
    uniform01(seed, step, self, tgt) counter hash)."""
    import numpy as np
    from ray_linkgraph._util import uniform01
    btw = [0.0] * V
    arrived = [{v} for v in range(V)]
    msgs = []
    for v in range(V):
        for t in out_adj[v]:
            msgs.append((t, 0.0, (v,)))
    for step in range(1, max_steps):
        if not msgs:
            break
        byd = {}
        for d, vote, seq in msgs:
            byd.setdefault(d, []).append((vote, seq))
        nxt = []
        for d, items in byd.items():
            seqtable = {}
            arriving = set()
            for vote, seq in items:
                btw[d] += vote
                if not seq:
                    continue
                src = seq[0]
                if src in arrived[d]:
                    continue
                if store_perf is not None and len(arrived[d]) >= store_perf:
                    continue
                arriving.add(src)
                tc = seqtable.setdefault(src, [0, {}])
                tc[0] += 1
                for m in seq[1:]:
                    tc[1][m] = tc[1].get(m, 0) + 1
                newseq = seq + (d,)
                for t in out_adj[d]:
                    if t not in newseq and (
                            sample_rate >= 1.0 or
                            float(uniform01(np.uint64(seed),
                                            np.uint64(step),
                                            np.uint64(d),
                                            np.uint64(t))) < sample_rate):
                        nxt.append((t, 0.0, newseq))
            arrived[d] |= arriving
            for src, (total, idc) in seqtable.items():
                for m, c in idc.items():
                    nxt.append((m, c / total, ()))
        msgs = nxt
    return btw


def naive_rings(V, out_adj, max_steps=6):
    """RingsDetection.java:49-119 exactly."""
    rings = [[] for _ in range(V)]
    msgs = []
    for v in range(V):
        for t in out_adj[v]:
            if t >= v:
                msgs.append((t, (v,)))
    for _ in range(1, max_steps):
        if not msgs:
            break
        nxt = []
        for d, seq in msgs:
            if d == seq[0]:
                if all(d <= x for x in seq):
                    rings[d].append(seq + (d,))
            elif d not in seq:
                for t in out_adj[d]:
                    if t >= seq[0]:
                        nxt.append((t, seq + (d,)))
        msgs = nxt
    return rings


def naive_filtered_rings(V, out_adj_w, max_steps=6, start_ok=None,
                         vertex_ok=None, edge0_ok=None, edge_ok=None):
    """RingsDetectionWithFilter.java:56-124 exactly. out_adj_w: per
    vertex list of (target, weight). Predicates are python callables
    (None = pass): start_ok(v), vertex_ok(v), edge0_ok(w) (superstep 0,
    $in-free expressions only), edge_ok(w_out, w_in). No target>=self
    pruning; rings record at their min vertex only."""
    def yes(*_):
        return True
    start_ok = start_ok or yes
    vertex_ok = vertex_ok or yes
    edge0_ok = edge0_ok or yes
    edge_ok = edge_ok or yes
    rings = [[] for _ in range(V)]
    msgs = []
    for v in range(V):
        if not start_ok(v):
            continue
        for t, w in out_adj_w[v]:
            if edge0_ok(w):
                msgs.append((t, (v,), w))
    for _ in range(1, max_steps):
        if not msgs:
            break
        nxt = []
        for d, seq, win in msgs:
            if not vertex_ok(d):
                continue
            if d == seq[0]:
                if all(d <= x for x in seq):
                    rings[d].append(seq + (d,))
            elif d not in seq:
                for t, w in out_adj_w[d]:
                    if edge_ok(w, win):
                        nxt.append((t, seq + (d,), w))
        msgs = nxt
    return rings


def naive_links(V, out_adj_w, starts, spread, end_edge=None,
                end_vertex=None, max_steps=5):
    """Links.java:53-129 exactly; predicates are python callables:
    spread(w_out, w_in), end_edge(src, dst, w), end_vertex(node)."""
    saved = [[] for _ in range(V)]
    msgs = []
    for v in starts:
        if not out_adj_w[v]:
            continue
        if end_vertex and end_vertex(v):
            saved[v].append((v,))
            continue
        for t, w in out_adj_w[v]:
            if end_edge and end_edge(v, t, w):
                saved[v].append((v, t))
            else:
                msgs.append((t, (v,), (w,)))
    for _ in range(1, max_steps):
        if not msgs:
            break
        nxt = []
        for d, pv, pw in msgs:
            if end_vertex and end_vertex(d):
                saved[d].append(pv + (d,))
                continue
            pv2 = pv + (d,)
            for t, w in out_adj_w[d]:
                if end_edge and end_edge(d, t, w):
                    saved[d].append(pv2 + (t,))
                elif spread(w, pw[-1]):
                    nxt.append((t, pv2, pw + (w,)))
        msgs = nxt
    return saved


def naive_subgraph(out_adj, pattern_edges, n_nodes, preds=None):
    """All injective homomorphisms of the directed pattern into the data
    graph (brute-force backtracking). Returns list of dict
    {pattern_node: data_id}."""
    preds = preds or {}
    V = len(out_adj)
    out_sets = [set(a) for a in out_adj]
    in_sets = [set() for _ in range(V)]
    for u, nbrs in enumerate(out_adj):
        for v in nbrs:
            in_sets[v].add(u)
    # assignment order: each next pattern node touches an assigned one
    order = [0]
    while len(order) < n_nodes:
        for q in range(n_nodes):
            if q in order:
                continue
            if any((a, b) in pattern_edges or (b, a) in pattern_edges
                   for a, b in [(q, o) for o in order]):
                order.append(q)
                break
    res = []

    def rec(i, assign, used):
        if i == n_nodes:
            res.append(dict(assign))
            return
        q = order[i]
        cands = None
        for (a, b) in pattern_edges:
            if a == q and b in assign:
                c = in_sets[assign[b]]
            elif b == q and a in assign:
                c = out_sets[assign[a]]
            else:
                continue
            cands = c if cands is None else cands & c
        if cands is None:
            cands = set(range(V))
        for dv in cands:
            if dv in used:
                continue
            if q in preds and not preds[q](dv):
                continue
            # verify all pattern edges among assigned
            assign[q] = dv
            ok = all(assign[b] in out_sets[assign[a]]
                     for a, b in pattern_edges
                     if a in assign and b in assign)
            if ok:
                used.add(dv)
                rec(i + 1, assign, used)
                used.discard(dv)
            del assign[q]

    rec(0, {}, set())
    return res


def naive_louvain_one_level(V, und_adj_w, max_rounds=10):
    """Synchronous one-level local-moving mirror of
    ray_linkgraph.algorithms.louvain (NOT the reference's sequential
    VOS optimizer — see that module's docstring)."""
    k = [sum(w for _, w in a) for a in und_adj_w]
    two_m = sum(k)
    return _naive_local_moving(V, und_adj_w, k, two_m, max_rounds)


def _naive_local_moving(V, und_adj_w, k, two_m, max_rounds):
    """Local-moving rounds with EXTERNAL degrees ``k`` (so contracted
    super-nodes can carry self-loop weight in k while the adjacency
    excludes self-edges)."""
    labels = list(range(V))
    if two_m == 0:
        return labels
    for _ in range(max_rounds):
        tot = [0.0] * V
        for v in range(V):
            tot[labels[v]] += k[v]
        new = labels[:]
        moved = False
        for v in range(V):
            if not und_adj_w[v]:
                continue
            kvc = {}
            for t, w in und_adj_w[v]:
                c = labels[t]
                kvc[c] = kvc.get(c, 0.0) + w
            cur = labels[v]

            def gain(c):
                ta = tot[c] - (k[v] if c == cur else 0.0)
                return kvc.get(c, 0.0) - k[v] * ta / two_m

            stay = gain(cur)
            best_c, best_g = None, None
            for c in sorted(kvc):
                g = gain(c)
                if best_g is None or g > best_g:
                    best_c, best_g = c, g
            if best_g is not None and best_g > stay + 1e-15 \
                    and best_c != cur:
                new[v] = best_c
                moved = True
        if not moved:
            break
        labels = new
    return labels


def naive_louvain_multilevel(V, und_adj_w, levels=2, max_rounds=10):
    """Hierarchical mirror of louvain_multilevel: local moving, then
    contract communities (self-loop weight into super-node degrees,
    excluded from adjacency) and repeat; labels stay in original
    node-id space."""
    labels = naive_louvain_one_level(V, und_adj_w, max_rounds)
    two_m = sum(w for a in und_adj_w for _, w in a)
    if two_m == 0:
        return labels
    for _ in range(1, levels):
        # contracted weights incl. self
        W = {}
        for v in range(V):
            for t, w in und_adj_w[v]:
                key = (labels[v], labels[t])
                W[key] = W.get(key, 0.0) + w
        uniq = sorted({c for ab in W for c in ab})
        dense = {c: i for i, c in enumerate(uniq)}
        nc = len(uniq)
        k_c = [0.0] * nc
        adj = [[] for _ in range(nc)]
        for (a, b), w in W.items():
            k_c[dense[a]] += w
            if a != b:
                adj[dense[a]].append((dense[b], w))
        for a in adj:
            a.sort()
        if not any(adj):
            break
        labs2 = _naive_local_moving(nc, adj, k_c, two_m, max_rounds)
        if labs2 == list(range(nc)):
            break
        labels = [uniq[labs2[dense[labels[v]]]] if labels[v] in dense
                  else labels[v] for v in range(V)]
    return labels
