"""SubGraphMatch — pattern matching via a min-height tree of the query
graph.

Conformance spec (/root/reference/computer-algorithm/.../path/subgraph/
SubGraphMatch.java:85-280 + MinHeightTree.java:53-160):

* The query pattern (small directed graph over pattern nodes, optional
  per-node predicates) is compiled to a spanning TREE that walks every
  query edge exactly once (a pattern vertex reached through several
  edges becomes several tree nodes); the root is the tree center found
  by leaf peeling (MinHeightTree.build:53-76), which minimizes height
  and therefore supersteps.
* superstep 0: every data vertex matching a LEAF sends the partial
  match [(leaf, v)] toward parent candidates — along the data edges
  whose direction mirrors the query edge's orientation
  (sendMessage:151-160; we use an explicit reverse-adjacency mode
  instead of the reference's inverse-edge flags).
* superstep s: a message at v extends to the parent tree node if v
  matches it; completed root paths must have pairwise-distinct data
  ids and are collected at the root candidate (compute:115-140).
* superstep treeHeight-1: root candidates group their root-path matches
  by tree path and take the cartesian product, keeping only assignments
  that are CONSISTENT (same pattern vertex -> same data vertex) and
  INJECTIVE (all data ids distinct) — setValueRes:166-199 +
  cartesianProductAndFilterRes:219-275. The result set is therefore
  exactly the injective homomorphisms of the pattern, independent of
  the tree shape.

Output: per-vertex embedding count (+ deterministic sorted embedding
strings), stored at phi(tree-root pattern node).
"""

from __future__ import annotations

import numpy as np

from ..engine import RaggedCol, VertexProgram, run_program
from ..expr import Predicate
from ..graph import Graph

_EMPTY = np.zeros(0, dtype=np.int64)


class TreeNode:
    __slots__ = ("node_id", "parent", "qv", "up_is_out", "children")

    def __init__(self, node_id, parent, qv, up_is_out):
        self.node_id = node_id        # tree node id (1-based like ref)
        self.parent = parent
        self.qv = qv                  # pattern vertex index
        self.up_is_out = up_is_out    # True: query edge child->parent
        self.children = []


class QueryTree:
    """Min-height tree of a directed pattern (edge list over pattern
    nodes 0..k-1; every edge becomes exactly one tree edge)."""

    def __init__(self, pattern_edges, n_nodes: int):
        self.edges = [tuple(e) for e in pattern_edges]
        self.n_nodes = n_nodes
        tmp = self._build(0)
        root_qv = self._center(tmp)
        self.root = self._build(root_qv)
        self.by_id = {}
        stack = [self.root]
        while stack:
            n = stack.pop()
            self.by_id[n.node_id] = n
            stack.extend(n.children)
        self.leaves = [n for n in self.by_id.values() if not n.children]
        self.paths = self._root_paths()
        self.height = max(len(p) for p in self.paths)

    def _build(self, root_qv: int) -> TreeNode:
        visited = set()
        nid = [1]
        root = TreeNode(nid[0], None, root_qv, None)
        root.parent = root
        queue = [root]
        while queue:
            parent = queue.pop(0)
            # in-edges first, then out-edges (MinHeightTree build order)
            for i, (a, b) in enumerate(self.edges):
                if i in visited or b != parent.qv:
                    continue
                visited.add(i)
                nid[0] += 1
                child = TreeNode(nid[0], parent, a, True)  # a->parent
                parent.children.append(child)
                queue.append(child)
            for i, (a, b) in enumerate(self.edges):
                if i in visited or a != parent.qv:
                    continue
                visited.add(i)
                nid[0] += 1
                child = TreeNode(nid[0], parent, b, False)  # parent->b
                parent.children.append(child)
                queue.append(child)
        if len(visited) != len(self.edges):
            raise ValueError("pattern must be weakly connected")
        return root

    @staticmethod
    def _center(root: TreeNode) -> int:
        """Leaf peeling on the temporary tree -> center pattern vertex."""
        nodes = []
        stack = [root]
        while stack:
            n = stack.pop()
            nodes.append(n)
            stack.extend(n.children)
        deg = {n: (0 if n.parent is n else 1) + len(n.children)
               for n in nodes}
        alive = list(nodes)
        while len(alive) > 2:
            for n in list(alive):
                if deg[n] == 1:
                    deg[n.parent] -= 1
                    for c in n.children:
                        deg[c] -= 1
                    alive.remove(n)
        return alive[0].qv

    def _root_paths(self):
        paths = []

        def walk(n, acc):
            acc = acc + [n.node_id]
            if not n.children:
                paths.append(list(reversed(acc)))  # leaf..root order
            for c in n.children:
                walk(c, acc)

        walk(self.root, [])
        return paths


class SubGraphProgram(VertexProgram):
    combiner = "concat"
    mode = "out"

    def __init__(self, pattern_edges, n_nodes: int,
                 node_predicates: dict[int, str] | None = None):
        self.tree = QueryTree(pattern_edges, n_nodes)
        self.preds = {qv: Predicate(e)
                      for qv, e in (node_predicates or {}).items()}

    def _match(self, qv: int, ids: np.ndarray) -> np.ndarray:
        p = self.preds.get(qv)
        if p is None:
            return np.ones(len(ids), dtype=bool)
        return p(node=ids)

    def init(self, ctx, g):
        return {"mp_flat": _EMPTY, "mp_off": np.zeros(1, dtype=np.int64),
                "mp_owner": _EMPTY.copy(),
                "res_flat": _EMPTY.copy(),
                "res_off": np.zeros(1, dtype=np.int64),
                "res_owner": _EMPTY.copy(),
                "p_dst": _EMPTY.copy(), "p_flat": _EMPTY.copy(),
                "p_off": np.zeros(1, dtype=np.int64)}

    def _adj(self, ctx, up_is_out: bool):
        """Edges along which a CHILD-candidate reaches PARENT-candidates:
        query edge child->parent means data edges v->x (out); query edge
        parent->child means data edges x->v, i.e. v's IN adjacency."""
        indptr, adj, _ = ctx.csr("out" if up_is_out else "in")
        return indptr, adj

    def _send_up(self, ctx, node: TreeNode, vert: np.ndarray,
                 msgs: RaggedCol):
        """Fan messages (one per vert row) to parent candidates."""
        indptr, adj = self._adj(ctx, node.up_is_out)
        deg = np.diff(indptr)
        n = deg[vert]
        total = int(n.sum())
        if total == 0:
            return _EMPTY, RaggedCol(_EMPTY, np.zeros(1, dtype=np.int64))
        off = np.zeros(len(vert) + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        e_idx = (np.repeat(indptr[vert], n)
                 + np.arange(total, dtype=np.int64)
                 - np.repeat(off[:-1], n))
        tgt = adj[e_idx]
        row = np.repeat(np.arange(len(vert), dtype=np.int64), n)
        return tgt, msgs[row]

    def compute0(self, ctx, state, g):
        vids = ctx.vids()
        outs_d, outs_m = [], []
        for leaf in self.tree.leaves:
            m = self._match(leaf.qv, vids)
            vert = np.flatnonzero(m)
            if not len(vert):
                continue
            flat = np.empty(2 * len(vert), dtype=np.int64)
            flat[0::2] = leaf.node_id
            flat[1::2] = vert + ctx.lo
            msgs = RaggedCol(flat, np.arange(len(vert) + 1,
                                             dtype=np.int64) * 2)
            d, mm = self._send_up(ctx, leaf, vert, msgs)
            outs_d.append(d)
            outs_m.append(mm)
        dst = (np.concatenate(outs_d) if outs_d else _EMPTY)
        seq = RaggedCol.concat(outs_m) if outs_m else \
            RaggedCol(_EMPTY, np.zeros(1, dtype=np.int64))
        state["p_dst"], state["p_flat"], state["p_off"] = \
            dst, seq.flat, seq.offsets
        return dst, {"seq": seq}, {}

    def compute(self, ctx, state, inbox, g, s):
        empty = RaggedCol(_EMPTY, np.zeros(1, dtype=np.int64))
        if s >= self.tree.height:
            state["p_dst"], state["p_flat"], state["p_off"] = \
                _EMPTY, empty.flat, empty.offsets
            return _EMPTY, {"seq": empty}, {}
        dst = inbox.dst
        seqs = inbox.cols[0] if inbox.cols else empty
        v_g = dst + ctx.lo
        outs_d, outs_m = [], []
        if len(dst):
            last_tn = seqs.flat[seqs.offsets[1:] - 2]  # last (tn, v) pair
            for tn in np.unique(last_tn):
                node = self.tree.by_id[int(tn)]
                parent = node.parent
                sel = np.flatnonzero(last_tn == tn)
                ok = self._match(parent.qv, v_g[sel])
                sel = sel[ok]
                if not len(sel):
                    continue
                base = seqs[sel]
                nl = base.lengths() + 2
                noff = np.zeros(len(sel) + 1, dtype=np.int64)
                np.cumsum(nl, out=noff[1:])
                flat = np.empty(noff[-1], dtype=np.int64)
                keep = np.ones(noff[-1], dtype=bool)
                keep[noff[1:] - 1] = False
                keep[noff[1:] - 2] = False
                flat[keep] = base.flat
                flat[noff[1:] - 2] = parent.node_id
                flat[noff[1:] - 1] = v_g[sel]
                merged = RaggedCol(flat, noff)
                if parent is self.tree.root:
                    # distinct-data-ids filter, then collect at v.
                    # All rows of one tree-node arrival share a length
                    # (same tree depth), so the check vectorizes as a
                    # row-sorted adjacent-diff over an (n, k) id matrix
                    # — the per-row np.unique loop here was the single
                    # hottest line of the whole pipeline (a Python pass
                    # over every root arrival, ~3M rows at sf0.1)
                    good = np.ones(len(merged), dtype=bool)
                    lens = merged.lengths()
                    for L in np.unique(lens):
                        k = int(L) // 2
                        if k <= 1:
                            continue
                        li = np.flatnonzero(lens == L)
                        mat = merged.flat[
                            merged.offsets[li][:, None]
                            + np.arange(1, L, 2)[None, :]]
                        srt = np.sort(mat, axis=1)
                        good[li] = (np.diff(srt, axis=1) != 0).all(axis=1)
                    gi = np.flatnonzero(good)
                    if len(gi):
                        keepm = merged[gi]
                        mp = RaggedCol.concat([
                            RaggedCol(state["mp_flat"], state["mp_off"]),
                            keepm])
                        state["mp_flat"] = mp.flat
                        state["mp_off"] = mp.offsets
                        state["mp_owner"] = np.concatenate(
                            [state["mp_owner"], dst[sel][gi]])
                else:
                    d2, m2 = self._send_up(ctx, parent, dst[sel], merged)
                    outs_d.append(d2)
                    outs_m.append(m2)
        # final assembly at s == height-1
        if s == self.tree.height - 1:
            self._assemble(ctx, state)
        dst2 = np.concatenate(outs_d) if outs_d else _EMPTY
        seq2 = RaggedCol.concat(outs_m) if outs_m else empty
        state["p_dst"], state["p_flat"], state["p_off"] = \
            dst2, seq2.flat, seq2.offsets
        return dst2, {"seq": seq2}, \
            {"mp": int(len(state["mp_owner"]))}

    def _assemble(self, ctx, state):
        """Cartesian product of per-path matches at each root candidate,
        keeping consistent + injective assignments."""
        mp = RaggedCol(state["mp_flat"], state["mp_off"])
        owners = state["mp_owner"]
        if not len(owners):
            return
        vids = ctx.vids()
        root_ok = self._match(self.tree.root.qv, vids)
        paths = self.tree.paths
        path_index = {tuple(p): i for i, p in enumerate(paths)}
        path_qvs = [[self.tree.by_id[tn].qv for tn in p] for p in paths]

        # ---- vectorized row classification (no per-row Python): every
        # row's (tree-node sequence) -> path index via per-length matrix
        # slicing + unique-row inverse; the data-vertex vectors live in
        # per-length matrices indexed by row position -----------------
        lens = mp.lengths()
        n_rows = len(mp)
        pi_of_row = np.full(n_rows, -1, dtype=np.int64)
        pos_of_row = np.zeros(n_rows, dtype=np.int64)
        dv_mats: dict[int, np.ndarray] = {}
        for L in np.unique(lens):
            li = np.flatnonzero(lens == L)
            Li = int(L)
            tn_mat = mp.flat[mp.offsets[li][:, None]
                             + np.arange(0, Li, 2)[None, :]]
            dv_mats[Li] = mp.flat[mp.offsets[li][:, None]
                                  + np.arange(1, Li, 2)[None, :]]
            pos_of_row[li] = np.arange(len(li))
            uniq, inv = np.unique(tn_mat, axis=0, return_inverse=True)
            for u_i in range(len(uniq)):
                pi = path_index.get(tuple(uniq[u_i].tolist()))
                if pi is not None:
                    pi_of_row[li[inv == u_i]] = pi

        # ---- fully vectorized assembly: iterative multi-key hash join
        # of the per-path candidate matrices on (owner + shared query
        # vertices), then one sorted-row injectivity check — replaces a
        # Python recursion that enumerated every cross-path combination
        # (~150M candidate pairs at the sf0.1 gate for 9k matches) ----
        ok_rows = np.flatnonzero(pi_of_row >= 0)
        if not len(ok_rows):
            return
        mats, mat_qvs = [], []
        for pi in range(len(paths)):
            rows = np.flatnonzero(pi_of_row == pi)
            if len(rows) == 0:
                return                        # a path with no match rows
            L = int(lens[rows[0]])
            dvm = dv_mats[L][pos_of_row[rows]]
            mats.append(np.column_stack([owners[rows], dvm]))
            mat_qvs.append([-1] + path_qvs[pi])   # -1 = owner pseudo-qv

        def join_pairs(ka: np.ndarray, kb: np.ndarray):
            """(ia, ib) row-index pairs with ka[ia] == kb[ib] (multi-col
            int64 keys) — unique-row group ids + sorted expansion."""
            _, inv = np.unique(np.vstack([ka, kb]), axis=0,
                               return_inverse=True)
            ga, gb = inv[:len(ka)], inv[len(ka):]
            ob = np.argsort(gb, kind="stable")
            gb_s = gb[ob]
            starts = np.searchsorted(gb_s, ga, side="left")
            counts = np.searchsorted(gb_s, ga, side="right") - starts
            ia = np.repeat(np.arange(len(ka), dtype=np.int64), counts)
            total = int(counts.sum())
            offs = np.r_[0, np.cumsum(counts)[:-1]]
            pos = (np.repeat(starts, counts)
                   + np.arange(total, dtype=np.int64)
                   - np.repeat(offs, counts))
            return ia, ob[pos]

        def _injective(mat: np.ndarray, qvs: list) -> np.ndarray:
            """Row mask: all distinct query vertices map to distinct
            data vertices (sorted-row adjacent diff)."""
            dv = mat[:, [i for i, q in enumerate(qvs) if q != -1]]
            if dv.shape[1] < 2:
                return np.ones(len(mat), dtype=bool)
            srt = np.sort(dv, axis=1)
            return (np.diff(srt, axis=1) != 0).all(axis=1)

        cur, cur_qvs = mats[0], list(mat_qvs[0])
        for gi in range(1, len(paths)):
            nxt, nqvs = mats[gi], mat_qvs[gi]
            shared = [q for q in nqvs if q in cur_qvs]
            new_q = [q for q in nqvs if q not in cur_qvs]
            ia, ib = join_pairs(
                cur[:, [cur_qvs.index(q) for q in shared]],
                nxt[:, [nqvs.index(q) for q in shared]])
            if not len(ia):
                return
            add = nxt[ib][:, [nqvs.index(q) for q in new_q]] \
                if new_q else np.zeros((len(ia), 0), dtype=np.int64)
            cur = np.column_stack([cur[ia], add])
            cur_qvs = cur_qvs + new_q
            # prune non-injective rows PER JOIN STEP (ADVICE.md): the
            # old recursion's used-set killed these at every depth, and
            # without the step filter the intermediate join product can
            # blow up combinatorially on hub owners before the final
            # check would drop the rows. Same semantics as filtering
            # only at the end — injectivity violations never heal.
            if new_q:
                good = _injective(cur, cur_qvs)
                if not good.all():
                    cur = cur[good]
                if not len(cur):
                    return
        # root predicate on the owner column (local ids)
        keep = root_ok[cur[:, 0]]
        cur = cur[keep]
        if not len(cur):
            return
        # injectivity: all DISTINCT query vertices map to distinct data
        # vertices (sorted-row adjacent diff; identical semantics to the
        # recursive used-set — shared qvs are single columns here)
        dv_idx = [i for i, q in enumerate(cur_qvs) if q != -1]
        ids = cur[:, dv_idx]
        srt = np.sort(ids, axis=1)
        good = (np.diff(srt, axis=1) != 0).all(axis=1)
        cur = cur[good]
        if not len(cur):
            return
        # embeddings ordered by query-vertex id (as the rec emitted)
        qv_order = np.argsort(np.array([q for q in cur_qvs if q != -1]))
        emb = cur[:, dv_idx][:, qv_order]
        res = RaggedCol(emb.reshape(-1).astype(np.int64),
                        np.arange(len(cur) + 1, dtype=np.int64)
                        * emb.shape[1])
        old = RaggedCol(state["res_flat"], state["res_off"])
        allres = RaggedCol.concat([old, res])
        state["res_flat"], state["res_off"] = allres.flat, allres.offsets
        state["res_owner"] = np.concatenate(
            [state["res_owner"], cur[:, 0].astype(np.int64)])

    def rescatter(self, ctx, state, g, s):
        return state["p_dst"], \
            {"seq": RaggedCol(state["p_flat"], state["p_off"])}

    def output(self, ctx, state):
        res = RaggedCol(state["res_flat"], state["res_off"])
        owners = state["res_owner"]
        count = np.zeros(ctx.size, dtype=np.int64)
        reps: list[list[str]] = [[] for _ in range(ctx.size)]
        for i in range(len(res)):
            seq = res.flat[res.offsets[i]:res.offsets[i + 1]]
            o = int(owners[i])
            count[o] += 1
            reps[o].append("-".join(map(str, seq.tolist())))
        strs = [";".join(sorted(r)) for r in reps]
        return {"n_matches": count, "matches": np.array(strs, dtype=object)}


def subgraph_match(graph: Graph, pattern_edges, n_nodes: int,
                   node_predicates: dict[int, str] | None = None,
                   max_supersteps: int | None = None,
                   checkpoint_dir: str | None = None,
                   checkpoint_every: int = 1, resume: bool = False):
    prog = SubGraphProgram(pattern_edges, n_nodes, node_predicates)
    graph.ensure_mode("in")    # messages travel both edge orientations
    steps = (prog.tree.height if max_supersteps is None
             else max_supersteps)
    return run_program(graph, prog, max_supersteps=steps,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every, resume=resume)
