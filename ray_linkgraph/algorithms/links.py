"""Links — constrained path traversal with expression predicates.

Conformance spec (/root/reference/computer-algorithm/.../path/links/
Links.java:53-129 + LinksSpreadFilter.java:41-139):

config: a set of START vertices, an optional END-VERTEX condition, an
optional END-EDGE condition, and an edge SPREAD condition comparing the
current edge ($out) against the previously walked edge ($in).

superstep 0 (start vertices with >= 1 out-edge only, Links.java:53-66):
    * if the start vertex itself satisfies the end-vertex condition:
      record the trivial path [v] and STOP (no sends);
    * else for each out-edge: end-edge -> record [v, target] AT v;
      otherwise send the path (step 0 spreads unconditionally,
      isEdgeCanSpread0 = label match only).
superstep s: per incoming path message at v:
    * end-vertex(v): record path + [v] at v, do not continue;
    * else per out-edge e: end-edge(e) -> record path + [v, target] at
      v; elif spread(e, last walked edge) -> forward path + [v].
value: the list of recorded paths (LinksValue) — output here is the
    per-vertex path count + a deterministic sorted path-string encoding
    (the reference appends in arrival order, which its buffer merge
    leaves unspecified).

Predicates are vectorized ``expr.Predicate`` expressions (the Aviator
analog) over: ``node`` (end-vertex), ``src/dst/w`` (end-edge),
``w_out/w_in`` (spread). Paths may revisit vertices (the reference has
no cycle check) — bound the run with max_supersteps.
"""

from __future__ import annotations

import numpy as np

from ..engine import RaggedCol, VertexProgram, run_program
from ..expr import Predicate
from ..graph import Graph


def _f2i(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64).view(np.int64)


def _i2f(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64).view(np.float64)


_EMPTY = np.zeros(0, dtype=np.int64)


def _empty_rc() -> RaggedCol:
    return RaggedCol(_EMPTY, np.zeros(1, dtype=np.int64))


class LinksProgram(VertexProgram):
    combiner = "concat"
    mode = "out"

    def __init__(self, start_nodes, spread: str = "w_out >= w_in",
                 end_edge: str | None = None,
                 end_vertex: str | None = None):
        self.start_nodes = np.asarray(sorted(start_nodes), dtype=np.int64)
        self.spread = Predicate(spread)
        self.end_edge = Predicate(end_edge) if end_edge else None
        self.end_vertex = Predicate(end_vertex) if end_vertex else None

    def init(self, ctx, g):
        return {"s_flat": _EMPTY, "s_off": np.zeros(1, dtype=np.int64),
                "s_owner": _EMPTY.copy(),
                "p_dst": _EMPTY.copy(), "p_flat": _EMPTY.copy(),
                "p_off": np.zeros(1, dtype=np.int64),
                "pw_flat": _EMPTY.copy(),
                "pw_off": np.zeros(1, dtype=np.int64)}

    def _weights(self, ctx):
        indptr, adj, w = ctx.csr("out")
        return indptr, adj, (w if w is not None
                             else np.ones(len(adj), dtype=np.float64))

    def _record(self, state, paths: RaggedCol, owners: np.ndarray):
        saved = RaggedCol.concat([
            RaggedCol(state["s_flat"], state["s_off"]), paths])
        state["s_flat"], state["s_off"] = saved.flat, saved.offsets
        state["s_owner"] = np.concatenate([state["s_owner"],
                                           owners.astype(np.int64)])

    def _ev(self, ids: np.ndarray) -> np.ndarray:
        if self.end_vertex is None:
            return np.zeros(len(ids), dtype=bool)
        return self.end_vertex(node=ids)

    def _ee(self, src, dst, w) -> np.ndarray:
        if self.end_edge is None:
            return np.zeros(len(src), dtype=bool)
        return self.end_edge(src=src, dst=dst, w=w)

    def _expand(self, ctx, vert, pv: RaggedCol, pw: RaggedCol, state,
                is_step0: bool, can_send: bool):
        """Shared step: paths (already including vert as last element)
        fan out over vert's out-edges; end-edges record at vert, spread
        edges forward. pw rows = edge weights walked so far (bits)."""
        indptr, adj, w = self._weights(ctx)
        deg = np.diff(indptr)
        n = deg[vert]
        total = int(n.sum())
        if total == 0:
            return _EMPTY, _empty_rc(), _empty_rc()
        off = np.zeros(len(vert) + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        e_idx = (np.repeat(indptr[vert], n)
                 + np.arange(total, dtype=np.int64)
                 - np.repeat(off[:-1], n))
        tgt = adj[e_idx]
        ew = w[e_idx]
        row = np.repeat(np.arange(len(vert), dtype=np.int64), n)
        src_g = (vert + ctx.lo)[row]
        is_end = self._ee(src_g, tgt, ew)
        # record end-edge paths at vert: path + [target]
        ri = np.flatnonzero(is_end)
        if len(ri):
            base = pv[row[ri]]
            nl = base.lengths() + 1
            noff = np.zeros(len(ri) + 1, dtype=np.int64)
            np.cumsum(nl, out=noff[1:])
            flat = np.empty(noff[-1], dtype=np.int64)
            tail = noff[1:] - 1
            kp = np.ones(noff[-1], dtype=bool)
            kp[tail] = False
            flat[kp] = base.flat
            flat[tail] = tgt[ri]
            self._record(state, RaggedCol(flat, noff), vert[row[ri]])
        # forward the rest where the spread predicate passes
        if not can_send:
            return _EMPTY, _empty_rc(), _empty_rc()
        if is_step0:
            ok = ~is_end
        else:
            w_in = _i2f(pw.flat[pw.offsets[1:] - 1])[row]  # last walked
            ok = ~is_end & self.spread(w_out=ew, w_in=w_in)
        fi = np.flatnonzero(ok)
        if not len(fi):
            return _EMPTY, _empty_rc(), _empty_rc()
        fwd_pv = pv[row[fi]]
        base_w = pw[row[fi]]
        nl = base_w.lengths() + 1
        noff = np.zeros(len(fi) + 1, dtype=np.int64)
        np.cumsum(nl, out=noff[1:])
        flat = np.empty(noff[-1], dtype=np.int64)
        tail = noff[1:] - 1
        kp = np.ones(noff[-1], dtype=bool)
        kp[tail] = False
        flat[kp] = base_w.flat
        flat[tail] = _f2i(ew[fi])
        return tgt[fi], fwd_pv, RaggedCol(flat, noff)

    def compute0(self, ctx, state, g):
        local = self.start_nodes[(self.start_nodes >= ctx.lo)
                                 & (self.start_nodes < ctx.hi)] - ctx.lo
        deg = np.diff(self._weights(ctx)[0])
        local = local[deg[local] > 0]
        ev = self._ev(local + ctx.lo)
        # end-vertex starts record [v] and stop
        if ev.any():
            done = local[ev] + ctx.lo
            self._record(state, RaggedCol(
                done.copy(), np.arange(len(done) + 1, dtype=np.int64)),
                local[ev])
        act = local[~ev]
        pv = RaggedCol((act + ctx.lo).copy(),
                       np.arange(len(act) + 1, dtype=np.int64))
        pw = RaggedCol(_EMPTY, np.zeros(len(act) + 1, dtype=np.int64))
        dst, fpv, fpw = self._expand(ctx, act, pv, pw, state,
                                     is_step0=True, can_send=True)
        state["p_dst"], state["p_flat"], state["p_off"] = \
            dst, fpv.flat, fpv.offsets
        state["pw_flat"], state["pw_off"] = fpw.flat, fpw.offsets
        return dst, {"apv": fpv, "bpw": fpw}, {}

    def compute(self, ctx, state, inbox, g, s):
        dst = inbox.dst
        if len(inbox.cols) == 2:
            pv, pww = inbox.cols             # sorted keys: apv, bpw
        else:
            pv, pww = _empty_rc(), _empty_rc()
        v_g = dst + ctx.lo
        ev = self._ev(v_g)
        # end-vertex arrivals: record path + [v] at v
        ei = np.flatnonzero(ev)
        if len(ei):
            base = pv[ei]
            nl = base.lengths() + 1
            noff = np.zeros(len(ei) + 1, dtype=np.int64)
            np.cumsum(nl, out=noff[1:])
            flat = np.empty(noff[-1], dtype=np.int64)
            tail = noff[1:] - 1
            kp = np.ones(noff[-1], dtype=bool)
            kp[tail] = False
            flat[kp] = base.flat
            flat[tail] = v_g[ei]
            self._record(state, RaggedCol(flat, noff), dst[ei])
        ci = np.flatnonzero(~ev)
        if len(ci):
            # continue: path += [v]
            base = pv[ci]
            nl = base.lengths() + 1
            noff = np.zeros(len(ci) + 1, dtype=np.int64)
            np.cumsum(nl, out=noff[1:])
            flat = np.empty(noff[-1], dtype=np.int64)
            tail = noff[1:] - 1
            kp = np.ones(noff[-1], dtype=bool)
            kp[tail] = False
            flat[kp] = base.flat
            flat[tail] = v_g[ci]
            pv2 = RaggedCol(flat, noff)
            can_send = getattr(ctx, "steps_remaining", 10**9) > 0
            dst2, fpv, fpw = self._expand(ctx, dst[ci], pv2, pww[ci],
                                          state, is_step0=False,
                                          can_send=can_send)
        else:
            dst2, fpv, fpw = _EMPTY, _empty_rc(), _empty_rc()
        state["p_dst"], state["p_flat"], state["p_off"] = \
            dst2, fpv.flat, fpv.offsets
        state["pw_flat"], state["pw_off"] = fpw.flat, fpw.offsets
        return dst2, {"apv": fpv, "bpw": fpw}, \
            {"saved": int(len(state["s_off"]) - 1)}

    def rescatter(self, ctx, state, g, s):
        return state["p_dst"], {
            "apv": RaggedCol(state["p_flat"], state["p_off"]),
            "bpw": RaggedCol(state["pw_flat"], state["pw_off"])}

    def output(self, ctx, state):
        saved = RaggedCol(state["s_flat"], state["s_off"])
        count = np.zeros(ctx.size, dtype=np.int64)
        reps: list[list[str]] = [[] for _ in range(ctx.size)]
        owners = state["s_owner"]
        for i in range(len(saved)):
            seq = saved.flat[saved.offsets[i]:saved.offsets[i + 1]]
            owner = int(owners[i])
            count[owner] += 1
            reps[owner].append("-".join(map(str, seq.tolist())))
        strs = [";".join(sorted(r, key=lambda x: (len(x), x)))
                for r in reps]
        return {"n_paths": count, "paths": np.array(strs, dtype=object)}


def links_from_config(graph: Graph, describe: str,
                      node_map=None, **run_kw):
    """Run Links from the reference's links.analyze_config JSON string
    (Links.OPTION_ANALYZE_CONFIG, LinksConditionDescribe.java:33-60).

    ``node_map``: optional vid->original-id array (tpch._node_map) to
    translate ``start_vertexes`` (original ids) into engine v_ids; when
    absent the start ids are taken as v_ids directly."""
    from ..jobspec import parse_links_config
    cfg = parse_links_config(describe)
    starts = np.asarray([int(x) for x in cfg.start_vertexes],
                        dtype=np.int64)
    if node_map is not None:
        nm = np.asarray(node_map)
        pos = np.searchsorted(nm, starts)
        if (pos >= len(nm)).any() or (nm[np.minimum(pos, len(nm) - 1)]
                                      != starts).any():
            raise ValueError("start vertex not present in the graph")
        starts = pos
    return links(graph, starts,
                 spread=cfg.spread or "w_out >= w_in",
                 end_edge=cfg.end_edge, end_vertex=cfg.end_vertex,
                 **run_kw)


def links(graph: Graph, start_nodes, spread: str = "w_out >= w_in",
          end_edge: str | None = None, end_vertex: str | None = None,
          max_supersteps: int = 5, checkpoint_dir: str | None = None,
          checkpoint_every: int = 1, resume: bool = False):
    return run_program(graph, LinksProgram(start_nodes, spread, end_edge,
                                           end_vertex),
                       max_supersteps=max_supersteps,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every, resume=resume)
