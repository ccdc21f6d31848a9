"""RingsDetection — directed cycle enumeration, each ring recorded once
at its minimum vertex.

Conformance spec (/root/reference/computer-algorithm/.../path/rings/
RingsDetection.java:49-119):

superstep 0: each vertex sends path [self] along out-edges whose target
    id >= self (:60-67 — id order; vertex ids here are dictionary
    encoded in the reference Id order so int64 compare is exact).
superstep s: per path message [v0, ...] arriving at v:
    * if v == v0: the path closed — record the ring v0..v (path + [v])
      iff v is the minimum id on the path (:80-93);
    * else if v not already on the path: forward path + [v] along
      out-edges whose target >= v0 (:95-113).
output: per vertex the list of rings rooted at it (IdListList,
    RingsDetectionOutput.java:40-52); rings are sorted (length, lexico)
    here for a deterministic output — the reference appends in message
    arrival order, which its own buffer merge leaves unspecified.
"""

from __future__ import annotations

import numpy as np

from ..engine import RaggedCol, VertexProgram, run_program
from ..graph import Graph


class RingsProgram(VertexProgram):
    combiner = "concat"
    mode = "out"

    def init(self, ctx, g):
        z = np.zeros(0, dtype=np.int64)
        return {"r_flat": z, "r_off": np.zeros(1, dtype=np.int64),
                "p_dst": z.copy(), "p_flat": z.copy(),
                "p_off": np.zeros(1, dtype=np.int64)}

    def _out(self, ctx):
        indptr, adj, _ = ctx.csr("out")
        return indptr, adj

    def compute0(self, ctx, state, g):
        indptr, adj = self._out(ctx)
        deg = np.diff(indptr)
        src = np.repeat(ctx.vids(), deg)
        keep = adj >= src                      # only to targets >= self
        dst = adj[keep]
        seqs = RaggedCol(src[keep].copy(),
                         np.arange(len(dst) + 1, dtype=np.int64))
        state["p_dst"] = dst.copy()
        state["p_flat"], state["p_off"] = seqs.flat, seqs.offsets
        return dst, {"seq": seqs}, {}

    def compute(self, ctx, state, inbox, g, s):
        dst = inbox.dst
        empty = RaggedCol(np.zeros(0, dtype=np.int64),
                          np.zeros(1, dtype=np.int64))
        # an empty inbox ships zero payload columns (a partition can
        # legitimately receive no messages at fine partitionings)
        (seqs,) = inbox.cols if inbox.cols else (empty,)
        v_g = dst + ctx.lo
        n = len(dst)
        if n == 0:
            state["p_dst"] = np.zeros(0, dtype=np.int64)
            state["p_flat"], state["p_off"] = empty.flat, empty.offsets
            return np.zeros(0, dtype=np.int64), {"seq": empty}, {}
        origin = seqs.flat[seqs.offsets[:-1]]
        lens = seqs.lengths()
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        # per-message: does the path contain v? and is v the min?
        # (paths always have >= 1 id, so offsets[:-1] is strictly
        # increasing and reduceat segments are exact)
        starts = seqs.offsets[:-1]
        contains = np.add.reduceat(
            (seqs.flat == v_g[row]).astype(np.int64), starts) > 0
        pmin = np.minimum.reduceat(seqs.flat, starts)
        closed = v_g == origin
        # rings: closed and v is the path minimum (v == origin is on the
        # path, so pmin >= v means v is min)
        is_ring = closed & (pmin >= v_g)
        ri = np.flatnonzero(is_ring)
        if len(ri):
            rs = seqs[ri]
            newlens = rs.lengths() + 1
            noff = np.zeros(len(ri) + 1, dtype=np.int64)
            np.cumsum(newlens, out=noff[1:])
            flat = np.empty(noff[-1], dtype=np.int64)
            tail = noff[1:] - 1
            kp = np.ones(noff[-1], dtype=bool)
            kp[tail] = False
            flat[kp] = rs.flat
            flat[tail] = v_g[ri]
            rings = RaggedCol.concat([
                RaggedCol(state["r_flat"], state["r_off"]),
                RaggedCol(flat, noff)])
            state["r_flat"], state["r_off"] = rings.flat, rings.offsets
        # forwards: not closed, not already on path (skipped on the final
        # superstep — nothing can receive them)
        if getattr(ctx, "steps_remaining", 10**9) == 0:
            fi = np.zeros(0, dtype=np.int64)
        else:
            fi = np.flatnonzero(~closed & ~contains)
        fwd_dst = np.zeros(0, dtype=np.int64)
        fwd_seq = empty
        if len(fi):
            fs = seqs[fi]
            fv = v_g[fi]
            forigin = origin[fi]
            indptr, adj = self._out(ctx)
            deg = np.diff(indptr)
            vloc = dst[fi]
            en = deg[vloc]
            total = int(en.sum())
            if total:
                off = np.zeros(len(fi) + 1, dtype=np.int64)
                np.cumsum(en, out=off[1:])
                e_idx = (np.repeat(indptr[vloc], en)
                         + np.arange(total, dtype=np.int64)
                         - np.repeat(off[:-1], en))
                tgt = adj[e_idx]
                rr = np.repeat(np.arange(len(fi), dtype=np.int64), en)
                keep = tgt >= forigin[rr]
                rk, tk = rr[keep], tgt[keep]
                if len(rk):
                    base = fs[rk]
                    nl = base.lengths() + 1
                    noff = np.zeros(len(rk) + 1, dtype=np.int64)
                    np.cumsum(nl, out=noff[1:])
                    flat = np.empty(noff[-1], dtype=np.int64)
                    tail = noff[1:] - 1
                    kp = np.ones(noff[-1], dtype=bool)
                    kp[tail] = False
                    flat[kp] = base.flat
                    flat[tail] = fv[rk]
                    fwd_dst = tk
                    fwd_seq = RaggedCol(flat, noff)
        state["p_dst"] = fwd_dst
        state["p_flat"], state["p_off"] = fwd_seq.flat, fwd_seq.offsets
        return fwd_dst, {"seq": fwd_seq}, {"rings": int(len(ri))}

    def rescatter(self, ctx, state, g, s):
        return state["p_dst"], \
            {"seq": RaggedCol(state["p_flat"], state["p_off"])}

    def output(self, ctx, state):
        rings = RaggedCol(state["r_flat"], state["r_off"])
        count = np.zeros(ctx.size, dtype=np.int64)
        reps: list[list[str]] = [[] for _ in range(ctx.size)]
        for i in range(len(rings)):
            seq = rings.flat[rings.offsets[i]:rings.offsets[i + 1]]
            root = int(seq[0]) - ctx.lo
            count[root] += 1
            reps[root].append("-".join(map(str, seq.tolist())))
        strs = [";".join(sorted(r, key=lambda x: (len(x), x)))
                for r in reps]
        return {"ring_count": count, "rings": np.array(strs, dtype=object)}


class RingsFilterProgram(RingsProgram):
    """RingsDetectionWithFilter — predicate-gated spreading.

    Conformance spec (/root/reference/computer-algorithm/.../rings/
    filter/RingsDetectionWithFilter.java:56-124 +
    RingsDetectionSpreadFilter.java):

    superstep 0: only vertices passing the start-vertex filter send
        [self], along out-edges passing the edge filter ($in-referencing
        expressions skipped — no walked edge yet). NO target>=self
        pruning: filters break rotation symmetry, so every rotation must
        be explored; rings still record only at their min vertex, so
        each directed ring records exactly once.
    superstep s: messages at vertices failing the vertex filter are
        dropped wholesale; otherwise ring-record and containment
        semantics match the unfiltered program, and forwards go along
        out-edges passing the full edge filter with $out = the new
        edge's weight and $in = the message's last-walked edge weight
        (RingsDetectionMessage.walkEdgeProp).
    """

    def __init__(self, spec):
        self.spec = spec

    def _wout(self, ctx):
        indptr, adj, w = ctx.csr("out")
        return indptr, adj, (w if w is not None
                             else np.ones(len(adj), dtype=np.float64))

    def init(self, ctx, g):
        state = super().init(ctx, g)
        state["p_win"] = np.zeros(0, dtype=np.float64)
        return state

    def compute0(self, ctx, state, g):
        indptr, adj, w = self._wout(ctx)
        deg = np.diff(indptr)
        vids = ctx.vids()
        keep = np.repeat(self.spec.start_mask(vids), deg)
        keep &= self.spec.edge_mask0(w)
        dst = adj[keep]
        win = w[keep].astype(np.float64)
        seqs = RaggedCol(np.repeat(vids, deg)[keep].copy(),
                         np.arange(len(dst) + 1, dtype=np.int64))
        state["p_dst"] = dst.copy()
        state["p_flat"], state["p_off"] = seqs.flat, seqs.offsets
        state["p_win"] = win.copy()
        return dst, {"seq": seqs, "win": win}, {}

    def compute(self, ctx, state, inbox, g, s):
        empty = RaggedCol(np.zeros(0, dtype=np.int64),
                          np.zeros(1, dtype=np.int64))
        zf = np.zeros(0, dtype=np.float64)
        zi = np.zeros(0, dtype=np.int64)
        dst = inbox.dst
        if len(inbox.cols) == 2:       # sorted payload keys: seq, win
            seqs, win = inbox.cols
        else:
            seqs, win = empty, zf
        # vertex filter gates ALL processing at the vertex (:78)
        if len(dst):
            vok = self.spec.vertex_mask(dst + ctx.lo)
            ki = np.flatnonzero(vok)
            dst, seqs, win = dst[ki], seqs[ki], win[ki]
        v_g = dst + ctx.lo
        n = len(dst)
        if n == 0:
            state["p_dst"], state["p_win"] = zi, zf
            state["p_flat"], state["p_off"] = empty.flat, empty.offsets
            return zi, {"seq": empty, "win": zf}, {}
        origin = seqs.flat[seqs.offsets[:-1]]
        starts = seqs.offsets[:-1]
        row = np.repeat(np.arange(n, dtype=np.int64), seqs.lengths())
        contains = np.add.reduceat(
            (seqs.flat == v_g[row]).astype(np.int64), starts) > 0
        pmin = np.minimum.reduceat(seqs.flat, starts)
        closed = v_g == origin
        is_ring = closed & (pmin >= v_g)
        ri = np.flatnonzero(is_ring)
        if len(ri):
            rs = seqs[ri]
            newlens = rs.lengths() + 1
            noff = np.zeros(len(ri) + 1, dtype=np.int64)
            np.cumsum(newlens, out=noff[1:])
            flat = np.empty(noff[-1], dtype=np.int64)
            tail = noff[1:] - 1
            kp = np.ones(noff[-1], dtype=bool)
            kp[tail] = False
            flat[kp] = rs.flat
            flat[tail] = v_g[ri]
            rings = RaggedCol.concat([
                RaggedCol(state["r_flat"], state["r_off"]),
                RaggedCol(flat, noff)])
            state["r_flat"], state["r_off"] = rings.flat, rings.offsets
        if getattr(ctx, "steps_remaining", 10**9) == 0:
            fi = zi
        else:
            fi = np.flatnonzero(~closed & ~contains)
        fwd_dst, fwd_seq, fwd_win = zi, empty, zf
        if len(fi):
            fs, fv, fwin = seqs[fi], v_g[fi], win[fi]
            indptr, adj, w = self._wout(ctx)
            deg = np.diff(indptr)
            vloc = dst[fi]
            en = deg[vloc]
            total = int(en.sum())
            if total:
                off = np.zeros(len(fi) + 1, dtype=np.int64)
                np.cumsum(en, out=off[1:])
                e_idx = (np.repeat(indptr[vloc], en)
                         + np.arange(total, dtype=np.int64)
                         - np.repeat(off[:-1], en))
                tgt, ew = adj[e_idx], w[e_idx]
                rr = np.repeat(np.arange(len(fi), dtype=np.int64), en)
                keep = self.spec.edge_mask(ew, fwin[rr])
                rk, tk = rr[keep], tgt[keep]
                if len(rk):
                    base = fs[rk]
                    nl = base.lengths() + 1
                    noff = np.zeros(len(rk) + 1, dtype=np.int64)
                    np.cumsum(nl, out=noff[1:])
                    flat = np.empty(noff[-1], dtype=np.int64)
                    tail = noff[1:] - 1
                    kp = np.ones(noff[-1], dtype=bool)
                    kp[tail] = False
                    flat[kp] = base.flat
                    flat[tail] = fv[rk]
                    fwd_dst = tk
                    fwd_seq = RaggedCol(flat, noff)
                    fwd_win = ew[keep].astype(np.float64)
        state["p_dst"], state["p_win"] = fwd_dst, fwd_win
        state["p_flat"], state["p_off"] = fwd_seq.flat, fwd_seq.offsets
        return fwd_dst, {"seq": fwd_seq, "win": fwd_win}, \
            {"rings": int(len(ri))}

    def rescatter(self, ctx, state, g, s):
        return state["p_dst"], \
            {"seq": RaggedCol(state["p_flat"], state["p_off"]),
             "win": state["p_win"]}


def rings_detection(graph: Graph, max_supersteps: int = 6,
                    checkpoint_dir: str | None = None,
                    checkpoint_every: int = 1, resume: bool = False):
    return run_program(graph, RingsProgram(),
                       max_supersteps=max_supersteps,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every, resume=resume)


def rings_detection_with_filter(graph: Graph, describe: str,
                                max_supersteps: int = 6,
                                checkpoint_dir: str | None = None,
                                checkpoint_every: int = 1,
                                resume: bool = False):
    """``describe``: the reference's rings.property_filter JSON string
    (RingsDetectionWithFilter.OPTION_FILTER), parsed by
    jobspec.parse_rings_filter."""
    from ..jobspec import RingsFilterSpec, parse_rings_filter
    spec = describe if isinstance(describe, RingsFilterSpec) \
        else parse_rings_filter(describe)
    return run_program(graph, RingsFilterProgram(spec),
                       max_supersteps=max_supersteps,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every, resume=resume)
