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
        (seqs,) = inbox.cols
        v_g = dst + ctx.lo
        n = len(dst)
        empty = RaggedCol(np.zeros(0, dtype=np.int64),
                          np.zeros(1, dtype=np.int64))
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


def rings_detection(graph: Graph, max_supersteps: int = 6,
                    checkpoint_dir: str | None = None,
                    checkpoint_every: int = 1, resume: bool = False):
    return run_program(graph, RingsProgram(),
                       max_supersteps=max_supersteps,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every, resume=resume)
