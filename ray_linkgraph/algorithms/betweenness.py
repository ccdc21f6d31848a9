"""BetweennessCentrality — the reference's path-enumeration vote scheme
(NOT Brandes).

Conformance spec (/root/reference/computer-algorithm/.../centrality/
betweenness/BetweennessCentrality.java:97-219):

superstep 0: value = 0, arrived = {self}; send sequence [self] along all
    out-edges (:99-113, unsampled).
superstep s: messages carry either a vote (double) or a path sequence.
    * betweenness += sum of incoming votes (:121-127).
    * per path message [source, ...mids]: process only when the source
      has NOT arrived at this vertex in an earlier superstep and the
      pre-superstep arrived count is below store_perf (:152-155 — the
      size() check reads the PRE-superstep set because arrivals merge
      after the loop, so the cap is deterministic). Count totalCount per
      source and idCount per intermediate (:157-165); forward
      seq + [self] along out-edges whose target is not already in the
      sequence, each edge passing a sample draw (:167-175; ours is a
      seeded counter hash, rate 1.0 == always).
    * per (source, intermediate): send vote idCount/totalCount to the
      intermediate (:178-188).

Deviation: store_perf defaults to UNLIMITED here (the reference's
default 64 makes results depend on intra-superstep arrival order once a
vertex has seen 64 sources — non-deterministic there; our cap applies
deterministically to whole supersteps and is available via the
store_perf argument).

All shortest paths from a source reach a vertex at the same superstep
(= BFS level), which is why same-superstep multiplicity counting equals
shortest-path counting.
"""

from __future__ import annotations

import numpy as np

from .._util import uniform01
from ..engine import RaggedCol, VertexProgram, run_program
from ..graph import Graph


class BetweennessProgram(VertexProgram):
    combiner = "concat"
    mode = "out"

    def __init__(self, sample_rate: float = 1.0, seed: int = 107,
                 store_perf: int | None = None):
        if not (0.0 < sample_rate <= 1.0):
            raise ValueError("sample_rate must be in (0, 1]")
        self.sample_rate = sample_rate
        self.seed = seed
        self.store_perf = store_perf

    def init(self, ctx, g):
        z = np.zeros(0, dtype=np.int64)
        return {"betweenness": np.zeros(ctx.size, dtype=np.float64),
                # arrived (vertex local, source) pairs, sorted by packed key
                "a_vert": z, "a_src": z.copy(),
                # forwarded paths of the LAST superstep (for rescatter):
                # destination + ragged sequences, plus last votes
                "p_dst": z.copy(), "p_flat": z.copy(),
                "p_off": np.zeros(1, dtype=np.int64),
                "v_dst": z.copy(), "v_val": np.zeros(0, dtype=np.float64)}

    # -- helpers -------------------------------------------------------------
    def _out(self, ctx):
        indptr, adj, _ = ctx.csr("out")
        return indptr, adj

    def _expand_forward(self, ctx, vert, seqs: RaggedCol, s):
        """seq + [self] forwarded along out-edges, skipping targets
        already in the sequence, sampled."""
        indptr, adj = self._out(ctx)
        deg = np.diff(indptr)
        n = deg[vert]
        total = int(n.sum())
        empty = (np.zeros(0, dtype=np.int64),
                 RaggedCol(np.zeros(0, dtype=np.int64),
                           np.zeros(1, dtype=np.int64)))
        if total == 0:
            return empty
        off = np.zeros(len(vert) + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        e_idx = (np.repeat(indptr[vert], n)
                 + np.arange(total, dtype=np.int64)
                 - np.repeat(off[:-1], n))
        tgt = adj[e_idx]
        row = np.repeat(np.arange(len(vert), dtype=np.int64), n)
        self_g = vert + ctx.lo
        # membership: target in (seq + [self])?
        lens = seqs.lengths()
        in_seq = np.zeros(total, dtype=bool)
        # group rows by sequence length, vectorized per length bucket
        for L in np.unique(lens):
            sel = lens[row] == L
            if not sel.any():
                continue
            rows_l = row[sel]
            mat = seqs.flat[(seqs.offsets[rows_l][:, None]
                             + np.arange(L)[None, :])] if L else \
                np.zeros((sel.sum(), 0), dtype=np.int64)
            in_seq[sel] = (mat == tgt[sel][:, None]).any(axis=1)
        keep = ~in_seq & (tgt != self_g[row])
        if self.sample_rate < 1.0:
            u = uniform01(np.uint64(self.seed), np.uint64(s),
                          self_g[row].astype(np.uint64),
                          tgt.astype(np.uint64))
            keep &= u < self.sample_rate
        rows_k = row[keep]
        tgt_k = tgt[keep]
        if len(rows_k) == 0:
            return empty
        # new sequences: seq[rows_k] + [self]
        base = seqs[rows_k]
        newlens = base.lengths() + 1
        newoff = np.zeros(len(rows_k) + 1, dtype=np.int64)
        np.cumsum(newlens, out=newoff[1:])
        flat = np.empty(newoff[-1], dtype=np.int64)
        tail = newoff[1:] - 1
        keep_pos = np.ones(newoff[-1], dtype=bool)
        keep_pos[tail] = False
        flat[keep_pos] = base.flat
        flat[tail] = self_g[rows_k]
        return tgt_k, RaggedCol(flat, newoff)

    # -- contract ------------------------------------------------------------
    def compute0(self, ctx, state, g):
        indptr, adj = self._out(ctx)
        deg = np.diff(indptr)
        vids = ctx.vids()
        state["a_vert"] = np.arange(ctx.size, dtype=np.int64)
        state["a_src"] = vids.copy()
        src = np.repeat(vids, deg)
        seqs = RaggedCol(src.copy(), np.arange(len(src) + 1,
                                               dtype=np.int64))
        state["p_dst"] = adj.copy()
        state["p_flat"] = seqs.flat
        state["p_off"] = seqs.offsets
        payload = {"seq": seqs,
                   "vote": np.zeros(len(adj), dtype=np.float64)}
        return adj, payload, {}

    def compute(self, ctx, state, inbox, g, s):
        dst = inbox.dst                      # local, unsorted
        if len(inbox.cols) == 2:
            seqs, votes = inbox.cols         # sorted payload keys: seq, vote
        else:                                # empty inbox
            seqs = RaggedCol(np.zeros(0, dtype=np.int64),
                             np.zeros(1, dtype=np.int64))
            votes = np.zeros(0, dtype=np.float64)
        # 1) votes accumulate
        if len(dst):
            state["betweenness"] += np.bincount(dst, weights=votes,
                                                minlength=ctx.size)
        remaining = getattr(ctx, "steps_remaining", 10**9)
        if remaining == 0:
            # final superstep: nothing sent now can be observed — votes
            # above are the only output-visible effect
            e = np.zeros(0, dtype=np.int64)
            empty_seq = RaggedCol(e, np.zeros(1, dtype=np.int64))
            state["p_dst"], state["p_flat"] = e, empty_seq.flat
            state["p_off"] = empty_seq.offsets
            state["v_dst"] = e.copy()
            state["v_val"] = np.zeros(0, dtype=np.float64)
            return e, {"seq": empty_seq,
                       "vote": np.zeros(0, dtype=np.float64)}, {}
        # 2) path messages (row indices composed so the expensive ragged
        # gather happens ONCE, on the final kept+ordered selection)
        lens = seqs.lengths()
        pi = np.flatnonzero(lens > 0)
        v = dst[pi]
        source = (seqs.flat[seqs.offsets[:-1][pi]] if len(pi)
                  else np.zeros(0, dtype=np.int64))
        # first-arrival + store_perf gate (pre-superstep arrived state)
        a_key = state["a_vert"] * ctx.V + state["a_src"]
        key = v * ctx.V + source
        if len(a_key):
            pos = np.minimum(np.searchsorted(a_key, key),
                             len(a_key) - 1)
            seen = a_key[pos] == key
        else:
            seen = np.zeros(len(key), dtype=bool)
        ok = ~seen
        if self.store_perf is not None:
            a_count = np.bincount(state["a_vert"], minlength=ctx.size)
            ok &= a_count[v] < self.store_perf
        oki = np.flatnonzero(ok)
        v, source, key = v[oki], source[oki], key[oki]
        # 3) per (v, source): totalCount and idCount over intermediates
        votes_dst = np.zeros(0, dtype=np.int64)
        votes_val = np.zeros(0, dtype=np.float64)
        sel = np.zeros(0, dtype=np.int64)
        if len(v):
            order = np.argsort(key, kind="stable")
            v, source, key = v[order], source[order], key[order]
            sel = pi[oki][order]              # inbox row per kept message
            runs = np.r_[0, np.flatnonzero(np.diff(key) != 0) + 1]
            totals = np.diff(np.r_[runs, len(key)])
            grp_of_msg = np.repeat(np.arange(len(runs)), totals)
            # intermediates: positions 1.. of each sequence, pulled
            # straight from the inbox flat — the full sequences are only
            # materialized (ragged-gathered) when they will be forwarded
            L = lens[sel]
            mid_n = np.maximum(L - 1, 0)
            mid_total = int(mid_n.sum())
            if mid_total:
                moff = np.zeros(len(v) + 1, dtype=np.int64)
                np.cumsum(mid_n, out=moff[1:])
                mpos = (np.repeat(seqs.offsets[:-1][sel] + 1, mid_n)
                        + np.arange(mid_total, dtype=np.int64)
                        - np.repeat(moff[:-1], mid_n))
                mids = seqs.flat[mpos]
                mgrp = np.repeat(grp_of_msg, mid_n)
                # ONE mid-major sort covers both reduction levels:
                # (mid, grp) runs give idCount per (group, mid); mid
                # runs give the per-destination map-side combine (votes
                # are pure sums at the receiver — the reference ships
                # one message per (source, mid), 29.6M rows at the sf0.1
                # bench, vs <=V combined rows here). Within a mid run
                # the pairs stay grp-ascending, so the left-to-right
                # float summation order — and the result — is identical
                # to the previous grp-major + per-dst-argsort pass.
                o2 = np.lexsort((mgrp, mids))
                mid_s, grp_s = mids[o2], mgrp[o2]
                pair = np.r_[0, np.flatnonzero((np.diff(mid_s) != 0) |
                                               (np.diff(grp_s) != 0)) + 1]
                cnt = np.diff(np.r_[pair, len(mid_s)])
                pair_vote = cnt / totals[grp_s[pair]]
                pmid = mid_s[pair]
                first = np.r_[0, np.flatnonzero(np.diff(pmid) != 0) + 1]
                votes_dst = pmid[first]
                votes_val = np.add.reduceat(pair_vote, first)
            # 4) merge new arrivals (distinct (v, source))
            nv, ns = v[runs], source[runs]
            av = np.concatenate([state["a_vert"], nv])
            asrc = np.concatenate([state["a_src"], ns])
            o3 = np.argsort(av * ctx.V + asrc, kind="stable")
            state["a_vert"], state["a_src"] = av[o3], asrc[o3]
        # 5) forwards — pointless when the step they'd arrive at is the
        # final one (paths only matter via votes one step later)
        fwd_dst, fwd_seq = self._expand_forward(ctx, v, seqs[sel], s) \
            if len(v) and remaining > 1 else \
            (np.zeros(0, dtype=np.int64),
             RaggedCol(np.zeros(0, dtype=np.int64),
                       np.zeros(1, dtype=np.int64)))
        out_dst = np.concatenate([fwd_dst, votes_dst])
        out_seq = RaggedCol.concat([
            fwd_seq, RaggedCol(np.zeros(0, dtype=np.int64),
                               np.zeros(len(votes_dst) + 1,
                                        dtype=np.int64))])
        out_vote = np.concatenate([np.zeros(len(fwd_dst)), votes_val])
        state["p_dst"] = fwd_dst
        state["p_flat"], state["p_off"] = fwd_seq.flat, fwd_seq.offsets
        state["v_dst"], state["v_val"] = votes_dst, votes_val
        return out_dst, {"seq": out_seq, "vote": out_vote}, \
            {"paths": int(len(v))}

    def rescatter(self, ctx, state, g, s):
        fwd = RaggedCol(state["p_flat"], state["p_off"])
        nv = len(state["v_dst"])
        dst = np.concatenate([state["p_dst"], state["v_dst"]])
        seq = RaggedCol.concat([
            fwd, RaggedCol(np.zeros(0, dtype=np.int64),
                           np.zeros(nv + 1, dtype=np.int64))])
        vote = np.concatenate([np.zeros(len(state["p_dst"])),
                               state["v_val"]])
        return dst, {"seq": seq, "vote": vote}

    def output(self, ctx, state):
        return {"betweenness": state["betweenness"]}


def betweenness_centrality(graph: Graph, sample_rate: float = 1.0,
                           seed: int = 107, store_perf: int | None = None,
                           max_supersteps: int = 6,
                           checkpoint_dir: str | None = None,
                           checkpoint_every: int = 1, resume: bool = False):
    return run_program(graph,
                       BetweennessProgram(sample_rate, seed, store_perf),
                       max_supersteps=max_supersteps,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every, resume=resume)
