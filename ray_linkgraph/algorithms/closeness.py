"""ClosenessCentrality — flooding all-pairs distance propagation.

Conformance spec (/root/reference/computer-algorithm/.../centrality/
closeness/ClosenessCentrality.java:82-173):

superstep 0: every vertex sends (start=self, dist=edge weight, sender=
    self) along all out-edges (weight defaults to 1.0 when the graph has
    no weight column, matching the missing-property default at :169).
superstep s: per vertex v, per distinct start id: take the MIN incoming
    distance; if it improves v's saved map entry (strictly smaller,
    :117-124), update and forward (dist + edge weight) along out-edges,
    skipping the winning sender and the start vertex (:136-141), each
    edge passing an independent sample() draw (:156-159 — ours is a
    seeded counter hash instead of ThreadLocalRandom so runs are
    reproducible; rate 1.0 == always).
output: closeness(v) = sum over map entries of 1/dist
    (ClosenessCentralityOutput.java:50-57).

Vectorization notes: messages use the engine's kv_min combiner (min
dist per (dst, start), ties -> min sender). The reference processes
messages one-at-a-time in arrival order and may forward non-minimal
improvements; those extra messages are provably never improving at the
receiver (the sender's own map entry is already dist - w < anything it
can receive back), so the min-combined schedule reaches bit-identical
per-superstep state.

The per-vertex map is flattened into sorted parallel arrays
(m_vert local idx, m_start global id, m_dist) — checkpointable and
mergeable with one lexsort per superstep.
"""

from __future__ import annotations

import numpy as np

from .._util import uniform01
from ..engine import VertexProgram, run_program
from ..graph import Graph


class ClosenessProgram(VertexProgram):
    combiner = "kv_min"
    mode = "out"

    def __init__(self, sample_rate: float = 1.0, seed: int = 99):
        if not (0.0 < sample_rate <= 1.0):
            raise ValueError("sample_rate must be in (0, 1]")
        self.sample_rate = sample_rate
        self.seed = seed

    def init(self, ctx, g):
        z = np.zeros(0, dtype=np.int64)
        return {"m_vert": z, "m_start": z.copy(),
                "m_dist": np.zeros(0, dtype=np.float64),
                # improvements applied in the LAST superstep (rescatter)
                "f_vert": z.copy(), "f_start": z.copy(),
                "f_dist": np.zeros(0, dtype=np.float64),
                "f_sender": z.copy()}

    def _weights(self, ctx):
        indptr, adj, w = ctx.csr("out")
        return indptr, adj, (w if w is not None
                             else np.ones(len(adj), dtype=np.float64))

    def _forward(self, ctx, vert, start, dist, sender, s):
        """Expand improvements along out-edges with the reference's
        sender/start skip rules and seeded edge sampling."""
        indptr, adj, w = self._weights(ctx)
        deg = np.diff(indptr)
        n = deg[vert]
        total = int(n.sum())
        if total == 0:
            return None, None
        off = np.zeros(len(vert) + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        # edge index per expanded row
        e_idx = (np.repeat(indptr[vert], n)
                 + np.arange(total, dtype=np.int64)
                 - np.repeat(off[:-1], n))
        tgt = adj[e_idx]
        r_start = np.repeat(start, n)
        r_dist = np.repeat(dist, n) + w[e_idx]
        r_sender = np.repeat(sender, n)
        r_self = np.repeat(vert + ctx.lo, n)
        keep = (tgt != r_sender) & (tgt != r_start)
        if self.sample_rate < 1.0:
            u = uniform01(np.uint64(self.seed), np.uint64(s),
                          r_self.astype(np.uint64), tgt.astype(np.uint64),
                          r_start.astype(np.uint64))
            keep &= u < self.sample_rate
        return tgt[keep], {"key": r_start[keep], "val": r_dist[keep],
                           "sender": r_self[keep]}

    def compute0(self, ctx, state, g):
        indptr, adj, w = self._weights(ctx)
        deg = np.diff(indptr)
        src = np.repeat(ctx.vids(), deg)
        dst, payload = adj, {"key": src, "val": w.astype(np.float64),
                             "sender": src}
        keep = dst != src          # defensive: self loops dropped at build
        return dst[keep], {k: v[keep] for k, v in payload.items()}, {}

    def compute(self, ctx, state, inbox, g, s):
        # inbox: min dist per (dst local, start), winner sender attached
        v, start = inbox.dst, inbox.key
        dist, sender = inbox.val, inbox.sender
        drop = (v + ctx.lo) == start          # msgs about self (:112-115)
        v, start, dist, sender = v[~drop], start[~drop], dist[~drop], \
            sender[~drop]
        # current map entries for (v, start): sorted lookup on a packed
        # (local vert, start) key — fits int64 while part_size * V < 2^63
        key_new = v * ctx.V + start
        m_key = state["m_vert"] * ctx.V + state["m_start"]
        if len(m_key):
            pos = np.minimum(np.searchsorted(m_key, key_new),
                             len(m_key) - 1)
            has = m_key[pos] == key_new
            cur = np.where(has, state["m_dist"][pos], np.inf)
        else:
            cur = np.full(len(key_new), np.inf)
        improved = dist < cur
        v, start, dist, sender = v[improved], start[improved], \
            dist[improved], sender[improved]
        # merge improvements into the sorted map
        if len(v):
            allk = np.concatenate([m_key, v * ctx.V + start])
            allv = np.concatenate([state["m_vert"], v])
            alls = np.concatenate([state["m_start"], start])
            alld = np.concatenate([state["m_dist"], dist])
            pref_new = np.r_[np.zeros(len(m_key), dtype=np.int64),
                             np.ones(len(v), dtype=np.int64)]
            order = np.lexsort((-pref_new, allk))   # new rows first per key
            allk, allv, alls, alld = allk[order], allv[order], \
                alls[order], alld[order]
            first = np.r_[0, np.flatnonzero(np.diff(allk) != 0) + 1]
            state["m_vert"] = np.ascontiguousarray(allv[first])
            state["m_start"] = np.ascontiguousarray(alls[first])
            state["m_dist"] = np.ascontiguousarray(alld[first])
        state["f_vert"], state["f_start"] = v, start
        state["f_dist"], state["f_sender"] = dist, sender
        if getattr(ctx, "steps_remaining", 10**9) == 0:
            dst = None        # final superstep: map update above is the
            payload = None    # only observable effect
        else:
            dst, payload = self._forward(ctx, v, start, dist, sender, s)
        if dst is None:
            dst, payload = np.zeros(0, dtype=np.int64), \
                {"key": np.zeros(0, dtype=np.int64),
                 "val": np.zeros(0, dtype=np.float64),
                 "sender": np.zeros(0, dtype=np.int64)}
        return dst, payload, {"improved": int(len(v))}

    def rescatter(self, ctx, state, g, s):
        if s == 0:
            return self.compute0(ctx, state, g)[:2]
        dst, payload = self._forward(ctx, state["f_vert"], state["f_start"],
                                     state["f_dist"], state["f_sender"], s)
        if dst is None:
            dst = np.zeros(0, dtype=np.int64)
            payload = {"key": dst.copy(),
                       "val": np.zeros(0, dtype=np.float64),
                       "sender": dst.copy()}
        return dst, payload

    def output(self, ctx, state):
        inv = np.zeros(ctx.size, dtype=np.float64)
        if len(state["m_vert"]):
            np.add.at(inv, state["m_vert"], 1.0 / state["m_dist"])
        reach = np.bincount(state["m_vert"], minlength=ctx.size) \
            if len(state["m_vert"]) else np.zeros(ctx.size, dtype=np.int64)
        return {"closeness": inv, "reachable": reach.astype(np.int64)}


def closeness_centrality(graph: Graph, sample_rate: float = 1.0,
                         seed: int = 99, max_supersteps: int = 10,
                         checkpoint_dir: str | None = None,
                         checkpoint_every: int = 1, resume: bool = False):
    return run_program(graph, ClosenessProgram(sample_rate, seed),
                       max_supersteps=max_supersteps,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every, resume=resume)
