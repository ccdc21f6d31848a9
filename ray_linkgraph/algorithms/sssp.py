"""Multi-source shortest paths with the reference's relax/rebroadcast rule.

Conformance spec (/root/reference/computer-algorithm/.../path/sssp/
Sssp.java:57-127, min combiner per SsspParams):

superstep 0: value = -1 (unreached sentinel); source vertices set value
             0 and send edge weight (default 1.0 when no weight
             property) along out-edges; inactivate.
superstep s: m = min(messages); adopt when m < value or value < 0;
             then EVERY message-receiving vertex re-sends value+weight
             along all out-edges (the reference rebroadcasts on receive,
             not on improvement — Sssp.java:105-126 — so cyclic graphs
             run until max_super_step; we reproduce that).

Output column ``distance`` keeps the reference's -1.0 for unreached.
"""

from __future__ import annotations

import numpy as np

from ..engine import VertexProgram, run_program
from ..graph import Graph


class SsspProgram(VertexProgram):
    combiner = "min"
    mode = "out"

    def __init__(self, source_ids):
        self.source_ids = np.asarray(sorted(source_ids), dtype=np.int64)

    def init(self, ctx, g):
        dist = np.full(ctx.size, np.inf)
        received = np.zeros(ctx.size, dtype=bool)
        local = self.source_ids[(self.source_ids >= ctx.lo)
                                & (self.source_ids < ctx.hi)] - ctx.lo
        dist[local] = 0.0
        return {"dist": dist, "received": received}

    def _weights(self, ctx):
        indptr, adj, w = ctx.csr("out")
        if w is None:
            w = np.ones(len(adj))
        return indptr, adj, w

    def _scatter(self, ctx, dist, senders_mask):
        indptr, adj, w = self._weights(ctx)
        deg = np.diff(indptr)
        edge_mask = np.repeat(senders_mask, deg)
        vals = np.repeat(dist, deg)[edge_mask] + w[edge_mask]
        return adj[edge_mask], {"val": vals}

    def compute0(self, ctx, state, g):
        senders = np.isfinite(state["dist"])  # the sources
        dst, payload = self._scatter(ctx, state["dist"], senders)
        return dst, payload, {"reached": int(senders.sum())}

    def compute(self, ctx, state, inbox, g, s):
        dist = state["dist"]
        m = inbox.min
        improve = inbox.mask & (m < dist)
        dist[improve] = m[improve]
        state["received"] = inbox.mask
        # rebroadcast from every receiver (reference behavior)
        dst, payload = self._scatter(ctx, dist, inbox.mask)
        return dst, payload, {"reached": int(np.isfinite(dist).sum()),
                              "improved": int(improve.sum())}

    def rescatter(self, ctx, state, g, s):
        mask = (np.isfinite(state["dist"]) if s == 0
                else state["received"].astype(bool))
        return self._scatter(ctx, state["dist"], mask)

    def output(self, ctx, state):
        d = state["dist"]
        return {"distance": np.where(np.isfinite(d), d, -1.0)}


def sssp(graph: Graph, source_ids, max_supersteps: int = 10,
         checkpoint_dir: str | None = None, checkpoint_every: int = 1,
         resume: bool = False):
    return run_program(graph, SsspProgram(source_ids),
                       max_supersteps=max_supersteps,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every, resume=resume)
