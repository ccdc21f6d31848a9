"""Weakly-connected components: frontier min-Id propagation.

Conformance spec (/root/reference/computer-algorithm/.../community/wcc/
Wcc.java:47-72, min combiner per WccParams.java:40):

superstep 0: value = min(own id, neighbor ids); send value to neighbors
             with larger id; inactivate.
superstep s: m = min(messages); if m < value: adopt + send to all
             neighbors; inactivate.
terminates when no messages are in flight.

Undirected semantics come from the symmetrized ("both") adjacency, the
analog of input.vertex_with_edges_bothdirection
(/root/reference/computer-core/.../config/ComputerOptions.java:933-939).
Min over int64 v_ids equals min in the reference's BytesId order
(length-first byte order) because the dictionary assigns ids in that
order — see graph.py.

Per-round values are identical to naive round-synchronous
min-of-neighbors (the SQL oracle's formulation): a neighbor that did not
change this round already delivered its value the round it last changed.
"""

from __future__ import annotations

import numpy as np

from ..engine import VertexProgram, run_program
from ..graph import Graph

I64MAX = np.iinfo(np.int64).max


def _seg_min(indptr: np.ndarray, values: np.ndarray, size: int) -> np.ndarray:
    """Per-vertex min over CSR segments; I64MAX for empty segments."""
    out = np.full(size, I64MAX, dtype=np.int64)
    deg = np.diff(indptr)
    ne = deg > 0
    if ne.any():
        starts = indptr[:-1][ne]
        out[ne] = np.minimum.reduceat(values, starts)
    return out


class WccProgram(VertexProgram):
    combiner = "min"
    mode = "both"

    def init(self, ctx, g):
        return {"component": np.zeros(ctx.size, dtype=np.int64),
                "changed": np.zeros(ctx.size, dtype=bool)}

    def compute0(self, ctx, state, g):
        indptr, adj, _ = ctx.csr("both")
        vids = ctx.vids()
        comp = np.minimum(vids, _seg_min(indptr, adj, ctx.size))
        state["component"] = comp
        state["changed"] = np.ones(ctx.size, dtype=bool)
        # send own value to neighbors with larger id (Wcc.java:52-55)
        deg = np.diff(indptr)
        vals = np.repeat(comp, deg)
        mask = vals < adj
        return adj[mask], {"val": vals[mask]}, {"changed": int(ctx.size)}

    def compute(self, ctx, state, inbox, g, s):
        comp = state["component"]
        m = inbox.min  # dense int64, I64MAX where no message
        changed = inbox.mask & (m < comp)
        comp[changed] = m[changed]
        state["changed"] = changed
        indptr, adj, _ = ctx.csr("both")
        deg = np.diff(indptr)
        edge_mask = np.repeat(changed, deg)
        vals = np.repeat(comp, deg)[edge_mask]
        return adj[edge_mask], {"val": vals}, {"changed": int(changed.sum())}

    def rescatter(self, ctx, state, g, s):
        indptr, adj, _ = ctx.csr("both")
        deg = np.diff(indptr)
        changed = state["changed"].astype(bool)
        comp = state["component"]
        if s == 0:
            vals = np.repeat(comp, deg)
            mask = vals < adj
            return adj[mask], {"val": vals[mask]}
        edge_mask = np.repeat(changed, deg)
        vals = np.repeat(comp, deg)[edge_mask]
        return adj[edge_mask], {"val": vals}

    def output(self, ctx, state):
        return {"component": state["component"]}


def wcc(graph: Graph, max_supersteps: int = 10**6,
        checkpoint_dir: str | None = None, checkpoint_every: int = 1,
        resume: bool = False):
    """Runs to fixpoint (engine stops when no messages are in flight)."""
    return run_program(graph, WccProgram(), max_supersteps=max_supersteps,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every, resume=resume)
