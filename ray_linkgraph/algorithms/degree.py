"""Degree centrality: single-superstep, no messages.

Conformance spec (/root/reference/computer-algorithm/.../centrality/
degree/DegreeCentrality.java:61-113): value = number of adjacent edges,
or the sum of an edge weight property when configured. Direction follows
the loaded adjacency (out-edges by default; "both" when symmetrized).
"""

from __future__ import annotations

import numpy as np

from ..engine import VertexProgram, run_program
from ..graph import Graph


class DegreeProgram(VertexProgram):
    combiner = "sum"

    def __init__(self, mode: str = "out", weighted: bool = False):
        self.mode = mode
        self.weighted = weighted

    def init(self, ctx, g):
        return {}

    def compute0(self, ctx, state, g):
        if self.weighted:
            indptr, _, w = ctx.csr(self.mode)
            if w is None:
                raise ValueError("graph has no weight column")
            sums = np.zeros(ctx.size, dtype=np.float64)
            ne = np.diff(indptr) > 0
            if ne.any():
                sums[ne] = np.add.reduceat(w, indptr[:-1][ne])
            state["degree"] = sums
        else:
            state["degree"] = ctx.degrees(self.mode).astype(np.int64)
        return None, {}, {}

    def compute(self, ctx, state, inbox, g, s):  # pragma: no cover
        return None, {}, {}

    def rescatter(self, ctx, state, g, s):
        return None, {}

    def output(self, ctx, state):
        return {"degree": state["degree"]}


def degree_centrality(graph: Graph, mode: str = "out", weighted: bool = False):
    """One superstep, zero messages: the engine stops after compute0."""
    return run_program(graph, DegreeProgram(mode, weighted), max_supersteps=1,
                       checkpoint_dir=None, checkpoint_every=0)
