"""K-core peeling.

Conformance spec (/root/reference/computer-algorithm/.../community/kcore/
KCore.java:55-92, k default 3):

superstep 0: core = degree; if core < k: core = 0 ("deleted") and
             announce deletion to all neighbors; inactivate.
superstep s: deleted vertices ignore messages; alive vertices decrease
             core by the number of deletions received; if core drops
             below k: core = 0 and announce. Terminates when no
             deletions propagate.

Deletion announcements carry no payload beyond their count, so the sum
combiner (count per dst) is exact. The reference skips sending to
already-deleted neighbors (sendMessageToAllEdgesIf with its
deleted-neighbor set, KCore.java:79-88) purely as a message-volume
optimization; we send to all neighbors — deleted receivers ignore — and
the resulting core values are identical.

Output: ``core`` = remaining degree within the k-core (0 when peeled),
matching KCoreValue semantics.
"""

from __future__ import annotations

import numpy as np

from ..engine import VertexProgram, run_program
from ..graph import Graph


class KCoreProgram(VertexProgram):
    combiner = "sum"
    mode = "both"

    def __init__(self, k: int = 3):
        self.k = k

    def init(self, ctx, g):
        return {"core": np.zeros(ctx.size, dtype=np.int64),
                "doomed": np.zeros(ctx.size, dtype=bool)}

    def _announce(self, ctx, doomed):
        indptr, adj, _ = ctx.csr("both")
        deg = np.diff(indptr)
        edge_mask = np.repeat(doomed, deg)
        return adj[edge_mask], {"val": np.ones(int(edge_mask.sum()))}

    def compute0(self, ctx, state, g):
        core = ctx.degrees("both").astype(np.int64)
        doomed = core < self.k
        core[doomed] = 0
        state["core"] = core
        state["doomed"] = doomed
        dst, payload = self._announce(ctx, doomed)
        return dst, payload, {"deleted": int(doomed.sum())}

    def compute(self, ctx, state, inbox, g, s):
        core = state["core"]
        alive = core > 0
        deletions = inbox.sum.astype(np.int64)
        core[alive] -= deletions[alive]
        doomed = alive & (core < self.k)
        core[doomed] = 0
        state["doomed"] = doomed
        dst, payload = self._announce(ctx, doomed)
        return dst, payload, {"deleted": int(doomed.sum())}

    def rescatter(self, ctx, state, g, s):
        return self._announce(ctx, state["doomed"].astype(bool))

    def output(self, ctx, state):
        return {"core": state["core"]}


def kcore(graph: Graph, k: int = 3, max_supersteps: int = 10**6,
          checkpoint_dir: str | None = None, checkpoint_every: int = 1,
          resume: bool = False):
    return run_program(graph, KCoreProgram(k), max_supersteps=max_supersteps,
                       checkpoint_dir=checkpoint_dir,
                       checkpoint_every=checkpoint_every, resume=resume)
