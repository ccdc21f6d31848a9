"""BSP superstep engine on a stateful partition-actor pool.

The execution model reproduces the reference's synchronous supersteps
(/root/reference/computer-core/.../worker/WorkerService.java:287-338 ↔
MasterService.java:240-288) with Ray-native machinery:

* one ``PartitionWorker`` actor per hash partition holds the partition's
  CSR adjacency (built once in ``__init__`` from the graph's partitioned
  parquet, the analog of FileGraphPartition's vertex/edge files,
  /root/reference/computer-core/.../compute/FileGraphPartition.java:81-98)
  plus the algorithm's vertex-state numpy arrays (value + frontier,
  the analog of the value/status double-buffer files, ibid.:640-661);
* the per-superstep message exchange is a hash-partitioned reduce on dst
  vertex with **map-side combining**: each actor pre-combines its
  outgoing messages per destination partition (sort + reduceat — the
  analog of the reference's sort-with-combiner send buffers,
  /root/reference/computer-core/.../sender/MessageSendManager.java:99-239),
  ships one small object per (src-part, dst-part) pair through the
  object store, and the receiver finishes the combine. Pre-combining
  per source partition is the skew treatment for hub dst vertices: a
  vertex with 10^6 in-edges receives at most P pre-combined values, not
  10^6 messages (equivalent to salting the hot key by source partition);
* global aggregators are small dicts returned from each actor and
  reduced on the driver (the analog of worker→master aggregator RPC,
  /root/reference/computer-core/.../aggregator/WorkerAggrManager.java);
* the driver barrier between supersteps is the BSP barrier (no etcd);
* after every superstep each actor checkpoints its post-apply state to
  parquet and the driver commits an atomic per-step manifest with
  per-partition lineage (file, rows, sha256, message counts) + metrics,
  so runs resume mid-iteration (the reference only supports resuming at
  the input/compute step boundary, MasterService.java:191-213 TODO).

Messages between partitions are (dst_local:int32, value...) numpy tuples
— Plasma gives zero-copy reads on the receiving side.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ._util import hash_u64
from .graph import Graph
from .synth import synth_edges_for_range

I64MAX = np.iinfo(np.int64).max


# ---------------------------------------------------------------------------
# combiners: map-side precombine + receive-side final combine
# ---------------------------------------------------------------------------

def _state_checksum(state: dict) -> str:
    """Fast vectorized content checksum for checkpoint lineage (position-
    sensitive splitmix64 mix — integrity marker, not cryptographic)."""
    acc = np.uint64(0x5851F42D4C957F2D)
    with np.errstate(over="ignore"):
        for k in sorted(state):
            a = np.ascontiguousarray(state[k])
            raw = a.view(np.uint8)
            pad = (-len(raw)) % 8
            if pad:
                raw = np.concatenate([raw, np.zeros(pad, dtype=np.uint8)])
            words = raw.view(np.uint64)
            mixed = hash_u64(words,
                             np.arange(len(words), dtype=np.uint64))
            acc = acc * np.uint64(31) + np.uint64(
                int(np.bitwise_xor.reduce(mixed)) + len(k)
                if len(mixed) else len(k))
    return f"{int(acc):016x}"


def _runs(sorted_arr: np.ndarray) -> np.ndarray:
    """Start indices of equal-value runs in a sorted array."""
    if len(sorted_arr) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.r_[0, np.flatnonzero(np.diff(sorted_arr)) + 1]


def precombine(kind: str, dst_local: np.ndarray, payload: dict):
    """Combine duplicate dst keys before shipping. ``dst_local`` must be
    sorted ascending already (the router sorts by global dst)."""
    if len(dst_local) == 0:
        return None
    if kind == "sum":
        starts = _runs(dst_local)
        return (dst_local[starts], np.add.reduceat(payload["val"], starts))
    if kind == "min":
        starts = _runs(dst_local)
        return (dst_local[starts], np.minimum.reduceat(payload["val"], starts))
    if kind == "label_count":
        lab = payload["label"]
        order = np.lexsort((lab, dst_local))
        d, l = dst_local[order], lab[order]
        change = np.r_[0, np.flatnonzero((np.diff(d) != 0) | (np.diff(l) != 0)) + 1]
        cnt = np.diff(np.r_[change, len(d)]).astype(np.int64)
        return (d[change], l[change], cnt)
    if kind == "concat":
        return (dst_local,) + tuple(payload[k] for k in sorted(payload))
    raise ValueError(kind)


class Inbox:
    """Receive-side combined view of one partition's incoming messages.

    Sum inboxes come in two wire formats chosen by the sender per
    (src-part, dst-part) pair: sparse ``(dst_local, values)`` when few
    dsts received, or a DENSE partial array (marker ``("D", array)``)
    when most of the destination partition received — dense partials
    cost O(part_size) sequential adds to merge, versus O(nnz) bincount
    scatter for sparse, and avoid shipping dst indices entirely. For
    dense-format inboxes the per-vertex received mask is not transported
    (programs using the EdgeScatter fast path broadcast from every
    vertex and must not depend on ``mask``)."""

    def __init__(self, kind: str, size: int, parts: list):
        self.kind = kind
        self.size = size
        self.n_msgs = 0
        self._mask = None
        parts = [p for p in parts if p is not None and
                 (isinstance(p[0], str) or len(p[0]))]
        if kind == "sum":
            dense_parts = [p[1] for p in parts if isinstance(p[0], str)]
            sparse = [p for p in parts if not isinstance(p[0], str)]
            acc = np.zeros(size, dtype=np.float64)
            for arr in dense_parts:
                acc += arr
                self.n_msgs += size
            if sparse:
                # single bincount over the concatenation: O(nnz + size),
                # not O(P * size) as a per-inbox pass would be
                d = np.concatenate([p[0] for p in sparse])
                v = np.concatenate([p[1] for p in sparse])
                self.n_msgs += len(d)
                acc += np.bincount(d, weights=v, minlength=size)
                self._sparse_d = d
            else:
                self._sparse_d = np.zeros(0, dtype=np.int64)
            self._has_dense = bool(dense_parts)
            self.sum = acc
        elif kind == "min":
            if parts:
                d = np.concatenate([p[0] for p in parts])
                v = np.concatenate([p[1] for p in parts])
                self.n_msgs = len(d)
                order = np.argsort(d, kind="stable")
                d, v = d[order], v[order]
                starts = _runs(d)
                ud, mv = d[starts], np.minimum.reduceat(v, starts)
            else:
                ud = np.zeros(0, dtype=np.int64)
                mv = np.zeros(0, dtype=np.float64)
            if np.issubdtype(mv.dtype, np.integer):
                dense = np.full(size, np.iinfo(mv.dtype).max, dtype=mv.dtype)
            else:
                dense = np.full(size, np.inf, dtype=mv.dtype)
            dense[ud] = mv
            self._mask = np.zeros(size, dtype=bool)
            self._mask[ud] = True
            self.min = dense
        elif kind == "label_count":
            if parts:
                d = np.concatenate([p[0] for p in parts])
                l = np.concatenate([p[1] for p in parts])
                c = np.concatenate([p[2] for p in parts])
                self.n_msgs = int(c.sum())
                order = np.lexsort((l, d))
                d, l, c = d[order], l[order], c[order]
                change = np.r_[0, np.flatnonzero((np.diff(d) != 0) |
                                                 (np.diff(l) != 0)) + 1]
                d2, l2 = d[change], l[change]
                c2 = np.add.reduceat(c, change)
                # winner per dst: max count, tie -> min label (reference
                # Lpa.voteLabel, Lpa.java:66-101; Id order == int64 order
                # by dictionary construction)
                worder = np.lexsort((l2, -c2, d2))
                dw, lw = d2[worder], l2[worder]
                first = _runs(dw)
                self.win_dst, self.win_label = dw[first], lw[first]
                self._mask = np.zeros(size, dtype=bool)
                self._mask[self.win_dst] = True
            else:
                self.win_dst = np.zeros(0, dtype=np.int64)
                self.win_label = np.zeros(0, dtype=np.int64)
                self._mask = np.zeros(size, dtype=bool)
        elif kind == "concat":
            self.dst = (np.concatenate([p[0] for p in parts]) if parts
                        else np.zeros(0, dtype=np.int64))
            ncols = (len(parts[0]) - 1) if parts else 0
            self.cols = [np.concatenate([p[i + 1] for p in parts])
                         for i in range(ncols)]
            self.n_msgs = len(self.dst)
            self._mask = np.zeros(size, dtype=bool)
            self._mask[self.dst] = True
        else:
            raise ValueError(kind)

    @property
    def mask(self) -> np.ndarray:
        """Per-vertex received mask. Lazy for sum inboxes (computed only
        when a program actually needs it); unavailable when a dense-format
        sum partial was received (EdgeScatter senders broadcast from every
        vertex, so such programs must not depend on the mask)."""
        if self._mask is None:
            if self.kind == "sum" and getattr(self, "_has_dense", False):
                raise RuntimeError(
                    "received mask is not transported for dense-format sum "
                    "partials (EdgeScatter fast path); the program must not "
                    "rely on inbox.mask")
            m = np.zeros(self.size, dtype=bool)
            if self.kind == "sum":
                m[self._sparse_d] = True
            self._mask = m
        return self._mask


# ---------------------------------------------------------------------------
# program contract
# ---------------------------------------------------------------------------

class VertexProgram:
    """Vectorized analog of the reference Computation<M> contract
    (/root/reference/computer-api/.../worker/Computation.java:42-106):
    ``compute0`` = superstep-0 init+scatter, ``compute`` = per-superstep
    apply+scatter over the whole partition at once, ``master`` = the
    MasterComputation continue/stop decision + next-step globals."""

    combiner = "sum"
    mode = "out"          # which adjacency the partition loads: "out" | "both"

    def master_init(self, graph: Graph) -> dict:
        return {}

    def init(self, ctx, g) -> dict:
        raise NotImplementedError

    def compute0(self, ctx, state, g):
        raise NotImplementedError

    def compute(self, ctx, state, inbox: Inbox, g, s):
        raise NotImplementedError

    def rescatter(self, ctx, state, g, s):
        """Regenerate the messages sent at the END of superstep s from the
        post-apply state (resume path). Must be a pure function of state."""
        raise NotImplementedError

    def master(self, s, aggs: dict, msg_total: int, graph: Graph, g: dict):
        return (msg_total > 0, g)

    def output(self, ctx, state) -> dict:
        """Final per-vertex columns (v_id added by the engine)."""
        raise NotImplementedError


class PartCtx:
    """Per-partition graph view handed to programs."""

    def __init__(self, graph_dir: str, meta: dict, part_id: int):
        self.meta = meta
        self.part_id = part_id
        self.V = meta["V"]
        self.part_size = meta["part_size"]
        self.lo = part_id * self.part_size
        self.hi = min(self.V, self.lo + self.part_size)
        self.size = max(0, self.hi - self.lo)
        self._dir = graph_dir
        self._csr = {}

    def csr(self, mode: str):
        """(indptr[size+1], dst[int64], weight[float64|None]) for owned srcs."""
        if mode not in self._csr:
            spec = self.meta.get("synthetic")
            if spec is not None:
                if mode != "out":
                    raise ValueError(
                        "synthetic graphs provide out-mode adjacency only")
                src, dst = synth_edges_for_range(
                    spec["V"], spec["avg_deg"], spec["seed"],
                    self.lo, self.hi)
                counts = np.bincount(src - self.lo, minlength=self.size)
                indptr = np.zeros(self.size + 1, dtype=np.int64)
                np.cumsum(counts, out=indptr[1:])
                self._csr[mode] = (indptr, dst, None)
                return self._csr[mode]
            path = os.path.join(self._dir, f"edges_{mode}",
                                f"part_{self.part_id:05d}.parquet")
            if os.path.exists(path):
                t = pq.read_table(path)
                src = t.column("src_id").to_numpy()
                dst = t.column("dst_id").to_numpy()
                w = (t.column("weight").to_numpy()
                     if "weight" in t.column_names else None)
            else:
                src = dst = np.zeros(0, dtype=np.int64)
                w = None
            counts = np.bincount(src - self.lo, minlength=self.size)
            indptr = np.zeros(self.size + 1, dtype=np.int64)
            np.cumsum(counts, out=indptr[1:])
            self._csr[mode] = (indptr, dst, w)
        return self._csr[mode]

    def degrees(self, mode: str) -> np.ndarray:
        indptr, _, _ = self.csr(mode)
        return np.diff(indptr)

    def vids(self) -> np.ndarray:
        return np.arange(self.lo, self.hi, dtype=np.int64)

    def scatter_plan(self, mode: str, local_dtype=np.int32):
        """Cached routing plan for full-adjacency scatters: edges sorted
        by dst once, kept as a dst-ordered SRC-LOCAL index (so each
        superstep is one cache-friendly gather from the part_size-sized
        per-vertex value array, not a permutation of an E-sized edge
        array), plus per-destination-partition slice bounds and combine
        run structure — all static properties of the CSR block. This
        removes the per-superstep argsort and E-sized shuffle that would
        otherwise dominate dense iterations like PageRank."""
        key = ("plan", mode)
        if key not in self._csr:
            indptr, dst, _ = self.csr(mode)
            P = self.meta["P"]
            deg = np.diff(indptr)
            src_local = np.repeat(
                np.arange(self.size, dtype=np.int64), deg)
            order = np.argsort(dst, kind="stable")
            d = dst[order]
            src_by_dst = src_local[order].astype(
                np.int32 if self.size < 2**31 else np.int64)
            bounds = np.searchsorted(
                d, np.arange(1, P + 1, dtype=np.int64) * self.part_size,
                side="left")
            starts = np.r_[0, bounds[:-1]]
            slices = []
            for q in range(P):
                a, b = int(starts[q]), int(bounds[q])
                if b <= a:
                    slices.append(None)
                    continue
                dq = d[a:b]
                runs = np.r_[0, np.flatnonzero(np.diff(dq)) + 1]
                q_size = min(self.V, (q + 1) * self.part_size) \
                    - q * self.part_size
                if len(runs) * 2 > q_size:
                    # dense slice: most of the destination partition is
                    # hit -> sum straight into a dense partial with one
                    # bincount over the slice edges (static decision)
                    dl_full = (dq - q * self.part_size).astype(local_dtype)
                    slices.append(("D", a, b, dl_full, q_size))
                else:
                    dl = (dq[runs] - q * self.part_size).astype(local_dtype)
                    slices.append(("S", a, b, runs, dl))
            self._csr[key] = (src_by_dst, slices)
        return self._csr[key]


class EdgeScatter:
    """Fast-path scatter result: one value PER VERTEX, broadcast along
    the partition's full adjacency (i.e. every out-edge of vertex v
    carries values[v]). Lets the engine route via the cached
    scatter_plan: a single gather through the static dst-ordered
    src-index instead of a per-superstep argsort. Only valid for
    sum/min combiners (label_count runs depend on the values)."""

    __slots__ = ("mode", "values")

    def __init__(self, mode: str, values: np.ndarray):
        self.mode = mode
        self.values = values


# ---------------------------------------------------------------------------
# partition actor
# ---------------------------------------------------------------------------

class PartitionWorker:
    def __init__(self, graph_dir: str, meta: dict, part_id: int, program):
        self.ctx = PartCtx(graph_dir, meta, part_id)
        self.program = program
        self.program.combiner  # touch to fail early on bad programs
        self.ctx.csr(self.program.mode)  # build CSR once, up front
        self.state = None
        self.P = meta["P"]
        self._local_dtype = np.int32 if meta["part_size"] < 2**31 else np.int64

    # -- message routing ----------------------------------------------------
    def _route_edges(self, scatter: EdgeScatter):
        """Fast path: per-vertex values broadcast along all edges,
        combined with the cached static routing plan (no per-step
        argsort; the only dynamic work is one gather + reduceat).

        When a slice's pre-combined output covers most of the destination
        partition (dense message pattern, e.g. PageRank on avg-degree-10
        graphs at small P), ship a DENSE partial-sum array instead of
        (dst, val) pairs: receivers then merge with cheap sequential adds
        instead of an O(nnz) scatter, which keeps receive-side work
        O(E/P + part_size) per actor instead of O(V)."""
        src_by_dst, slices = self.ctx.scatter_plan(scatter.mode,
                                                   self._local_dtype)
        is_sum = self.program.combiner == "sum"
        reduce_fn = np.add.reduceat if is_sum else np.minimum.reduceat
        outs = [None] * self.P
        vv = scatter.values
        for q, s in enumerate(slices):
            if s is None:
                continue
            kind, a, b, idx, extra = s
            if kind == "D" and is_sum:
                # dense partial straight from one bincount over the slice
                outs[q] = ("D", np.bincount(idx, weights=vv[src_by_dst[a:b]],
                                            minlength=extra))
            elif kind == "D":
                # min combiner over a dense slice: reduceat on runs
                # recovered on the fly (rare path; frontier algorithms
                # use the generic router instead)
                runs = np.r_[0, np.flatnonzero(np.diff(idx)) + 1]
                outs[q] = (idx[runs],
                           reduce_fn(vv[src_by_dst[a:b]], runs))
            else:
                runs, dl = idx, extra
                outs[q] = (dl, reduce_fn(vv[src_by_dst[a:b]], runs))
        return outs, int(len(src_by_dst))

    def _route(self, dst_global, payload):
        """Split outgoing messages by destination partition, pre-combining
        each slice. Returns P objects (or None) + sent count."""
        # name-based check: with cloudpickle by-value registration
        # (__ray_entry__) the actor's EdgeScatter class object can be a
        # distinct copy from the program module's, so isinstance fails
        if dst_global.__class__.__name__ == "EdgeScatter":
            return self._route_edges(dst_global)
        outs = [None] * self.P
        if dst_global is None or len(dst_global) == 0:
            return outs, 0
        order = np.argsort(dst_global, kind="stable")
        d = dst_global[order]
        pay = {k: v[order] for k, v in payload.items()}
        bounds = np.searchsorted(
            d, np.arange(1, self.P + 1, dtype=np.int64) * self.ctx.part_size,
            side="left")
        starts = np.r_[0, bounds[:-1]]
        for q in range(self.P):
            a, b = int(starts[q]), int(bounds[q])
            if b <= a:
                continue
            dl = (d[a:b] - q * self.ctx.part_size).astype(self._local_dtype)
            outs[q] = precombine(self.program.combiner, dl,
                                 {k: v[a:b] for k, v in pay.items()})
        return outs, int(len(d))

    # -- superstep ----------------------------------------------------------
    def superstep(self, s: int, g: dict, ckpt_dir, *inbox_parts):
        t0 = time.monotonic()
        n_in = 0
        if s == 0:
            self.state = self.program.init(self.ctx, g)
            dst, payload, aggs = self.program.compute0(self.ctx, self.state, g)
        else:
            inbox = Inbox(self.program.combiner, self.ctx.size,
                          list(inbox_parts))
            n_in = inbox.n_msgs
            dst, payload, aggs = self.program.compute(
                self.ctx, self.state, inbox, g, s)
        t1 = time.monotonic()
        ck = None
        if ckpt_dir is not None:
            ck = self._write_checkpoint(ckpt_dir, s)
        t2 = time.monotonic()
        outs, n_out = self._route(dst, payload)
        t3 = time.monotonic()
        meta = {"aggs": aggs, "part": self.ctx.part_id, "msgs_in": n_in,
                "msgs_out": n_out, "wall_s": t3 - t0,
                "compute_s": t1 - t0, "ckpt_s": t2 - t1, "route_s": t3 - t2,
                "checkpoint": ck}
        return (*outs, meta)

    def rescatter(self, s: int, g: dict):
        dst, payload = self.program.rescatter(self.ctx, self.state, g, s)
        outs, n_out = self._route(dst, payload)
        return (*outs, {"part": self.ctx.part_id, "msgs_out": n_out})

    # -- checkpoint / resume -------------------------------------------------
    def _write_checkpoint(self, ckpt_dir: str, s: int) -> dict:
        d = os.path.join(ckpt_dir, f"step_{s:05d}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part_{self.ctx.part_id:05d}.parquet")
        t = pa.table({k: pa.array(v) for k, v in self.state.items()})
        pq.write_table(t, path, compression="none")
        return {"file": path, "rows": self.ctx.size,
                "checksum": _state_checksum(self.state)}

    def load_checkpoint(self, ckpt_dir: str, s: int):
        path = os.path.join(ckpt_dir, f"step_{s:05d}",
                            f"part_{self.ctx.part_id:05d}.parquet")
        t = pq.read_table(path)
        self.state = {c: t.column(c).to_numpy().copy() for c in t.column_names}
        return True

    def output_table(self):
        cols = self.program.output(self.ctx, self.state)
        t = pa.table({"v_id": pa.array(self.ctx.vids()),
                      **{k: pa.array(v) for k, v in cols.items()}})
        return t


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

class BSPResult:
    def __init__(self, output_refs, supersteps, aggs, history):
        self.output_refs = output_refs   # ObjectRefs to per-partition tables
        self.supersteps = supersteps     # number of supersteps executed
        self.aggs = aggs                 # aggregates of the final superstep
        self.history = history           # per-superstep metrics dicts

    def to_dataset(self):
        return ray.data.from_arrow_refs(self.output_refs)

    def to_arrow(self) -> pa.Table:
        tables = ray.get(self.output_refs)
        return pa.concat_tables([t for t in tables if t.num_rows])


class BSPEngine:
    """Drives P PartitionWorker actors through the superstep loop."""

    def __init__(self, graph: Graph, program, checkpoint_dir: str | None = None,
                 checkpoint_every: int = 1):
        self.graph = graph
        self.program = program
        self.ckpt_dir = checkpoint_dir
        self.ckpt_every = max(0, checkpoint_every)
        P = graph.P
        total_cpus = ray.cluster_resources().get("CPU", P) or P
        cpu_per_actor = min(1.0, max(0.05, (total_cpus - 1) / max(P, 1)))
        Worker = ray.remote(PartitionWorker)
        self.actors = [
            Worker.options(num_cpus=cpu_per_actor).remote(
                graph.dir, graph.meta, p, program)
            for p in range(P)
        ]
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------
    def _commit_manifest(self, s, g_next, aggs, metas, wall_s, done):
        if not self.ckpt_dir:
            return
        man = {
            "step": s,
            "globals_next": _jsonable(g_next),
            "aggs": _jsonable(aggs),
            "done": done,
            "wall_s": wall_s,
            "parts": {m["part"]: {"msgs_in": m["msgs_in"],
                                  "msgs_out": m["msgs_out"],
                                  **(m["checkpoint"] or {})}
                      for m in metas},
        }
        tmp = os.path.join(self.ckpt_dir, f"manifest_{s:05d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, os.path.join(self.ckpt_dir, f"manifest_{s:05d}.json"))
        with open(os.path.join(self.ckpt_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({"step": s, "wall_s": wall_s,
                                "msgs": sum(m["msgs_out"] for m in metas),
                                "aggs": _jsonable(aggs)}) + "\n")

    def latest_checkpoint(self) -> tuple[int, dict] | None:
        if not self.ckpt_dir or not os.path.isdir(self.ckpt_dir):
            return None
        best = None
        for f in os.listdir(self.ckpt_dir):
            if f.startswith("manifest_") and f.endswith(".json"):
                with open(os.path.join(self.ckpt_dir, f)) as fh:
                    man = json.load(fh)
                if len(man["parts"]) == self.graph.P and (
                        best is None or man["step"] > best["step"]):
                    best = man
        return (best["step"], best) if best else None

    # -- main loop ----------------------------------------------------------
    def run(self, max_supersteps: int = 10, resume: bool = False) -> BSPResult:
        P = self.graph.P
        history = []
        s0, inboxes, g = 0, None, self.program.master_init(self.graph)
        aggs = {}
        if resume:
            found = self.latest_checkpoint()
            if found:
                s_ck, man = found
                ray.get([a.load_checkpoint.remote(self.ckpt_dir, s_ck)
                         for a in self.actors])
                g = man["globals_next"]
                aggs = man["aggs"]
                if man["done"]:
                    return self._finish(s_ck + 1, aggs, history)
                outs = [self.actors[p].rescatter.options(num_returns=P + 1)
                        .remote(s_ck, g) for p in range(P)]
                msg_refs = [o[:P] for o in outs]
                ray.get([o[P] for o in outs])  # barrier on rescatter
                inboxes = [[msg_refs[p][q] for p in range(P)] for q in range(P)]
                s0 = s_ck + 1

        s = s0
        while s < max_supersteps:
            t0 = time.monotonic()
            do_ckpt = (self.ckpt_dir if self.ckpt_every and
                       (s % self.ckpt_every == 0) else None)
            outs = []
            for p in range(P):
                args = (s, g, do_ckpt) + (tuple(inboxes[p]) if s > 0 else ())
                outs.append(self.actors[p].superstep
                            .options(num_returns=P + 1).remote(*args))
            msg_refs = [o[:P] for o in outs]
            metas = ray.get([o[P] for o in outs])
            wall = time.monotonic() - t0
            aggs = _reduce_aggs([m["aggs"] for m in metas])
            msg_total = sum(m["msgs_out"] for m in metas)
            cont, g = self.program.master(s, aggs, msg_total, self.graph, g)
            done = (not cont) or msg_total == 0 or s == max_supersteps - 1
            history.append({
                "step": s, "wall_s": wall, "msgs": msg_total,
                "aggs": dict(aggs),
                "actor_compute_s": max(m["compute_s"] for m in metas),
                "actor_ckpt_s": max(m["ckpt_s"] for m in metas),
                "actor_route_s": max(m["route_s"] for m in metas),
                "actor_wall_max_s": max(m["wall_s"] for m in metas),
                "actor_wall_sum_s": sum(m["wall_s"] for m in metas),
            })
            if do_ckpt:
                self._commit_manifest(s, g, aggs, metas, wall, done)
            s += 1
            if done:
                break
            inboxes = [[msg_refs[p][q] for p in range(P)] for q in range(P)]
        return self._finish(s, aggs, history)

    def _finish(self, supersteps, aggs, history) -> BSPResult:
        """Collect per-partition output tables, then release the actor pool
        (its CPUs) — resume works from the on-disk checkpoints, not from
        live actors."""
        refs = [a.output_table.remote() for a in self.actors]
        ray.wait(refs, num_returns=len(refs))  # ensure computed before kill
        self.close()
        return BSPResult(refs, supersteps, aggs, history)

    def close(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def _reduce_aggs(dicts: list[dict]) -> dict:
    out = {}
    for d in dicts:
        for k, v in (d or {}).items():
            out[k] = out.get(k, 0) + v
    return out


def _jsonable(d):
    out = {}
    for k, v in (d or {}).items():
        out[k] = float(v) if isinstance(v, (np.floating, float)) else (
            int(v) if isinstance(v, (np.integer, int)) else v)
    return out


def run_program(graph: Graph, program, max_supersteps: int = 10,
                checkpoint_dir: str | None = None, checkpoint_every: int = 1,
                resume: bool = False) -> BSPResult:
    graph.ensure_mode(program.mode)
    eng = BSPEngine(graph, program, checkpoint_dir, checkpoint_every)
    return eng.run(max_supersteps=max_supersteps, resume=resume)
