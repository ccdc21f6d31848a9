"""Bare-metal scaling probe for the texthash kernel family (no Ray).

Answers "is clean_corpus's sub-0.8 2→8 scaling the pipeline's fault or
the host's?" the same way tools/membench.py answers it for the engine's
gather+reduceat edge phase: run the EXACT per-batch kernel the MinHash
stage runs (`texthash.minhash_band_hashes` — utf-8 → codepoints, prefix
-sum polynomial hashes, 64 permutation passes, band folds) over the
same synthetic corpus in K barrier-synchronized plain processes and
report aggregate docs/s at each K. If the bare kernel's K_lo→K_hi
efficiency matches the pipeline's, the limit is the box's memory
bandwidth, not the orchestration.

Usage: python tools/texthash_membench.py [K_lo K_hi] [n_docs]
Prints one JSON line.
"""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(path, batch, reps, barrier, out):
    import pyarrow.parquet as pq
    from ray_linkgraph.ops import texthash
    tbl = pq.read_table(path, columns=["text"])
    col = tbl.column("text").combine_chunks()
    n = len(col)
    texthash.minhash_band_hashes(col.slice(0, min(batch, n)))  # warm caches
    barrier.wait()
    t0 = time.monotonic()
    done = 0
    for r in range(reps):
        for lo in range(0, n, batch):
            texthash.minhash_band_hashes(col.slice(lo, min(batch, n - lo)))
            done += min(batch, n - lo)
    out.put((done, time.monotonic() - t0))


def run_level(path, k, batch=2000, reps=1):
    barrier = mp.Barrier(k)
    out = mp.Queue()
    procs = [mp.Process(target=_worker, args=(path, batch, reps, barrier, out))
             for _ in range(k)]
    for p in procs:
        p.start()
    tot_docs, tot_wall = 0, 0.0
    for _ in procs:
        d, w = out.get()
        tot_docs += d
        tot_wall = max(tot_wall, w)
    for p in procs:
        p.join()
    return tot_docs / tot_wall


def main():
    k_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    k_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000
    import bench
    path = bench.synth_docs_parquet(
        n_docs, f"/tmp/rlg_bench/scaling_docs_{n_docs}.parquet")
    lo = run_level(path, k_lo)
    hi = run_level(path, k_hi)
    print(json.dumps({
        "metric": f"bare minhash_band_hashes kernel, K={k_lo} vs K={k_hi} "
                  f"processes (no Ray)",
        "value": round((hi / lo) / (k_hi / k_lo), 3),
        "unit": "efficiency",
        f"docs_per_sec_{k_lo}": round(lo, 1),
        f"docs_per_sec_{k_hi}": round(hi, 1),
        "n_docs": n_docs,
    }))


if __name__ == "__main__":
    main()
