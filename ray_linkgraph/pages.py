"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Schema (BASELINE.json ``input_hint``):
    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

The embedded outlink structure is a directed power-law graph with the
structural features the conformance tests need: >=2 disjoint components,
dangling pages, self-links (must be dropped), duplicate links (must be
deduped), off-site link targets (vertices that exist only as edge dsts,
like the reference keeps edge-only vertices), heavy hub pages with
out-degree > the reference's superedge threshold of 100
(/root/reference/computer-core/.../config/ComputerOptions.java:196-203),
and a 6-clique with known per-vertex triangle counts.

Everything is a pure function of (n, seed, row index) via counter-based
hashing — bit-identical across runs, chunk sizes, and parallelism.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ._util import hash_u64, uniform01, ceil_div

CLIQUE = list(range(6))          # indices forming a bidirectional 6-clique
HUB_FRACTION = 0.01              # fraction of each component that is a hub target
HUB_PROB = 0.3                   # probability an outlink targets a hub
N_DOMAINS_MAX = 500
ZIPF_S = 1.1
BASE_TS_US = 1735689600_000_000  # 2025-01-01T00:00:00 in microseconds

_VOCAB = None


def vocab() -> list[str]:
    global _VOCAB
    if _VOCAB is None:
        syll = ["ra", "to", "mi", "ken", "lor", "va", "shi", "den", "pu", "gal"]
        _VOCAB = [syll[i % 10] + syll[(i // 10) % 10] + syll[(i // 100) % 10]
                  for i in range(1000)]
    return _VOCAB


def _domains(n: int) -> list[str]:
    d = min(N_DOMAINS_MAX, max(10, n // 50))
    return [f"d{k}.example" for k in range(d)]


def _zipf_cdf(d: int) -> np.ndarray:
    w = 1.0 / np.arange(1, d + 1, dtype=np.float64) ** ZIPF_S
    return np.cumsum(w) / w.sum()


def _component_bounds(n: int) -> tuple[int, int]:
    """Component A = [0, split), component B = [split, n)."""
    split = max(6, int(n * 0.9))
    if split >= n:  # tiny tables still get two components when possible
        split = max(6, n - 2) if n > 8 else n
    return split, n


def page_urls(idx: np.ndarray, n: int, seed: int) -> np.ndarray:
    doms = _domains(n)
    cdf = _zipf_cdf(len(doms))
    u = uniform01(np.uint64(seed), idx.astype(np.uint64), 7)
    dom_idx = np.searchsorted(cdf, u, side="right")
    return np.array([f"https://{doms[d]}/p{i}" for d, i in zip(dom_idx, idx)],
                    dtype=object)


def out_targets(i: int, n: int, seed: int) -> list[int]:
    """Deterministic outlink target page-indices for page i (may repeat;
    may include i itself). Off-site links are handled separately."""
    split, _ = _component_bounds(n)
    lo, hi = (0, split) if i < split else (split, n)
    size = hi - lo
    if size <= 1:
        return []
    h = int(hash_u64(np.uint64(seed), np.uint64(i), 1)[()])
    deg = h % 16
    if deg == 0:
        return []  # dangling page
    if i % 997 == 17:
        deg = 150  # heavy hub source: out-degree > superedge threshold 100
    n_hubs = max(1, int(size * HUB_FRACTION))
    j = np.arange(deg, dtype=np.uint64)
    u = uniform01(np.uint64(seed), np.uint64(i), j, 3)
    th = hash_u64(np.uint64(seed), np.uint64(i), j, 4)
    hub_t = lo + (th % np.uint64(n_hubs)).astype(np.int64)
    uni_t = lo + (th % np.uint64(size)).astype(np.int64)
    t = np.where(u < HUB_PROB, hub_t, uni_t)
    out = t.tolist()
    if i in CLIQUE:
        out.extend(c for c in CLIQUE if c != i)
    if i % 17 == 3:
        out.append(i)          # self-link (canonicalization must drop)
    if i % 13 == 5 and out:
        out.append(out[0])     # duplicate link (canonicalization must dedup)
    return out


def _page_rows(idx: np.ndarray, n: int, seed: int) -> dict:
    urls = page_urls(idx, n, seed)
    all_urls = {int(i): u for i, u in zip(idx, urls)}

    # texts
    nw = 20 + (hash_u64(np.uint64(seed), idx.astype(np.uint64), 5) % np.uint64(30)).astype(np.int64)
    vb = vocab()
    texts = []
    for i, k in zip(idx, nw):
        wid = hash_u64(np.uint64(seed), np.uint64(i), 6,
                       np.arange(k, dtype=np.uint64)) % np.uint64(len(vb))
        texts.append(" ".join(vb[w] for w in wid))

    # langs
    ul = uniform01(np.uint64(seed), idx.astype(np.uint64), 8)
    langs = np.where(ul < 0.95, "en", np.where(ul < 0.975, "de", "fr"))

    htmls = []
    need = {}
    targets_per_page = []
    for i in idx:
        t = out_targets(int(i), n, seed)
        targets_per_page.append(t)
        for x in t:
            if x not in all_urls:
                need[x] = None
    if need:
        miss = np.array(sorted(need), dtype=np.int64)
        for k, u in zip(miss, page_urls(miss, n, seed)):
            all_urls[int(k)] = u

    for i, text, targets in zip(idx, texts, targets_per_page):
        anchors = []
        for j, t in enumerate(targets):
            anchors.append(f'<a href="{all_urls[t]}">a{j}</a>')
        if i % 23 == 7:
            # off-site target pools are per-component so the disjoint
            # components stay disjoint (FIXTURES.md structural features)
            split, _ = _component_bounds(n)
            comp = 0 if i < split else 1
            off = int(hash_u64(np.uint64(seed), np.uint64(i), 9)[()] % 50)
            anchors.append(
                f'<a href="https://offsite{comp}.example/x{off}">'
                f'a{len(targets)}</a>')
        htmls.append((f"<html><head><title>t{i}</title></head><body><p>{text}</p>"
                      + "".join(anchors) + "</body></html>").encode("utf-8"))

    ts = BASE_TS_US + idx.astype(np.int64) * 1_000_000
    return {
        "url": urls.tolist(),
        "warc_ts": ts,
        "html": htmls,
        "text": texts,
        "lang": langs.tolist(),
    }


def pages_table(n: int, seed: int = 42, lo: int = 0, hi: int | None = None) -> pa.Table:
    """Build rows [lo, hi) of the n-page table as one Arrow table."""
    hi = n if hi is None else hi
    idx = np.arange(lo, hi, dtype=np.int64)
    d = _page_rows(idx, n, seed)
    return pa.table({
        "url": pa.array(d["url"], type=pa.string()),
        "warc_ts": pa.array(d["warc_ts"], type=pa.timestamp("us")),
        "html": pa.array(d["html"], type=pa.binary()),
        "text": pa.array(d["text"], type=pa.string()),
        "lang": pa.array(d["lang"], type=pa.string()),
    })


def generate_pages(n: int, out_dir: str, seed: int = 42,
                   rows_per_file: int = 50_000, overwrite: bool = False) -> str:
    """Write the n-page table as a directory of parquet shards.

    Shard layout does not affect content (content is keyed by global row
    index). Existing complete output is reused (resumable generation).
    """
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker) and not overwrite:
        with open(marker) as f:
            if f.read().strip() == f"n={n} seed={seed}":
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n_files = ceil_div(n, rows_per_file)
    for f_idx in range(n_files):
        lo = f_idx * rows_per_file
        hi = min(n, lo + rows_per_file)
        t = pages_table(n, seed=seed, lo=lo, hi=hi)
        pq.write_table(t, os.path.join(out_dir, f"pages_{f_idx:05d}.parquet"))
    with open(marker, "w") as f:
        f.write(f"n={n} seed={seed}")
    return out_dir
