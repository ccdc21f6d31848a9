"""Link + text extraction over pages batches (zero-copy Arrow map_batches).

The reference ingests an explicit edge list (hugegraph-loader CSV
mappings, /root/reference/computer-core/.../input/loader/FileEdgeFetcher.java:37-73);
our input is raw Common-Crawl-style pages, so extraction is the ingest
stage: ``pages → (src, dst) edges`` plus the byte-identical
``url → text`` invariant (BASELINE.json input_hint).

Both extractors are callable classes (actor-pool stages): the regexes
are compiled once per actor in ``__init__``; ``__call__`` does
vectorized-ish work per Arrow batch (the regex engine runs in C; only
the per-row dispatch is Python — html payloads are bytes and never
round-trip through pandas).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

HREF_RE = rb'<a href="([^"]*)">'
TEXT_RE = rb"<p>(.*?)</p>"


class LinkExtractor:
    """pages(url, html) -> edges(src, dst), one row per anchor href.

    Extraction is purely syntactic and deterministic; duplicate hrefs and
    self-links are preserved here (graph canonicalization dedups later,
    mirroring the reference's IdSet dedup in TriangleCount.compute0,
    /root/reference/computer-algorithm/.../trianglecount/TriangleCount.java:74-85).
    """

    def __init__(self):
        self.href = re.compile(HREF_RE, re.S)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        find = self.href.findall
        src_counts = np.empty(len(urls), dtype=np.int64)
        dsts: list[bytes] = []
        for i, h in enumerate(htmls):
            m = find(h)
            src_counts[i] = len(m)
            dsts.extend(m)
        src = pa.array(np.repeat(np.asarray(urls, dtype=object), src_counts),
                       type=pa.string())
        dst = pa.array([d.decode("utf-8") for d in dsts], type=pa.string())
        return pa.table({"src": src, "dst": dst})


class TextExtractor:
    """pages(url, html) -> (url, text): concatenation of <p> bodies.

    Must reproduce the pages table's ``text`` column byte-for-byte
    (per-row invariant in BASELINE.json input_hint), which the generator
    guarantees by construction and tests verify end-to-end.
    """

    def __init__(self):
        self.para = re.compile(TEXT_RE, re.S)

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        find = self.para.findall
        texts = [b"".join(find(h)).decode("utf-8") for h in htmls]
        return pa.table({"url": batch.column("url"),
                         "text": pa.array(texts, type=pa.string())})


def _default_concurrency():
    """Autoscaling actor-pool bounds sized to the cluster."""
    import ray
    n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, n))


def extract_links(pages, batch_size: int = 2048, concurrency=None):
    """pages Dataset -> edges Dataset (src:string, dst:string).

    Projects away all non-needed columns before the transform so shuffles
    never carry html bytes (SURVEY.md §7 "what's hard" (f)).
    """
    ds = pages.select_columns(["url", "html"])
    return ds.map_batches(LinkExtractor, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency or _default_concurrency())


def extract_text(pages, batch_size: int = 2048, concurrency=None):
    ds = pages.select_columns(["url", "html"])
    return ds.map_batches(TextExtractor, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency or _default_concurrency())
