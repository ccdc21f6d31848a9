"""Link + text extraction over pages batches (zero-copy Arrow map_batches).

The reference ingests an explicit edge list (hugegraph-loader CSV
mappings, /root/reference/computer-core/.../input/loader/FileEdgeFetcher.java:37-73);
our input is raw Common-Crawl-style pages, so extraction is the ingest
stage: ``pages → (src, dst) edges`` plus the byte-identical
``url → text`` invariant (BASELINE.json input_hint).

Both extractors are fully vectorized Arrow kernel chains — no Python
loop over rows and no ``to_pylist`` round trip.  The anchor pattern
``<a href="([^"]*)">`` is decomposed into ``split_pattern`` on the fixed
prefix + a bounded split on the closing quote + a ``starts_with('>')``
validity check; this is exactly equivalent to the regex (the capture
group excludes ``"``, so a match always ends at the FIRST quote after
the prefix and is valid iff that quote is followed by ``>`` — any
backtracking the regex engine would attempt cannot cross a quote).
Paragraph extraction (``<p>(.*?)</p>`` DOTALL) is likewise decomposed
via ``split_pattern``; for well-formed, non-nested paragraphs this is
byte-identical (the pathological case where a ``<p>`` has no closing
tag before the next ``<p>`` differs — the regex would span pieces —
and tests pin equality against the regex on the synthetic corpus).

They are callable classes (actor-pool stages) so per-actor setup stays
the contract even though the vectorized path needs none.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HREF_RE = rb'<a href="([^"]*)">'
TEXT_RE = rb"<p>(.*?)</p>"
ANCHOR_PREFIX = b'<a href="'


def _list_parts(lst):
    """(flat values, per-row lengths int64, first-element offsets) of a
    list array produced by split_pattern (every list has >= 1 element)."""
    nlens = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lst)
    starts = np.zeros(len(nlens), dtype=np.int64)
    np.cumsum(nlens[:-1], out=starts[1:] if len(nlens) else starts[:0])
    return flat, nlens, starts


class LinkExtractor:
    """pages(url, html) -> edges(src, dst), one row per anchor href.

    Extraction is purely syntactic and deterministic; duplicate hrefs and
    self-links are preserved here (graph canonicalization dedups later,
    mirroring the reference's IdSet dedup in TriangleCount.compute0,
    /root/reference/computer-algorithm/.../trianglecount/TriangleCount.java:74-85).
    """

    def __init__(self):
        self.href = re.compile(HREF_RE, re.S)  # kept for the slow-path oracle

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column("html")
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        urls = batch.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        if len(html) == 0:
            return pa.table({"src": pa.array([], type=pa.string()),
                             "dst": pa.array([], type=pa.string())})
        lst = pc.split_pattern(html, pattern=ANCHOR_PREFIX)
        flat, nlens, starts = _list_parts(lst)
        mask = np.ones(len(flat), dtype=bool)
        mask[starts] = False                     # drop pre-prefix piece per row
        keep = np.flatnonzero(mask)
        pieces = flat.take(pa.array(keep))
        row_ids = np.repeat(np.arange(len(nlens), dtype=np.int64), nlens)[keep]

        lst2 = pc.split_pattern(pieces, pattern=b'"', max_splits=1)
        flat2, l2, starts2 = _list_parts(lst2)
        two = l2 == 2                            # a closing quote exists
        rest = flat2.take(pa.array(starts2[two] + 1))
        ok = pc.starts_with(rest, pattern=b">").to_numpy(zero_copy_only=False)
        valid = np.flatnonzero(two)[ok]
        dst = flat2.take(pa.array(starts2[valid])).cast(pa.string())
        src = urls.take(pa.array(row_ids[valid]))
        return pa.table({"src": src, "dst": dst})


class TextExtractor:
    """pages(url, html) -> (url, text): concatenation of <p> bodies.

    Must reproduce the pages table's ``text`` column byte-for-byte
    (per-row invariant in BASELINE.json input_hint), which the generator
    guarantees by construction and tests verify end-to-end.
    """

    def __init__(self):
        self.para = re.compile(TEXT_RE, re.S)  # kept for the slow-path oracle

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column("html")
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        if len(html) == 0:
            return pa.table({"url": batch.column("url"),
                             "text": pa.array([], type=pa.string())})
        lst = pc.split_pattern(html, pattern=b"<p>")
        flat, nlens, starts = _list_parts(lst)
        mask = np.ones(len(flat), dtype=bool)
        mask[starts] = False
        keep = np.flatnonzero(mask)
        pieces = flat.take(pa.array(keep))
        row_ids = np.repeat(np.arange(len(nlens), dtype=np.int64), nlens)[keep]

        lst2 = pc.split_pattern(pieces, pattern=b"</p>", max_splits=1)
        flat2, l2, starts2 = _list_parts(lst2)
        two = l2 == 2                            # closing tag exists
        contents = flat2.take(pa.array(starts2[two]))
        rows = row_ids[two]                      # nondecreasing by construction
        counts = np.bincount(rows, minlength=len(nlens)).astype(np.int64)
        offs = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        grouped = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()),
            contents.cast(pa.large_binary()))
        joined = pc.binary_join(grouped,
                                pa.scalar(b"", type=pa.large_binary()))
        return pa.table({"url": batch.column("url"),
                         "text": joined.cast(pa.string())})


def _default_concurrency():
    """Autoscaling actor-pool bounds sized to the cluster."""
    import ray
    n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, n))


def extract_links(pages, batch_size: int = 4096, concurrency=None):
    """pages Dataset -> edges Dataset (src:string, dst:string).

    Projects away all non-needed columns before the transform so shuffles
    never carry html bytes (SURVEY.md §7 "what's hard" (f)).
    """
    ds = pages.select_columns(["url", "html"])
    return ds.map_batches(LinkExtractor, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency or _default_concurrency())


def extract_text(pages, batch_size: int = 4096, concurrency=None):
    ds = pages.select_columns(["url", "html"])
    return ds.map_batches(TextExtractor, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency or _default_concurrency())
