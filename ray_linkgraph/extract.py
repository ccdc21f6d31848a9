"""Link + text extraction over pages batches (zero-copy Arrow map_batches).

The reference ingests an explicit edge list (hugegraph-loader CSV
mappings, /root/reference/computer-core/.../input/loader/FileEdgeFetcher.java:37-73);
our input is raw Common-Crawl-style pages, so extraction is the ingest
stage: ``pages → (src, dst) edges`` plus the byte-identical
``url → text`` invariant (BASELINE.json input_hint).

Both extractors are fully vectorized Arrow kernel chains — no Python
loop over rows and no ``to_pylist`` round trip — and are EXACTLY
equivalent to the regex contracts (``HREF_RE`` findall, ``TEXT_RE``
findall-join), adversarial and randomized property tests included:

* ``<a href="([^"]*)">``: split on the fixed prefix (which has no
  self-border, so ``split_pattern`` finds every occurrence), then a
  bounded split on the closing quote + ``starts_with('>')``. The
  capture group excludes ``"``, so a match must end at the FIRST quote
  at/after the prefix; that quote is either inside the piece (case A)
  or is the trailing quote of the NEXT prefix occurrence itself
  (case B — shared-quote overlap, capture = piece + ``<a href=``,
  which consumes the next occurrence, so consecutive case-B candidates
  alternate effective/suppressed).
* ``<p>(.*?)</p>`` (DOTALL): the non-greedy body runs to the first
  ``</p>`` anywhere after the ``<p>``, crossing later ``<p>``
  occurrences — so captures are the ``<p>``-joined SEGMENTS of split
  pieces ending at each closed piece; trailing close-less segments
  never match.

The stages are stateless, so ``extract_links``/``extract_text`` pass
INSTANCES to ``map_batches`` — Ray schedules plain tasks on warm
workers instead of paying an actor-pool startup per pipeline.
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

        n = len(pieces)
        if n == 0:
            return pa.table({"src": pa.array([], type=pa.string()),
                             "dst": pa.array([], type=pa.string())})
        lst2 = pc.split_pattern(pieces, pattern=b'"', max_splits=1)
        flat2, l2, starts2 = _list_parts(lst2)
        has_q = l2 == 2                          # a closing quote exists
        # case A: the piece's first quote is followed by '>'
        ok_a = np.zeros(n, dtype=bool)
        rest = flat2.take(pa.array(starts2[has_q] + 1))
        ok_a[has_q] = pc.starts_with(rest, pattern=b">") \
            .to_numpy(zero_copy_only=False)
        # case B (shared-quote overlap): the piece has NO quote and the
        # NEXT prefix occurrence's own trailing quote closes the match —
        # i.e. the next piece (same row) begins with '>'. The regex
        # capture is then piece + '<a href=' (prefix minus its quote);
        # the whole next prefix is consumed, so the next piece must not
        # produce a match of its own (suppression). The prefix has no
        # self-border, so split_pattern found every occurrence and
        # consecutive-candidate runs alternate effective/suppressed.
        begins_gt = pc.starts_with(pieces, pattern=b">") \
            .to_numpy(zero_copy_only=False)
        next_same_row = np.r_[row_ids[1:] == row_ids[:-1], False]
        cand_b = (~has_q) & next_same_row & np.r_[begins_gt[1:], False]
        idx = np.arange(n)
        run_start = cand_b & np.r_[True, ~cand_b[:-1]]
        start_of_run = np.maximum.accumulate(np.where(run_start, idx, -1))
        eff_b = cand_b & (((idx - start_of_run) % 2) == 0)
        suppressed = np.r_[False, eff_b[:-1]]
        match_a = ok_a & ~suppressed

        idx_a = np.flatnonzero(match_a)
        idx_b = np.flatnonzero(eff_b)
        dst_a = flat2.take(pa.array(starts2[idx_a]))
        if len(idx_b):
            dst_b = pc.binary_join_element_wise(
                pieces.take(pa.array(idx_b)),
                pa.scalar(ANCHOR_PREFIX[:-1], type=pa.binary()),
                pa.scalar(b"", type=pa.binary()))
            all_idx = np.concatenate([idx_a, idx_b])
            order = np.argsort(all_idx, kind="stable")
            dst = pa.concat_arrays([dst_a.combine_chunks()
                                    if isinstance(dst_a, pa.ChunkedArray)
                                    else dst_a,
                                    dst_b.combine_chunks()
                                    if isinstance(dst_b, pa.ChunkedArray)
                                    else dst_b]).take(pa.array(order))
            rows = all_idx[order]
        else:
            dst, rows = dst_a, idx_a
        src = urls.take(pa.array(row_ids[rows]))
        return pa.table({"src": src, "dst": dst.cast(pa.string())})


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
        n_rows = len(nlens)
        mask = np.ones(len(flat), dtype=bool)
        mask[starts] = False
        keep = np.flatnonzero(mask)
        pieces = flat.take(pa.array(keep))
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), nlens)[keep]
        n = len(pieces)

        def _row_join(items, item_rows):
            counts = np.bincount(item_rows, minlength=n_rows) \
                .astype(np.int64)
            offs = np.zeros(n_rows + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            grouped = pa.LargeListArray.from_arrays(
                pa.array(offs, type=pa.int64()),
                items.cast(pa.large_binary()))
            return pc.binary_join(grouped,
                                  pa.scalar(b"", type=pa.large_binary()))

        if n == 0:
            joined = _row_join(pa.array([], type=pa.binary()),
                               np.zeros(0, dtype=np.int64))
            return pa.table({"url": batch.column("url"),
                             "text": joined.cast(pa.string())})

        lst2 = pc.split_pattern(pieces, pattern=b"</p>", max_splits=1)
        flat2, l2, starts2 = _list_parts(lst2)
        has_close = l2 == 2
        # contribution of every piece: its pre-</p> content when closed,
        # the WHOLE piece otherwise (split with no match returns [piece],
        # so flat2[starts2] covers both cases). A regex match spans from
        # a '<p>' through the FIRST '</p>' anywhere after it — crossing
        # later '<p>' occurrences — so captures are the '<p>'-joined
        # SEGMENTS of pieces that end at the next closed piece; trailing
        # segments with no close never match.
        contrib = flat2.take(pa.array(starts2))
        row_change = np.r_[True, row_ids[1:] != row_ids[:-1]]
        seg_start = row_change | np.r_[False, has_close[:-1]]
        seg_offs = np.r_[np.flatnonzero(seg_start), n].astype(np.int64)
        terminal = has_close[seg_offs[1:] - 1]   # segment ends at a close
        seg_rows = row_ids[seg_offs[:-1]]
        grouped = pa.LargeListArray.from_arrays(
            pa.array(seg_offs, type=pa.int64()),
            contrib.cast(pa.large_binary()))
        captures = pc.binary_join(grouped,
                                  pa.scalar(b"<p>", type=pa.large_binary()))
        keep_t = np.flatnonzero(terminal)
        joined = _row_join(captures.take(pa.array(keep_t)),
                           seg_rows[keep_t])
        return pa.table({"url": batch.column("url"),
                         "text": joined.cast(pa.string())})


def _task_cap(concurrency):
    """Normalize a legacy actor-pool (min, max) tuple to a task cap —
    task pools take a single int bound (tuples raise in Ray Data)."""
    if isinstance(concurrency, tuple):
        return concurrency[-1]
    return concurrency


def extract_links(pages, batch_size: int = 4096, concurrency=None):
    """pages Dataset -> edges Dataset (src:string, dst:string).

    Projects away all non-needed columns before the transform so shuffles
    never carry html bytes (SURVEY.md §7 "what's hard" (f)). The stage
    is stateless (pure Arrow kernels), so an INSTANCE is passed and Ray
    schedules warm task workers — no actor-pool startup; ``concurrency``
    (int, or a legacy (min, max) tuple whose max is used) bounds
    concurrent tasks.
    """
    ds = pages.select_columns(["url", "html"])
    return ds.map_batches(LinkExtractor(), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=_task_cap(concurrency))


def extract_text(pages, batch_size: int = 4096, concurrency=None):
    ds = pages.select_columns(["url", "html"])
    return ds.map_batches(TextExtractor(), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=_task_cap(concurrency))
