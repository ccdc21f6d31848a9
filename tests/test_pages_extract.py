"""Pages generator determinism + extraction invariants (FIXTURES.md §1)."""

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from ray_linkgraph.pages import (CLIQUE, generate_pages, out_targets,
                                 pages_table)
from ray_linkgraph.extract import LinkExtractor, TextExtractor, extract_links, extract_text

N = 200


def test_generator_deterministic():
    t1 = pages_table(N)
    t2 = pages_table(N)
    assert t1.equals(t2)
    assert t1.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    # chunked generation is identical to one-shot
    a = pages_table(N, lo=0, hi=97)
    b = pages_table(N, lo=97, hi=N)
    import pyarrow as pa
    assert pa.concat_tables([a, b]).equals(t1)


def test_generate_pages_files(work_dir):
    d = generate_pages(N, f"{work_dir}/pages_gen", rows_per_file=64)
    t = pq.read_table(d)
    assert t.num_rows == N
    assert t.column("url").to_pylist() == pages_table(N).column("url").to_pylist()


def test_structural_features():
    has_dangling = has_self = has_dup = False
    for i in range(N):
        t = out_targets(i, N, 42)
        if not t:
            has_dangling = True
        if i in t:
            has_self = True
        if len(t) != len(set(t)):
            has_dup = True
    assert has_dangling and has_self and has_dup
    # clique is fully bidirectional
    for i in CLIQUE:
        t = set(out_targets(i, N, 42))
        assert all(j in t for j in CLIQUE if j != i)
    # heavy hub page (superedge threshold) exists at larger n
    assert len(out_targets(17, 2000, 42)) >= 150


def test_text_extraction_byte_identical():
    t = pages_table(N)
    ext = extract_text(rd.from_arrow(t)).to_pandas()
    orig = t.to_pandas()[["url", "text"]]
    m = orig.merge(ext, on="url", suffixes=("_orig", "_ext"))
    assert len(m) == N
    assert (m["text_orig"] == m["text_ext"]).all()


def test_link_extraction_matches_generator():
    t = pages_table(N)
    edges = extract_links(rd.from_arrow(t)).to_pandas()
    urls = t.column("url").to_pylist()
    got = set(zip(edges["src"], edges["dst"]))
    # generator ground truth (offsite links excluded from this check)
    exp = set()
    for i in range(N):
        for j in out_targets(i, N, 42):
            exp.add((urls[i], urls[j]))
    assert exp <= got
    offsite = {d for _, d in got if d.startswith("https://offsite")}
    assert offsite  # edge-only dst vertices exist
    # raw extraction keeps duplicates (dedup happens at graph build)
    assert len(edges) > len(got) - len(offsite)
