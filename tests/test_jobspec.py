"""JSON job-spec surface: the reference's rings.property_filter and
links.analyze_config contracts parsed into expr.Predicates and run
through the engine (RingsDetectionWithFilter.java, Links.java)."""

import json

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

import naive_ref
from ray_linkgraph.graph import build_graph
from ray_linkgraph.jobspec import (parse_links_config, parse_rings_filter,
                                   translate_aviator)


def test_translate_aviator():
    assert translate_aviator("$out.weight > $in.weight") == "w_out > w_in"
    assert translate_aviator("double($out.weight) >= 4") == "(w_out) >= 4"
    assert translate_aviator("$element.node % 2 == 0") == "node % 2 == 0"
    assert translate_aviator(
        "$out.weight > 1 && $out.weight < 9") == "(w_out > 1) & (w_out < 9)"
    assert translate_aviator(
        "$in.weight==$out.weight", out_name="w") == "w_in==w"
    with pytest.raises(ValueError):
        translate_aviator("$out.other > 1")


def test_parse_links_config_reference_shape():
    # the exact JSON shape of the reference's LinksTest.java:117-135
    cfg = parse_links_config(json.dumps({
        "start_vertexes": ["1", "2", "3"],
        "edge_end_condition": {"label": "pay",
                               "property_filter": "double($out.weight) >= 4"},
        "edge_compare_condition": {"label": "pay",
                                   "property_filter":
                                       "$out.weight > $in.weight"},
    }))
    assert cfg.start_vertexes == ["1", "2", "3"]
    assert cfg.spread == "w_out > w_in"
    assert cfg.end_edge == "(w) >= 4"
    assert cfg.end_vertex is None
    with pytest.raises(ValueError):
        parse_links_config(json.dumps({"start_vertexes": []}))
    with pytest.raises(ValueError):
        parse_links_config(json.dumps({"start_vertexes": ["1"]}))


def test_parse_rings_filter_groups():
    spec = parse_rings_filter(json.dumps({
        "start_vertex_filter": [{"label": "user",
                                 "property_filter": "$element.node < 6"}],
        "vertex_filter": [{"label": "user",
                           "property_filter": "$element.node != 3"}],
        "edge_filter": [{"label": "know",
                         "property_filter":
                             "$in.weight <= $out.weight"}],
    }))
    assert spec.start_mask(np.array([2, 7])).tolist() == [True, False]
    assert spec.vertex_mask(np.array([3, 4])).tolist() == [False, True]
    # $in-referencing edge expressions are skipped at superstep 0
    assert spec.edge_mask0(np.array([1.0])).tolist() == [True]
    assert spec.edge_mask(np.array([2.0, 1.0]),
                          np.array([1.0, 2.0])).tolist() == [True, False]
    # empty describe passes everything
    empty = parse_rings_filter("{}")
    assert empty.start_mask(np.array([0])).tolist() == [True]


@pytest.fixture(scope="module")
def wgraph(tmp_path_factory):
    """Small weighted digraph with rings of mixed weights."""
    rng = np.random.RandomState(7)
    src, dst, w = [], [], []
    n = 12
    for a in range(n):
        for b in range(n):
            if a != b and rng.rand() < 0.25:
                src.append(str(a))
                dst.append(str(b))
                w.append(float(rng.randint(1, 10)))
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                  "weight": pa.array(w)})
    d = tmp_path_factory.mktemp("jobspec_graph")
    g = build_graph(rd.from_arrow(t), str(d / "g"), n_parts=2,
                    weight_col="weight")
    adj_w = [[] for _ in range(g.V)]
    for s_, d_, w_ in zip(src, dst, w):
        adj_w[int(s_)].append((int(d_), w_))
    for a in adj_w:
        a.sort()
    return g, adj_w


DESCRIBE = json.dumps({
    "start_vertex_filter": [{"label": "user",
                             "property_filter": "$element.node < 9"}],
    "vertex_filter": [{"label": "user",
                       "property_filter": "$element.node != 4"}],
    "edge_filter": [{"label": "know",
                     "property_filter": "$out.weight >= 3"},
                    {"label": "know",
                     "property_filter": "$in.weight + 4 >= $out.weight"}],
})


def test_filtered_rings_vs_reference_semantics(wgraph):
    from ray_linkgraph.algorithms.rings import rings_detection_with_filter
    g, adj_w = wgraph
    res = rings_detection_with_filter(g, DESCRIBE, max_supersteps=5) \
        .to_arrow().to_pandas().sort_values("v_id").reset_index(drop=True)
    exp = naive_ref.naive_filtered_rings(
        g.V, adj_w, max_steps=5,
        start_ok=lambda v: v < 9,
        vertex_ok=lambda v: v != 4,
        edge0_ok=lambda w: w >= 3,
        edge_ok=lambda wo, wi: wo >= 3 and wi + 4 >= wo)
    exp_count = [len(r) for r in exp]
    assert res["ring_count"].tolist() == exp_count
    assert sum(exp_count) > 0        # the filter still admits rings
    # ring membership, not just counts
    got = ["" if not r else r for r in res["rings"].tolist()]
    for v in range(g.V):
        want = sorted(("-".join(map(str, seq)) for seq in exp[v]),
                      key=lambda x: (len(x), x))
        have = got[v].split(";") if got[v] else []
        assert have == want, f"vertex {v}"
    # and the filter actually bit: unfiltered differs
    full = naive_ref.naive_filtered_rings(g.V, adj_w, max_steps=5)
    assert [len(r) for r in full] != exp_count


def test_links_from_config(wgraph):
    from ray_linkgraph.algorithms.links import links_from_config
    g, adj_w = wgraph
    describe = json.dumps({
        "start_vertexes": ["0", "1", "2"],
        "edge_end_condition": {"label": "pay",
                               "property_filter":
                                   "double($out.weight) >= 8"},
        "edge_compare_condition": {"label": "pay",
                                   "property_filter":
                                       "$out.weight > $in.weight"},
    })
    res = links_from_config(g, describe, max_supersteps=4) \
        .to_arrow().to_pandas().sort_values("v_id").reset_index(drop=True)
    exp = naive_ref.naive_links(
        g.V, adj_w, starts=[0, 1, 2],
        spread=lambda wo, wi: wo > wi,
        end_edge=lambda s, d, w: w >= 8,
        max_steps=4)
    assert res["n_paths"].tolist() == [len(p) for p in exp]
    assert sum(len(p) for p in exp) > 0