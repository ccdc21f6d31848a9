"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ray_linkgraph) calls ray.init()/ray.shutdown().

``queries()`` / ``oracle_sql()``: one entry per implemented operator
(SURVEY.md §2). The graph operators run over a deterministic link graph
derived from ``orders`` (see ray_linkgraph/tpch.py) through the full
engine path (dictionary encode -> partitioned canonical edges -> BSP
actor pool); the oracles compute the same recurrences as unrolled
ANSI-SQL CTEs. Iterative algorithms compare at a fixed superstep count;
floating aggregates are rounded to 10 decimals on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ray_linkgraph import tpch
from ray_linkgraph.ops import entries as ops_entries


def _register_by_value():
    """Ray worker processes inherit sys.path from ray.init time, not from
    this import — if the driver initialised Ray from another cwd, workers
    could not import ray_linkgraph. Registering the package for by-value
    cloudpickle serialization makes every task/actor self-contained."""
    try:
        from ray import cloudpickle
        for name, mod in list(sys.modules.items()):
            if name == "ray_linkgraph" or name.startswith("ray_linkgraph."):
                try:
                    cloudpickle.register_pickle_by_value(mod)
                except Exception:
                    pass
    except Exception:
        pass


_register_by_value()


def entry() -> Any:
    """Flagship pipeline at sf0.001: derived link graph -> PageRank to
    1e-6 convergence -> per-node ranks (node, rank)."""
    import numpy as np
    import pyarrow as pa
    from ray_linkgraph.algorithms import pagerank

    g = tpch.gate_graph("/root/testdata/sf0.001")
    res = pagerank(g, l1_threshold=1e-6, max_supersteps=100)
    nm = tpch._node_map(g)
    df = res.to_arrow().to_pandas().sort_values("v_id")
    return pa.table({"node": pa.array(nm[df["v_id"].to_numpy()]),
                     "rank": pa.array(df["rank"].to_numpy())})


def queries() -> dict[str, Callable[[str], Any]]:
    q = {
        "edges_derive": tpch.q_edges,
        "degree_centrality": tpch.q_degree,
        "pagerank_k6": tpch.q_pagerank,
        "wcc": tpch.q_wcc_nodes,
        "lpa_k10": tpch.q_lpa,
        "triangle_count": tpch.q_triangles,
        "sssp_k10": tpch.q_sssp,
        "kcore_k3": tpch.q_kcore,
        "clustering_coefficient": tpch.q_clustering,
        "ppr": tpch.q_ppr,
        "closeness_k4": tpch.q_closeness,
        "betweenness_k5": tpch.q_betweenness,
        "betweenness_s50": tpch.q_betweenness_sampled,
        "rings_k4": tpch.q_rings,
        "links_k4": tpch.q_links,
        "subgraph_diamond": tpch.q_subgraph,
        "louvain_l1": tpch.q_louvain,
        "louvain_ml2": tpch.q_louvain_ml,
    }
    q.update(ops_entries.queries())
    return q


def oracle_sql() -> dict[str, str]:
    o = {
        "edges_derive": tpch.sql_edges(),
        "degree_centrality": tpch.sql_degree(),
        "pagerank_k6": tpch.sql_pagerank(),
        "wcc": tpch.sql_wcc(),
        "lpa_k10": tpch.sql_lpa(),
        "triangle_count": tpch.sql_triangles(),
        "sssp_k10": tpch.sql_sssp(),
        "kcore_k3": tpch.sql_kcore(),
        "clustering_coefficient": tpch.sql_clustering(),
        "ppr": tpch.sql_ppr(),
        "closeness_k4": tpch.sql_closeness(),
        "betweenness_k5": tpch.sql_betweenness(),
        "betweenness_s50": tpch.sql_betweenness_sampled(),
        "rings_k4": tpch.sql_rings(),
        "links_k4": tpch.sql_links(),
        "subgraph_diamond": tpch.sql_subgraph(),
        "louvain_l1": tpch.sql_louvain(),
        "louvain_ml2": tpch.sql_louvain_ml(),
    }
    o.update(ops_entries.oracle_sql())
    return o
