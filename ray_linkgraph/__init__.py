"""ray-linkgraph: a Ray-Data-native link-graph analytics engine.

Built from scratch (not a port) with the compute capabilities of
hugegraph-computer's Pregel-style kernels — PageRank, WCC, label
propagation, triangle count, and friends — expressed as Ray Data
pipelines (``map_batches`` over zero-copy Arrow batches, stateful actor
pools for per-partition CSR adjacency, hash-partitioned message reduces
with map-side combining).

Reference semantics (conformance spec, see SURVEY.md):
    /root/reference/computer-algorithm/.../centrality/pagerank/PageRank.java
    /root/reference/computer-algorithm/.../community/wcc/Wcc.java
    /root/reference/computer-algorithm/.../community/lpa/Lpa.java
    /root/reference/computer-algorithm/.../community/trianglecount/TriangleCount.java
"""

__version__ = "0.1.0"
