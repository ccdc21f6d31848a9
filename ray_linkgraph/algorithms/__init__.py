from .pagerank import PageRankProgram, pagerank
from .wcc import WccProgram, wcc
from .lpa import LpaProgram, lpa
from .degree import DegreeProgram, degree_centrality
from .sssp import SsspProgram, sssp
from .ppr import PprProgram, ppr, ppr_topk
from .kcore import KCoreProgram, kcore
from .triangle import triangle_count, clustering_coefficient
from .closeness import ClosenessProgram, closeness_centrality
from .betweenness import BetweennessProgram, betweenness_centrality
from .rings import RingsProgram, rings_detection
from .links import LinksProgram, links
from .louvain import louvain_communities, louvain_multilevel
from .subgraph import SubGraphProgram, subgraph_match

__all__ = [
    "PageRankProgram", "pagerank", "WccProgram", "wcc", "LpaProgram", "lpa",
    "DegreeProgram", "degree_centrality", "SsspProgram", "sssp",
    "PprProgram", "ppr", "ppr_topk",
    "KCoreProgram", "kcore", "triangle_count", "clustering_coefficient",
    "ClosenessProgram", "closeness_centrality",
    "BetweennessProgram", "betweenness_centrality",
    "RingsProgram", "rings_detection",
    "LinksProgram", "links", "louvain_communities",
    "louvain_multilevel",
    "SubGraphProgram", "subgraph_match",
]
