from .pagerank import (
    PageRankProgram,
    PersonalizedPageRankProgram,
    WeightedPageRankProgram,
    pagerank,
    personalized_pagerank,
    weighted_pagerank,
)
from .cc import CCProgram, connected_components
from .labelprop import LabelPropProgram, label_propagation
from .triangles import ktruss, triangle_count
from .bfs import bfs_hops
from .kcore import kcore
from .gcn import gcn_features
from .walks import assemble_walks, random_walks
from .sssp import sssp_weighted
from .temporal import temporal_reach
from .widest import widest_path
from .hits import hits_dataset
from .katz import katz_dataset, katz_numpy
from .salsa import salsa_dataset, salsa_numpy
from .trustrank import trustrank_dataset, spam_mass, spam_mass_engine
from .bowtie import bowtie
from .coloring import greedy_coloring
from .dag import dag_levels
from .mis import maximal_independent_set
from .matching import MatchProgram, matching_replay, maximal_matching
from .msf import spanning_forest
from .scc import strongly_connected_components
from .hyperanf import hyperanf
from .betweenness import BrandesProgram, betweenness, top_degree_sources
from .hyperball import harmonic_centrality

__all__ = [
    "PageRankProgram",
    "PersonalizedPageRankProgram",
    "WeightedPageRankProgram",
    "pagerank",
    "personalized_pagerank",
    "weighted_pagerank",
    "CCProgram",
    "connected_components",
    "LabelPropProgram",
    "label_propagation",
    "ktruss",
    "triangle_count",
    "bfs_hops",
    "kcore",
    "gcn_features",
    "random_walks",
    "assemble_walks",
    "sssp_weighted",
    "temporal_reach",
    "widest_path",
    "hits_dataset",
    "katz_dataset",
    "katz_numpy",
    "salsa_dataset",
    "salsa_numpy",
    "trustrank_dataset",
    "spam_mass",
    "spam_mass_engine",
    "bowtie",
    "dag_levels",
    "greedy_coloring",
    "maximal_independent_set",
    "MatchProgram",
    "matching_replay",
    "maximal_matching",
    "spanning_forest",
    "strongly_connected_components",
    "BrandesProgram",
    "betweenness",
    "top_degree_sources",
    "harmonic_centrality",
    "hyperanf",
]
