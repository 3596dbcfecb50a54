from .pagerank import PageRankProgram, pagerank
from .cc import CCProgram, connected_components
from .labelprop import LabelPropProgram, label_propagation
from .triangles import triangle_count

__all__ = [
    "PageRankProgram",
    "pagerank",
    "CCProgram",
    "connected_components",
    "LabelPropProgram",
    "label_propagation",
    "triangle_count",
]
