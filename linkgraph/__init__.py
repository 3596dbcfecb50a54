"""linkgraph — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the query / data-processing
capabilities of the HOOVER streaming-graph framework
(reference: /root/reference, e.g. src/hoover.cpp:3804-3947 iteration
pipeline), re-expressed Ray-Data-first:

- pages (Common-Crawl-style Parquet) -> text + hyperlink extraction
  (`linkgraph.extract`) -> hashed edge table (`linkgraph.edges`)
- an iterative BSP superstep engine over partition-pinned actor state
  (`linkgraph.engine`) running PageRank, connected components
  (min-label propagation), label-propagation clustering
  (`linkgraph.algos`)
- triangle counting as joins over the canonical edge table
- training-data ops: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding cosine), text analysis, ANN search, multimodal
  plumbing (`linkgraph.ops`)

No module here calls ``ray.init()``; sessions are owned by the caller
(bench.py, CLI, pytest fixture).
"""

__version__ = "0.1.0"
