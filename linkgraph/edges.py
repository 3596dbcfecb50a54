"""Edge-table construction and degree materialization (SURVEY.md §7 steps 2-3).

pages -> ExtractEdges (stateless map_batches, in-batch dedup combiner)
      -> global dedup via groupby((src, dst))  [the first shuffle]
degrees: per-batch partial counts (pyarrow group_by combiner) -> small
groupby-sum shuffle, the scalable pre-aggregation pattern for power-law
hubs (SURVEY.md §4 skew row).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from .extract import ExtractEdges


def build_edges(
    pages: Dataset,
    dedup: bool = True,
    canonicalize: bool = False,
    typed: bool = False,
) -> Dataset:
    """pages(url, html) -> deduplicated hashed edge table (src, dst) uint64.

    ``canonicalize=True`` rewrites page urls to RFC 3986 canonical form
    before extraction/hashing (linkgraph.urlnorm), collapsing spelling
    variants of one page to one vertex; off by default to preserve the
    byte-identical golden invariant on already-canonical corpora.
    ``typed=True`` adds the int8 ``nofollow`` edge-type column
    (rel=nofollow anchors; the reference's hvr_edge_type analogue,
    inc/hvr_common.h:96-117), deduped with min(nofollow) per edge.

    Reference parity: explicit-edge creation + idempotent upsert
    (reference src/hoover.cpp:2289-2355, 450-600 `update_edge_info`
    early-return on existing edge) expressed as extract + distinct.
    """
    if canonicalize:
        from .urlnorm import canonicalize_pages

        pages = canonicalize_pages(pages)
    edges = pages.map_batches(
        ExtractEdges(canonicalize=canonicalize, typed=typed),
        batch_format="pyarrow",
        batch_size=4096,
    )
    if dedup:
        edges = distinct_edges_typed(edges) if typed else distinct_edges(edges)
    return edges


def distinct_edges_typed(edges: Dataset) -> Dataset:
    """Global dedup of TYPED edges (src, dst, nofollow): one (src, dst)
    range sort, then per-block run-min of nofollow — one followed
    anchor anywhere in the crawl makes the edge a follow edge. Exact
    across blocks: the sort key IS the dedup key (equal composite keys
    share a block), so unlike coarser-key folds no correction pass is
    needed."""
    import numpy as np

    def fold(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        if len(s) == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "nofollow": pa.array([], pa.int8()),
                }
            )
        d = t.column("dst").to_numpy()
        nf = t.column("nofollow").to_numpy()
        starts = np.flatnonzero(np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])])
        return pa.table(
            {
                "src": pa.array(s[starts]),
                "dst": pa.array(d[starts]),
                "nofollow": pa.array(np.minimum.reduceat(nf, starts)),
            }
        )

    return edges.sort(["src", "dst"]).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


def distinct_pairs(ds: Dataset, c1: str, c2: str) -> Dataset:
    """Exact dedup on (c1, c2): global range sort + adjacent-mask.

    ``ds.sort([c1, c2])`` range-partitions by value comparison, so ALL
    rows with an equal (c1, c2) land in the same output block (equal
    keys compare identically against every sampled boundary);
    duplicates are then adjacent within a block and one vectorized mask
    per block removes them. Measured 12x faster than the previous
    bucket-hash ``groupby("part").map_groups`` at 767k pairs (1.4s vs
    10.9s at 32 cpus) and ~12x faster than ``groupby((c1, c2)).count``
    — the sort is the same all-to-all exchange, without the per-group
    materialization machinery. batch_size=None keeps batches aligned to
    the sorted blocks (a re-sliced batch could split an equal run)."""
    import numpy as np

    def dedup_sorted(t: pa.Table) -> pa.Table:
        s = t.column(c1).to_numpy()
        d = t.column(c2).to_numpy()
        if len(s) == 0:
            return t
        m = np.empty(len(s), bool)
        m[0] = True
        m[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        return pa.table({c1: pa.array(s[m]), c2: pa.array(d[m])})

    return ds.sort([c1, c2]).map_batches(
        dedup_sorted, batch_format="pyarrow", batch_size=None
    )


def distinct_edges(edges: Dataset, num_buckets: int = 64) -> Dataset:
    """Exact dedup on (src, dst) — see :func:`distinct_pairs`.
    ``num_buckets`` is kept for signature compatibility (unused)."""
    return distinct_pairs(edges, "src", "dst")


def _partial_counts(key: str, out: str):
    def fn(batch: pa.Table) -> pa.Table:
        g = batch.group_by(key).aggregate([(key, "count")])
        return g.rename_columns([key, out])

    return fn


def out_degrees(edges: Dataset, src_col: str = "src", out: str = "out_deg") -> Dataset:
    """(src, out_deg) — combiner per batch, then a small groupby-sum."""
    partial = edges.map_batches(_partial_counts(src_col, "_c"), batch_format="pyarrow", batch_size=131072)
    return partial.groupby(src_col).aggregate(Sum("_c", alias_name=out))


def in_degrees(edges: Dataset, dst_col: str = "dst", out: str = "in_deg") -> Dataset:
    partial = edges.map_batches(_partial_counts(dst_col, "_c"), batch_format="pyarrow", batch_size=131072)
    return partial.groupby(dst_col).aggregate(Sum("_c", alias_name=out))


def degree_histogram(edges: Dataset, col: str = "src") -> Dataset:
    """(degree, n_vertices) — the skew profile the partitioner cares about."""
    degs = out_degrees(edges, src_col=col, out="deg")
    partial = degs.map_batches(_partial_counts("deg", "_c"), batch_format="pyarrow", batch_size=131072)
    return partial.groupby("deg").aggregate(Sum("_c", alias_name="n_vertices"))
