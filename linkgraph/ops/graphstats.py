"""Webgraph structure statistics: host-graph collapse, reciprocity,
local clustering coefficients.

All three follow the repo's scale rules: per-batch combiners ahead of
every global groupby, hash joins for the wide steps (never a broadcast
of a large side), bucket-and-vectorize for per-group work. Each has a
row-exact DuckDB oracle in __ray_entry__.

(Reference analogue: SURVEY.md §2.7 grouped aggregates / joins / set
ops; the host collapse mirrors the partition-window coarsening idea of
update_partition_window, src/hoover.cpp:1185-1220, applied to the
vertex id space instead of the spatial domain.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..edges import _partial_counts


def _nparts(num_partitions: int | None) -> int:
    if num_partitions is not None:
        return num_partitions
    import ray

    return max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)


def host_graph(
    edges: Dataset,
    doc_hosts: Dataset,
    num_partitions: int | None = None,
) -> Dataset:
    """Collapse the page graph to the host graph.

    edges(src, dst) x doc_hosts(doc_id, host) -> (src_host, dst_host,
    n_links): two hash joins map each endpoint to its host, a per-batch
    combiner pre-aggregates (src_host, dst_host) pairs, one small
    groupby sums the partials. The host table is joined, not broadcast —
    at web scale #hosts is itself large."""
    P = _nparts(num_partitions)
    j1 = edges.join(
        doc_hosts, join_type="inner", num_partitions=P,
        on=("src",), right_on=("doc_id",),
    ).select_columns(["dst", "host"]).rename_columns({"host": "src_host"})
    j2 = j1.join(
        doc_hosts, join_type="inner", num_partitions=P,
        on=("dst",), right_on=("doc_id",),
    ).select_columns(["src_host", "host"]).rename_columns({"host": "dst_host"})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["src_host", "dst_host"]).aggregate([("src_host", "count")])
        return g.rename_columns(["src_host", "dst_host", "_c"])

    return (
        j2.map_batches(combine, batch_format="pyarrow", batch_size=1 << 20)
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("_c", alias_name="n_links"))
    )


def reciprocity(edges: Dataset, num_partitions: int | None = None) -> pd.DataFrame:
    """Edge reciprocity of the directed graph: one row
    (n_edges, n_reciprocal, reciprocity) where n_reciprocal counts
    directed edges whose reverse also exists. Self-join on the full
    (src, dst) key — a hash shuffle join, no driver materialization."""
    P = _nparts(num_partitions)

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("dst"), "dst": t.column("src")})

    reversed_e = edges.map_batches(rev, batch_format="pyarrow", batch_size=1 << 20)
    n_recip = edges.join(
        reversed_e, join_type="inner", num_partitions=P, on=("src", "dst")
    ).count()
    n_edges = edges.count()
    return pd.DataFrame(
        {
            "n_edges": [np.int64(n_edges)],
            "n_reciprocal": [np.int64(n_recip)],
            "reciprocity": [round(n_recip / n_edges, 8) if n_edges else 0.0],
        }
    )


def clustering_coefficient(
    edges: Dataset, num_partitions: int | None = None
) -> Dataset:
    """Local clustering coefficient on the undirected simple graph:
    (v, degree, n_triangles, clustering) for every vertex, clustering =
    2T(v) / (d(v) (d(v)-1)) and 0.0 where d < 2.

    T(v) comes from the degree-oriented wedge pipeline
    (triangle_counts_per_vertex — sqrt(m)-bounded, fully bucketed);
    d(v) is the distinct-neighbor count via canonical-pair dedup +
    combiner counts. One left join lines them up."""
    from ..algos.triangles import triangle_counts_per_vertex

    P = _nparts(num_partitions)

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64, copy=False)
        d = t.column("dst").to_numpy().astype(np.int64, copy=False)
        keep = s != d
        s, d = s[keep], d[keep]
        pairs = np.unique(
            np.stack([np.minimum(s, d), np.maximum(s, d)], axis=1), axis=0
        )
        return pa.table({"u": pa.array(pairs[:, 0]), "v": pa.array(pairs[:, 1])})

    cpairs = edges.map_batches(canon, batch_format="pyarrow", batch_size=1 << 20)
    # global dedup of canonical pairs: bucket by pair hash, unique per group
    B = max(P * 4, 16)

    def bucket(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        return pa.table(
            {"u": t.column("u"), "v": t.column("v"), "part": pa.array((u * 31 + v) % B)}
        )

    def dedup_count(g: pd.DataFrame) -> pd.DataFrame:
        pairs = np.unique(
            np.stack([g["u"].to_numpy(), g["v"].to_numpy()], axis=1), axis=0
        )
        ends = np.concatenate([pairs[:, 0], pairs[:, 1]])
        ids, cnt = np.unique(ends, return_counts=True)  # in-bucket combiner
        return pd.DataFrame({"v": ids, "_c": cnt.astype(np.int64)})

    deg = (
        cpairs.map_batches(bucket, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("part")
        .map_groups(dedup_count, batch_format="pandas")
        .groupby("v")
        .aggregate(Sum("_c", alias_name="degree"))
    )
    tri = triangle_counts_per_vertex(edges, num_partitions=P)
    joined = deg.join(
        tri, join_type="left_outer", num_partitions=P,
        on=("v",), right_on=("v",), right_suffix="_t",
    )

    def coeff(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = t.column("degree").to_numpy().astype(np.float64)
        tr = pc.fill_null(t.column("n_triangles"), 0).to_numpy(zero_copy_only=False)
        denom = d * (d - 1.0)
        c = np.where(denom > 0, 2.0 * tr / np.where(denom > 0, denom, 1.0), 0.0)
        return pa.table(
            {
                "v": t.column("v"),
                "degree": t.column("degree"),
                "n_triangles": pa.array(tr.astype(np.int64)),
                "clustering": pa.array(np.round(c, 8)),
            }
        )

    return joined.map_batches(coeff, batch_format="pyarrow")
