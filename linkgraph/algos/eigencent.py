"""Eigenvector centrality over the directed link graph — L1-normalized
power iteration with pure Ray-Data operators (join + combiner + groupby),
the un-damped companion to PageRank/Katz:

    m_k(v) = sum over in-edges (u, v) of x_{k-1}(u)
    x_k(v) = m_k(v) / sum_w m_k(w),      x_0(v) = 1.0

Fixed-iteration unrolling keeps the recurrence SQL-replayable
iteration-exactly (the katz_4 / pagerank_5 trick); the per-iteration
normalizer is ONE tiny global aggregate (a driver-held scalar — the
coupled-metric pattern, src/hoover.cpp:2819-2860), exactly like
PageRank's dangling-mass term. Vertices with no in-edges go to 0 after
one iteration and stay there.

Per superstep: edges ⨝ x (hash join on src) -> per-batch partial sums
by dst (combiner) -> groupby(dst).sum -> global Sum for the normalizer
-> left-join back to the vertex set. One all-to-all per iteration
carrying unique (dst, partial) rows — the 100-TB shape is identical to
pagerank_dataset / katz_dataset.

(Reference analogue: SURVEY.md §2.5 PageRank family — the
bench/graphx + bench/giraph comparison benches; HOOVER itself ships no
eigencentrality, as with PageRank.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from .dataset_impl import _vertices


def eigencent_dataset(
    edges: Dataset,
    iters: int = 4,
    num_partitions: int | None = None,
) -> Dataset:
    """edges(src, dst) -> Dataset(v, eigencent) after ``iters`` unrolled
    L1-normalized power iterations (rounded to 8 dp at export)."""
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)

    verts = _vertices(edges, num_partitions).materialize()

    x = verts.map_batches(
        lambda t: t.append_column("x", pa.array(np.ones(len(t)))),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        msgs = edges.join(
            x, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("v",),
        )

        def contrib(t: pa.Table) -> pa.Table:
            tt = pa.table({"dst": t.column("dst"), "c": t.column("x")})
            g = tt.group_by("dst").aggregate([("c", "sum")])  # combiner
            return g.rename_columns(["dst", "c"])

        incoming = (
            msgs.map_batches(contrib, batch_format="pyarrow", batch_size=1 << 20)
            .groupby("dst")
            .aggregate(Sum("c", alias_name="m"))
            .materialize()
        )
        total = incoming.aggregate(Sum("m", alias_name="s"))["s"] or 1.0

        joined = verts.join(
            incoming, join_type="left_outer", num_partitions=num_partitions,
            on=("v",), right_on=("dst",),
        )

        def apply(t: pa.Table, s=total) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.fill_null(t.column("m"), 0.0).to_numpy(zero_copy_only=False)
            return pa.table({"v": t.column("v"), "x": pa.array(m / s)})

        x = joined.map_batches(apply, batch_format="pyarrow").materialize()

    def export(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("v"),
                "eigencent": pa.array(np.round(t.column("x").to_numpy(), 8)),
            }
        )

    return x.map_batches(export, batch_format="pyarrow")
