"""Katz centrality over the directed link graph — pure Ray-Data
operators (join + combiner + groupby), the attenuated-path companion to
PageRank (counts all inbound walks, damped geometrically by length):

    x_k(v) = beta + alpha * sum over in-edges (u, v) of x_{k-1}(u),
    x_0(v) = beta

Fixed-iteration unrolling (no convergence test) keeps the recurrence a
pure polynomial in alpha, so the __ray_entry__ oracle replays it
iteration-exactly in SQL (round 8 dp) — the same unrolling trick as
pagerank_5 / ppr_5. alpha must stay below 1/lambda_max for the infinite
series to mean anything; at fixed k the value is well-defined for any
alpha, and the driver uses a small alpha so 8-dp rounding is stable.

Per superstep: edges ⨝ ranks (hash join on src) -> per-batch partial
sums by dst (combiner) -> groupby(dst).sum -> left-join to the vertex
set. One all-to-all per iteration carrying unique (dst, partial) rows —
the 100-TB shape is identical to pagerank_dataset.

(Reference analogue: the fixed-iteration vertex-update loop of
update_vertices, src/hoover.cpp:1216-1260; SURVEY.md §2.5 PageRank
family.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from .dataset_impl import _vertices


def katz_dataset(
    edges: Dataset,
    iters: int = 4,
    alpha: float = 0.05,
    beta: float = 1.0,
    num_partitions: int | None = None,
) -> Dataset:
    """edges(src, dst) -> Dataset(v, katz) after ``iters`` unrolled
    iterations (katz rounded to 8 dp at export)."""
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)

    verts = _vertices(edges, num_partitions).materialize()

    ranks = verts.map_batches(
        lambda t: t.append_column("x", pa.array(np.full(len(t), beta))),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        msgs = edges.join(
            ranks, join_type="inner", num_partitions=num_partitions,
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
        )
        joined = verts.join(
            incoming, join_type="left_outer", num_partitions=num_partitions,
            on=("v",), right_on=("dst",),
        )

        def apply(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.fill_null(t.column("m"), 0.0).to_numpy(zero_copy_only=False)
            return pa.table({"v": t.column("v"), "x": pa.array(beta + alpha * m)})

        ranks = joined.map_batches(apply, batch_format="pyarrow").materialize()

    def export(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t.column("v"), "katz": pa.array(np.round(t.column("x").to_numpy(), 8))}
        )

    return ranks.map_batches(export, batch_format="pyarrow")


def katz_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    iters: int = 4,
    alpha: float = 0.05,
    beta: float = 1.0,
) -> np.ndarray:
    """Dense-numpy oracle for tests: same fixed-iteration recurrence."""
    x = np.full(n, beta)
    for _ in range(iters):
        nxt = np.full(n, beta)
        np.add.at(nxt, dst, alpha * x[src])
        x = nxt
    return np.round(x, 8)
