"""Pure Ray-Data-operator implementations of the superstep kernel
(SURVEY.md §7 step 4a) — PageRank and CC expressed only with
map_batches / join / groupby aggregates, no pinned actor state.

This is the comparison variant: each superstep re-shuffles the edge
table (join on src + groupby dst), where the actor engine
(linkgraph.engine) shuffles once at load and then exchanges only
combiner-reduced messages. bench.py records both; the actor engine is
~1-2 orders of magnitude faster per superstep at equal correctness.
These stay useful where engine state doesn't fit (edge set >> cluster
RAM) since every stage streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum, Min

from ..edges import out_degrees


def _vertices(edges: Dataset, num_partitions: int) -> Dataset:
    def both(t: pa.Table) -> pa.Table:
        x = np.unique(
            np.concatenate([t.column("src").to_numpy(), t.column("dst").to_numpy()])
        )
        return pa.table({"v": pa.array(x)})

    return (
        edges.map_batches(both, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("v")
        .count()
        .select_columns(["v"])
    )


def pagerank_dataset(
    edges: Dataset,
    iters: int = 5,
    damping: float = 0.85,
    num_partitions: int | None = None,
) -> Dataset:
    """Fixed-iteration PageRank with pure Dataset ops -> (v, rank).

    Per superstep: edges ⨝ ranks (hash join on src) -> per-batch partial
    sums by dst (combiner) -> groupby(dst).sum -> left-join back to the
    vertex set with dangling-mass redistribution.
    """
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)

    verts = _vertices(edges, num_partitions).materialize()
    n = verts.count()
    deg = out_degrees(edges, out="deg").materialize()

    # edges with sender out-degree (join once, reused every superstep)
    ewd = edges.join(
        deg, join_type="inner", num_partitions=num_partitions,
        on=("src",), right_on=("src",), right_suffix="_r",
    ).materialize()

    ranks = verts.map_batches(
        lambda t: t.append_column("rank", pa.array(np.full(len(t), 1.0 / n))),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        # dangling mass = total rank - rank held by senders
        sender_rank = ranks.join(
            deg, join_type="inner", num_partitions=num_partitions,
            on=("v",), right_on=("src",),
        )
        held = sender_rank.aggregate(Sum("rank", alias_name="s"))["s"] or 0.0
        total = ranks.aggregate(Sum("rank", alias_name="s"))["s"]
        dangling = total - held

        msgs = ewd.join(
            ranks, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("v",),
        )

        def contrib(t: pa.Table) -> pa.Table:
            c = t.column("rank").to_numpy() / t.column("deg").to_numpy()
            tt = pa.table({"dst": t.column("dst"), "c": pa.array(c)})
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
            r = (1 - damping) / n + damping * (m + dangling / n)
            return pa.table({"v": t.column("v"), "rank": pa.array(r)})

        ranks = joined.map_batches(apply, batch_format="pyarrow").materialize()
    return ranks


def weighted_pagerank_dataset(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    iters: int = 5,
    damping: float = 0.85,
    num_partitions: int | None = None,
    local_threshold: int = 2_000_000,
) -> Dataset:
    """Fixed-iteration PageRank over DATA-DEPENDENT edge weights ->
    (v, rank). The engine's per-edge value channel only carries
    id-derived weights (weights live where edges live, never shipped),
    so aggregate weights from the data — e.g. link counts of the
    collapsed host graph (ops/graphstats.host_graph -> hostrank) — take
    this pure-Dataset path: transition mass = w(u,v) / W_out(u). Keys
    may be any joinable type (host STRINGS work directly; production
    would dictionary-encode hosts to ints at ingest, the oracle story
    here keeps the strings end-to-end). Same per-superstep shape as
    pagerank_dataset: one hash join + per-batch combiner + groupby sum.

    A COLLAPSED graph is usually tiny relative to its source (10^8
    hosts vs 10^12 pages): at <= local_threshold edge rows the
    distributed work is the collapse itself, so the recurrence runs
    in-driver on numpy (per-iteration Dataset joins would be pure
    scheduling latency — measured 24 s vs <1 s on a 1024-host
    collapse). Above the gate, the streaming join path takes over.
    """
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)

    if edges.count() <= local_threshold:
        import pandas as pd
        import ray

        df = edges.to_pandas()
        s = df[src_col].to_numpy()
        t = df[dst_col].to_numpy()
        w = df[weight_col].to_numpy().astype(np.float64)
        verts, codes = np.unique(np.concatenate([s, t]), return_inverse=True)
        si, ti = codes[: len(s)], codes[len(s):]
        n = len(verts)
        outw = np.zeros(n)
        np.add.at(outw, si, w)
        r = np.full(n, 1.0 / n)
        for _ in range(iters):
            dang = r[outw == 0.0].sum()
            m = np.zeros(n)
            np.add.at(m, ti, r[si] / outw[si] * w)
            r = (1 - damping) / n + damping * (m + dang / n)
        return ray.data.from_pandas(pd.DataFrame({"v": verts, "rank": r}))

    def both(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        x = pa.concat_arrays(
            [
                t.column(src_col).combine_chunks().cast(t.schema.field(src_col).type),
                t.column(dst_col).combine_chunks().cast(t.schema.field(src_col).type),
            ]
        )
        return pa.table({"v": pc.unique(x)})

    verts = (
        edges.map_batches(both, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("v")
        .count()
        .select_columns(["v"])
        .materialize()
    )
    n = verts.count()

    def wfloat(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                src_col: t.column(src_col),
                dst_col: t.column(dst_col),
                "_w": pc.cast(t.column(weight_col), pa.float64()),
            }
        )

    ew = edges.map_batches(wfloat, batch_format="pyarrow")
    outw = (
        ew.groupby(src_col).aggregate(Sum("_w", alias_name="w_out")).materialize()
    )
    ewd = ew.join(
        outw, join_type="inner", num_partitions=num_partitions,
        on=(src_col,), right_on=(src_col,), right_suffix="_r",
    ).materialize()

    ranks = verts.map_batches(
        lambda t: t.append_column("rank", pa.array(np.full(len(t), 1.0 / n))),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        sender_rank = ranks.join(
            outw, join_type="inner", num_partitions=num_partitions,
            on=("v",), right_on=(src_col,),
        )
        held = sender_rank.aggregate(Sum("rank", alias_name="s"))["s"] or 0.0
        total = ranks.aggregate(Sum("rank", alias_name="s"))["s"]
        dangling = total - held

        msgs = ewd.join(
            ranks, join_type="inner", num_partitions=num_partitions,
            on=(src_col,), right_on=("v",),
        )

        def contrib(t: pa.Table) -> pa.Table:
            c = (
                t.column("rank").to_numpy()
                / t.column("w_out").to_numpy()
                * t.column("_w").to_numpy()
            )
            tt = pa.table({"dst": t.column(dst_col), "c": pa.array(c)})
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
            r = (1 - damping) / n + damping * (m + dangling / n)
            return pa.table({"v": t.column("v"), "rank": pa.array(r)})

        ranks = joined.map_batches(apply, batch_format="pyarrow").materialize()
    return ranks


def cc_dataset(edges: Dataset, max_iters: int = 50, num_partitions: int | None = None) -> Dataset:
    """Min-label propagation CC with pure Dataset ops -> (v, label)."""
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)

    def sym(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d])),
                "dst": pa.array(np.concatenate([d, s])),
            }
        )

    ue = edges.map_batches(sym, batch_format="pyarrow", batch_size=1 << 20).materialize()
    labels = _vertices(ue, num_partitions).map_batches(
        lambda t: t.append_column("label", t.column("v")), batch_format="pyarrow"
    ).materialize()

    for _ in range(max_iters):
        msgs = ue.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("v",),
        )

        def pmin(t: pa.Table) -> pa.Table:
            tt = pa.table({"dst": t.column("dst"), "l": t.column("label")})
            g = tt.group_by("dst").aggregate([("l", "min")])
            return g.rename_columns(["dst", "l"])

        nbr_min = (
            msgs.map_batches(pmin, batch_format="pyarrow", batch_size=1 << 20)
            .groupby("dst")
            .aggregate(Min("l", alias_name="m"))
        )
        joined = labels.join(
            nbr_min, join_type="left_outer", num_partitions=num_partitions,
            on=("v",), right_on=("dst",),
        )

        def apply(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # arrow kernels keep int64 labels exact (a float64 round-trip
            # would corrupt 64-bit hash ids)
            m = pc.coalesce(t.column("m"), t.column("label"))
            new = pc.min_element_wise(t.column("label"), m)
            chg = pc.cast(pc.not_equal(new, t.column("label")), pa.int64())
            return pa.table({"v": t.column("v"), "label": new, "chg": chg})

        stepped = joined.map_batches(apply, batch_format="pyarrow").materialize()
        changed = stepped.aggregate(Sum("chg", alias_name="s"))["s"]
        labels = stepped.drop_columns(["chg"])
        if not changed:
            break
    return labels
