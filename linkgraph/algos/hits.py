"""HITS hubs & authorities over the directed link graph — pure Ray-Data
operators (join + combiner + groupby), the classic link-analysis
companion to PageRank for web graphs.

Simultaneous-update variant (one exchange per iteration):

    auth_k(v) = sum over in-edges  (u, v) of hub_{k-1}(u)
    hub_k(v)  = sum over out-edges (v, w) of auth_{k-1}(w)

Both directions ride ONE join per iteration: the edge table is stored
once with a direction flag (fwd rows carry hub mass src->dst, rev rows
carry auth mass dst->src), each batch pre-aggregates per (to, dir)
before the global groupby (combiner), so the all-to-all carries unique
(vertex, dir) partials. Normalization (scale-invariant) is applied once
at export: each score vector divided by its L2 norm.

The __ray_entry__ oracle unrolls the same recurrence in SQL
(iteration-exact, round 8 dp), so this is fully DuckDB-checked.

(Reference analogue: the coupled-value aggregation pattern of
update_coupled_values, src/hoover.cpp:2819-2860, applied to a two-score
vertex state; SURVEY.md §2.7 grouped aggregates.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from .dataset_impl import _vertices


def hits_dataset(
    edges: Dataset,
    iters: int = 5,
    num_partitions: int | None = None,
    rescale_above: float = 1e100,
    rescale_check_every: int = 5,
) -> Dataset:
    """edges(src, dst) -> Dataset(v, hub, auth), L2-normalized, 8 dp."""
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)

    verts = _vertices(edges, num_partitions).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table(
            {
                "frm": pa.array(np.concatenate([s, d])),
                "to": pa.array(np.concatenate([d, s])),
                # dir 0: fwd edge (hub mass -> auth); dir 1: reversed
                # traversal of the same edge (auth mass -> hub)
                "dir": pa.array(
                    np.r_[np.zeros(len(s), np.int8), np.ones(len(s), np.int8)]
                ),
            }
        )

    be = edges.map_batches(
        both_dirs, batch_format="pyarrow", batch_size=1 << 20
    ).materialize()

    ranks = verts.map_batches(
        lambda t: pa.table(
            {
                "v": t.column("v"),
                "hub": pa.array(np.ones(len(t))),
                "auth": pa.array(np.ones(len(t))),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for it in range(iters):
        msgs = be.join(
            ranks, join_type="inner", num_partitions=num_partitions,
            on=("frm",), right_on=("v",),
        )

        def contrib(t: pa.Table) -> pa.Table:
            d = t.column("dir").to_numpy()
            val = np.where(
                d == 0, t.column("hub").to_numpy(), t.column("auth").to_numpy()
            )
            tt = pa.table({"to": t.column("to"), "dir": t.column("dir"), "c": pa.array(val)})
            g = tt.group_by(["to", "dir"]).aggregate([("c", "sum")])  # combiner
            return g.rename_columns(["to", "dir", "c"])

        inc = (
            msgs.map_batches(contrib, batch_format="pyarrow", batch_size=1 << 20)
            .groupby(["to", "dir"])
            .aggregate(Sum("c", alias_name="m"))
        )
        auth_in = inc.filter(expr="dir == 0").select_columns(["to", "m"])
        hub_in = inc.filter(expr="dir == 1").select_columns(["to", "m"])
        joined = verts.join(
            auth_in, join_type="left_outer", num_partitions=num_partitions,
            on=("v",), right_on=("to",),
        ).join(
            hub_in, join_type="left_outer", num_partitions=num_partitions,
            on=("v",), right_on=("to",), right_suffix="_h",
        )

        def apply(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            a = pc.fill_null(t.column("m"), 0.0)
            h = pc.fill_null(t.column("m_h"), 0.0)
            return pa.table({"v": t.column("v"), "hub": h, "auth": a})

        ranks = joined.map_batches(apply, batch_format="pyarrow").materialize()

        # Unnormalized hub/auth grow ~lambda^k per iteration, so large
        # --iters on hub-heavy graphs overflows float64 to inf and the
        # final normalization emits NaNs. Rescale each vector by its
        # global max once it nears overflow — each final vector is a
        # pure scalar multiple of the unscaled one (the recurrence is
        # linear), so the export L2 normalization folds the scale out;
        # gating at 1e100 keeps bit-parity with the unrolled SQL oracle
        # at normal iteration counts. Growth is geometric (~lambda per
        # iteration), so checking every 5th iteration suffices: values
        # overflow only past 1.8e308, and 5 unchecked iterations from
        # below 1e100 would need lambda > 1e41 — no real graph. This
        # removes a full aggregation pass from 4 of every 5 supersteps.
        if (it + 1) % rescale_check_every != 0:
            continue
        mx = ranks.max(["hub", "auth"])
        m = max(float(mx["max(hub)"]), float(mx["max(auth)"]))
        if m > rescale_above and m > 0.0:

            def rescale(t: pa.Table, s: float = m) -> pa.Table:
                return pa.table(
                    {
                        "v": t.column("v"),
                        "hub": pa.array(t.column("hub").to_numpy() / s),
                        "auth": pa.array(t.column("auth").to_numpy() / s),
                    }
                )

            ranks = ranks.map_batches(rescale, batch_format="pyarrow").materialize()

    sq = ranks.map_batches(
        lambda t: pa.table(
            {
                "h2": pa.array([float(np.square(t.column("hub").to_numpy()).sum())]),
                "a2": pa.array([float(np.square(t.column("auth").to_numpy()).sum())]),
            }
        ),
        batch_format="pyarrow",
    ).sum(["h2", "a2"])
    nh = np.sqrt(sq["sum(h2)"]) or 1.0
    na = np.sqrt(sq["sum(a2)"]) or 1.0

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("v"),
                "hub": pa.array(np.round(t.column("hub").to_numpy() / nh, 8)),
                "auth": pa.array(np.round(t.column("auth").to_numpy() / na, 8)),
            }
        )

    return ranks.map_batches(norm, batch_format="pyarrow")
