"""SALSA hubs & authorities (Lempel & Moran 2000) — the degree-
normalized cousin of HITS used by web-search link analysis (the TKC
effect fix): each endorsement is diluted by the endorser's degree, so
densely interlinked cliques cannot monopolize the score.

Simultaneous-update power iteration (one exchange per iteration):

    auth_k(v) = sum over in-edges  (u, v) of hub_{k-1}(u)  / outdeg(u)
    hub_k(v)  = sum over out-edges (v, w) of auth_{k-1}(w) / indeg(w)

Fixed-iteration unrolling, init hub = auth = 1 — iteration-exact vs
the unrolled SQL oracle in __ray_entry__ (round 8 dp; the normalized
updates are averages, so no overflow rescale is needed, unlike HITS).

Distributed shape (the hits_dataset pattern): the edge table is stored
ONCE doubled with a direction flag and a pre-divided weight column
(fwd rows carry 1/outdeg(src), rev rows 1/indeg(dst) — degrees join in
a single setup pass, never per iteration); each superstep is one hash
join ranks x doubled-edges on the sender + a per-batch (to, dir)
combiner + one groupby.

(Reference analogue: SURVEY.md §2.5 PageRank family / §2.7 grouped
aggregates; the two-score state mirrors update_coupled_values,
src/hoover.cpp:2819-2860.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..edges import in_degrees, out_degrees
from .dataset_impl import _vertices


def salsa_dataset(
    edges: Dataset,
    iters: int = 5,
    num_partitions: int | None = None,
) -> Dataset:
    """edges(src, dst) -> Dataset(v, hub, auth), 8 dp."""
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)

    verts = _vertices(edges, num_partitions).materialize()

    outd = out_degrees(edges, out="odeg").materialize()
    ind = in_degrees(edges, out="ideg").materialize()
    ewd = edges.join(
        outd, join_type="inner", num_partitions=num_partitions,
        on=("src",), right_on=("src",),
    ).join(
        ind, join_type="inner", num_partitions=num_partitions,
        on=("dst",), right_on=("dst",),
    )

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        od = t.column("odeg").to_numpy().astype(np.float64)
        idg = t.column("ideg").to_numpy().astype(np.float64)
        return pa.table(
            {
                "frm": pa.array(np.concatenate([s, d])),
                "to": pa.array(np.concatenate([d, s])),
                # dir 0: fwd edge (hub mass -> auth, diluted by the
                # sender's out-degree); dir 1: reversed traversal
                # (auth mass -> hub, diluted by the target's in-degree)
                "dir": pa.array(
                    np.r_[np.zeros(len(s), np.int8), np.ones(len(s), np.int8)]
                ),
                "w": pa.array(np.concatenate([1.0 / od, 1.0 / idg])),
            }
        )

    be = ewd.map_batches(
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

    for _ in range(iters):
        msgs = be.join(
            ranks, join_type="inner", num_partitions=num_partitions,
            on=("frm",), right_on=("v",),
        )

        def contrib(t: pa.Table) -> pa.Table:
            d = t.column("dir").to_numpy()
            val = t.column("w").to_numpy() * np.where(
                d == 0, t.column("hub").to_numpy(), t.column("auth").to_numpy()
            )
            tt = pa.table(
                {"to": t.column("to"), "dir": t.column("dir"), "c": pa.array(val)}
            )
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

    def export(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("v"),
                "hub": pa.array(np.round(t.column("hub").to_numpy(), 8)),
                "auth": pa.array(np.round(t.column("auth").to_numpy(), 8)),
            }
        )

    return ranks.map_batches(export, batch_format="pyarrow")


def salsa_numpy(src, dst, n, iters=5):
    """Dense-numpy oracle: same simultaneous-update recurrence."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    od = np.bincount(src, minlength=n).astype(float)
    idg = np.bincount(dst, minlength=n).astype(float)
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(iters):
        a2 = np.zeros(n)
        np.add.at(a2, dst, hub[src] / od[src])
        h2 = np.zeros(n)
        np.add.at(h2, src, auth[dst] / idg[dst])
        hub, auth = h2, a2
    return np.round(hub, 8), np.round(auth, 8)
