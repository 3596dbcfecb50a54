"""Single-source shortest paths over weighted edges — the min-plus
generalization of BFS (reference `update_distances` hop recomputation,
src/hoover.cpp:2024-2056, with per-edge costs via the engine's
edge-value channel, the analogue of update_edge_info edge info,
src/hoover.cpp:485-520).

Per superstep the scattered message along edge (u, v) is
``dist(u) + w(u, v)``; the gather is a min-reduce; convergence is the
Bellman-Ford fixpoint. Monotone min-plus, so frontier gating applies:
late supersteps touch only improved vertices' out-edges.

Weights are a deterministic function of the endpoint ids (computed once
per partition at program init, never shipped). ``id_weight`` below is
the oracle-shared default: ``1 + (7*src + 13*dst) % 10``.

Unreached vertices report distance -1.
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram

_INF = np.int64(np.iinfo(np.int64).max // 2)


def id_weight(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Deterministic integer edge weight in [1, 10] from endpoint ids
    (identical arithmetic in __ray_entry__.oracle_sql sssp_weighted)."""
    s = src.astype(np.int64, copy=False)
    d = dst.astype(np.int64, copy=False)
    return 1 + (7 * s + 13 * d) % 10


class SSSPProgram(VertexProgram):
    reduce = "min"
    state_columns = ("dist",)
    conv_tol = 0.5  # stop when no distances improved
    frontier = True  # min-plus is monotone
    edge_weight_mode = "add"

    def __init__(self, source: int, weight_fn=id_weight):
        self.source = (
            np.int64(source).astype(np.uint64) if source < 0 else np.uint64(source)
        )
        self.edge_weight_fn = weight_fn

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        d = np.full(ctx.n_local, _INF, np.int64)
        i = np.searchsorted(ctx.verts, self.source)
        if i < ctx.n_local and ctx.verts[i] == self.source:
            d[i] = 0
        return {"dist": d}

    def vertex_values(self, ctx):
        # the engine adds the per-edge weight to this per-source value
        return ctx.state["dist"]

    def apply(self, ctx, idx, vals, g):
        d = ctx.state["dist"]
        changed = 0
        ctx.changed_idx = np.empty(0, np.int64)
        if len(idx):
            new = np.minimum(d[idx], vals)
            ch = new != d[idx]
            changed = int(ch.sum())
            d[idx] = new
            ctx.changed_idx = idx[ch]
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"dist_changed": changed}


def sssp_weighted(
    edges,
    source: int,
    num_parts: int = 8,
    max_iters: int = 200,
    weight_fn=id_weight,
    engine: SuperstepEngine | None = None,
):
    """edges -> (Dataset(v, dist), summary, engine); dist = -1 if
    unreachable."""
    eng = engine or SuperstepEngine(num_parts=num_parts).load_edges(edges)
    summary = eng.run(SSSPProgram(source, weight_fn), max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["dist"])

    import pyarrow as pa

    def fix(t: pa.Table) -> pa.Table:
        d = t.column("dist").to_numpy().copy()
        d[d >= _INF] = -1
        return pa.table({"v": t.column("v"), "dist": pa.array(d)})

    return out.map_batches(fix, batch_format="pyarrow"), summary, eng
