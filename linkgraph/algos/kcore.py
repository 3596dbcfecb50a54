"""k-core decomposition (fixed k) as an iterative peel on the engine.

Each superstep a vertex's message is its activity bit; a vertex stays
active iff at least k of its (undirected) neighbors are active.
Converges to the k-core membership — another shape of the reference's
vertex-centric loop (degree-threshold peeling instead of value
propagation).
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram


class KCoreProgram(VertexProgram):
    reduce = "sum"
    state_columns = ("active",)
    conv_tol = 0.5

    def __init__(self, k: int):
        self.k = k

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        return {"active": np.ones(ctx.n_local, np.float64)}

    def vertex_values(self, ctx):
        return ctx.state["active"]

    def apply(self, ctx, idx, vals, g):
        act = ctx.state["active"]
        deg = np.zeros(ctx.n_local)
        if len(idx):
            deg[idx] = vals
        new = np.where((act > 0) & (deg >= self.k), 1.0, 0.0)
        changed = int((new != act).sum())
        ctx.state["active"] = new
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"deactivated": changed}


def kcore(
    edges,
    k: int,
    num_parts: int = 8,
    max_iters: int = 200,
    engine: SuperstepEngine | None = None,
):
    """edges (undirected) -> (Dataset(v, in_kcore:int64), summary)."""
    eng = engine or SuperstepEngine(num_parts=num_parts, symmetrize=True).load_edges(edges)
    summary = eng.run(KCoreProgram(k), max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["active"])

    import pyarrow as pa

    def fix(t: pa.Table) -> pa.Table:
        a = (t.column("active").to_numpy() > 0).astype(np.int64)
        return pa.table({"v": t.column("v"), "in_kcore": pa.array(a)})

    return out.map_batches(fix, batch_format="pyarrow"), summary, eng
