"""Widest path (maximum-bottleneck) from a single source — the max-min
semiring companion to SSSP's min-plus (reference analogue: the same
`update_distances` hop recomputation, src/hoover.cpp:2024-2056, run
over a different semiring via the engine's edge-value channel).

bottleneck(v) = max over paths source->v of the minimum edge weight on
the path; it is the classic bandwidth / maximum-capacity-route metric.

Engine expression: rather than adding a max-reduce, the program stores
the NEGATED bottleneck ``x = -bneck`` so the fixpoint becomes a
monotone min-reduce (x only ever decreases) and the engine's existing
frontier gating, relay re-aggregation and checkpoint machinery apply
unchanged.  The scattered message along (u, v, w) is
``max(x(u), -w) == -min(bneck(u), w)`` — the engine's
``edge_weight_mode='cap_neg'`` channel — gathered by min.

Weights reuse SSSP's deterministic id_weight in [1, 10] (identical
arithmetic in the SQL oracle).  The source reports bneck = BIG
(2^30, the "infinite capacity at the origin" convention shared with
the oracle's recursive-CTE seed); unreached vertices report -1.
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram
from .sssp import id_weight

_INF = np.int64(np.iinfo(np.int64).max // 2)
BIG = np.int64(1) << 30  # source capacity sentinel, mirrored in the SQL oracle


class WidestPathProgram(VertexProgram):
    reduce = "min"
    state_columns = ("negb",)
    conv_tol = 0.5  # stop when no bottlenecks improved
    frontier = True  # negated max-min is a monotone min fixpoint
    edge_weight_mode = "cap_neg"

    def __init__(self, source: int, weight_fn=id_weight):
        self.source = (
            np.int64(source).astype(np.uint64) if source < 0 else np.uint64(source)
        )
        self.edge_weight_fn = weight_fn

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        x = np.full(ctx.n_local, _INF, np.int64)
        i = np.searchsorted(ctx.verts, self.source)
        if i < ctx.n_local and ctx.verts[i] == self.source:
            x[i] = -BIG
        return {"negb": x}

    def vertex_values(self, ctx):
        # cap_neg combines each out-edge weight: max(x(src), -w)
        return ctx.state["negb"]

    def apply(self, ctx, idx, vals, g):
        x = ctx.state["negb"]
        changed = 0
        ctx.changed_idx = np.empty(0, np.int64)
        if len(idx):
            new = np.minimum(x[idx], vals.astype(np.int64, copy=False))
            ch = new != x[idx]
            changed = int(ch.sum())
            x[idx] = new
            ctx.changed_idx = idx[ch]
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"bneck_changed": changed}


def widest_path(
    edges,
    source: int,
    num_parts: int = 8,
    max_iters: int = 200,
    weight_fn=id_weight,
    engine: SuperstepEngine | None = None,
):
    """edges -> (Dataset(v, bneck), summary, engine); bneck = -1 if
    unreachable, BIG (2^30) for the source itself."""
    eng = engine or SuperstepEngine(num_parts=num_parts).load_edges(edges)
    summary = eng.run(WidestPathProgram(source, weight_fn), max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["negb"])

    import pyarrow as pa

    def fix(t: pa.Table) -> pa.Table:
        x = t.column("negb").to_numpy().copy()
        b = np.where(x >= _INF, np.int64(-1), -x)
        return pa.table({"v": t.column("v"), "bneck": pa.array(b)})

    return out.map_batches(fix, batch_format="pyarrow"), summary, eng
