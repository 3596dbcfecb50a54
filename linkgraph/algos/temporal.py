"""Earliest-arrival temporal reachability over time-respecting paths
(Holme & Saramaki temporal-graph primitive): each directed edge carries
a timestamp; a path is time-respecting when successive edge stamps are
non-decreasing; arrival(v) is the minimum final-edge stamp over such
paths from the source (source arrival = 0: it may depart at any time).

Engine expression (the reference analogue is update_distances' hop
recomputation, src/hoover.cpp:2024-2056, generalized to the temporal
semiring): scattered message along (u, v, ts) is ``ts`` when
``ts >= arrival(u)`` and the min-identity sentinel otherwise — the
engine's ``edge_weight_mode='gate_ge'`` channel — gathered by min.
Monotone (a decreased arrival(u) only widens u's eligible edge set and
lowers candidates downstream), so the Bellman-Ford-style fixpoint is
the exact earliest arrival and frontier gating applies: late supersteps
touch only improved vertices' out-edges.

Stamps are a deterministic function of endpoint ids (computed once per
partition at program init, never shipped), identical arithmetic to the
windowed graph metrics and the SQL oracle: ``(13*src + 7*dst) % 21600``.

Unreached vertices report arrival -1.
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram

_INF = np.int64(np.iinfo(np.int64).max // 2)


def id_ts(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Deterministic edge timestamp in [0, 21600) from endpoint ids
    (identical arithmetic in __ray_entry__.oracle_sql temporal_reach
    and the window_triangles/window_cc stamps)."""
    s = src.astype(np.int64, copy=False)
    d = dst.astype(np.int64, copy=False)
    return (13 * s + 7 * d) % 21600


class EarliestArrivalProgram(VertexProgram):
    reduce = "min"
    state_columns = ("arrival",)
    conv_tol = 0.5  # stop when no arrivals improved
    frontier = True  # monotone min fixpoint
    edge_weight_mode = "gate_ge"

    def __init__(self, source: int, ts_fn=id_ts):
        self.source = (
            np.int64(source).astype(np.uint64) if source < 0 else np.uint64(source)
        )
        self.edge_weight_fn = ts_fn

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        a = np.full(ctx.n_local, _INF, np.int64)
        i = np.searchsorted(ctx.verts, self.source)
        if i < ctx.n_local and ctx.verts[i] == self.source:
            a[i] = 0
        return {"arrival": a}

    def vertex_values(self, ctx):
        # gate_ge compares each out-edge stamp against this value
        return ctx.state["arrival"]

    def apply(self, ctx, idx, vals, g):
        a = ctx.state["arrival"]
        changed = 0
        ctx.changed_idx = np.empty(0, np.int64)
        if len(idx):
            new = np.minimum(a[idx], vals.astype(np.int64, copy=False))
            ch = new != a[idx]
            changed = int(ch.sum())
            a[idx] = new
            ctx.changed_idx = idx[ch]
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"arrival_changed": changed}


def temporal_reach(
    edges,
    source: int,
    num_parts: int = 8,
    max_iters: int = 200,
    ts_fn=id_ts,
    engine: SuperstepEngine | None = None,
):
    """edges -> (Dataset(v, arrival), summary, engine); arrival = -1 if
    no time-respecting path from ``source`` reaches v (the source itself
    reports 0)."""
    eng = engine or SuperstepEngine(num_parts=num_parts).load_edges(edges)
    summary = eng.run(EarliestArrivalProgram(source, ts_fn), max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["arrival"])

    import pyarrow as pa

    def fix(t: pa.Table) -> pa.Table:
        a = t.column("arrival").to_numpy().copy()
        a[a >= _INF] = -1
        return pa.table({"v": t.column("v"), "arrival": pa.array(a)})

    return out.map_batches(fix, batch_format="pyarrow"), summary, eng
