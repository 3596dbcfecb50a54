"""BFS hop distance from a source vertex — the engine analogue of the
reference's bounded hop-distance recomputation (`update_distances`,
reference src/hoover.cpp:2024-2056): k-hop neighborhoods are k
supersteps of the min-plus exchange (SURVEY.md §2.1 row 5).

Unreached vertices report distance -1.
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram

_INF = np.int64(np.iinfo(np.int64).max // 2)


class BFSProgram(VertexProgram):
    reduce = "min"
    state_columns = ("dist",)
    conv_tol = 0.5  # stop when no distances improved
    frontier = True  # min-plus is monotone: only improved vertices rescatter

    def __init__(self, source: int):
        # accept signed ids (hashed-url bit-views): a negative source is
        # the int64 view of the uint64 vertex id stored in ctx.verts
        self.source = (
            np.int64(source).astype(np.uint64) if source < 0 else np.uint64(source)
        )

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        d = np.full(ctx.n_local, _INF, np.int64)
        i = np.searchsorted(ctx.verts, self.source)
        if i < ctx.n_local and ctx.verts[i] == self.source:
            d[i] = 0
        return {"dist": d}

    def vertex_values(self, ctx):
        return ctx.state["dist"] + 1

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


def bfs_hops(
    edges,
    source: int,
    num_parts: int = 8,
    max_iters: int = 100,
    directed: bool = True,
    engine: SuperstepEngine | None = None,
):
    """edges -> (Dataset(v, dist), summary); dist = -1 if unreachable."""
    eng = engine or SuperstepEngine(
        num_parts=num_parts, symmetrize=not directed
    ).load_edges(edges)
    summary = eng.run(BFSProgram(source), max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["dist"])

    import pyarrow as pa

    def fix(t: pa.Table) -> pa.Table:
        d = t.column("dist").to_numpy().copy()
        d[d >= _INF] = -1
        return pa.table({"v": t.column("v"), "dist": pa.array(d)})

    return out.map_batches(fix, batch_format="pyarrow"), summary, eng
