"""DAG longest-path levels (dependency depth): level(v) = the longest
path length from any source to v over a DAG edge set — the
topological-level / critical-path primitive of lineage and scheduling
analytics.

Engine mapping: monotone max-plus propagation (level' = max(level,
max_in(level_u + 1))), shipped as NEGATED int64 through the engine's
min-reduce (min(-x) == -max(x), the same complement trick as SCC's
forward coloring) — monotone, so frontier-gated like BFS; converges
in (longest-path length) supersteps.

The caller supplies edges that form a DAG (the query filters the
derived doc graph to src < dst, acyclic by construction); on a cyclic
input the fixpoint would not exist and max_iters bounds the run.

(Reference analogue: SURVEY.md §2.1 row 5 update_distances — the
max-plus dual of the BFS min-plus program, reference
src/hoover.cpp:2024-2056.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..engine import SuperstepEngine, VertexProgram


class DagLevelProgram(VertexProgram):
    reduce = "min"
    state_columns = ("lvl",)
    conv_tol = 0.5
    frontier = True  # max-plus is monotone

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        return {"lvl": np.zeros(ctx.n_local, np.int64)}

    def vertex_values(self, ctx):
        return -(ctx.state["lvl"] + 1)

    def apply(self, ctx, idx, vals, g):
        lvl = ctx.state["lvl"]
        changed = 0
        ctx.changed_idx = np.empty(0, np.int64)
        if len(idx):
            new = np.maximum(lvl[idx], -vals)
            ch = new != lvl[idx]
            changed = int(ch.sum())
            lvl[idx] = new
            ctx.changed_idx = idx[ch]
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"levels_changed": changed}


def dag_levels(
    edges,
    num_parts: int = 8,
    max_iters: int = 1000,
    min_edges_per_part: int = 100_000,
):
    """edges Dataset (src, dst; must be a DAG) ->
    (Dataset(v:int64, lvl:int64), summary)."""
    n_edges = edges.count()
    num_parts = max(2, min(num_parts, max(4, n_edges // min_edges_per_part)))

    eng = SuperstepEngine(num_parts=num_parts).load_edges(edges)
    summary = eng.run(DagLevelProgram(), max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["lvl"])

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"v": t.column("v"), "lvl": t.column("lvl")})

    out = out.map_batches(cast, batch_format="pyarrow").materialize()
    eng.shutdown()
    summary["depth"] = None  # filled by callers that aggregate
    return out, summary
