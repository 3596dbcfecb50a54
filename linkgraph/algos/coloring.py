"""Greedy distance-1 graph coloring, Jones-Plassmann round-number
variant: fixed splitmix64 priorities (distinct — a bijection); each
round, every uncolored vertex whose priority is the minimum over its
UNCOLORED neighbors takes the round number as its color. Adjacent
vertices can never win the same round (one of them has the smaller
priority), so the result is a proper coloring; rounds = length of the
longest priority-decreasing path (28 at 500 docs, 47 at 5000 on the
derived graph).

Engine mapping: ONE single-phase vertex program — uncolored vertices
advertise their priority, the min-reduce gather delivers each vertex
its uncolored-neighborhood minimum, local minima color themselves with
the superstep index. The all-colored fixpoint is absorbing (everyone
ships UMAX, nobody wins), so burst pre-submission is safe.

(Reference analogue: SURVEY.md §2.1 update_vertices family — like MIS
a symmetry-breaking program; deterministic priorities let the DuckDB
oracle unroll the rounds exactly.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..engine import SuperstepEngine, VertexProgram
from ..hashing import splitmix64

UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)
NOCOLOR = np.int64(-1)


class ColorProgram(VertexProgram):
    reduce = "min"
    state_columns = ("color", "prio")
    frontier = False  # the uncolored set shrinks non-monotonically in value space

    def conv_stat(self, stats):
        return float("inf")

    def init_state(self, ctx):
        return {
            "color": np.full(ctx.n_local, NOCOLOR, np.int64),
            "prio": splitmix64(ctx.verts),
        }

    def vertex_values(self, ctx):
        st = ctx.state
        self._k = getattr(self, "_k", 0) + 1
        return np.where(st["color"] == NOCOLOR, st["prio"], UMAX)

    def apply(self, ctx, idx, vals, g):
        st = ctx.state
        rnd = self._k - 1
        if len(idx):
            win = (st["color"][idx] == NOCOLOR) & (st["prio"][idx] < vals)
            st["color"][idx[win]] = rnd
        return {"uncolored": int((st["color"] == NOCOLOR).sum())}

    def driver_step(self, stats, g, it):
        un = sum(s["uncolored"] for s in stats)
        return g, un == 0, {"uncolored": un}


def greedy_coloring(
    edges,
    num_parts: int = 8,
    max_iters: int = 400,
    min_edges_per_part: int = 100_000,
):
    """edges Dataset (src, dst; treated undirected) ->
    (Dataset(v:int64, color:int64), summary). Latency-bound: partition
    count capped by edge ownership (see scc.py)."""
    n_edges = edges.count()
    num_parts = max(2, min(num_parts, max(4, n_edges // min_edges_per_part)))

    eng = SuperstepEngine(num_parts=num_parts, symmetrize=True).load_edges(edges)
    summary = eng.run(ColorProgram(), max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["color"])

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({"v": t.column("v"), "color": t.column("color")})

    out = out.map_batches(cast, batch_format="pyarrow").materialize()
    eng.shutdown()
    summary["colors"] = summary["iterations"]
    return out, summary
