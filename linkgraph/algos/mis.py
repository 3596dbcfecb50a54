"""Maximal independent set via deterministic Luby rounds on the
symmetrized graph: every vertex carries the fixed priority
splitmix64(id) (a bijection — priorities are distinct, no tie-breaks);
each round, an active vertex joins the MIS iff its priority is
strictly below the minimum over its ACTIVE neighbors, then neighbors
of new members retire. Terminates in O(log n) rounds w.h.p.; the
result is a valid maximal independent set regardless of round count.

Engine mapping: ONE program whose supersteps alternate two phases
tracked by a per-partition call counter (program instances persist
across supersteps within a run):

  phase 0  actives ship their priority, inactives ship UMAX; the
           min-reduce gather gives each vertex its active-neighborhood
           minimum; apply joins (prio < min, UMAX when no active
           neighbor — an isolated active always joins).
  phase 1  MIS members ship 0, everyone else UMAX; an active receiver
           of a 0 retires (a new neighbor entered the set).

The fixpoint (no actives) is absorbing, so burst pre-submission past
convergence is a no-op, as the engine requires.

(Reference analogue: SURVEY.md §2.1 update_vertices family —
symmetry-breaking vertex programs; priorities replace the RNG of
classic Luby so the DuckDB oracle can replay rounds exactly via the
repo's bit-exact SQL splitmix64.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..engine import SuperstepEngine, VertexProgram
from ..hashing import splitmix64

UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_ZERO = np.uint64(0)


class MISProgram(VertexProgram):
    reduce = "min"
    state_columns = ("status", "prio")
    frontier = False  # phase values are non-monotone

    def conv_stat(self, stats):
        return float("inf")

    def init_state(self, ctx):
        return {
            "status": np.zeros(ctx.n_local, np.uint8),  # 0 active 1 MIS 2 out
            "prio": splitmix64(ctx.verts),
        }

    def vertex_values(self, ctx):
        st = ctx.state
        k = getattr(self, "_k", 0)
        self._k = k + 1
        if k % 2 == 0:  # phase 0: actives advertise priority
            return np.where(st["status"] == 0, st["prio"], UMAX)
        # phase 1: new-and-old MIS members advertise membership
        return np.where(st["status"] == 1, _ZERO, UMAX)

    def apply(self, ctx, idx, vals, g):
        st = ctx.state
        phase = (self._k - 1) % 2
        joined = retired = 0
        if len(idx):
            if phase == 0:
                win = (st["status"][idx] == 0) & (st["prio"][idx] < vals)
                st["status"][idx[win]] = 1
                joined = int(win.sum())
            else:
                out = (st["status"][idx] == 0) & (vals == _ZERO)
                st["status"][idx[out]] = 2
                retired = int(out.sum())
        return {
            "joined": joined,
            "retired": retired,
            "active": int((st["status"] == 0).sum()),
        }

    def driver_step(self, stats, g, it):
        active = sum(s["active"] for s in stats)
        return g, active == 0, {
            "active": active,
            "joined": sum(s["joined"] for s in stats),
        }


def maximal_independent_set(
    edges,
    num_parts: int = 8,
    max_iters: int = 200,
    min_edges_per_part: int = 100_000,
):
    """edges Dataset (src, dst; treated undirected) ->
    (Dataset(v:int64, in_mis:int64), summary). Latency-bound like SCC:
    partition count capped by edge ownership (see scc.py)."""
    n_edges = edges.count()
    num_parts = max(2, min(num_parts, max(4, n_edges // min_edges_per_part)))

    eng = SuperstepEngine(num_parts=num_parts, symmetrize=True).load_edges(edges)
    summary = eng.run(MISProgram(), max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["status"])

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("v"),
                "in_mis": pa.array(
                    (t.column("status").to_numpy() == 1).astype(np.int64)
                ),
            }
        )

    out = out.map_batches(cast, batch_format="pyarrow").materialize()
    eng.shutdown()
    summary["rounds"] = summary["iterations"] // 2
    return out, summary
