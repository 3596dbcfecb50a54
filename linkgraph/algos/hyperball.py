"""HyperBall harmonic centrality (Boldi & Vigna, "In-core computation
of geometric centralities with HyperBall", ICDM 2013 workshops): per
vertex, h(v) = sum over u != v of 1 / d(u, v), estimated from the
hop-by-hop growth of the vertex's HLL reachability ball:

    h(v) ~= sum_t ( |B(v, t)| - |B(v, t-1)| ) / t

Reuses the HyperANF program machinery (complemented registers riding
the native min-reduce combiner, frontier-gated monotone merges —
algos/hyperanf.py); adds two per-vertex state columns: the running
harmonic sum and the previous ball-size estimate, both updated ONLY
for vertices whose sketch changed this superstep (unchanged sketch =
unchanged estimate = zero increment), so late hops stay O(frontier).

mode='in' (default, the centrality convention) grows incoming balls
{u : d(u, v) <= t} — messages flow along the stored src->dst edges;
mode='out' swaps the edge table first.

Deterministic (splitmix64 hashing): exactly partition-count invariant.
Checkpoint/resume is NOT supported for this program (the hop counter
and prev-estimate live actor-side between supersteps).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..engine import SuperstepEngine
from .hyperanf import _AnfProgram, _estimate_rows


class _HyperBallProgram(_AnfProgram):
    state_columns = ("regs", "harm", "ball")

    def init_state(self, ctx):
        st = super().init_state(ctx)
        del ctx.anf_nf  # parent's global-NF bookkeeping not needed
        st["harm"] = np.zeros(ctx.n_local)
        st["ball"] = _estimate_rows(st["regs"], self.m)  # |B(v, 0)|
        self._t = 0
        return st

    def apply(self, ctx, idx, vals, g):
        regs = ctx.state["regs"]
        self._t += 1
        changed = 0
        ctx.changed_idx = np.empty(0, np.int64)
        if len(idx):
            new = np.minimum(regs[idx], vals)
            ch = (new != regs[idx]).any(axis=1)
            changed = int(ch.sum())
            ci = idx[ch]
            regs[ci] = new[ch]
            ctx.changed_idx = ci
            if len(ci):
                est = _estimate_rows(regs[ci], self.m)
                ball = ctx.state["ball"]
                ctx.state["harm"][ci] += (est - ball[ci]) / float(self._t)
                ball[ci] = est
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"sketches_changed": changed}


def harmonic_centrality(
    edges,
    p: int = 7,
    num_parts: int = 8,
    max_iters: int = 64,
    mode: str = "in",
    engine: SuperstepEngine | None = None,
):
    """edges (src, dst) -> (Dataset(v, harmonic, ball), summary, engine).

    harmonic = estimated sum of reciprocal distances from (mode='in')
    or to (mode='out') all other vertices; ball = the final reachability
    set size estimate (useful on its own as per-vertex reach)."""
    if mode not in ("in", "out"):
        raise ValueError(mode)
    if mode == "out":

        def swap(t: pa.Table) -> pa.Table:
            return pa.table({"src": t.column("dst"), "dst": t.column("src")})

        edges = edges.map_batches(swap, batch_format="pyarrow")
    eng = engine or SuperstepEngine(num_parts=num_parts).load_edges(edges)
    prog = _HyperBallProgram(p=p)
    summary = eng.run(prog, max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["harm", "ball"])

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("v"),
                "harmonic": pa.array(np.round(t.column("harm").to_numpy(), 6)),
                "ball": pa.array(np.round(t.column("ball").to_numpy(), 4)),
            }
        )

    return out.map_batches(fmt, batch_format="pyarrow"), summary, eng
