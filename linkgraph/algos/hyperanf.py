"""HyperANF: approximate neighborhood function + effective diameter
(Boldi, Rosa & Vigna, WWW 2011) on the superstep engine.

Every vertex keeps a small HyperLogLog sketch of its out-reachability
ball B(v, t) = {u : dist(v, u) <= t}. Per superstep the ball grows by
one hop: B(v, t) = B(v, t-1) union of B(w, t-1) over out-neighbors w —
an HLL register-wise MAX merge. The engine runs it on the REVERSED
edge table (successors message their sketches back to v) with
registers stored COMPLEMENTED so the merge rides the native min-reduce
combiner (same trick as SCC's max coloring); register updates are
monotone, so frontier gating keeps late hops O(changed sketches).

Message cost per superstep: m bytes per (unique dst x src partition)
after the combiner — 64 bytes/vertex at p=6, independent of |E|.

N(t) = sum over v of |B(v, t)| estimates gives the neighborhood
function; the effective diameter is the (interpolated) smallest t with
N(t) >= q * N(max) (q = 0.9 by convention). All hashing is
deterministic (splitmix64 of the vertex id), so results are exactly
partition-count invariant.

(Reference analogue: SURVEY.md §2.7 approximate aggregates — the HLL
counterpart of the count-min sketch, applied per vertex; the sketch
family is linkgraph/ops/hll.py.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..engine import SuperstepEngine, VertexProgram, splitmix64
from ..ops.hll import _alpha


def _rho_registers(ids: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) of each vertex id's own hash."""
    h = splitmix64(ids.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) | np.uint64(1 << (p - 1))  # sentinel bit
    rho = np.zeros(len(h), np.uint8)
    cur = w
    for shift in (32, 16, 8, 4, 2, 1):  # branchless clz via halving
        mask = cur < np.uint64(1 << (64 - shift))
        rho[mask] += shift
        cur = np.where(mask, cur << np.uint64(shift), cur)
    return idx, rho + 1


def _estimate_rows(regs_compl: np.ndarray, m: int) -> np.ndarray:
    """Vectorized HLL estimate per row (registers complemented)."""
    reg = (np.uint8(255) - regs_compl).astype(np.float64)
    e = _alpha(m) * m * m / np.sum(np.exp2(-reg), axis=1)
    zeros = np.sum(reg == 0, axis=1)
    small = (e <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1))
    return np.where(small, lin, e)


class _AnfProgram(VertexProgram):
    reduce = "min"
    state_columns = ("regs",)
    conv_tol = 0.5
    frontier = True  # register merges are monotone

    def __init__(self, p: int = 6):
        self.p = p
        self.m = 1 << p

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        regs = np.full((ctx.n_local, self.m), 255, np.uint8)  # complemented 0
        idx, rho = _rho_registers(ctx.verts, self.p)
        own = np.arange(ctx.n_local)
        regs[own, idx] = np.minimum(regs[own, idx], np.uint8(255) - rho)
        ctx.anf_nf = [float(_estimate_rows(regs, self.m).sum())]  # N(0)
        return {"regs": regs}

    def vertex_values(self, ctx):
        return ctx.state["regs"]

    def apply(self, ctx, idx, vals, g):
        regs = ctx.state["regs"]
        changed = 0
        ctx.changed_idx = np.empty(0, np.int64)
        if len(idx):
            new = np.minimum(regs[idx], vals)
            ch = (new != regs[idx]).any(axis=1)
            changed = int(ch.sum())
            regs[idx] = new
            ctx.changed_idx = idx[ch]
        ctx.anf_nf.append(float(_estimate_rows(regs, self.m).sum()))
        return {"changed": changed, "nf": ctx.anf_nf[-1]}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        nf = float(sum(s["nf"] for s in stats))
        return g, changed == 0, {"sketches_changed": changed, "nf": nf}


def hyperanf(
    edges,
    p: int = 6,
    q: float = 0.9,
    num_parts: int = 8,
    max_iters: int = 64,
    engine: SuperstepEngine | None = None,
) -> tuple[pd.DataFrame, dict]:
    """edges (src, dst) -> (DataFrame(t, nf), summary with
    effective_diameter / avg ball saturation point).

    nf[t] = estimated number of reachable (v, u) pairs within t hops
    (t = 0 counts each vertex itself)."""

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("dst"), "dst": t.column("src")})

    eng = engine or SuperstepEngine(num_parts=num_parts).load_edges(
        edges.map_batches(swap, batch_format="pyarrow")
    )
    prog = _AnfProgram(p=p)
    summary = eng.run(prog, max_iters=max_iters)
    hist = summary.get("history", [])
    nf = [h["nf"] for h in hist if "nf" in h]
    # N(0) per partition lives actor-side; reconstruct from verts count
    n0 = float(eng.n_total)
    nfs = [n0] + nf
    # drop the trailing no-growth step the convergence protocol adds
    while len(nfs) >= 2 and nfs[-1] <= nfs[-2]:
        nfs.pop()
    target = q * nfs[-1]
    eff = float(len(nfs) - 1)
    for t in range(len(nfs)):
        if nfs[t] >= target:
            if t == 0:
                eff = 0.0
            else:
                lo, hi = nfs[t - 1], nfs[t]
                eff = t - 1 + (target - lo) / (hi - lo) if hi > lo else float(t)
            break
    # 2-decimal rounding (not 4): the estimate has ~9% standard error
    # at p=7, and the coarser grid absorbs float-summation-order noise
    # so the DuckDB oracle's SUM reproduces nf bit-exactly after ROUND
    out = pd.DataFrame({"t": np.arange(len(nfs), dtype=np.int64), "nf": np.round(nfs, 2)})
    res = {
        "effective_diameter": round(eff, 4),
        "hops_to_saturation": len(nfs) - 1,
        "reachable_pairs": round(nfs[-1], 2),
        **{k: v for k, v in summary.items() if k != "history"},
    }
    if engine is None:
        eng.shutdown()
    return out, res
