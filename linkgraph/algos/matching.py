"""Maximal matching via deterministic local-min edge priorities —
MIS on the line graph, without ever building the line graph.

Every undirected edge carries the fixed symmetric priority
pe(a, b) = splitmix64(splitmix64(a) XOR splitmix64(b)) (distinct
w.h.p. — a collision only stalls the tied edges, never mismatches).
Each round, an edge is matched iff its priority is the strict minimum
over all ACTIVE edges incident to either endpoint (both endpoints
then retire); an active vertex with no remaining active neighbor
retires unmatched. The globally minimum active edge always matches,
so every round makes progress; expected rounds are O(log n) under
the pseudo-random priorities. The result is a maximal matching: two
adjacent vertices can never both retire unmatched, because whichever
would retire first still sees the other active (see test_matching's
exact replay).

Engine mapping — ONE program, two alternating phases, the handshake
split across the two masked edge-weight modes (engine._apply_edge_w):

  phase 0 (mode 'mask0')  active vertices ship 0, retirees 1; the
          message along each edge is its priority pe iff the source is
          active, else UMAX. The min-reduce gather hands every vertex
          mn(v) = min priority over its active-incident edges; apply
          stores mn and retires actives with no active neighbor.
  phase 1 (mode 'eq')     active vertices ship mn(v); the message
          along an edge is pe iff pe == mn(src) — the source endorses
          exactly its minimum edge. The gather gives r(v) = min
          endorsed incident priority; since every endorsed incident
          priority is >= mn(v), r(v) == mn(v) iff v's minimum edge was
          ALSO the minimum of its other endpoint — the mutual
          handshake. Matched vertices flip status.

The fixpoint (no actives) is absorbing — past it phase 0 masks every
edge to UMAX and apply sees no actives — so burst pre-submission past
convergence is a no-op, as the engine requires.

(Reference analogue: SURVEY.md §2.1 update_vertices family —
symmetry-breaking vertex programs over per-edge info, the
update_edge_info surface src/hoover.cpp:485-520 carrying a
deterministic per-edge value; priorities replace RNG so the DuckDB
oracle replays rounds exactly via the repo's bit-exact SQL
splitmix64.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..engine import SuperstepEngine, VertexProgram
from ..hashing import splitmix64

UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def edge_priority(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Symmetric per-edge priority — identical for (a,b) and (b,a), so
    both stored directions of a symmetrized edge carry the same key."""
    return splitmix64(
        splitmix64(np.asarray(a, np.uint64)) ^ splitmix64(np.asarray(b, np.uint64))
    )


class MatchProgram(VertexProgram):
    reduce = "min"
    state_columns = ("status", "mn")
    frontier = False  # phase values are non-monotone

    edge_weight_fn = staticmethod(edge_priority)
    edge_weight_mode = "mask0"

    def conv_stat(self, stats):
        return float("inf")

    def init_state(self, ctx):
        return {
            # 0 active, 1 matched, 2 retired-unmatched
            "status": np.zeros(ctx.n_local, np.uint8),
            "mn": np.full(ctx.n_local, UMAX, np.uint64),
        }

    def vertex_values(self, ctx):
        st = ctx.state
        k = getattr(self, "_k", 0)
        self._k = k + 1
        if k % 2 == 0:  # phase 0: actives unmask their incident edges
            self.edge_weight_mode = "mask0"
            return np.where(st["status"] == 0, np.uint64(0), np.uint64(1))
        # phase 1: actives endorse exactly their minimum edge
        self.edge_weight_mode = "eq"
        return np.where(st["status"] == 0, st["mn"], UMAX)

    def apply(self, ctx, idx, vals, g):
        st = ctx.state
        phase = (self._k - 1) % 2
        matched = 0
        if phase == 0:
            # store the active-neighborhood minimum; retire actives
            # whose neighborhood went silent (no message / all-UMAX)
            got = np.zeros(ctx.n_local, bool)
            if len(idx):
                live = vals != UMAX
                st["mn"][idx] = vals
                got[idx[live]] = True
            lone = (st["status"] == 0) & ~got
            st["status"][lone] = 2
        elif len(idx):
            ok = (st["status"][idx] == 0) & (vals != UMAX) & (vals == st["mn"][idx])
            st["status"][idx[ok]] = 1
            matched = int(ok.sum())
        return {
            "matched": matched,
            "active": int((st["status"] == 0).sum()),
        }

    def driver_step(self, stats, g, it):
        active = sum(s["active"] for s in stats)
        return g, active == 0, {
            "active": active,
            "matched": sum(s["matched"] for s in stats),
        }


def maximal_matching(
    edges,
    num_parts: int = 8,
    max_iters: int = 200,
    min_edges_per_part: int = 100_000,
):
    """edges Dataset (src, dst; treated undirected, self-loops dropped)
    -> (Dataset(v:int64, matched:int64), summary). Latency-bound like
    MIS/SCC: partition count capped by edge ownership (see scc.py)."""

    def drop_loops(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return t.filter(pa.array(s != d))

    edges = edges.map_batches(drop_loops, batch_format="pyarrow")
    n_edges = edges.count()
    num_parts = max(2, min(num_parts, max(4, n_edges // min_edges_per_part)))

    eng = SuperstepEngine(num_parts=num_parts, symmetrize=True).load_edges(edges)
    summary = eng.run(MatchProgram(), max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["status"])

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("v"),
                "matched": pa.array(
                    (t.column("status").to_numpy() == 1).astype(np.int64)
                ),
            }
        )

    out = out.map_batches(cast, batch_format="pyarrow").materialize()
    eng.shutdown()
    summary["rounds"] = summary["iterations"] // 2
    return out, summary


def matching_replay(src: np.ndarray, dst: np.ndarray) -> dict[int, int]:
    """Single-process exact replay of the round semantics (test oracle):
    returns {vertex: partner} for the matched vertices."""
    a = np.asarray(src, np.int64)
    b = np.asarray(dst, np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    und = np.unique(np.stack([lo, hi], axis=1), axis=0)
    ea, eb = und[:, 0], und[:, 1]
    pe = edge_priority(ea, eb)
    partners: dict[int, int] = {}
    active_e = np.ones(len(ea), bool)
    matched_v: set[int] = set()
    while active_e.any():
        ia, ib, ip = ea[active_e], eb[active_e], pe[active_e]
        mn: dict[int, np.uint64] = {}
        for u, v, p in zip(ia, ib, ip):
            for x in (int(u), int(v)):
                if x not in mn or p < mn[x]:
                    mn[x] = p
        hit = np.array(
            [mn[int(u)] == p and mn[int(v)] == p for u, v, p in zip(ia, ib, ip)]
        )
        if not hit.any():
            break  # only possible under a priority collision
        for u, v in zip(ia[hit], ib[hit]):
            partners[int(u)] = int(v)
            partners[int(v)] = int(u)
            matched_v.add(int(u))
            matched_v.add(int(v))
        alive = np.array(
            [int(u) not in matched_v and int(v) not in matched_v for u, v in zip(ea, eb)]
        )
        active_e &= alive
    return partners
