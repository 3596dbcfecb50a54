"""Strongly connected components via distributed forward-backward
coloring (the Pregel-style peeling algorithm: per round, a forward
max-id propagation partitions the active vertices into color classes,
then a backward traversal from each color root flags the vertices that
reach their root within the class — those form the root's SCC and are
retired; repeat on the remainder).

Two engines over the SAME vertex set carry the two edge orientations;
per-vertex state (colors, flags, assignments) moves between them as one
object-store ref per partition (engine.export_state_refs /
run(import_state=...)) — identical partition layouts, no driver
materialization, no disk.

Max-propagation rides the engine's min-reduce by shipping bitwise
COMPLEMENTS (min(~c) == ~max(c)). The backward accept test exploits a
coloring invariant: along an edge v->u, color(u) >= color(v) (u's
ancestor set contains v's), so the MIN over flagged-successor colors
equals color(v) iff some flagged successor matches — an equality-safe
combiner where max/sum would lose the matching color.

The SCC label is the maximum member id (the color root; for signed /
hashed id spaces this is the max in unsigned order — a canonical
representative). Rounds are O(#peel levels): small for web-like
bowtie graphs, worst-case O(n) for a chain of singleton SCCs (each
round still retires every color root's SCC, so simple DAGs finish in
one round).

(Reference analogue: SURVEY.md §2.5 applications family; the
multi-phase state handoff mirrors the coupled-graph pattern of
test/pas.cpp via engine state refs instead of a second graph id.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..engine import SuperstepEngine, VertexProgram

NA = np.uint64(0xFFFFFFFFFFFFFFFF)  # scc-unassigned sentinel
UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)  # min-reduce neutral


class _FwdColor(VertexProgram):
    """color(v) = max id over active ancestors of v (and v itself),
    shipped as complements through the min-reduce combiner."""

    reduce = "min"
    state_columns = ("color", "scc")
    conv_tol = 0.5
    frontier = True  # max-propagation is monotone

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        # scc may be overwritten by an imported ref right after this
        return {"color": ctx.verts.copy(), "scc": np.full(ctx.n_local, NA, np.uint64)}

    def vertex_values(self, ctx):
        st = ctx.state
        if not getattr(self, "_reset_done", False):
            # fresh round: active vertices restart from their own id
            active = st["scc"] == NA
            st["color"] = np.where(active, ctx.verts, st["color"])
            self._reset_done = True
        out = ~st["color"]
        out[st["scc"] != NA] = UMAX  # retired vertices never win
        return out

    def apply(self, ctx, idx, vals, g):
        st = ctx.state
        changed = 0
        ctx.changed_idx = np.empty(0, np.int64)
        if len(idx):
            cand = ~vals  # min of complements == complement of max
            active = st["scc"][idx] == NA
            new = np.where(active, np.maximum(st["color"][idx], cand), st["color"][idx])
            ch = new != st["color"][idx]
            changed = int(ch.sum())
            st["color"][idx] = new
            ctx.changed_idx = idx[ch]
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"colors_changed": changed}


class _BwdFlag(VertexProgram):
    """On the REVERSED graph: flag spreads from each color root to the
    active vertices that reach it inside their own color class."""

    reduce = "min"
    state_columns = ("flag", "color", "scc")
    conv_tol = 0.5
    frontier = True  # flags only get set

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        return {
            "flag": np.zeros(ctx.n_local, np.uint8),
            "color": ctx.verts.copy(),
            "scc": np.full(ctx.n_local, NA, np.uint64),
        }

    def vertex_values(self, ctx):
        st = ctx.state
        if not getattr(self, "_roots_done", False):
            # colors/scc were just imported from the forward engine;
            # roots (color == own id, still active) seed the traversal
            st["flag"] = ((st["color"] == ctx.verts) & (st["scc"] == NA)).astype(np.uint8)
            self._roots_done = True
        return np.where(st["flag"] == 1, st["color"], UMAX)

    def apply(self, ctx, idx, vals, g):
        st = ctx.state
        changed = 0
        ctx.changed_idx = np.empty(0, np.int64)
        if len(idx):
            # vals = min over flagged-successor colors; all successor
            # colors are >= own color, so equality <=> a match exists
            acc = (
                (st["scc"][idx] == NA)
                & (st["flag"][idx] == 0)
                & (vals == st["color"][idx])
            )
            changed = int(acc.sum())
            st["flag"][idx[acc]] = 1
            ctx.changed_idx = idx[acc]
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"flags_set": changed}


def _assign(ctx):
    st = ctx.state
    newly = (st["flag"] == 1) & (st["scc"] == NA)
    st["scc"][newly] = st["color"][newly]
    st["flag"][:] = 0
    return {
        "assigned": int(newly.sum()),
        "remaining": int((st["scc"] == NA).sum()),
    }


def strongly_connected_components(
    edges,
    num_parts: int = 8,
    max_iters: int = 200,
    max_rounds: int = 64,
    min_edges_per_part: int = 100_000,
    keep_engines: bool = False,
):
    """edges Dataset (src, dst; directed) -> (Dataset(v, scc), summary).

    scc = max member id of the vertex's strongly connected component.
    Caller owns neither engine; both are shut down before returning —
    unless ``keep_engines=True``, in which case the return is
    ``(out, summary, eng_f, eng_b)`` with the final scc state resident
    on ``eng_b``'s actors (the bow-tie decomposition seeds its
    reachability sweeps from those refs without a reload).

    Partition sizing: SCC is LATENCY-bound — it runs ~2 full fixpoints
    per peel round with tiny frontiers after the first sweep, so the
    per-superstep fixed exchange cost (P packed objects read by P
    actors) dominates while per-partition work is negligible. P is
    therefore capped so each partition owns >= ``min_edges_per_part``
    edges (measured at sf0.1: P=32 ran the same 4 rounds 5x slower
    than P=8 on 767k edges, pure fixed cost); ``num_parts`` remains
    the ceiling for big inputs."""
    n_edges = edges.count()
    num_parts = max(2, min(num_parts, max(4, n_edges // min_edges_per_part)))

    eng_f = SuperstepEngine(num_parts=num_parts).load_edges(edges)
    # reverse orientation straight off the forward actors' segments
    # (actor-to-actor push — no swap pass, no re-route)
    eng_b = eng_f.transposed()
    state = None
    rounds = 0
    fwd_iters = bwd_iters = 0
    while rounds < max_rounds:
        sf = eng_f.run(_FwdColor(), max_iters=max_iters, import_state=state)
        refs = eng_f.export_state_refs(["color", "scc"])
        sb = eng_b.run(_BwdFlag(), max_iters=max_iters, import_state=refs)
        stats = eng_b.map_state(_assign)
        remaining = sum(s["remaining"] for s in stats)
        state = eng_b.export_state_refs(["scc"])
        rounds += 1
        fwd_iters += sf["iterations"]
        bwd_iters += sb["iterations"]
        if remaining == 0:
            break

    out = eng_b.state_dataset(id_col="v", columns=["scc"])

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("v"),
                "scc": pa.array(t.column("scc").to_numpy().astype(np.int64)),
            }
        )

    out = out.map_batches(cast, batch_format="pyarrow").materialize()
    summary = {
        "rounds": rounds,
        "fwd_iterations": fwd_iters,
        "bwd_iterations": bwd_iters,
        "remaining": remaining,
    }
    if keep_engines:
        return out, summary, eng_f, eng_b
    eng_f.shutdown()
    eng_b.shutdown()
    return out, summary
