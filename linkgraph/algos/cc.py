"""Connected components via min-label propagation (reference parity:
test/connected_components.c:88-112 — per iteration each vertex takes
min(own label, min over neighbor labels) through the fused
``hvr_neighbors_min`` aggregate, src/hoover.cpp:2058-2110; here the
neighbor-min is the engine's combiner-reduced 'min' shuffle).

Labels start as the vertex id; at convergence every vertex carries the
minimum vertex id of its (undirected) component — exact-match oracle:
union-find on the same edge list.
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram


SIGN_BIAS = np.uint64(0x8000000000000000)


class CCProgram(VertexProgram):
    """``signed=True`` (graphs whose int64 ids include negatives, e.g.
    hashed-url bit-views) flips the sign bit before the min so the
    propagated label order matches SIGNED int64 order — the exported
    label is then the true minimum int64 vertex id of the component,
    matching union-find / DuckDB ``min()`` oracles. Without the flip the
    label would be the minimum in unsigned order (a valid canonical
    representative, but not the documented minimum)."""

    reduce = "min"
    state_columns = ("label",)
    conv_tol = 0.5  # stop when no labels changed
    frontier = True  # min-label is monotone: only changed vertices rescatter

    def __init__(self, signed: bool = False):
        self.signed = signed

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        lab = ctx.verts.copy()
        return {"label": lab ^ SIGN_BIAS if self.signed else lab}

    def vertex_values(self, ctx):
        return ctx.state["label"]

    def apply(self, ctx, idx, vals, g):
        lab = ctx.state["label"]
        changed = 0
        ctx.changed_idx = np.empty(0, np.int64)
        if len(idx):
            new = np.minimum(lab[idx], vals)
            ch = new != lab[idx]
            changed = int(ch.sum())
            lab[idx] = new
            ctx.changed_idx = idx[ch]
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"labels_changed": changed}


def connected_components(
    edges,
    num_parts: int = 8,
    max_iters: int = 200,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    engine: SuperstepEngine | None = None,
    node_groups: int | None = None,
):
    """edges Dataset (src, dst; treated undirected) -> (Dataset(v, label), summary).

    Note: min-label propagation converges in O(diameter) supersteps —
    fine for web graphs (small diameter); a pointer-doubling variant is
    the scale path for long chains. ``node_groups`` selects the
    two-level node-topology exchange (exact — min combine)."""
    eng = engine or SuperstepEngine(
        num_parts=num_parts, symmetrize=True, node_groups=node_groups
    ).load_edges(edges)
    summary = eng.run(
        CCProgram(signed=eng.signed_ids),
        max_iters=max_iters,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    out = eng.state_dataset(id_col="v", columns=["label"])
    if eng.signed_ids:
        import pyarrow as pa

        def cast(t: pa.Table) -> pa.Table:
            lab = (t.column("label").to_numpy() ^ SIGN_BIAS).view(np.int64)
            return pa.table({"v": t.column("v"), "label": pa.array(lab)})

        out = out.map_batches(cast, batch_format="pyarrow")
    return out, summary, eng
