"""Synchronous label-propagation clustering on the superstep engine.

Semantics (the engine's spec — deterministic so two runs and the pytest
oracle match exactly, FIXTURES.md §4):

  * labels start as the vertex id
  * each superstep, every vertex with >=1 neighbor takes the most
    frequent label among its (undirected) neighbors; ties break to the
    smallest label; isolated vertices keep their label
  * synchronous update (all vertices see the previous superstep's
    labels), fixed max_iters cap since synchronous LP may oscillate

The frequency vote is shipped as combiner-reduced (dst, label, count)
triples — the labelvote reduce — so hub vertices receive at most
P * distinct_labels messages (reference analogue: community-detection
label propagation over supernode graphs, test/community_detection.cpp:493-512).
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram


from .cc import SIGN_BIAS


class LabelPropProgram(VertexProgram):
    """``signed=True``: labels are compared sign-bit-flipped so the
    smallest-label tie-break follows SIGNED int64 order on graphs with
    negative hashed ids (see CCProgram)."""

    reduce = "labelvote"
    state_columns = ("label",)
    conv_tol = 0.5  # stop when no labels changed

    def __init__(self, signed: bool = False):
        self.signed = signed

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        lab = ctx.verts.copy()
        return {"label": lab ^ SIGN_BIAS if self.signed else lab}

    def vertex_values(self, ctx):
        return ctx.state["label"]

    def apply(self, ctx, idx, winners, g):
        lab = ctx.state["label"]
        changed = 0
        if len(idx):
            changed = int((winners != lab[idx]).sum())
            lab[idx] = winners
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"labels_changed": changed}


def label_propagation(
    edges,
    num_parts: int = 8,
    max_iters: int = 20,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    engine: SuperstepEngine | None = None,
):
    eng = engine or SuperstepEngine(num_parts=num_parts, symmetrize=True).load_edges(edges)
    summary = eng.run(
        LabelPropProgram(signed=eng.signed_ids),
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
