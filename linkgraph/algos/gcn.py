"""Graph-convolution feature propagation on the superstep engine
(reference parity: test/gcn.cpp:63-71 — per-vertex ``A · X · W`` over
neighbor features).

One engine run = one GCN layer: every vertex aggregates (sums) its
in-neighbors' feature vectors plus its own (self loop, as in Kipf-GCN),
then applies the dense layer ``relu(agg @ W + b)``. Messages are 2-D —
the engine's combiner reduceat sums feature rows per destination inside
the source partition, so hub fan-in stays P-bounded just like scalar
programs.

Weights are deterministic (seeded splitmix64) when not supplied — there
is no training here, only the distributed propagation kernel the
reference app exercises.
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram
from ..hashing import splitmix64, uniform01


def deterministic_weights(d_in: int, d_out: int, seed: int = 11) -> np.ndarray:
    raw = splitmix64(np.arange(d_in * d_out, dtype=np.uint64) + np.uint64(seed * 7919))
    return (uniform01(raw).reshape(d_in, d_out) - 0.5) / np.sqrt(d_in)


def deterministic_features(verts: np.ndarray, dim: int, seed: int = 5) -> np.ndarray:
    v = np.asarray(verts, dtype=np.uint64)
    cols = [
        uniform01(splitmix64(v ^ np.uint64(seed * 1_000_003 + j))) for j in range(dim)
    ]
    return np.stack(cols, axis=1)


class GCNLayerProgram(VertexProgram):
    """h' = relu((h + sum_in h_src) @ W + b), one superstep."""

    reduce = "sum"
    state_columns = ()  # features exported via feature_table

    def __init__(self, dim: int, W: np.ndarray | None = None, b: np.ndarray | None = None, feat_seed: int = 5):
        self.dim = dim
        self.W = W if W is not None else deterministic_weights(dim, dim)
        self.b = b if b is not None else np.zeros(dim)
        self.feat_seed = feat_seed

    def init_state(self, ctx):
        return {"h": deterministic_features(ctx.verts, self.dim, self.feat_seed)}

    def vertex_values(self, ctx):
        return ctx.state["h"]  # (n_local, dim); engine gathers per edge

    def apply(self, ctx, idx, vals, g):
        agg = ctx.state["h"].copy()  # self contribution
        if len(idx):
            agg[idx] += vals
        ctx.state["h"] = np.maximum(agg @ self.W + self.b, 0.0)
        return {}

    def driver_step(self, stats, g, it):
        return g, False, {}


def gcn_features(
    edges,
    dim: int = 8,
    layers: int = 2,
    num_parts: int = 8,
    engine: SuperstepEngine | None = None,
):
    """edges -> Dataset(v, h_0..h_{dim-1}) after `layers` GCN layers."""
    eng = engine or SuperstepEngine(num_parts=num_parts).load_edges(edges)
    prog = GCNLayerProgram(dim)
    eng.run(prog, max_iters=layers, burst_size=layers)

    import ray.data

    refs = [
        a.export_state_matrix.remote("h", eng.signed_ids) for a in eng.actors
    ]
    return ray.data.from_arrow_refs(refs), eng
