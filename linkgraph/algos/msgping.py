"""Diagnostic vertex-to-vertex message program — the usage example for
the engine's arbitrary-message channel (reference ``hvr_send_msg`` /
``hvr_poll_msg``, src/hoover.cpp:1843-1893): every vertex messages a
NON-NEIGHBOR each superstep, which pure edge-aligned exchanges cannot
express. Also the building block pattern for supernode protocols
(community detection) and coupled-graph (pas-style) exchanges.
"""

from __future__ import annotations

import numpy as np

from ..engine import VertexProgram


class PingProgram(VertexProgram):
    """Every vertex messages vertex ``(v + offset) % n`` each superstep
    with payload = its own id; state accumulates received payload sums.
    The destination is arbitrary — no edge between sender and receiver
    is required."""

    reduce = "sum"
    state_columns = ("got",)

    def __init__(self, n: int, offset: int):
        self.n = n
        self.offset = offset

    def init_state(self, ctx):
        return {"got": np.zeros(ctx.n_local, np.float64)}

    def vertex_values(self, ctx):
        return np.zeros(ctx.n_local, np.float64)

    def send_messages(self, ctx):
        dst = (ctx.verts.astype(np.int64) + self.offset) % self.n
        return dst.astype(np.uint64), ctx.verts.astype(np.float64)

    def apply(self, ctx, idx, vals, g):
        if ctx.inbox is not None:
            pos, payload = ctx.inbox
            np.add.at(ctx.state["got"], pos, payload)
        return {}

    def driver_step(self, stats, g, it):
        return g, False, {}
