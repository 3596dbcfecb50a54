"""Two coupled graphs in one engine run — the reference's ``pas``
pattern (test/pas.cpp:10-11: a patch graph + an agent graph created via
``hvr_graph_create``, agents moving among patches and reading patch
state). Here the two logical graphs share one vertex set partitioned by
an id-range tag (the Ray analogue of the reference's graph-id
bitvector, inc/hvr_common.h:41-50), and the cross-graph exchange runs
on the engine's arbitrary vertex-to-vertex message channel — agent ->
patch presence, patch -> agent occupancy replies — because agents move,
so no static edge can carry the coupling.

BSP timing: messages sent at scatter(t) arrive at apply(t+1). The
schedule below is deterministic, so a plain numpy simulation is an
exact oracle (tests/test_coupled.py).
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram

AGENT_BASE = 1 << 20  # ids >= this are agents; below are patches


class PatchAgentProgram(VertexProgram):
    """Each superstep: agents announce presence to their current patch;
    patches count presence into ``val`` (occupancy) and reply the count
    to each announcing agent; an agent whose patch occupancy exceeds
    ``cap`` hops to the next patch (loc + 1 mod n_patches)."""

    reduce = "sum"
    state_columns = ("val", "loc")

    def __init__(self, n_patches: int, cap: int):
        self.n_patches = n_patches
        self.cap = cap

    def init_state(self, ctx):
        ids = ctx.verts.astype(np.int64)
        is_agent = ids >= AGENT_BASE
        # agents start at patch (agent_index % n_patches)
        loc = np.where(is_agent, (ids - AGENT_BASE) % self.n_patches, -1)
        self._pending: tuple | None = None  # patch replies stashed per actor
        return {"val": np.zeros(ctx.n_local, np.float64), "loc": loc.astype(np.int64)}

    def vertex_values(self, ctx):
        return np.zeros(ctx.n_local, np.float64)  # no edge-aligned traffic

    def send_messages(self, ctx):
        ids = ctx.verts.astype(np.int64)
        is_agent = ids >= AGENT_BASE
        dsts = [ctx.state["loc"][is_agent]]  # agent -> its patch
        payloads = [
            np.stack(
                [np.zeros(int(is_agent.sum())), ids[is_agent].astype(np.float64)],
                axis=1,
            )
        ]  # type 0 = presence, carries sender id
        if self._pending is not None:
            senders, occs = self._pending
            self._pending = None
            dsts.append(senders)
            payloads.append(
                np.stack([np.ones(len(senders)), occs.astype(np.float64)], axis=1)
            )  # type 1 = occupancy reply
        dst = np.concatenate(dsts).astype(np.int64)
        return dst.astype(np.uint64), np.concatenate(payloads, axis=0)

    def apply(self, ctx, idx, vals, g):
        ids = ctx.verts.astype(np.int64)
        is_agent = ids >= AGENT_BASE
        moved = 0
        if ctx.inbox is not None:
            pos, payload = ctx.inbox
            typ = payload[:, 0]
            # patches: count presence announcements -> occupancy; stash
            # (sender agent, occupancy) pairs for the reply scatter
            pres = typ == 0
            if pres.any():
                ppos = pos[pres]
                occ = np.zeros(ctx.n_local, np.float64)
                np.add.at(occ, ppos, 1.0)
                ctx.state["val"] = np.where(is_agent, ctx.state["val"], occ)
                senders = payload[pres, 1].astype(np.int64)
                self._pending = (senders, occ[ppos])
            # agents: occupancy replies -> hop if crowded
            rep = typ == 1
            if rep.any():
                apos = pos[rep]
                crowd = payload[rep, 1]
                hop = crowd > self.cap
                if hop.any():
                    loc = ctx.state["loc"]
                    loc[apos[hop]] = (loc[apos[hop]] + 1) % self.n_patches
                    moved = int(hop.sum())
        return {"moved": moved}

    def driver_step(self, stats, g, it):
        return g, False, {"moved": int(sum(s["moved"] for s in stats))}


def run_patch_agent(
    n_patches: int,
    n_agents: int,
    cap: int,
    iters: int,
    num_parts: int = 4,
):
    """Build the coupled two-graph vertex set (patch ring edges + agent
    self-registration edges) and run the simulation; returns
    (Dataset(v, val, loc), engine)."""
    import pandas as pd

    import ray.data

    # patch ring registers patches; agent self-loops register agents
    # (the coupling itself travels over v2v messages, not edges)
    src = list(range(n_patches)) + [AGENT_BASE + i for i in range(n_agents)]
    dst = [(p + 1) % n_patches for p in range(n_patches)] + [
        AGENT_BASE + i for i in range(n_agents)
    ]
    edges = ray.data.from_pandas(
        pd.DataFrame({"src": np.array(src, np.int64), "dst": np.array(dst, np.int64)})
    )
    eng = SuperstepEngine(num_parts=num_parts).load_edges(edges)
    eng.run(PatchAgentProgram(n_patches, cap), max_iters=iters, burst_size=1)
    out = eng.state_dataset(id_col="v", columns=["val", "loc"])
    return out, eng
