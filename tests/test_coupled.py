"""pas-style coupled two-graph simulation vs an exact numpy oracle
(reference test/pas.cpp: patch graph + agent graph, agents move among
patches reading patch state)."""

from __future__ import annotations

import numpy as np

from linkgraph.algos.coupled import AGENT_BASE, run_patch_agent


def _oracle(n_patches, n_agents, cap, iters):
    loc = np.arange(n_agents) % n_patches
    pending = None  # (occ_per_agent,)
    last_presence = loc.copy()
    occ = np.zeros(n_patches)
    for _ in range(iters):
        occ = np.bincount(last_presence, minlength=n_patches).astype(float)
        new_pending = occ[last_presence]
        if pending is not None:
            hop = pending > cap
            loc[hop] = (loc[hop] + 1) % n_patches
        pending = new_pending
        last_presence = loc.copy()
    return occ, loc


def test_patch_agent_matches_oracle(ray_session):
    n_patches, n_agents, cap, iters = 4, 13, 2, 6  # cap 2 < 13/4 -> hops happen
    out, eng = run_patch_agent(n_patches, n_agents, cap, iters)
    df = out.to_pandas()
    eng.shutdown()
    occ, loc = _oracle(n_patches, n_agents, cap, iters)
    got_occ = {int(r["v"]): r["val"] for _, r in df.iterrows() if r["v"] < AGENT_BASE}
    got_loc = {
        int(r["v"]) - AGENT_BASE: int(r["loc"])
        for _, r in df.iterrows()
        if r["v"] >= AGENT_BASE
    }
    for p in range(n_patches):
        assert got_occ[p] == occ[p], (p, got_occ[p], occ[p])
    for a in range(n_agents):
        assert got_loc[a] == loc[a], (a, got_loc[a], loc[a])
    # the scenario must actually exercise movement
    assert (loc != np.arange(n_agents) % n_patches).any()
