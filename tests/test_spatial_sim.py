"""Dynamic-contact infection sim (in-loop implicit edge discovery,
reference infectious_test pattern) vs an exact numpy replay."""

from __future__ import annotations

import numpy as np

from linkgraph.algos.spatial_sim import infection_sim, positions


def _oracle(n, radius, timesteps, seeds):
    infected = np.zeros(n, bool)
    infected[list(seeds)] = True
    ids = np.arange(n)
    for t in range(timesteps):
        p = positions(ids, t)
        xy = p[["x", "y"]].to_numpy()
        d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
        contact = d2 <= radius * radius
        # one hop per timestep over the CURRENT contact graph
        infected = infected | (contact @ infected.astype(int) > 0)
    return infected.astype(np.int64)


def test_infection_sim_matches_oracle(ray_session):
    n, radius, steps, seeds = 60, 0.12, 4, (0, 7)
    df = infection_sim(n, radius, steps, seeds=seeds)
    want = _oracle(n, radius, steps, seeds)
    assert len(df) == n
    got = df.sort_values("v")["infected"].to_numpy()
    assert (got == want).all(), (got.sum(), want.sum())
    # the scenario must actually spread
    assert want.sum() > len(seeds)
