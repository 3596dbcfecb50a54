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


def test_radius_join_exact_and_duplicate_free(ray_session):
    # the emit-once rule (pair generated only in the lower-id point's
    # home-cell bucket) means NO global distinct stage: output must be
    # exact AND duplicate-free as-is
    import pyarrow as pa
    import ray.data
    from linkgraph.ops.spatial import radius_join

    rng = np.random.default_rng(9)
    n, r = 1200, 0.07
    ids = np.arange(n, dtype=np.int64)
    x, y = rng.uniform(-1, 2, n), rng.uniform(-1, 2, n)
    pts = ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "x": pa.array(x), "y": pa.array(y)})
    ).repartition(9)
    out = radius_join(pts, r).to_pandas()
    D2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    ii, jj = np.nonzero(D2 <= r * r)
    want = {(int(a), int(b)) for a, b in zip(ids[ii], ids[jj]) if a < b}
    got = list(zip(out["a"].astype(int), out["b"].astype(int)))
    assert set(got) == want
    assert len(got) == len(want)  # duplicate-free without a distinct
