"""Random-walk corpus generation: walks are valid paths, deterministic,
and invariant to the partition count."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from linkgraph.algos.walks import assemble_walks, random_walks
from linkgraph.engine import SuperstepEngine


def _pairs(n=120, m=600, seed=3):
    rng = np.random.default_rng(seed)
    pairs = {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    }
    return sorted(pairs)


def _edges_ds(pairs):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": np.array([p[0] for p in pairs], np.int64),
                "dst": np.array([p[1] for p in pairs], np.int64),
            }
        )
    )


def _walk_df(parts, pairs, walk_len=6, n_per_vertex=2, seed=11):
    eng = SuperstepEngine(num_parts=parts).load_edges(_edges_ds(pairs))
    df = (
        random_walks(eng, walk_len=walk_len, n_per_vertex=n_per_vertex, seed=seed)
        .to_pandas()
        .sort_values(["walk_v0", "walk_rep", "step"])
        .reset_index(drop=True)
    )
    eng.shutdown()
    return df


def test_walks_are_valid_paths(ray_session):
    pairs = _pairs()
    df = _walk_df(4, pairs)
    eset = set(pairs)
    out_verts = {a for a, _ in pairs}
    for (v0, rep), g in df.groupby(["walk_v0", "walk_rep"]):
        path = g.sort_values("step")["v"].tolist()
        assert g["step"].tolist() == list(range(len(path)))
        assert path[0] == v0
        for a, b in zip(path, path[1:]):
            assert (a, b) in eset
        # a walk ends only at a dangling vertex or at full length
        assert len(path) == 7 or path[-1] not in out_verts
    # every non-dangling vertex starts n_per_vertex walks
    assert df.groupby(["walk_v0", "walk_rep"]).ngroups == 2 * len(out_verts)


def test_walks_partition_count_invariant(ray_session):
    pairs = _pairs()
    a = _walk_df(2, pairs)
    b = _walk_df(5, pairs)
    pd.testing.assert_frame_equal(a, b)


def test_assemble_walks_paths(ray_session):
    pairs = _pairs(n=40, m=160)
    eng = SuperstepEngine(num_parts=3).load_edges(_edges_ds(pairs))
    visits = random_walks(eng, walk_len=4, n_per_vertex=1, seed=5)
    paths = assemble_walks(visits).to_pandas()
    vdf = visits.to_pandas()
    eng.shutdown()
    assert len(paths) == vdf.groupby(["walk_v0", "walk_rep"]).ngroups
    row = paths.sort_values(["walk_v0", "walk_rep"]).iloc[0]
    expect = (
        vdf[(vdf.walk_v0 == row.walk_v0) & (vdf.walk_rep == row.walk_rep)]
        .sort_values("step")["v"]
        .tolist()
    )
    assert list(row["path"]) == expect
