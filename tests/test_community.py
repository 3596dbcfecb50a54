"""K-clique percolation golden tests — replicating the reference's
community_test_cases/*.csv fixtures (test/community_detection.cpp:
K = 4 cliques over a Euclidean distance graph; cliques sharing >= K-1
vertices merge into one community).

Fixture interpretation notes: the reference CSVs hold rows
(x, y, z, id). `8_vert_2_cliq_overlapping.csv` contains a malformed row
("0.0.11,..."); the overlapping case is therefore replicated
semantically — two 4-cliques sharing K-1 = 3 vertices must merge —
with clean coordinates. Distance thresholds are per-case CLI args in
the reference (argv[2]); chosen here so each fixture's name holds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from linkgraph.algos.community import kclique_communities


def _distance_edges(points: dict[int, tuple], threshold: float):
    ids = sorted(points)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = np.linalg.norm(np.subtract(points[a], points[b]))
            if d <= threshold:
                rows.append((a, b))
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": np.array([r[0] for r in rows], np.int64),
                "dst": np.array([r[1] for r in rows], np.int64),
            }
        )
    )


def _communities(ds) -> dict[int, set[int]]:
    df = kclique_communities(ds, k=4).to_pandas()
    out: dict[int, set[int]] = {}
    for _, r in df.iterrows():
        out.setdefault(int(r["community"]), set()).add(int(r["v"]))
    return out


# reference community_test_cases/4_vert_1_cliq.csv
FIX1 = {1: (0, 0, 0), 2: (0, 1, 0), 3: (1, 0, 0), 4: (0, 0, 1)}

# reference community_test_cases/8_vert_2_cliq.csv
FIX2 = {**FIX1, 5: (1000, 0, 0), 6: (1000, 1, 0), 7: (1001, 0, 0), 8: (1000, 0, 1)}


def test_one_clique_fixture(ray_session):
    comm = _communities(_distance_edges(FIX1, 1.5))
    assert comm == {1: {1, 2, 3, 4}}


def test_two_clique_fixture(ray_session):
    comm = _communities(_distance_edges(FIX2, 1.5))
    assert comm == {1: {1, 2, 3, 4}, 5: {5, 6, 7, 8}}


def test_overlapping_clique_fixture(ray_session):
    # collinear points 0..4 apart; threshold 3 -> cliques {1,2,3,4} and
    # {2,3,4,5} share 3 vertices -> ONE merged community
    points = {i + 1: (0.0, float(i), 0.0) for i in range(5)}
    comm = _communities(_distance_edges(points, 3.0))
    assert comm == {1: {1, 2, 3, 4, 5}}


def test_k3_percolation_edge_vs_vertex_overlap(ray_session):
    # triangles sharing an EDGE merge; sharing only a vertex don't
    tris_edge = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)]  # share edge (2,3)
    ds = ray.data.from_pandas(
        pd.DataFrame({"src": [a for a, _ in tris_edge], "dst": [b for _, b in tris_edge]})
    )
    df = kclique_communities(ds, k=3).to_pandas()
    comm = {}
    for _, r in df.iterrows():
        comm.setdefault(int(r["community"]), set()).add(int(r["v"]))
    assert comm == {1: {1, 2, 3, 4}}

    tris_vert = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]  # share vertex 3
    ds2 = ray.data.from_pandas(
        pd.DataFrame({"src": [a for a, _ in tris_vert], "dst": [b for _, b in tris_vert]})
    )
    df2 = kclique_communities(ds2, k=3).to_pandas()
    comm2 = {}
    for _, r in df2.iterrows():
        comm2.setdefault(int(r["community"]), set()).add(int(r["v"]))
    assert comm2 == {1: {1, 2, 3}, 3: {3, 4, 5}}
