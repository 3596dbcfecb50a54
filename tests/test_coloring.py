"""Jones-Plassmann round coloring vs an exact numpy round replay,
plus the properness invariant on random graphs and partition-count
invariance."""

import numpy as np
import pytest

from linkgraph.algos import greedy_coloring
from linkgraph.hashing import splitmix64
from oracles import random_edges
from test_scc import edges_ds


def coloring_oracle(edges):
    verts = sorted({v for e in edges for v in e})
    vi = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    a = np.array([vi[x] for x, _ in edges] + [vi[y] for _, y in edges])
    b = np.array([vi[y] for _, y in edges] + [vi[x] for x, _ in edges])
    prio = splitmix64(np.array(verts, np.uint64))
    color = np.full(n, -1, np.int64)
    r = 0
    while (color < 0).any():
        un = color < 0
        minp = np.full(n, np.uint64(0xFFFFFFFFFFFFFFFF))
        m = un[a] & un[b]
        np.minimum.at(minp, b[m], prio[a[m]])
        win = un & (prio < minp)
        color[win] = r
        r += 1
    return {v: int(color[vi[v]]) for v in verts}


@pytest.mark.parametrize("parts", [1, 4])
def test_coloring_random_vs_oracle(parts):
    edges = random_edges(150, 500, seed=23)
    out, summ = greedy_coloring(edges_ds(edges), num_parts=parts)
    got = {r["v"]: r["color"] for r in out.take_all()}
    assert got == coloring_oracle(edges)
    assert summ["converged"]
    assert summ["colors"] == max(got.values()) + 1


def test_coloring_proper():
    edges = random_edges(250, 900, seed=2)
    out, _ = greedy_coloring(edges_ds(edges), num_parts=2)
    got = {r["v"]: r["color"] for r in out.take_all()}
    for x, y in edges:
        assert got[x] != got[y], (x, y)
    assert min(got.values()) == 0


def test_coloring_star_two_colors():
    # star: center + leaves -> exactly two color classes, leaves equal
    edges = [(0, i) for i in range(1, 12)]
    out, _ = greedy_coloring(edges_ds(edges), num_parts=2)
    got = {r["v"]: r["color"] for r in out.take_all()}
    leaf_colors = {got[i] for i in range(1, 12)}
    assert len(leaf_colors) == 1
    assert got[0] != leaf_colors.pop()
    assert max(got.values()) <= 1
