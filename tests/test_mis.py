"""Deterministic-Luby MIS vs an exact numpy round replay, plus the
structural invariants (independence + maximality) on random graphs and
partition-count invariance."""

import numpy as np
import pytest

from linkgraph.algos import maximal_independent_set
from linkgraph.hashing import splitmix64
from oracles import random_edges
from test_scc import edges_ds


def mis_oracle(edges):
    verts = sorted({v for e in edges for v in e})
    vi = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    a = np.array([vi[x] for x, _ in edges] + [vi[y] for _, y in edges])
    b = np.array([vi[y] for _, y in edges] + [vi[x] for x, _ in edges])
    prio = splitmix64(np.array(verts, np.uint64))
    status = np.zeros(n, np.int8)
    while (status == 0).any():
        act = status == 0
        minp = np.full(n, np.uint64(0xFFFFFFFFFFFFFFFF))
        m = act[a] & act[b]
        np.minimum.at(minp, b[m], prio[a[m]])
        join = act & (prio < minp)
        status[join] = 1
        excl = np.zeros(n, bool)
        excl[b[join[a]]] = True
        status[(status == 0) & excl] = 2
    return {v: int(status[vi[v]] == 1) for v in verts}


@pytest.mark.parametrize("parts", [1, 4])
def test_mis_random_vs_oracle(parts):
    edges = random_edges(180, 600, seed=11)
    out, summ = maximal_independent_set(edges_ds(edges), num_parts=parts)
    got = {r["v"]: r["in_mis"] for r in out.take_all()}
    assert got == mis_oracle(edges)
    assert summ["converged"]


def test_mis_invariants_sparse():
    edges = random_edges(300, 350, seed=5)
    out, _ = maximal_independent_set(edges_ds(edges), num_parts=2)
    got = {r["v"]: r["in_mis"] for r in out.take_all()}
    nbr = {}
    for x, y in edges:
        nbr.setdefault(x, set()).add(y)
        nbr.setdefault(y, set()).add(x)
    mis = {v for v, f in got.items() if f}
    # independence: no two members adjacent
    for v in mis:
        assert not (nbr[v] & mis)
    # maximality: every non-member has a member neighbor
    for v in got:
        if v not in mis:
            assert nbr[v] & mis, v


def test_mis_path_graph_exact():
    # 0-1-2-3-4 path: membership decided purely by priorities; replay
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    out, _ = maximal_independent_set(edges_ds(edges), num_parts=2)
    got = {r["v"]: r["in_mis"] for r in out.take_all()}
    assert got == mis_oracle(edges)
    assert sum(got.values()) >= 2
