"""Deterministic maximal matching (local-min edge priorities) vs the
exact round replay, plus the structural invariants (matching validity
+ maximality) on random graphs and partition-count invariance."""

import numpy as np
import pytest

from linkgraph.algos import maximal_matching
from linkgraph.algos.matching import matching_replay
from oracles import random_edges
from test_scc import edges_ds


def run(edges, parts=4):
    out, summ = maximal_matching(edges_ds(edges), num_parts=parts)
    return {r["v"]: r["matched"] for r in out.take_all()}, summ


@pytest.mark.parametrize("parts", [1, 4])
def test_matching_random_vs_replay(parts):
    edges = random_edges(180, 600, seed=11)
    got, summ = run(edges, parts)
    partners = matching_replay(
        np.array([x for x, _ in edges]), np.array([y for _, y in edges])
    )
    want = {v: int(v in partners) for v in got}
    assert got == want
    assert summ["converged"]


def test_matching_invariants_sparse():
    edges = random_edges(300, 350, seed=5)
    got, _ = run(edges, parts=2)
    partners = matching_replay(
        np.array([x for x, _ in edges]), np.array([y for _, y in edges])
    )
    # validity: partners pair up one-to-one
    for v, p in partners.items():
        assert partners[p] == v and p != v
    und = {(min(x, y), max(x, y)) for x, y in edges if x != y}
    # replay partners are real edges
    for v, p in partners.items():
        assert (min(v, p), max(v, p)) in und
    matched = {v for v, f in got.items() if f}
    assert matched == set(partners)
    # maximality: no edge with both endpoints unmatched
    for x, y in und:
        assert x in matched or y in matched, (x, y)


def test_matching_path_and_star():
    # star: exactly one matched pair; path: alternating structure
    star = [(0, i) for i in range(1, 9)]
    got, _ = run(star, parts=2)
    assert sum(got.values()) == 2 and got[0] == 1
    path = [(i, i + 1) for i in range(10)]
    got, _ = run(path, parts=2)
    matched = {v for v, f in got.items() if f}
    for i in range(10):
        assert i in matched or i + 1 in matched


def test_matching_self_loops_dropped():
    edges = [(1, 1), (1, 2), (3, 3)]
    got, _ = run(edges, parts=1)
    # 3 only appears in a self-loop: isolated after the drop, absent
    # from the engine's vertex set entirely or unmatched if present
    assert got.get(1) == 1 and got.get(2) == 1
    assert not got.get(3, 0)
