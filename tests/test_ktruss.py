"""k-truss (edge-support peel) vs a brute-force set-peel oracle."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.algos import ktruss


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).repartition(3)


def brute_ktruss(edges, k):
    cur = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        adj = {}
        for u, v in cur:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(adj[u] & adj[v])
            for u, v in cur
        }
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return cur
        cur = nxt


def random_graph(seed, n=40, m=160):
    rng = np.random.default_rng(seed)
    es = set()
    while len(es) < m:
        a, b = rng.integers(0, n, 2)
        if a != b:
            es.add((int(a), int(b)))
    return sorted(es)


@pytest.mark.parametrize("seed,k", [(1, 3), (2, 4), (3, 5)])
def test_ktruss_matches_brute_force(ray_session, seed, k):
    edges = random_graph(seed)
    got = {
        (int(r["u"]), int(r["v"]))
        for r in ktruss(edges_ds(edges), k=k, num_partitions=4).take_all()
    }
    assert got == brute_ktruss(edges, k)


def test_ktruss_planted_clique_survives(ray_session):
    # K6 on {100..105}: every clique edge sits in 4 triangles -> the
    # whole clique survives the 6-truss while the sparse tail peels away
    clique = [(a, b) for a, b in itertools.combinations(range(100, 106), 2)]
    tail = [(i, i + 1) for i in range(50)] + [(0, 100), (1, 101)]
    got = {
        (int(r["u"]), int(r["v"]))
        for r in ktruss(edges_ds(clique + tail), k=6, num_partitions=4).take_all()
    }
    assert got == set(clique)


def test_ktruss_triangle_free_graph_empty(ray_session):
    path = [(i, i + 1) for i in range(30)]  # no triangles at all
    assert ktruss(edges_ds(path), k=3, num_partitions=4).count() == 0


def test_ktruss_partition_count_invariance(ray_session):
    edges = random_graph(9, n=30, m=120)
    a = {
        (int(r["u"]), int(r["v"]))
        for r in ktruss(edges_ds(edges), k=4, num_partitions=2).take_all()
    }
    b = {
        (int(r["u"]), int(r["v"]))
        for r in ktruss(edges_ds(edges), k=4, num_partitions=7).take_all()
    }
    assert a == b == brute_ktruss(edges, 4)
