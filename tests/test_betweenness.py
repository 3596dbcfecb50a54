"""Multi-source Brandes betweenness vs a pure-Python textbook oracle
(undirected BFS DAG per source, backward dependency accumulation)."""

from collections import defaultdict, deque

import numpy as np
import pyarrow as pa

import ray.data

from linkgraph.algos import betweenness, top_degree_sources
from oracles import random_edges


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def brandes_oracle(edges, sources):
    nbrs = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        order = []
        q = deque([s])
        while q:
            w = q.popleft()
            order.append(w)
            for x in nbrs[w]:
                if x not in dist:
                    dist[x] = dist[w] + 1
                    q.append(x)
                if dist[x] == dist[w] + 1:
                    sigma[x] += sigma[w]
        delta = defaultdict(float)
        for w in reversed(order):
            for v in nbrs[w]:
                if dist.get(v, -2) == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        for v in order:
            if v != s:
                bc[v] += delta[v]
    return bc


def test_brandes_two_sources_random():
    edges = random_edges(120, 500, seed=41)
    srcs = sorted({e[0] for e in edges})[:2]
    out, summary, eng = betweenness(edges_ds(edges), sources=srcs, num_parts=4)
    got = {int(r["v"]): r["bc"] for r in out.take_all()}
    eng.shutdown()
    want = brandes_oracle(edges, srcs)
    assert summary["converged"]
    for v, b in got.items():
        assert abs(b - want.get(v, 0.0)) < 1e-8, (v, b, want.get(v, 0.0))
    # every positive-dependency vertex is present
    for v, b in want.items():
        if b > 0:
            assert abs(got[v] - b) < 1e-8


def test_brandes_disconnected_and_isolated_source():
    # two components + an isolated vertex used as a source
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (99, 99)]
    srcs = [1, 99, 10]
    out, summary, eng = betweenness(edges_ds(edges), sources=srcs, num_parts=2)
    got = {int(r["v"]): r["bc"] for r in out.take_all()}
    eng.shutdown()
    want = brandes_oracle(edges, srcs)
    assert summary["converged"]
    for v in got:
        assert abs(got[v] - want.get(v, 0.0)) < 1e-12


def test_top_degree_sources_deterministic():
    edges = random_edges(60, 300, seed=7)
    a = top_degree_sources(edges_ds(edges), 3)
    b = top_degree_sources(edges_ds(edges), 3)
    assert a == b and len(a) == 3


def test_brandes_normalized_scale():
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    out, summary, eng = betweenness(
        edges_ds(edges), sources=[1], num_parts=2, normalize=True
    )
    got = {int(r["v"]): r["bc"] for r in out.take_all()}
    eng.shutdown()
    want = brandes_oracle(edges, [1])
    n = summary["n_vertices"]
    for v in got:
        assert abs(got[v] - want.get(v, 0.0) * n) < 1e-12
