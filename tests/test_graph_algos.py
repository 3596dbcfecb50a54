"""Graph algorithms vs single-threaded oracles (FIXTURES.md §3-4):
exact match for CC / label propagation / triangles, allclose 1e-6 for
PageRank, at two partition counts (partition-count independence)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.algos import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)
from oracles import (
    FIXTURE_GRAPHS,
    cc_oracle,
    labelprop_oracle,
    pagerank_oracle,
    random_edges,
    triangle_oracle,
)


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


@pytest.mark.parametrize("name", sorted(FIXTURE_GRAPHS))
@pytest.mark.parametrize("parts", [1, 3])
def test_pagerank_fixtures(name, parts):
    edges = FIXTURE_GRAPHS[name]
    out, summary, eng = pagerank(edges_ds(edges), num_parts=parts, tol=1e-10)
    got = {r["v"]: r["rank"] for r in out.take_all()}
    want = pagerank_oracle(edges, tol=1e-10)
    eng.shutdown()
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6


@pytest.mark.parametrize("name", sorted(FIXTURE_GRAPHS))
def test_cc_fixtures(name):
    edges = FIXTURE_GRAPHS[name]
    out, _, eng = connected_components(edges_ds(edges), num_parts=3)
    got = {r["v"]: r["label"] for r in out.take_all()}
    eng.shutdown()
    assert got == cc_oracle(edges)


@pytest.mark.parametrize("name", sorted(FIXTURE_GRAPHS))
def test_labelprop_fixtures(name):
    edges = FIXTURE_GRAPHS[name]
    out, _, eng = label_propagation(edges_ds(edges), num_parts=3, max_iters=20)
    got = {r["v"]: r["label"] for r in out.take_all()}
    eng.shutdown()
    assert got == labelprop_oracle(edges, max_iters=20)


@pytest.mark.parametrize("name", sorted(FIXTURE_GRAPHS))
def test_triangles_fixtures(name):
    edges = FIXTURE_GRAPHS[name]
    assert triangle_count(edges_ds(edges), num_partitions=2) == triangle_oracle(edges)


def test_random_graph_all_algos():
    edges = random_edges(150, 600, seed=11)
    ds = edges_ds(edges)
    out, _, eng = pagerank(ds, num_parts=4, tol=1e-10)
    got = {r["v"]: r["rank"] for r in out.take_all()}
    want = pagerank_oracle(edges, tol=1e-10)
    eng.shutdown()
    assert all(abs(got[v] - want[v]) < 1e-6 for v in want)

    out, _, eng = connected_components(ds, num_parts=4)
    got = {r["v"]: r["label"] for r in out.take_all()}
    eng.shutdown()
    assert got == cc_oracle(edges)

    out, _, eng = label_propagation(ds, num_parts=4, max_iters=10)
    got = {r["v"]: r["label"] for r in out.take_all()}
    eng.shutdown()
    assert got == labelprop_oracle(edges, max_iters=10)

    assert triangle_count(ds, num_partitions=2) == triangle_oracle(edges)


def test_pagerank_uint64_hash_ids():
    # hashed-url id space (uint64) exercises the unsigned path
    from linkgraph.hashing import hash64_str

    edges = FIXTURE_GRAPHS["two_cliques_bridge"]
    names = {v: f"https://site/{v}" for e in edges for v in e}
    h = {v: int(hash64_str([names[v]])[0]) for v in names}
    hedges = [(h[s], h[d]) for s, d in edges]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in hedges], pa.uint64()),
                "dst": pa.array([e[1] for e in hedges], pa.uint64()),
            }
        )
    )
    out, _, eng = pagerank(ds, num_parts=3, tol=1e-10)
    got = {r["v"]: r["rank"] for r in out.take_all()}
    want = pagerank_oracle(hedges, tol=1e-10)
    eng.shutdown()
    assert all(abs(got[v] - want[v]) < 1e-6 for v in want)


def test_bfs_hops():
    from collections import deque

    from linkgraph.algos.bfs import bfs_hops

    edges = random_edges(120, 360, seed=17) + [(0, 5)]
    out, _, eng = bfs_hops(edges_ds(edges), source=0, num_parts=3, directed=True)
    got = {r["v"]: r["dist"] for r in out.take_all()}
    eng.shutdown()
    # oracle BFS over directed edges
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {0: 0}
    q = deque([0])
    while q:
        u = q.popleft()
        for w in adj.get(u, []):
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    verts = {v for e in edges for v in e}
    want = {v: dist.get(v, -1) for v in verts}
    assert got == want
