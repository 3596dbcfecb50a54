"""DAG longest-path levels vs a topological-DP oracle — fixture DAGs,
random DAGs (edges a<b so acyclic by construction), and partition-count
invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.algos import dag_levels
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


def topo_dp_oracle(edges):
    """level(v) = longest path length from any source to v (Kahn DP)."""
    verts = sorted({v for e in edges for v in e})
    adj, indeg = {}, {v: 0 for v in verts}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        indeg[b] += 1
    lvl = {v: 0 for v in verts}
    queue = [v for v in verts if indeg[v] == 0]
    order = []
    while queue:
        u = queue.pop()
        order.append(u)
        for w in adj.get(u, []):
            if lvl[u] + 1 > lvl[w]:
                lvl[w] = lvl[u] + 1
            indeg[w] -= 1
            if indeg[w] == 0:
                queue.append(w)
    assert len(order) == len(verts), "oracle input must be a DAG"
    return lvl


FIXTURES = {
    "chain": [(0, 1), (1, 2), (2, 3), (3, 4)],
    "diamond": [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
    # two components: a long path and a star (star leaves all level 1)
    "two_comp": [(0, 1), (1, 2), (2, 3), (10, 11), (10, 12), (10, 13)],
    # a shortcut edge must NOT lower the level (longest, not shortest)
    "shortcut": [(0, 1), (1, 2), (2, 3), (0, 3)],
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_dag_levels_fixtures(ray_session, name):
    edges = FIXTURES[name]
    out, summary = dag_levels(edges_ds(edges), num_parts=3)
    got = {int(r["v"]): int(r["lvl"]) for r in out.take_all()}
    assert got == topo_dp_oracle(edges)


@pytest.mark.parametrize("seed", [1, 7])
def test_dag_levels_random(ray_session, seed):
    raw = random_edges(60, 220, seed)
    # orient every edge low->high: acyclic by construction
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    out, _ = dag_levels(edges_ds(edges), num_parts=4)
    got = {int(r["v"]): int(r["lvl"]) for r in out.take_all()}
    assert got == topo_dp_oracle(edges)


def test_dag_levels_partition_invariance(ray_session):
    raw = random_edges(40, 120, 3)
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    results = []
    for parts in (2, 5):
        out, _ = dag_levels(edges_ds(edges), num_parts=parts)
        results.append(sorted((int(r["v"]), int(r["lvl"])) for r in out.take_all()))
    assert results[0] == results[1]
