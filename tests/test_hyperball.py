"""HyperBall harmonic centrality vs exact BFS reciprocal-distance sums."""

from collections import defaultdict, deque

import pyarrow as pa

import ray.data

from linkgraph.algos import harmonic_centrality
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


def harmonic_oracle(edges, mode="in"):
    """Exact h(v) = sum_u 1/d(u, v) (mode='in') by BFS from every u."""
    fwd = defaultdict(set)
    verts = set()
    for a, b in edges:
        verts.update((a, b))
        if a != b:
            fwd[a].add(b)
    h = defaultdict(float)
    for s in verts:
        dist = {s: 0}
        q = deque([s])
        while q:
            w = q.popleft()
            for x in fwd[w]:
                if x not in dist:
                    dist[x] = dist[w] + 1
                    q.append(x)
        for v, d in dist.items():
            if d > 0:
                if mode == "in":
                    h[v] += 1.0 / d
                else:
                    h[s] += 1.0 / d
    return h


def test_hyperball_path_graph_near_exact():
    # tiny balls => linear counting regime => near-exact estimates
    edges = [(1, 2), (2, 3), (3, 4)]
    out, summary, eng = harmonic_centrality(edges_ds(edges), p=7, num_parts=2)
    got = {int(r["v"]): r["harmonic"] for r in out.take_all()}
    eng.shutdown()
    want = harmonic_oracle(edges)
    assert summary["converged"]
    for v in got:
        assert abs(got[v] - want.get(v, 0.0)) < 0.08, (v, got[v], want.get(v))


def test_hyperball_random_accuracy_and_invariance():
    edges = random_edges(150, 700, seed=53)
    out2, _, e2 = harmonic_centrality(edges_ds(edges), p=7, num_parts=2)
    got2 = {int(r["v"]): r["harmonic"] for r in out2.take_all()}
    e2.shutdown()
    out5, _, e5 = harmonic_centrality(edges_ds(edges), p=7, num_parts=5)
    got5 = {int(r["v"]): r["harmonic"] for r in out5.take_all()}
    e5.shutdown()
    assert got2 == got5  # deterministic hashing: partition invariant
    want = harmonic_oracle(edges)
    tot_got = sum(got2.values())
    tot_want = sum(want.values())
    assert abs(tot_got - tot_want) / tot_want < 0.15
    errs = [
        abs(got2[v] - want[v]) / want[v] for v in want if want[v] > 1.0
    ]
    assert sum(errs) / len(errs) < 0.25


def test_hyperball_out_mode():
    edges = [(1, 2), (2, 3)]
    out, _, eng = harmonic_centrality(edges_ds(edges), p=7, num_parts=2, mode="out")
    got = {int(r["v"]): r["harmonic"] for r in out.take_all()}
    eng.shutdown()
    want = harmonic_oracle(edges, mode="out")
    for v in got:
        assert abs(got[v] - want.get(v, 0.0)) < 0.08
