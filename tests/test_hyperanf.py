"""HyperANF vs the exact neighborhood function (BFS ball closure) on
random digraphs; estimation error bound, monotonicity, and exact
partition-count invariance (deterministic hashing + max-merge)."""

import numpy as np
import pyarrow as pa

import ray.data

from linkgraph.algos import hyperanf
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


def exact_nf(edges):
    verts = sorted({v for e in edges for v in e})
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    balls = {v: {v} for v in verts}
    nf = [len(verts)]
    while True:
        new = {v: set.union(balls[v], *(balls[w] for w in adj.get(v, ()))) if adj.get(v) else set(balls[v]) for v in verts}
        if all(new[v] == balls[v] for v in verts):
            break
        balls = new
        nf.append(sum(len(s) for s in balls.values()))
    return nf


def test_hyperanf_error_and_invariance():
    edges = random_edges(250, 750, seed=41)
    df, res = hyperanf(edges_ds(edges), p=7, num_parts=3)
    want = exact_nf(edges)
    for t in range(min(len(want), len(df))):
        assert abs(df["nf"][t] - want[t]) / want[t] < 0.15
    assert (np.diff(df["nf"].to_numpy()) >= 0).all()
    assert res["effective_diameter"] <= res["hops_to_saturation"]
    df2, _ = hyperanf(edges_ds(edges), p=7, num_parts=7)
    assert df.equals(df2)
