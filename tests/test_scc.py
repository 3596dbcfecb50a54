"""SCC forward-backward coloring vs an iterative Tarjan oracle —
fixture graphs, random digraphs, a pure DAG (all singletons, finishes
in one round), and partition-count invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.algos import strongly_connected_components
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


def tarjan_oracle(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    verts = sorted({v for e in edges for v in e})
    index, low, on, st, out = {}, {}, set(), [], {}
    cnt = [0]

    def strong(v0):
        stack = [(v0, 0)]
        while stack:
            node, pi = stack[-1]
            if pi == 0:
                index[node] = low[node] = cnt[0]
                cnt[0] += 1
                st.append(node)
                on.add(node)
            ns = adj.get(node, [])
            advanced = False
            while pi < len(ns):
                w = ns[pi]
                pi += 1
                if w not in index:
                    stack[-1] = (node, pi)
                    stack.append((w, 0))
                    advanced = True
                    break
                elif w in on:
                    low[node] = min(low[node], index[w])
            if advanced:
                continue
            stack.pop()
            if stack:
                low[stack[-1][0]] = min(low[stack[-1][0]], low[node])
            if low[node] == index[node]:
                comp = []
                while True:
                    w = st.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                m = max(comp)
                for w in comp:
                    out[w] = m

    for v in verts:
        if v not in index:
            strong(v)
    return out


FIXTURES = {
    # two 3-cycles joined by a one-way bridge: two SCCs
    "two_cycles_bridge": [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
    # a 4-cycle with a tail: cycle SCC + singleton tail
    "cycle_tail": [(0, 1), (1, 2), (2, 3), (3, 0), (3, 9)],
    # pure DAG: every vertex its own SCC
    "dag": [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
    # bidirectional pair inside a larger weak component
    "bipair": [(7, 8), (8, 7), (8, 9), (1, 7)],
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_scc_fixtures(name):
    edges = FIXTURES[name]
    out, summary = strongly_connected_components(edges_ds(edges), num_parts=2)
    got = {r["v"]: r["scc"] for r in out.take_all()}
    assert got == tarjan_oracle(edges)
    if name == "dag":
        assert summary["rounds"] == 1  # every root retires its singleton


@pytest.mark.parametrize("parts", [1, 4])
def test_scc_random(parts):
    edges = random_edges(150, 500, seed=31)
    out, _ = strongly_connected_components(edges_ds(edges), num_parts=parts)
    got = {r["v"]: r["scc"] for r in out.take_all()}
    assert got == tarjan_oracle(edges)
