"""Bow-tie decomposition vs a brute-force BFS/Tarjan oracle — fixture
graphs covering every class, random digraphs, and partition-count
invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.algos import bowtie
from oracles import random_edges
from test_scc import edges_ds, tarjan_oracle


def bowtie_oracle(edges):
    scc = tarjan_oracle(edges)
    verts = sorted({v for e in edges for v in e})
    from collections import Counter

    cnt = Counter(scc.values())
    core_lbl = max(cnt, key=lambda s: (cnt[s], s))
    corem = [v for v in verts if scc[v] == core_lbl]

    adj, radj, uadj = {}, {}, {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        radj.setdefault(b, []).append(a)
        uadj.setdefault(a, []).append(b)
        uadj.setdefault(b, []).append(a)

    def bfs(starts, g):
        seen = set(starts)
        q = list(starts)
        while q:
            v = q.pop()
            for w in g.get(v, []):
                if w not in seen:
                    seen.add(w)
                    q.append(w)
        return seen

    outr, inr, wk = bfs(corem, adj), bfs(corem, radj), bfs(corem, uadj)
    core = set(corem)
    out = {}
    for v in verts:
        if v in core:
            out[v] = "CORE"
        elif v in inr:
            out[v] = "IN"
        elif v in outr:
            out[v] = "OUT"
        elif v in wk:
            out[v] = "TENDRIL"
        else:
            out[v] = "DISC"
    return out


FIXTURES = {
    # 3-cycle core, an IN chain, an OUT chain, a tendril off the IN
    # chain, and a disconnected pair: all five classes present
    "all_classes": [
        (0, 1), (1, 2), (2, 0),          # core
        (10, 11), (11, 0),               # IN chain
        (2, 20), (20, 21),               # OUT chain
        (11, 30),                        # tendril off IN (not IN/OUT)
        (40, 41),                        # disconnected
    ],
    # two equal-size cycles: tie broken by max label
    "tie": [(0, 1), (1, 0), (5, 6), (6, 5)],
    # pure DAG: core = the singleton with max id
    "dag": [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_bowtie_fixtures(name):
    edges = FIXTURES[name]
    out, summary = bowtie(edges_ds(edges), num_parts=2)
    got = {r["v"]: r["cls"] for r in out.take_all()}
    assert got == bowtie_oracle(edges)
    if name == "all_classes":
        assert set(got.values()) == {"CORE", "IN", "OUT", "TENDRIL", "DISC"}


@pytest.mark.parametrize("parts", [1, 4])
def test_bowtie_random(parts):
    # sparse random digraph: rich class mix at this density
    edges = random_edges(200, 260, seed=7)
    out, _ = bowtie(edges_ds(edges), num_parts=parts)
    got = {r["v"]: r["cls"] for r in out.take_all()}
    assert got == bowtie_oracle(edges)


def test_bowtie_doc_graph_thin():
    # the query's thinned derived graph at tiny N, vs the oracle
    from linkgraph.docgraph import derive_edges_np

    N = 120
    src, dst = derive_edges_np(np.arange(N), N)
    keep = (src + dst) % 3 == 1
    edges = sorted({(int(s), int(d)) for s, d in zip(src[keep], dst[keep])})
    out, _ = bowtie(edges_ds(edges), num_parts=2)
    got = {r["v"]: r["cls"] for r in out.take_all()}
    assert got == bowtie_oracle(edges)
