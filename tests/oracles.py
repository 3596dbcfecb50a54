"""Pure-python/numpy oracles for the graph algorithms (FIXTURES.md §4).

Single-threaded, no Ray: these are the golden implementations the
distributed engine must match (exact for CC/LP/triangles, allclose 1e-6
for PageRank)."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def pagerank_oracle(edges, damping=0.85, tol=1e-8, max_iters=200):
    """Dense power iteration with dangling-mass redistribution.

    edges: iterable of (src, dst) pairs (any hashable ids).
    Returns dict id -> rank."""
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    idx = {v: i for i, v in enumerate(verts)}
    out = np.zeros(n)
    adj = defaultdict(list)
    for s, d in edges:
        out[idx[s]] += 1
        adj[idx[s]].append(idx[d])
    rank = np.full(n, 1.0 / n)
    for _ in range(max_iters):
        new = np.zeros(n)
        for i, targets in adj.items():
            c = rank[i] / out[i]
            for j in targets:
                new[j] += c
        dangling = rank[out == 0].sum()
        new = (1 - damping) / n + damping * (new + dangling / n)
        if np.abs(new - rank).sum() < tol:
            rank = new
            break
        rank = new
    return {v: rank[idx[v]] for v in verts}


def cc_oracle(edges):
    """Union-find; label = min vertex id in component. Returns dict id -> label."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rd] = rs
    comps = defaultdict(list)
    for v in parent:
        comps[find(v)].append(v)
    out = {}
    for members in comps.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def labelprop_oracle(edges, max_iters=20):
    """Synchronous LP, most-frequent neighbor label, ties -> min label."""
    nbrs = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    verts = sorted(nbrs)
    labels = {v: v for v in verts}
    for _ in range(max_iters):
        new = {}
        changed = 0
        for v in verts:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in nbrs[v])
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[v] = best
            if best != labels[v]:
                changed += 1
        labels = new
        if changed == 0:
            break
    return labels


def triangle_oracle(edges):
    """Exact triangle count of the undirected simple graph."""
    nbrs = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    count = 0
    for v, ns in nbrs.items():
        for u in ns:
            if u > v:
                count += len(ns & nbrs[u] & {w for w in nbrs[u] if w > u})
    return count


FIXTURE_GRAPHS = {
    # FIXTURES.md §3 known-answer graphs
    "one_clique_4": [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
    "two_cliques": [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8),
    ],
    "two_cliques_bridge": [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8), (4, 5),
    ],
    "chain_16": [(i, i + 1) for i in range(15)],
    "star_hub": [(0, i) for i in range(1, 65)],
    "dangling": [(0, 1), (1, 2)],
}


def random_edges(n, m, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    return list({(int(s), int(d)) for s, d in zip(src[keep], dst[keep])})
