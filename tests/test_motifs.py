"""Bounded motif census (GBAD-lite) vs a brute-force subgraph counter
(reference analogue: test/intrusion_detection.cpp:33-46 frequent
subgraph patterns, bounded to the complete <=4-vertex lattice)."""

import itertools

import numpy as np
import pyarrow as pa

import ray.data

from linkgraph.ops.motifs import MOTIFS, motif_census


def _brute(edges):
    es = set()
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        es.add((u, v))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    verts = sorted(adj)
    deg = {v: len(adj[v]) for v in verts}

    def E(a, b):
        return (min(a, b), max(a, b)) in es

    c = dict.fromkeys(MOTIFS, 0)
    c["wedge"] = sum(d * (d - 1) // 2 for d in deg.values())
    c["star3"] = sum(d * (d - 1) * (d - 2) // 6 for d in deg.values())
    for u, v, w in itertools.combinations(verts, 3):
        if E(u, v) and E(v, w) and E(u, w):
            c["triangle"] += 1
    for q in itertools.combinations(verts, 4):
        if len([1 for a, b in itertools.combinations(q, 2) if E(a, b)]) == 6:
            c["clique4"] += 1
        for a, b, x, d in itertools.permutations(q):
            if E(a, b) and E(b, x) and E(x, d):
                c["path4"] += 1
                if E(d, a):
                    c["cycle4"] += 1
            if E(a, b) and E(b, x) and E(a, x) and E(a, d):
                c["tadpole"] += 1
            if E(a, b) and E(a, x) and E(b, x) and E(a, d) and E(b, d):
                c["diamond"] += 1
    c["path4"] //= 2  # path reversal
    c["cycle4"] //= 8  # cycle automorphisms
    c["tadpole"] //= 2  # triangle base swap
    c["diamond"] //= 4  # shared-edge and apex swaps
    return c


def _ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def test_motif_census_matches_bruteforce_random():
    rng = np.random.default_rng(5)
    for _ in range(2):
        edges = [
            (int(rng.integers(0, 13)), int(rng.integers(0, 13))) for _ in range(28)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _brute(edges)
        got_df = motif_census(_ds(edges), num_partitions=4, top=8)
        got = dict(zip(got_df["motif"], got_df["count"]))
        for m in MOTIFS:
            assert got.get(m, 0) == want[m], m
        # shares sum to <= 1 and are count/total
        total = sum(want.values())
        for m, cnt, sh in zip(got_df["motif"], got_df["count"], got_df["share"]):
            assert abs(sh - cnt / total) <= 5e-9  # share rounded to 8 dp


def test_motif_census_planted_cliques():
    # two K4s sharing a vertex + a pendant path: exercises every class
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (3, 4), (3, 5), (3, 6), (4, 5), (4, 6), (5, 6),
        (6, 7), (7, 8),
    ]
    want = _brute(edges)
    assert want["clique4"] == 2
    got_df = motif_census(_ds(edges), num_partitions=4, top=8)
    got = dict(zip(got_df["motif"], got_df["count"]))
    for m in MOTIFS:
        assert got.get(m, 0) == want[m], m


def test_motif_census_top5_order_and_empty():
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    df = motif_census(_ds(edges), num_partitions=2, top=5)
    assert len(df) == 5
    counts = list(df["count"])
    assert counts == sorted(counts, reverse=True)
    empty = motif_census(_ds([(0, 0)]), num_partitions=2)
    assert len(empty) == 0


def test_slabbed_pairs_match_unslabbed():
    # tiny max_pairs forces many slabs, including splits INSIDE a hub
    # run; the pair stream must be identical to the one-shot generator
    import numpy as np
    from linkgraph.algos.triangles import (
        _all_pairs_per_run,
        _all_pairs_per_run_slabbed,
    )

    rng = np.random.default_rng(4)
    a = np.sort(rng.integers(0, 6, 500))  # few runs -> big runs
    b = rng.integers(0, 1000, 500)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    ii, jj = _all_pairs_per_run(a, b)
    want = set(zip(ii.tolist(), jj.tolist()))
    for mp in (1, 7, 64, 1 << 22):
        got = set()
        tot = 0
        for si, sj in _all_pairs_per_run_slabbed(a, b, max_pairs=mp):
            got |= set(zip(si.tolist(), sj.tolist()))
            tot += len(si)
        assert got == want, mp
        assert tot == len(want), mp  # no duplicate emission
