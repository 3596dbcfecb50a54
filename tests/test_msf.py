"""Distributed Borůvka MSF vs an exact Kruskal replay over the same
deterministic distinct weights (unique forest => set equality), CC
cross-check, and both pointer-collapse paths."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from linkgraph.algos.msf import edge_weight63, spanning_forest
from oracles import random_edges


def kruskal(edges):
    src = np.array([x for x, _ in edges], np.int64)
    dst = np.array([y for _, y in edges], np.int64)
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep])
    hi = np.maximum(src[keep], dst[keep])
    und = np.unique(np.stack([lo, hi], 1), axis=0)
    pe = edge_weight63(und[:, 0], und[:, 1])
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = []
    for i in np.argsort(pe):
        a, b = int(und[i, 0]), int(und[i, 1])
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            mst.append((a, b))
    return sorted(mst)


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": np.array([x for x, _ in edges], np.int64),
                "dst": np.array([y for _, y in edges], np.int64),
            }
        )
    )


@pytest.mark.parametrize("thresh", [5_000_000, 0])
def test_msf_vs_kruskal(thresh):
    edges = random_edges(250, 800, seed=17)
    forest, labels, summ = spanning_forest(
        edges_ds(edges), local_resolve_threshold=thresh
    )
    got = sorted(
        (int(r["lo"]), int(r["hi"])) for r in forest.take_all()
    )
    assert got == kruskal(edges)
    # forest size = V - #components; labels are the CC labels
    lab = labels.to_pandas()
    ncomp = lab["comp"].nunique()
    assert len(got) == len(lab) - ncomp
    # CC cross-check: two endpoints of any input edge share a component
    cmap = dict(zip(lab["v"], lab["comp"]))
    for x, y in edges:
        if x != y:
            assert cmap[x] == cmap[y]


def test_msf_negative_hashed_ids():
    # hashed web ids are SIGNED int64: negative labels must survive the
    # outer-attach fill sentinel (regression: -1 fill broke relabeling)
    rng = np.random.default_rng(23)
    ids = rng.integers(-(2**62), 2**62, 120).astype(np.int64)
    pairs = rng.integers(0, 120, (300, 2))
    edges = [(int(ids[a]), int(ids[b])) for a, b in pairs]
    forest, labels, summ = spanning_forest(edges_ds(edges))
    got = sorted((int(r["lo"]), int(r["hi"])) for r in forest.take_all())
    assert got == kruskal(edges)
    assert summ["rounds"] < 15  # converged, not max_rounds-capped


def test_msf_sparse_forest():
    # several components + isolated-ish structure
    edges = random_edges(400, 180, seed=9)
    forest, labels, summ = spanning_forest(edges_ds(edges))
    got = sorted((int(r["lo"]), int(r["hi"])) for r in forest.take_all())
    assert got == kruskal(edges)
    assert summ["rounds"] >= 1
