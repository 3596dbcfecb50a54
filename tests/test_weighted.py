"""Weighted ops over the per-edge value channel: SSSP (min-plus
Bellman-Ford) vs a dense numpy oracle, HITS vs a dense power-iteration
oracle — at two partition counts (partition-count independence)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.algos import hits_dataset, sssp_weighted
from linkgraph.algos.sssp import id_weight
from oracles import FIXTURE_GRAPHS, random_edges


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def sssp_oracle(edges, source):
    """Bellman-Ford over the directed edge list with id_weight costs."""
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    w = id_weight(src, dst)
    verts = np.unique(np.concatenate([src, dst]))
    dist = {int(v): -1 for v in verts}
    dist[source] = 0
    for _ in range(len(verts)):
        changed = False
        for s, d, c in zip(src, dst, w):
            ds_ = dist[int(s)]
            if ds_ >= 0 and (dist[int(d)] < 0 or ds_ + c < dist[int(d)]):
                dist[int(d)] = ds_ + int(c)
                changed = True
        if not changed:
            break
    return dist


def hits_oracle(edges, iters):
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    verts = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(verts)}
    si = np.array([idx[int(s)] for s in src])
    di = np.array([idx[int(d)] for d in dst])
    h = np.ones(len(verts))
    a = np.ones(len(verts))
    for _ in range(iters):
        na = np.zeros(len(verts))
        nh = np.zeros(len(verts))
        np.add.at(na, di, h[si])
        np.add.at(nh, si, a[di])
        h, a = nh, na
    h = h / (np.linalg.norm(h) or 1.0)
    a = a / (np.linalg.norm(a) or 1.0)
    return {int(v): (h[i], a[i]) for v, i in idx.items()}


@pytest.mark.parametrize("name", ["two_cliques_bridge", "chain_16", "star_hub"])
@pytest.mark.parametrize("parts", [1, 3])
def test_sssp_fixtures(name, parts):
    edges = FIXTURE_GRAPHS[name]
    source = edges[0][0]
    out, _, eng = sssp_weighted(edges_ds(edges), source, num_parts=parts)
    got = {r["v"]: r["dist"] for r in out.take_all()}
    eng.shutdown()
    want = sssp_oracle(edges, source)
    assert got == want


def test_sssp_random_graph():
    edges = random_edges(200, 800, seed=7)
    out, _, eng = sssp_weighted(edges_ds(edges), int(edges[0][0]), num_parts=4)
    got = {r["v"]: r["dist"] for r in out.take_all()}
    eng.shutdown()
    want = sssp_oracle(edges, int(edges[0][0]))
    assert got == want


def _graph_arrays(edges):
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    verts = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(verts)}
    si = np.array([idx[int(s)] for s in src])
    di = np.array([idx[int(d)] for d in dst])
    return verts, idx, si, di, src, dst


def ppr_oracle(edges, sources, d=0.85, iters=5):
    verts, idx, si, di, _, _ = _graph_arrays(edges)
    n = len(verts)
    p = np.zeros(n)
    for s in sources:
        if int(s) in idx:
            p[idx[int(s)]] = 1.0 / len(sources)
    outdeg = np.bincount(si, minlength=n)
    r = p.copy()
    for _ in range(iters):
        dang = r[outdeg == 0].sum()
        msg = np.zeros(n)
        np.add.at(msg, di, r[si] / outdeg[si])
        r = (1 - d) * p + d * (msg + dang * p)
    return {int(v): r[i] for v, i in idx.items()}


def wpr_oracle(edges, d=0.85, iters=5):
    verts, idx, si, di, src, dst = _graph_arrays(edges)
    n = len(verts)
    w = id_weight(src, dst).astype(np.float64)
    W = np.bincount(si, weights=w, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[W == 0].sum()
        msg = np.zeros(n)
        np.add.at(msg, di, r[si] / W[si] * w)
        r = (1 - d) / n + d * (msg + dang / n)
    return {int(v): r[i] for v, i in idx.items()}


@pytest.mark.parametrize("parts", [1, 3])
def test_personalized_pagerank(parts):
    from linkgraph.algos import personalized_pagerank

    edges = random_edges(150, 600, seed=11)
    srcs = [int(edges[0][0]), int(edges[1][0])]
    out, _, eng = personalized_pagerank(
        edges_ds(edges), srcs, num_parts=parts, tol=0.0, max_iters=5
    )
    got = {r["v"]: r["rank"] for r in out.take_all()}
    eng.shutdown()
    want = ppr_oracle(edges, srcs)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


@pytest.mark.parametrize("parts", [1, 3])
def test_weighted_pagerank(parts):
    from linkgraph.algos import weighted_pagerank

    edges = random_edges(150, 600, seed=12)
    out, _, eng = weighted_pagerank(edges_ds(edges), num_parts=parts, tol=0.0, max_iters=5)
    got = {r["v"]: r["rank"] for r in out.take_all()}
    eng.shutdown()
    want = wpr_oracle(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


@pytest.mark.parametrize("name", ["two_cliques_bridge", "star_hub"])
def test_hits_fixtures(name):
    edges = FIXTURE_GRAPHS[name]
    df = hits_dataset(edges_ds(edges), iters=4, num_partitions=2).to_pandas()
    want = hits_oracle(edges, iters=4)
    assert set(df["v"]) == set(want)
    for _, r in df.iterrows():
        wh, wa = want[int(r["v"])]
        assert abs(r["hub"] - wh) < 1e-6
        assert abs(r["auth"] - wa) < 1e-6
