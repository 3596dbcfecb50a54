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


@pytest.mark.parametrize("seed,n,m,source", [(3, 60, 400, 0), (9, 40, 220, 5)])
def test_temporal_reach_vs_bellman_ford(seed, n, m, source):
    from linkgraph.algos import temporal_reach
    from linkgraph.algos.temporal import id_ts

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(4)
    out, _, eng = temporal_reach(edges, source=source, num_parts=4)
    df = out.to_pandas()
    eng.shutdown()

    ts = id_ts(src, dst)
    INF = 1 << 60
    arr = {v: INF for v in set(src.tolist()) | set(dst.tolist())}
    arr[source] = 0
    for _ in range(len(arr)):
        changed = False
        for s, d, t in zip(src, dst, ts):
            if t >= arr[s] and t < arr[d]:
                arr[d] = int(t)
                changed = True
        if not changed:
            break
    want = {v: (a if a < INF else -1) for v, a in arr.items()}
    got = dict(zip(df["v"].astype(int), df["arrival"].astype(int)))
    assert got == want
    assert sum(1 for a in want.values() if a > 0) > 0  # non-degenerate


def test_temporal_reach_gate_blocks_stale_paths():
    from linkgraph.algos import temporal_reach

    # stamps: (13*src + 7*dst) % 21600. Chain 0 -> a -> b is viable only
    # if ts(a, b) >= ts(0, a). Pick ids so the second hop is EARLIER:
    # ts(0, 100) = 700; ts(100, 3) = 1321 >= 700 reaches 3 at 1321;
    # ts(3, 1) = 46 < 1321 -> vertex 1 unreachable through 3.
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 100, 3], pa.int64()),
                "dst": pa.array([100, 3, 1], pa.int64()),
            }
        )
    )
    out, _, eng = temporal_reach(edges, source=0, num_parts=2)
    df = out.to_pandas().set_index("v")["arrival"]
    eng.shutdown()
    assert int(df[100]) == 700
    assert int(df[3]) == 1321
    assert int(df[1]) == -1  # time-respecting constraint blocks it


@pytest.mark.parametrize("seed,n,m,source", [(5, 60, 400, 0), (11, 40, 220, 5)])
def test_widest_path_vs_bellman_ford(seed, n, m, source):
    from linkgraph.algos import widest_path
    from linkgraph.algos.sssp import id_weight
    from linkgraph.algos.widest import BIG

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(4)
    out, _, eng = widest_path(edges, source=source, num_parts=4)
    df = out.to_pandas()
    eng.shutdown()

    w = id_weight(src, dst)
    b = {v: -1 for v in set(src.tolist()) | set(dst.tolist())}
    b[source] = int(BIG)
    for _ in range(len(b)):
        changed = False
        for s, d, ww in zip(src, dst, w):
            cand = min(b[s], int(ww)) if b[s] >= 0 else -1
            if cand > b[d]:
                b[d] = cand
                changed = True
        if not changed:
            break
    got = dict(zip(df["v"].astype(int), df["bneck"].astype(int)))
    assert got == b
    reached = [x for v, x in b.items() if v != source and x > 0]
    assert reached and min(reached) < max(reached)  # non-degenerate


def test_widest_path_prefers_wide_detour():
    from linkgraph.algos import widest_path

    # weights 1 + (7*src + 13*dst) % 10: direct edge 0->1 has weight
    # 1 + 13 % 10 = 4; detour 0->7->1 has weights w(0,7)=1+91%10=2 ... pick
    # ids so the detour's bottleneck beats the direct edge: w(0,3)=
    # 1+39%10=10, w(3,1)=1+(21+13)%10=5 -> bottleneck 5 > direct 4.
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 0, 3], pa.int64()),
                "dst": pa.array([1, 3, 1], pa.int64()),
            }
        )
    )
    out, _, eng = widest_path(edges, source=0, num_parts=2)
    df = out.to_pandas().set_index("v")["bneck"]
    eng.shutdown()
    assert int(df[3]) == 10
    assert int(df[1]) == 5  # max(min-path) beats the direct weight-4 edge
