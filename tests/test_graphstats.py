"""Webgraph stats ops vs single-threaded numpy oracles on fixture +
random graphs (the SQL-oracle parity at driver scale lives in
test_oracle_parity.py; this covers edge cases and the max_degree cap)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.ops import adamic_adar, degree_assortativity
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


def _undirected(edges):
    pairs = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nbrs = {}
    for u, v in pairs:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    return pairs, nbrs


def aa_oracle(edges, min_cn=2, max_degree=None):
    pairs, nbrs = _undirected(edges)
    out = {}
    for z, nz in nbrs.items():
        if len(nz) < 2 or (max_degree is not None and len(nz) > max_degree):
            continue
        ns = sorted(nz)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                k = (ns[i], ns[j])
                cn, aa = out.get(k, (0, 0.0))
                out[k] = (cn + 1, aa + 1.0 / np.log(len(nz)))
    return {
        k: (cn, round(aa, 8))
        for k, (cn, aa) in out.items()
        if cn >= min_cn and k not in pairs
    }


def assort_oracle(edges):
    pairs, nbrs = _undirected(edges)
    deg = {v: len(n) for v, n in nbrs.items()}
    xs, ys = [], []
    for u, v in pairs:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    x = np.array(xs, np.int64)
    y = np.array(ys, np.int64)
    n = len(x)
    r = (n * (x * y).sum() - x.sum() * y.sum()) / (
        np.sqrt(n * (x * x).sum() - x.sum() ** 2)
        * np.sqrt(n * (y * y).sum() - y.sum() ** 2)
    )
    return n, round(float(r), 8)


def test_adamic_adar_random():
    edges = random_edges(80, 400, seed=21)
    df = adamic_adar(edges_ds(edges), min_cn=2, num_partitions=2).to_pandas()
    got = {
        (int(r["a"]), int(r["b"])): (int(r["common_neighbors"]), r["adamic_adar"])
        for _, r in df.iterrows()
    }
    want = aa_oracle(edges, min_cn=2)
    assert set(got) == set(want)
    for k, (cn, aa) in want.items():
        assert got[k][0] == cn
        assert abs(got[k][1] - aa) < 1e-7


def test_adamic_adar_degree_cap():
    edges = FIXTURE_GRAPHS["star_hub"] + [(1, 2), (3, 4)]
    # cap below the hub's degree: hub-centered wedges are skipped
    df = adamic_adar(edges_ds(edges), min_cn=1, max_degree=10, num_partitions=2).to_pandas()
    got = {(int(r["a"]), int(r["b"])) for _, r in df.iterrows()}
    want = set(aa_oracle(edges, min_cn=1, max_degree=10))
    assert got == want


def jaccard_oracle(edges):
    pairs, nbrs = _undirected(edges)
    out = {}
    for u, v in pairs:
        cn = len(nbrs[u] & nbrs[v])
        if cn:
            out[(u, v)] = (cn, round(cn / (len(nbrs[u]) + len(nbrs[v]) - cn), 8))
    return out


def test_edge_jaccard_random():
    from linkgraph.ops import edge_jaccard

    edges = random_edges(80, 400, seed=23)
    df = edge_jaccard(edges_ds(edges), num_partitions=2).to_pandas()
    got = {
        (int(r["a"]), int(r["b"])): (int(r["common_neighbors"]), r["jaccard"])
        for _, r in df.iterrows()
    }
    want = jaccard_oracle(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-8


def test_assortativity_random():
    edges = random_edges(120, 600, seed=22)
    df = degree_assortativity(edges_ds(edges), num_partitions=2)
    n, r = assort_oracle(edges)
    assert int(df["n_points"][0]) == n
    assert abs(df["assortativity"][0] - r) < 1e-9


def test_quotient_graph_random():
    from linkgraph.ops import quotient_graph

    edges = random_edges(100, 500, seed=31)
    verts = sorted({v for e in edges for v in e})
    lab = {v: v % 7 for v in verts}
    labels = ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(verts, pa.int64()),
                "label": pa.array([lab[v] for v in verts], pa.int64()),
            }
        )
    )
    df = quotient_graph(edges_ds(edges), labels, num_partitions=2).to_pandas()
    want = {}
    for s, d in edges:
        k = (lab[s], lab[d])
        want[k] = want.get(k, 0) + 1
    got = {
        (int(r["src_label"]), int(r["dst_label"])): int(r["n_edges"])
        for _, r in df.iterrows()
    }
    assert got == want


def test_modularity_random():
    from linkgraph.ops import modularity

    edges = random_edges(90, 450, seed=37)
    pairs, nbrs = _undirected(edges)
    verts = sorted(nbrs)
    lab = {v: v % 5 for v in verts}
    labels = ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array(verts, pa.int64()),
                "label": pa.array([lab[v] for v in verts], pa.int64()),
            }
        )
    )
    df = modularity(edges_ds(edges), labels, num_partitions=2)
    m = len(pairs)
    intra = sum(1 for u, v in pairs if lab[u] == lab[v])
    deg_c = {}
    for u, v in pairs:
        deg_c[lab[u]] = deg_c.get(lab[u], 0) + 1
        deg_c[lab[v]] = deg_c.get(lab[v], 0) + 1
    q = intra / m - sum(d * d for d in deg_c.values()) / (4.0 * m * m)
    assert int(df["n_edges"][0]) == m
    assert int(df["n_communities"][0]) == len(deg_c)
    assert abs(df["modularity"][0] - q) < 1e-8


def test_powerlaw_alpha_random():
    from linkgraph.ops import powerlaw_alpha

    edges = random_edges(100, 600, seed=61)
    df = powerlaw_alpha(edges_ds(edges), dmin=2)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    tail = np.array([d for d in deg.values() if d >= 2], np.float64)
    alpha = 1.0 + len(tail) / (np.log(tail).sum() - len(tail) * np.log(1.5))
    assert int(df["n_tail"][0]) == len(tail)
    assert abs(df["alpha"][0] - alpha) < 1e-8


def butterfly_oracle(edges):
    dedup = sorted(set(edges))
    by_src = {}
    for s, d in dedup:
        by_src.setdefault(s, []).append(d)
    w = {}
    wedges = 0
    for s, ds in by_src.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                w[(ds[i], ds[j])] = w.get((ds[i], ds[j]), 0) + 1
                wedges += 1
    return wedges, sum(c * (c - 1) // 2 for c in w.values())


@pytest.mark.parametrize("seed,n,m", [(7, 40, 300), (11, 25, 200)])
def test_butterflies_random(seed, n, m):
    from linkgraph.ops import butterflies

    edges = random_edges(n, m, seed=seed)
    # duplicate some rows: the op must count distinct (src, dst) only
    edges_dup = edges + edges[: len(edges) // 3]
    nw, nb = butterfly_oracle(edges)
    df = butterflies(edges_ds(edges_dup))
    assert int(df["n_wedges"][0]) == nw
    assert int(df["n_butterflies"][0]) == nb


def test_butterflies_known():
    from linkgraph.ops import butterflies

    # K_{2,2}: exactly one butterfly, two wedges
    edges = [(0, 10), (0, 11), (1, 10), (1, 11)]
    df = butterflies(edges_ds(edges))
    assert int(df["n_wedges"][0]) == 2
    assert int(df["n_butterflies"][0]) == 1
    # degree cap drops hub source 0 (outdeg 3 > 2)
    edges = [(0, 10), (0, 11), (0, 12), (1, 10), (1, 11)]
    df = butterflies(edges_ds(edges), max_out_degree=2)
    assert int(df["n_wedges"][0]) == 1
    assert int(df["n_butterflies"][0]) == 0


def gamma_oracle(edges):
    dedup = sorted(set(edges))
    by_src = {}
    for s, d in dedup:
        by_src.setdefault(s, []).append(d)
    n, bits = 0, 0
    for s, ds in by_src.items():
        prev = None
        for d in sorted(ds):
            g = d + 1 if prev is None else d - prev
            bits += 2 * (g.bit_length() - 1) + 1
            prev = d
            n += 1
    return n, bits


@pytest.mark.parametrize("seed,n,m", [(13, 50, 400), (17, 30, 250)])
def test_adjacency_gamma_bits_random(seed, n, m):
    from linkgraph.ops import adjacency_gamma_bits

    edges = random_edges(n, m, seed=seed)
    edges_dup = edges + edges[: len(edges) // 4]
    ne, bits = gamma_oracle(edges)
    df = adjacency_gamma_bits(edges_ds(edges_dup))
    assert int(df["n_edges"][0]) == ne
    assert int(df["gamma_bits"][0]) == bits
    assert int(df["raw_bits"][0]) == 64 * ne
    assert abs(df["ratio"][0] - round(bits / (64.0 * ne), 8)) < 1e-12


def test_adjacency_gamma_bits_vertex_zero():
    from linkgraph.ops import adjacency_gamma_bits

    # dst 0 first in a run: gap = 0 + 1 = 1 -> gamma cost 1 bit
    df = adjacency_gamma_bits(edges_ds([(5, 0), (5, 1), (5, 9)]))
    # gaps: 1 (cost 1), 1 (cost 1), 8 (cost 7)
    assert int(df["gamma_bits"][0]) == 9


@pytest.mark.parametrize("seed,n,m,k", [(19, 30, 260, 10), (23, 45, 350, 7)])
def test_cocitation_topk_random(seed, n, m, k):
    from linkgraph.ops import cocitation_topk

    edges = random_edges(n, m, seed=seed)
    by_src = {}
    for s, d in sorted(set(edges)):
        by_src.setdefault(s, []).append(d)
    w = {}
    for s, ds in by_src.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                w[(ds[i], ds[j])] = w.get((ds[i], ds[j]), 0) + 1
    want = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    df = cocitation_topk(edges_ds(edges), k=k)
    got = list(zip(zip(df["d1"], df["d2"]), df["n_common"]))
    assert [(tuple(map(int, p)), int(c)) for p, c in got] == [
        (p, c) for p, c in want
    ]


def test_cocitation_topk_empty():
    from linkgraph.ops import cocitation_topk

    df = cocitation_topk(edges_ds([(1, 2)]), k=5)  # no src with outdeg >= 2
    assert len(df) == 0 and list(df.columns) == ["d1", "d2", "n_common"]
