"""Random-walk corpus generation: walks are valid paths, deterministic,
and invariant to the partition count."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from linkgraph.algos.walks import assemble_walks, random_walks
from linkgraph.engine import SuperstepEngine


def _pairs(n=120, m=600, seed=3):
    rng = np.random.default_rng(seed)
    pairs = {
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    }
    return sorted(pairs)


def _edges_ds(pairs):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "src": np.array([p[0] for p in pairs], np.int64),
                "dst": np.array([p[1] for p in pairs], np.int64),
            }
        )
    )


def _walk_df(parts, pairs, walk_len=6, n_per_vertex=2, seed=11):
    eng = SuperstepEngine(num_parts=parts).load_edges(_edges_ds(pairs))
    df = (
        random_walks(eng, walk_len=walk_len, n_per_vertex=n_per_vertex, seed=seed)
        .to_pandas()
        .sort_values(["walk_v0", "walk_rep", "step"])
        .reset_index(drop=True)
    )
    eng.shutdown()
    return df


def test_walks_are_valid_paths(ray_session):
    pairs = _pairs()
    df = _walk_df(4, pairs)
    eset = set(pairs)
    out_verts = {a for a, _ in pairs}
    for (v0, rep), g in df.groupby(["walk_v0", "walk_rep"]):
        path = g.sort_values("step")["v"].tolist()
        assert g["step"].tolist() == list(range(len(path)))
        assert path[0] == v0
        for a, b in zip(path, path[1:]):
            assert (a, b) in eset
        # a walk ends only at a dangling vertex or at full length
        assert len(path) == 7 or path[-1] not in out_verts
    # every non-dangling vertex starts n_per_vertex walks
    assert df.groupby(["walk_v0", "walk_rep"]).ngroups == 2 * len(out_verts)


def test_walks_partition_count_invariant(ray_session):
    pairs = _pairs()
    a = _walk_df(2, pairs)
    b = _walk_df(5, pairs)
    pd.testing.assert_frame_equal(a, b)


def test_assemble_walks_paths(ray_session):
    pairs = _pairs(n=40, m=160)
    eng = SuperstepEngine(num_parts=3).load_edges(_edges_ds(pairs))
    visits = random_walks(eng, walk_len=4, n_per_vertex=1, seed=5)
    paths = assemble_walks(visits).to_pandas()
    vdf = visits.to_pandas()
    eng.shutdown()
    assert len(paths) == vdf.groupby(["walk_v0", "walk_rep"]).ngroups
    row = paths.sort_values(["walk_v0", "walk_rep"]).iloc[0]
    expect = (
        vdf[(vdf.walk_v0 == row.walk_v0) & (vdf.walk_rep == row.walk_rep)]
        .sort_values("step")["v"]
        .tolist()
    )
    assert list(row["path"]) == expect


# -- node2vec ---------------------------------------------------------------

from linkgraph.algos.walks import node2vec_walks
from linkgraph.hashing import splitmix64


def _sym_pairs(n=40, m=160, seed=9):
    rng = np.random.default_rng(seed)
    und = {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    }
    return sorted(und | {(b, a) for a, b in und})


def _n2v_df(parts, pairs, walk_len=5, n_per_vertex=2, p=0.5, q=2.0, seed=13):
    eng = SuperstepEngine(num_parts=parts).load_edges(_edges_ds(pairs))
    df = (
        node2vec_walks(
            eng, walk_len=walk_len, n_per_vertex=n_per_vertex, p=p, q=q, seed=seed
        )
        .to_pandas()
        .sort_values(["walk_v0", "walk_rep", "step"])
        .reset_index(drop=True)
    )
    eng.shutdown()
    return df


def _n2v_hash(v0, rep, t, tries, salt):
    x = splitmix64(np.uint64(v0)) ^ splitmix64(
        np.uint64(rep) * np.uint64(0x9E3779B97F4A7C15)
        + np.uint64(t) * np.uint64(0x100000001B3)
        + np.uint64(tries) * np.uint64(1000003)
        + np.uint64(salt)
    )
    return splitmix64(x)


def _n2v_reference(pairs, walk_len, n_per_vertex, p, q, seed):
    """Single-process exact replica of the distributed rejection
    protocol (same hashes, same dst-sorted neighbor order)."""
    import collections

    adj = collections.defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
    adj = {v: np.array(sorted(set(ns)), np.int64) for v, ns in adj.items()}
    a_ret, a_far = 1.0 / p, 1.0 / q
    amax = max(a_ret, 1.0, a_far)
    rows = []
    for v0 in sorted(adj):
        for rep in range(n_per_vertex):
            cur, prev = v0, None
            rows.append((v0, rep, 0, v0))
            for t in range(1, walk_len + 1):
                ns = adj.get(cur)
                if ns is None or len(ns) == 0:
                    break
                tries = 0
                while True:
                    h = _n2v_hash(np.uint64(v0) + np.uint64(seed), rep, t, tries, 11)
                    cand = int(ns[int(h % np.uint64(len(ns)))])
                    if prev is None:
                        alpha = amax
                    elif cand == prev:
                        alpha = a_ret
                    elif prev in adj.get(cand, ()):
                        alpha = 1.0
                    else:
                        alpha = a_far
                    u = float(
                        _n2v_hash(np.uint64(v0) + np.uint64(seed), rep, t, tries, 23)
                    ) / 2.0**64
                    if u * amax < alpha or tries >= 64:
                        break
                    tries += 1
                rows.append((v0, rep, t, cand))
                prev, cur = cur, cand
    return (
        pd.DataFrame(rows, columns=["walk_v0", "walk_rep", "step", "v"])
        .sort_values(["walk_v0", "walk_rep", "step"])
        .reset_index(drop=True)
        .astype("int64")
    )


def test_node2vec_matches_exact_replica_and_partition_invariant(ray_session):
    pairs = _sym_pairs()
    ref = _n2v_reference(pairs, walk_len=5, n_per_vertex=2, p=0.5, q=2.0, seed=13)
    for parts in (2, 5):
        df = _n2v_df(parts, pairs).astype("int64")
        pd.testing.assert_frame_equal(df, ref)


def test_node2vec_high_p_never_backtracks_on_triangle(ray_session):
    # triangle: from any vertex the non-return candidate is always a
    # common neighbor (alpha=1), the return candidate has alpha=1/p~0
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
    df = _n2v_df(3, pairs, walk_len=8, n_per_vertex=2, p=1e9, q=1.0, seed=3)
    for (_, _), g in df.groupby(["walk_v0", "walk_rep"]):
        path = g.sort_values("step")["v"].tolist()
        assert len(path) == 9
        for x, y in zip(path, path[2:]):
            assert x != y  # no immediate return anywhere


def test_node2vec_walks_are_valid_paths(ray_session):
    pairs = _sym_pairs(n=30, m=90, seed=4)
    df = _n2v_df(4, pairs, walk_len=6, n_per_vertex=1, p=2.0, q=0.5, seed=21)
    eset = set(pairs)
    for (v0, _), g in df.groupby(["walk_v0", "walk_rep"]):
        path = g.sort_values("step")["v"].tolist()
        assert path[0] == v0 and g["step"].tolist() == list(range(len(path)))
        for a, b in zip(path, path[1:]):
            assert (a, b) in eset
