"""K-clique percolation community detection — reference parity:
test/community_detection.cpp (K=4): every K-clique becomes a supernode
(262-313, 416-434), supernodes sharing >= K-1 member vertices get edges
(446-491), and min-label propagation over the supernode graph yields
the communities (493-512). Golden fixtures: community_test_cases/*.csv
(replicated in tests/test_community.py).

Ray-Data-first shape:

  1. K-clique enumeration = the triangle join pipeline (+ one extension
     round for K=4): bucketed map_groups joins, never all-pairs.
  2. Two distinct K-cliques overlap in >= K-1 vertices iff they share a
     (K-1)-subset, so overlap edges come from ONE groupby over each
     clique's K sorted (K-1)-subsets.
  3. Percolation components = connected components of the clique graph,
     run on the SuperstepEngine (clique ids are 64-bit mixes of the
     member tuple — collision probability ~ n_cliques^2 / 2^64,
     negligible and detectable).
  4. A community is labeled by the minimum member vertex id over its
     component; output is the distinct (v, community) pairs (a vertex in
     cliques of several communities appears once per community, as in
     classic CPM).

Scale notes: clique enumeration cost is the standard CPM bound (tracks
triangle/4-clique counts, hub wedges capped by the degree orientation);
every shuffle is a B-bucket groupby with vectorized bodies; the clique
graph is usually far smaller than the input graph.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..hashing import splitmix64
from .triangles import _canonical_bucketed, _degree_oriented, _rows


def _triangles_ds(canon: Dataset, B: int) -> Dataset:
    """All triangles (a, b, c) with a < b < c, via centered wedges +
    closure against canonical edges (same machinery as
    triangle_counts_per_vertex, returning the triangle rows)."""
    oriented = _degree_oriented(canon, B)

    def wedge_gen_centered(g: pd.DataFrame) -> pd.DataFrame:
        a = g["k1"].to_numpy()
        b = g["k2"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[starts[1:], len(a)]
        out = []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, 1)
            nb = b[s:e]
            out.append(np.stack([np.full(len(i), a[s]), nb[i], nb[j]], axis=1))
        if not out:
            return pd.DataFrame({"ctr": [], "b": [], "c": []}).astype(np.int64)
        w = np.concatenate(out)
        return pd.DataFrame({"ctr": w[:, 0], "b": w[:, 1], "c": w[:, 2]})

    wedges = oriented.groupby("part").map_groups(
        wedge_gen_centered, batch_format="pandas"
    )

    def tag_wedges(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy()
        c = t.column("c").to_numpy()
        return _rows((b + 31 * c) % B, 1, b, c, t.column("ctr").to_numpy())

    def tag_canon(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        return _rows((u + 31 * v) % B, 0, u, v, 0)

    def close_tri(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0][["k1", "k2"]]
        w = g[g["kind"] == 1][["k1", "k2", "w"]]
        if len(e) == 0 or len(w) == 0:
            return pd.DataFrame({"a": [], "b": [], "c": []}).astype(np.int64)
        m = w.merge(e, on=["k1", "k2"], how="inner")
        # triangle corners sorted ascending: center is the orientation
        # minimum by (degree, id), not by id — re-sort the tuple
        tri = np.sort(
            np.stack([m["w"].to_numpy(), m["k1"].to_numpy(), m["k2"].to_numpy()], axis=1),
            axis=1,
        )
        return pd.DataFrame({"a": tri[:, 0], "b": tri[:, 1], "c": tri[:, 2]})

    return (
        wedges.map_batches(tag_wedges, batch_format="pyarrow", batch_size=131072)
        .union(canon.map_batches(tag_canon, batch_format="pyarrow", batch_size=131072))
        .groupby("part")
        .map_groups(close_tri, batch_format="pandas")
    )


def _cliques4_ds(canon: Dataset, tris: Dataset, B: int) -> Dataset:
    """4-cliques (a<b<c<d): triangle (a,b,c) + d adjacent to all three
    with d > c. Three bucketed semi-joins against canonical edges, each
    a tagged-union groupby with a vectorized pandas merge body."""

    def tag_tri_on_c(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "part": pa.array(t.column("c").to_numpy() % B),
                "kind": pa.array(np.ones(n, np.int64)),
                "a": t.column("a"),
                "b": t.column("b"),
                "c": t.column("c"),
                "d": pa.array(np.zeros(n, np.int64)),
            }
        )

    def tag_edge_on_u(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "part": pa.array(t.column("u").to_numpy() % B),
                "kind": pa.array(np.zeros(n, np.int64)),
                "a": pa.array(np.zeros(n, np.int64)),
                "b": pa.array(np.zeros(n, np.int64)),
                "c": t.column("u"),
                "d": t.column("v"),
            }
        )

    def extend(g: pd.DataFrame) -> pd.DataFrame:
        tri = g[g["kind"] == 1][["a", "b", "c"]]
        ed = g[g["kind"] == 0][["c", "d"]]
        if len(tri) == 0 or len(ed) == 0:
            return pd.DataFrame({"a": [], "b": [], "c": [], "d": []}).astype(np.int64)
        return tri.merge(ed, on="c", how="inner")  # d > c by canonical order

    cand = (
        tris.map_batches(tag_tri_on_c, batch_format="pyarrow", batch_size=131072)
        .union(canon.map_batches(tag_edge_on_u, batch_format="pyarrow", batch_size=131072))
        .groupby("part")
        .map_groups(extend, batch_format="pandas")
    )

    def semi_join(pair_cols):
        x, y = pair_cols

        def tag_cand(t: pa.Table) -> pa.Table:
            key = (t.column(x).to_numpy() + 31 * t.column(y).to_numpy()) % B
            return t.append_column("part", pa.array(key)).append_column(
                "kind", pa.array(np.ones(len(t), np.int64))
            )

        def tag_edge(t: pa.Table) -> pa.Table:
            u = t.column("u").to_numpy()
            v = t.column("v").to_numpy()
            n = len(t)
            cols = {c: pa.array(np.zeros(n, np.int64)) for c in ("a", "b", "c", "d")}
            cols[x] = pa.array(u)
            cols[y] = pa.array(v)
            cols["part"] = pa.array((u + 31 * v) % B)
            cols["kind"] = pa.array(np.zeros(n, np.int64))
            return pa.table(cols)

        def check(g: pd.DataFrame) -> pd.DataFrame:
            cand_ = g[g["kind"] == 1][["a", "b", "c", "d"]]
            ed = g[g["kind"] == 0][[x, y]].drop_duplicates()
            if len(cand_) == 0 or len(ed) == 0:
                return pd.DataFrame({"a": [], "b": [], "c": [], "d": []}).astype(np.int64)
            return cand_.merge(ed, on=[x, y], how="inner")

        return tag_cand, tag_edge, check

    out = cand
    for pair in (("a", "d"), ("b", "d")):
        tag_cand, tag_edge, check = semi_join(pair)
        out = (
            out.map_batches(tag_cand, batch_format="pyarrow", batch_size=131072)
            .union(canon.map_batches(tag_edge, batch_format="pyarrow", batch_size=131072))
            .groupby("part")
            .map_groups(check, batch_format="pandas")
        )
    return out


def _clique_id(members: np.ndarray) -> np.ndarray:
    """64-bit id of a sorted member tuple (rows of a 2-D int64 array)."""
    h = np.zeros(len(members), np.uint64)
    for j in range(members.shape[1]):
        h = splitmix64(h ^ splitmix64(members[:, j].astype(np.int64).view(np.uint64)))
    return h


def kclique_communities(
    edges: Dataset, k: int = 4, num_partitions: int | None = None, num_parts_cc: int = 8
) -> Dataset:
    """(v, community) rows: community = min member vertex id of each
    K-clique percolation community; vertices in no K-clique are absent
    (the reference reports them as singleton nodes)."""
    assert k in (3, 4), "reference K=4; K=3 (triangle percolation) also supported"
    import ray.data

    B = num_partitions or 32
    canon = _canonical_bucketed(edges, B).materialize()
    tris = _triangles_ds(canon, B)
    cliques = tris if k == 3 else _cliques4_ds(canon, tris, B)
    cliques = cliques.materialize()
    if cliques.count() == 0:
        return ray.data.from_arrow(
            pa.table({"v": pa.array([], pa.int64()), "community": pa.array([], pa.int64())})
        )
    cols = ["a", "b", "c", "d"][:k]

    # rows (cid, member v) + overlap edges via shared (k-1)-subsets
    def member_rows(t: pa.Table) -> pa.Table:
        M = np.stack([t.column(c).to_numpy() for c in cols], axis=1)
        cid = _clique_id(M).view(np.int64)
        return pa.table(
            {
                "cid": pa.array(np.repeat(cid, k)),
                "v": pa.array(M.reshape(-1)),
            }
        )

    members = cliques.map_batches(member_rows, batch_format="pyarrow", batch_size=65536).materialize()

    def subset_rows(t: pa.Table) -> pa.Table:
        M = np.stack([t.column(c).to_numpy() for c in cols], axis=1)
        cid = _clique_id(M).view(np.int64)
        subs, ids = [], []
        for drop in range(k):
            sub = np.delete(M, drop, axis=1)
            subs.append(sub)
            ids.append(cid)
        S = np.concatenate(subs)
        key = _clique_id(S).view(np.int64)
        return pa.table(
            {
                "part": pa.array(key % np.int64(B)),
                "skey": pa.array(key),
                "cid": pa.array(np.concatenate(ids)),
            }
        )

    def overlap_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sk = g["skey"].to_numpy()
        cid = g["cid"].to_numpy()
        order = np.lexsort((cid, sk))
        sk, cid = sk[order], cid[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        ends = np.r_[starts[1:], len(sk)]
        outs = []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            seg = np.unique(cid[s:e])
            if len(seg) < 2:
                continue
            i, j = np.triu_indices(len(seg), 1)
            outs.append(np.stack([seg[i], seg[j]], axis=1))
        if not outs:
            return pd.DataFrame({"src": [], "dst": []}).astype(np.int64)
        p = np.unique(np.concatenate(outs), axis=0)
        return pd.DataFrame({"src": p[:, 0], "dst": p[:, 1]})

    overlaps = (
        cliques.map_batches(subset_rows, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(overlap_pairs, batch_format="pandas")
    )
    # register every clique (incl. overlap-free singletons) via
    # self-loops (pandas blocks to match the map_groups output type)
    selfloops = members.map_batches(
        lambda df: pd.DataFrame({"src": df["cid"], "dst": df["cid"]}),
        batch_format="pandas",
    )
    clique_graph = overlaps.union(selfloops)

    from .cc import connected_components

    cc_out, _, eng = connected_components(clique_graph, num_parts=num_parts_cc)
    # materialize before shutdown: the label blocks are owned by the
    # engine's partition actors until copied out
    comp = cc_out.map_batches(
        lambda t: t.rename_columns(["cid", "comp"]), batch_format="pyarrow"
    ).materialize()
    eng.shutdown()

    # attach each member row's component: bucketed equi-join on cid
    # (tagged union -> one groupby -> vectorized searchsorted lookup;
    # Ray's Dataset.join operator chokes on empty aggregate blocks here)
    def tag_members(t: pa.Table) -> pa.Table:
        cid = t.column("cid").to_numpy()
        return pa.table(
            {
                "part": pa.array(splitmix64(cid.view(np.uint64)).view(np.int64) % B),
                "kind": pa.array(np.ones(len(t), np.int8)),
                "cid": pa.array(cid),
                "v": t.column("v"),
                "comp": pa.array(np.zeros(len(t), np.int64)),
            }
        )

    def tag_comp(t: pa.Table) -> pa.Table:
        cid = t.column("cid").to_numpy()
        return pa.table(
            {
                "part": pa.array(splitmix64(cid.view(np.uint64)).view(np.int64) % B),
                "kind": pa.array(np.zeros(len(t), np.int8)),
                "cid": pa.array(cid),
                "v": pa.array(np.zeros(len(t), np.int64)),
                "comp": t.column("comp"),
            }
        )

    def join_cid(g: pd.DataFrame) -> pd.DataFrame:
        is_c = g["kind"].to_numpy() == 0
        ck = g["cid"].to_numpy()[is_c]
        cv = g["comp"].to_numpy()[is_c]
        order = np.argsort(ck, kind="stable")
        ck, cv = ck[order], cv[order]
        m = g[~is_c]
        if len(m) == 0 or len(ck) == 0:
            return pd.DataFrame(
                {"v": pd.Series([], dtype="int64"), "comp": pd.Series([], dtype="int64")}
            )
        mk = m["cid"].to_numpy()
        pos = np.clip(np.searchsorted(ck, mk), 0, len(ck) - 1)
        ok = ck[pos] == mk
        return pd.DataFrame({"v": m["v"].to_numpy()[ok], "comp": cv[pos[ok]]})

    withcomp = (
        members.map_batches(tag_members, batch_format="pyarrow", batch_size=65536)
        .union(comp.map_batches(tag_comp, batch_format="pyarrow", batch_size=65536))
        .groupby("part")
        .map_groups(join_cid, batch_format="pandas")
    )

    def bucket(t: pa.Table) -> pa.Table:
        cmp_ = t.column("comp").to_numpy()
        return pa.table(
            {
                "part": pa.array(
                    splitmix64(cmp_.view(np.uint64)).view(np.int64) % np.int64(B)
                ),
                "comp": pa.array(cmp_),
                "v": t.column("v"),
            }
        )

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        cmp_ = g["comp"].to_numpy()
        v = g["v"].to_numpy()
        order = np.lexsort((v, cmp_))
        cmp_, v = cmp_[order], v[order]
        starts = np.flatnonzero(np.r_[True, cmp_[1:] != cmp_[:-1]])
        community = np.repeat(v[starts], np.diff(np.r_[starts, len(v)]))
        return pd.DataFrame({"v": v, "community": community}).drop_duplicates()

    assigned = (
        withcomp.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(assign, batch_format="pandas")
    )
    # global distinct: a vertex can be the min member of several
    # disjoint components and carry the same community label twice
    return (
        assigned.groupby(["v", "community"]).count().select_columns(["v", "community"])
    )
