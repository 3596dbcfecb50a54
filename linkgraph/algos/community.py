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
import pyarrow as pa

from ray.data import Dataset

from ..segops import pair_unique

from ..hashing import splitmix64
from .triangles import (
    _all_pairs_per_run,
    _canonical_bucketed,
    _degree_oriented,
    _i64,
    _member,
    _pack2,
    _rows,
    _sorted_runs,
)


def _triangles_ds(canon: Dataset, B: int) -> Dataset:
    """All triangles (a, b, c) with a < b < c, via centered wedges +
    closure against canonical edges (same machinery as
    triangle_counts_per_vertex, returning the triangle rows)."""
    oriented = _degree_oriented(canon, B)

    def wedge_gen_centered(t: pa.Table) -> pa.Table:
        a, b = _sorted_runs(t)
        ii, jj = _all_pairs_per_run(a, b)
        e = pa.array([], pa.int64())
        if len(ii) == 0:
            return pa.table({"ctr": e, "b": e, "c": e})
        return pa.table({"ctr": _i64(a[ii]), "b": _i64(b[ii]), "c": _i64(b[jj])})

    wedges = oriented.groupby("part").map_groups(
        wedge_gen_centered, batch_format="pyarrow"
    )

    def tag_wedges(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy()
        c = t.column("c").to_numpy()
        return _rows((b + 31 * c) % B, 1, b, c, t.column("ctr").to_numpy())

    def tag_canon(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        return _rows((u + 31 * v) % B, 0, u, v, 0)

    def close_tri(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy()
        k1 = t.column("k1").to_numpy()
        k2 = t.column("k2").to_numpy()
        w = t.column("w").to_numpy()
        em = kind == 0
        wm = ~em
        ke = np.sort(_pack2(k1[em], k2[em]))
        hit = _member(ke, _pack2(k1[wm], k2[wm]))
        if not hit.any():
            e_ = pa.array([], pa.int64())
            return pa.table({"a": e_, "b": e_, "c": e_})
        # triangle corners sorted ascending: center is the orientation
        # minimum by (degree, id), not by id — re-sort the tuple
        tri = np.sort(
            np.stack([w[wm][hit], k1[wm][hit], k2[wm][hit]], axis=1), axis=1
        )
        return pa.table({"a": _i64(tri[:, 0]), "b": _i64(tri[:, 1]), "c": _i64(tri[:, 2])})

    return (
        wedges.map_batches(tag_wedges, batch_format="pyarrow", batch_size=131072)
        .union(canon.map_batches(tag_canon, batch_format="pyarrow", batch_size=131072))
        .groupby("part")
        .map_groups(close_tri, batch_format="pyarrow")
    )


def _cliques4_ds(canon: Dataset, tris: Dataset, B: int) -> Dataset:
    """4-cliques (a<b<c<d): triangle (a,b,c) + d adjacent to all three
    with d > c. Three bucketed semi-joins against canonical edges, each
    a tagged-union groupby with a vectorized sorted-key join body."""

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

    def extend(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy()
        tm = kind == 1
        em = ~tm
        e_ = pa.array([], pa.int64())
        if not tm.any() or not em.any():
            return pa.table({"a": e_, "b": e_, "c": e_, "d": e_})
        ta = t.column("a").to_numpy()[tm]
        tb = t.column("b").to_numpy()[tm]
        tc = t.column("c").to_numpy()[tm]
        ec = t.column("c").to_numpy()[em]
        ed = t.column("d").to_numpy()[em]
        order = np.argsort(ec, kind="stable")
        ec, ed = ec[order], ed[order]
        # one-to-many join on c (d > c by canonical order): expand each
        # triangle over its c-run of edges
        lo = np.searchsorted(ec, tc, side="left")
        hi = np.searchsorted(ec, tc, side="right")
        cnt = hi - lo
        tot = int(cnt.sum())
        if tot == 0:
            return pa.table({"a": e_, "b": e_, "c": e_, "d": e_})
        jj = np.repeat(np.arange(len(tc)), cnt)
        off = np.cumsum(cnt) - cnt
        kk = np.repeat(lo, cnt) + (np.arange(tot) - np.repeat(off, cnt))
        return pa.table(
            {"a": _i64(ta[jj]), "b": _i64(tb[jj]), "c": _i64(tc[jj]), "d": _i64(ed[kk])}
        )

    cand = (
        tris.map_batches(tag_tri_on_c, batch_format="pyarrow", batch_size=131072)
        .union(canon.map_batches(tag_edge_on_u, batch_format="pyarrow", batch_size=131072))
        .groupby("part")
        .map_groups(extend, batch_format="pyarrow")
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

        def check(t: pa.Table) -> pa.Table:
            kind = t.column("kind").to_numpy()
            cm = kind == 1
            em = ~cm
            e_ = pa.array([], pa.int64())
            if not cm.any() or not em.any():
                return pa.table({"a": e_, "b": e_, "c": e_, "d": e_})
            ke = np.sort(
                _pack2(t.column(x).to_numpy()[em], t.column(y).to_numpy()[em])
            )
            hit = _member(
                ke, _pack2(t.column(x).to_numpy()[cm], t.column(y).to_numpy()[cm])
            )
            return pa.table(
                {
                    c: _i64(t.column(c).to_numpy()[cm][hit])
                    for c in ("a", "b", "c", "d")
                }
            )

        return tag_cand, tag_edge, check

    out = cand
    for pair in (("a", "d"), ("b", "d")):
        tag_cand, tag_edge, check = semi_join(pair)
        out = (
            out.map_batches(tag_cand, batch_format="pyarrow", batch_size=131072)
            .union(canon.map_batches(tag_edge, batch_format="pyarrow", batch_size=131072))
            .groupby("part")
            .map_groups(check, batch_format="pyarrow")
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

    def overlap_pairs(t: pa.Table) -> pa.Table:
        sk = t.column("skey").to_numpy()
        cid = t.column("cid").to_numpy()
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
            e_ = pa.array([], pa.int64())
            return pa.table({"src": e_, "dst": e_})
        cat = np.concatenate(outs)
        pu, pv = pair_unique(cat[:, 0], cat[:, 1])
        return pa.table({"src": _i64(pu), "dst": _i64(pv)})

    overlaps = (
        cliques.map_batches(subset_rows, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(overlap_pairs, batch_format="pyarrow")
    )
    # register every clique (incl. overlap-free singletons) via self-loops
    selfloops = members.map_batches(
        lambda t: pa.table({"src": t.column("cid"), "dst": t.column("cid")}),
        batch_format="pyarrow",
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

    def join_cid(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy()
        cidv = t.column("cid").to_numpy()
        is_c = kind == 0
        ck = cidv[is_c]
        cv = t.column("comp").to_numpy()[is_c]
        order = np.argsort(ck, kind="stable")
        ck, cv = ck[order], cv[order]
        mm = ~is_c
        e_ = pa.array([], pa.int64())
        if not mm.any() or len(ck) == 0:
            return pa.table({"v": e_, "comp": e_})
        mk = cidv[mm]
        pos = np.clip(np.searchsorted(ck, mk), 0, len(ck) - 1)
        ok = ck[pos] == mk
        return pa.table(
            {
                "v": _i64(t.column("v").to_numpy()[mm][ok]),
                "comp": _i64(cv[pos[ok]]),
            }
        )

    withcomp = (
        members.map_batches(tag_members, batch_format="pyarrow", batch_size=65536)
        .union(comp.map_batches(tag_comp, batch_format="pyarrow", batch_size=65536))
        .groupby("part")
        .map_groups(join_cid, batch_format="pyarrow")
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

    def assign(t: pa.Table) -> pa.Table:
        cmp_ = t.column("comp").to_numpy()
        v = t.column("v").to_numpy()
        order = np.lexsort((v, cmp_))
        cmp_, v = cmp_[order], v[order]
        starts = np.flatnonzero(np.r_[True, cmp_[1:] != cmp_[:-1]])
        community = np.repeat(v[starts], np.diff(np.r_[starts, len(v)]))
        pv, pc = pair_unique(v, community)
        return pa.table({"v": _i64(pv), "community": _i64(pc)})

    assigned = (
        withcomp.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(assign, batch_format="pyarrow")
    )
    # global distinct: a vertex can be the min member of several
    # disjoint components and carry the same community label twice
    # (sort+mask distinct — see edges.distinct_pairs)
    from ..edges import distinct_pairs

    return distinct_pairs(assigned, "v", "community")
