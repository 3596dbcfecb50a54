"""Bounded motif census — GBAD-lite frequent-subgraph mining.

Counts every connected <=4-vertex motif class (non-induced subgraph
occurrences, the standard graphlet-census convention) on the undirected
simple graph and reports the exact top-5 pattern shares — the bounded
analogue of the reference's GBAD frequent-subgraph miner
(test/intrusion_detection.cpp:33-46): instead of unbounded beam-search
pattern growth, the census enumerates the complete size<=4 pattern
lattice exactly.

Everything is the repo's bucketed-join pattern (hash buckets -> ONE
groupby shuffle per round -> vectorized numpy inside each bucket):

  wedge     : sum C(d, 2)            — degree moments (no shuffle beyond
  star3     : sum C(d, 3)              the degree build)
  path4     : sum over edges (du-1)(dv-1) - 3*triangle
  triangle  : oriented wedge closure (algos.triangles pipeline)
  tadpole   : sum_v t_v * (d_v - 2)  — triangle corners join degrees
  cycle4    : sum over vertex pairs C(cn, 2) / 2 — wedge-pair common-
              neighbor counts (each 4-cycle counted at its 2 diagonals)
  diamond   : sum over edges C(t_e, 2) — triangles-per-edge
  clique4   : per-edge pairs of triangle-completing vertices that are
              themselves adjacent, / 6 (each K4 hits at all 6 edges)

The triangle stages use hub-degree orientation exactly as in
triangle_count. cycle4 cannot orient (a 4-cycle's diagonal pair shares
no edge), so its wedge pairs come from the UNORIENTED adjacency and are
emitted in bounded slabs (<=4M pairs, combined per slab before the next
materializes) so a degree-d hub costs O(slab) peak memory instead of
O(d^2). The heaviest residual term is C(t_e, 2) candidate pairs on
triangle-dense edges (the diamond/K4 join), which is the census
frontier any exact counter pays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..segops import pair_unique_counts, pair_unique_inverse
from ..algos.triangles import (
    _all_pairs_per_run,
    _all_pairs_per_run_slabbed,
    _canonical_bucketed,
    _degree_oriented,
    _edges_with_degrees,
    _i64,
    _member,
    _pack2,
    _rows,
    _sorted_runs,
)

MOTIFS = (
    "wedge",
    "triangle",
    "star3",
    "path4",
    "cycle4",
    "tadpole",
    "diamond",
    "clique4",
)


def _sum_col(ds: Dataset, col: str) -> float:
    out = ds.sum(col)
    return float(out or 0)


def _triangle_triples(canon: Dataset, B: int) -> Dataset:
    """All triangles, once each, as (a, b, c) triples (center + wedge
    endpoints) — the oriented wedge-closure stage of
    :func:`algos.triangles.triangle_count` kept before compression."""
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

    def close_triples(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy()
        k1 = t.column("k1").to_numpy()
        k2 = t.column("k2").to_numpy()
        w = t.column("w").to_numpy()
        em = kind == 0
        ke = np.sort(_pack2(k1[em], k2[em]))
        wm = ~em
        hit = _member(ke, _pack2(k1[wm], k2[wm]))
        return pa.table(
            {
                "a": _i64(w[wm][hit]),
                "b": _i64(k1[wm][hit]),
                "c": _i64(k2[wm][hit]),
            }
        )

    return (
        wedges.map_batches(tag_wedges, batch_format="pyarrow", batch_size=131072)
        .union(canon.map_batches(tag_canon, batch_format="pyarrow", batch_size=131072))
        .groupby("part")
        .map_groups(close_triples, batch_format="pyarrow")
    )


def motif_census(
    edges: Dataset, num_partitions: int | None = None, top: int = 5
):
    """-> pandas DataFrame (motif, count, share), the top ``top`` motif
    classes by (count desc, motif asc); share = count / total census."""
    import pandas as pd

    B = num_partitions or 32
    canon = _canonical_bucketed(edges, B).materialize()
    if canon.count() == 0:
        return pd.DataFrame(
            {
                "motif": pd.Series([], dtype=object),
                "count": pd.Series([], dtype=np.int64),
                "share": pd.Series([], dtype=np.float64),
            }
        )

    # --- degree moments: wedges, 3-stars -------------------------------
    def deg_partial(t: pa.Table) -> pa.Table:
        x = np.concatenate([t.column("u").to_numpy(), t.column("v").to_numpy()])
        ids, cnt = np.unique(x, return_counts=True)
        return pa.table({"v": _i64(ids), "_c": _i64(cnt)})

    deg = (
        canon.map_batches(deg_partial, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("v")
        .aggregate(Sum("_c", alias_name="d"))
        .materialize()
    )

    def deg_moments(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy().astype(np.int64)
        return pa.table(
            {
                "w2": _i64(d * (d - 1) // 2),
                "w3": _i64(d * (d - 1) * (d - 2) // 6),
            }
        )

    mom = deg.map_batches(deg_moments, batch_format="pyarrow").materialize()
    n_wedge = int(_sum_col(mom, "w2"))
    n_star3 = int(_sum_col(mom, "w3"))

    # --- triangles + per-corner counts ---------------------------------
    triples = _triangle_triples(canon, B).materialize()
    n_tri = triples.count()

    def corners(t: pa.Table) -> pa.Table:
        x = np.concatenate(
            [t.column("a").to_numpy(), t.column("b").to_numpy(), t.column("c").to_numpy()]
        )
        ids, cnt = np.unique(x, return_counts=True)
        return pa.table({"v": _i64(ids), "_t": _i64(cnt)})

    t_v = (
        triples.map_batches(corners, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("v")
        .aggregate(Sum("_t", alias_name="t"))
        if n_tri
        else None
    )

    # --- 4-paths: sum over edges (du-1)(dv-1) - 3T ----------------------
    def p4_partial(t: pa.Table) -> pa.Table:
        du = t.column("du").to_numpy().astype(np.int64)
        dv = t.column("dv").to_numpy().astype(np.int64)
        return pa.table({"p": _i64((du - 1) * (dv - 1))})

    n_path4 = (
        int(
            _sum_col(
                _edges_with_degrees(canon, B).map_batches(
                    p4_partial, batch_format="pyarrow"
                ),
                "p",
            )
        )
        - 3 * n_tri
    )

    # --- tadpoles: sum_v t_v (d_v - 2) ----------------------------------
    n_tadpole = 0
    if n_tri:
        td = t_v.join(
            deg, join_type="inner", num_partitions=max(B // 4, 2),
            on=("v",), right_on=("v",), right_suffix="_d",
        )

        def tp(t: pa.Table) -> pa.Table:
            tv = t.column("t").to_numpy().astype(np.int64)
            d = t.column("d").to_numpy().astype(np.int64)
            return pa.table({"x": _i64(tv * (d - 2))})

        n_tadpole = int(_sum_col(td.map_batches(tp, batch_format="pyarrow"), "x"))

    # --- 4-cycles: wedge-pair common-neighbor counts ---------------------
    def adj(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        ctr = np.concatenate([u, v])
        nbr = np.concatenate([v, u])
        return pa.table(
            {"part": _i64(ctr % B), "ctr": _i64(ctr), "nbr": _i64(nbr)}
        )

    def wedge_pair_cn(t: pa.Table) -> pa.Table:
        # Slab-bounded pair emission (round-3 ADVICE medium): the
        # adjacency here is UNORIENTED (both directions), so a degree-d
        # hub center owns C(d, 2) neighbor pairs in one bucket. Pairs
        # stream in <=4M slabs, each combined to (x, y, count) before
        # the next slab materializes, then the slab partials combine —
        # peak memory O(slab + distinct pairs), never O(d^2) raw rows.
        a = t.column("ctr").to_numpy()
        b = t.column("nbr").to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        xs, ys, cs = [], [], []
        for ii, jj in _all_pairs_per_run_slabbed(a, b):
            ux, uy, c = pair_unique_counts(b[ii], b[jj])
            xs.append(ux)
            ys.append(uy)
            cs.append(c)
        if not xs:
            e = pa.array([], pa.int64())
            return pa.table({"x": e, "y": e, "cn": e})
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        c = np.concatenate(cs)
        ux, uy, inv = pair_unique_inverse(x, y)
        cn = np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)
        return pa.table({"x": _i64(ux), "y": _i64(uy), "cn": _i64(cn)})

    cn_pairs = (
        canon.map_batches(adj, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("part")
        .map_groups(wedge_pair_cn, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum("cn", alias_name="cn"))
    )

    def c4_partial(t: pa.Table) -> pa.Table:
        c = t.column("cn").to_numpy().astype(np.int64)
        return pa.table({"q": _i64(c * (c - 1) // 2)})

    n_cycle4 = (
        int(_sum_col(cn_pairs.map_batches(c4_partial, batch_format="pyarrow"), "q"))
        // 2
    )

    # --- diamonds + 4-cliques from triangles-per-edge --------------------
    n_diamond = n_clique4 = 0
    if n_tri:
        def edge_thirds(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy()
            b = t.column("b").to_numpy()
            c = t.column("c").to_numpy()
            eu = np.concatenate([np.minimum(a, b), np.minimum(a, c), b])
            ev = np.concatenate([np.maximum(a, b), np.maximum(a, c), c])
            third = np.concatenate([c, b, a])
            return pa.table(
                {
                    "part": _i64((eu + 31 * ev) % B),
                    "eu": _i64(eu),
                    "ev": _i64(ev),
                    "third": _i64(third),
                }
            )

        def per_edge(t: pa.Table) -> pa.Table:
            eu = t.column("eu").to_numpy()
            ev = t.column("ev").to_numpy()
            th = t.column("third").to_numpy()
            order = np.lexsort((th, ev, eu))
            eu, ev, th = eu[order], ev[order], th[order]
            run = np.r_[True, (eu[1:] != eu[:-1]) | (ev[1:] != ev[:-1])]
            starts = np.flatnonzero(run)
            lens = np.diff(np.r_[starts, len(eu)])
            # diamond partial: one row per edge, C(t_e, 2)
            dia = int((lens * (lens - 1) // 2).sum())
            # K4 candidates: pairs of thirds per edge (third sorted asc
            # within run -> pairs arrive canonical)
            run_start = np.repeat(starts, lens)
            lj = np.arange(len(eu), dtype=np.int64) - run_start
            tot = int(lj.sum())
            if tot == 0:
                e = pa.array([], pa.int64())
                return pa.table(
                    {"part2": _i64([0]), "kind": pa.array([2], pa.int8()),
                     "x": _i64([0]), "y": _i64([0]), "w": _i64([dia])}
                )
            jj = np.repeat(np.arange(len(eu), dtype=np.int64), lj)
            off = np.cumsum(lj) - lj
            ii = np.repeat(run_start, lj) + (np.arange(tot, dtype=np.int64) - np.repeat(off, lj))
            x, y = th[ii], th[jj]
            return pa.table(
                {
                    "part2": _i64(np.r_[(x + 31 * y) % B, np.int64(0)]),
                    "kind": pa.array(
                        np.r_[np.ones(tot, np.int8), np.int8(2)], pa.int8()
                    ),
                    "x": _i64(np.r_[x, np.int64(0)]),
                    "y": _i64(np.r_[y, np.int64(0)]),
                    "w": _i64(np.r_[np.zeros(tot, np.int64), np.int64(dia)]),
                }
            )

        def tag_canon2(t: pa.Table) -> pa.Table:
            u = t.column("u").to_numpy()
            v = t.column("v").to_numpy()
            return pa.table(
                {
                    "part2": _i64((u + 31 * v) % B),
                    "kind": pa.array(np.zeros(len(u), np.int8), pa.int8()),
                    "x": _i64(u),
                    "y": _i64(v),
                    "w": _i64(np.zeros(len(u), np.int64)),
                }
            )

        def close_k4(t: pa.Table) -> pa.Table:
            kind = t.column("kind").to_numpy()
            x = t.column("x").to_numpy()
            y = t.column("y").to_numpy()
            w = t.column("w").to_numpy()
            dia = int(w[kind == 2].sum())
            em = kind == 0
            cm = kind == 1
            ke = np.sort(_pack2(x[em], y[em]))
            hits = int(_member(ke, _pack2(x[cm], y[cm])).sum())
            return pa.table({"dia": _i64([dia]), "k4": _i64([hits])})

        per = (
            triples.map_batches(edge_thirds, batch_format="pyarrow", batch_size=1 << 20)
            .groupby("part")
            .map_groups(per_edge, batch_format="pyarrow")
            .union(canon.map_batches(tag_canon2, batch_format="pyarrow", batch_size=1 << 20))
            .groupby("part2")
            .map_groups(close_k4, batch_format="pyarrow")
            .materialize()
        )
        n_diamond = int(_sum_col(per, "dia"))
        n_clique4 = int(_sum_col(per, "k4")) // 6

    counts = {
        "wedge": n_wedge,
        "triangle": n_tri,
        "star3": n_star3,
        "path4": n_path4,
        "cycle4": n_cycle4,
        "tadpole": n_tadpole,
        "diamond": n_diamond,
        "clique4": n_clique4,
    }
    total = sum(counts.values()) or 1
    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return pd.DataFrame(
        {
            "motif": [m for m, _ in rows],
            "count": np.array([c for _, c in rows], np.int64),
            "share": np.round(
                np.array([c for _, c in rows], np.float64) / total, 8
            ),
        }
    )
