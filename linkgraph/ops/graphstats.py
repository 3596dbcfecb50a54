"""Webgraph structure statistics: host-graph collapse, reciprocity,
local clustering coefficients.

All three follow the repo's scale rules: per-batch combiners ahead of
every global groupby, hash joins for the wide steps (never a broadcast
of a large side), bucket-and-vectorize for per-group work. Each has a
row-exact DuckDB oracle in __ray_entry__.

(Reference analogue: SURVEY.md §2.7 grouped aggregates / joins / set
ops; the host collapse mirrors the partition-window coarsening idea of
update_partition_window, src/hoover.cpp:1185-1220, applied to the
vertex id space instead of the spatial domain.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..segops import pair_unique, pair_unique_inverse
from ray.data.aggregate import Sum

from ..algos.triangles import _all_pairs_per_run, _i64, _member, _pack2
from ..edges import _partial_counts


def _filter_runs(a: np.ndarray, b: np.ndarray, cap: int | None):
    """Keep only rows whose a-run has 2..cap members (a sorted); returns
    (a, b, run_len_per_row) over the kept rows — run structure intact."""
    n = len(a)
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]]) if n else np.zeros(0, np.int64)
    lens = np.diff(np.r_[starts, n])
    per_row = np.repeat(lens, lens)
    keep = per_row >= 2
    if cap is not None:
        keep &= per_row <= cap
    return a[keep], b[keep], per_row[keep]


def _nparts(num_partitions: int | None) -> int:
    if num_partitions is not None:
        return num_partitions
    import ray

    return max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)


def host_graph(
    edges: Dataset,
    doc_hosts: Dataset,
    num_partitions: int | None = None,
) -> Dataset:
    """Collapse the page graph to the host graph.

    edges(src, dst) x doc_hosts(doc_id, host) -> (src_host, dst_host,
    n_links): two hash joins map each endpoint to its host, a per-batch
    combiner pre-aggregates (src_host, dst_host) pairs, one small
    groupby sums the partials. The host table is joined, not broadcast —
    at web scale #hosts is itself large."""
    P = _nparts(num_partitions)
    j1 = edges.join(
        doc_hosts, join_type="inner", num_partitions=P,
        on=("src",), right_on=("doc_id",),
    ).select_columns(["dst", "host"]).rename_columns({"host": "src_host"})
    j2 = j1.join(
        doc_hosts, join_type="inner", num_partitions=P,
        on=("dst",), right_on=("doc_id",),
    ).select_columns(["src_host", "host"]).rename_columns({"host": "dst_host"})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["src_host", "dst_host"]).aggregate([("src_host", "count")])
        return g.rename_columns(["src_host", "dst_host", "_c"])

    return (
        j2.map_batches(combine, batch_format="pyarrow", batch_size=1 << 20)
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("_c", alias_name="n_links"))
    )


def adamic_adar(
    edges: Dataset,
    min_cn: int = 2,
    max_degree: int | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Link prediction over the undirected simple graph: for every
    non-adjacent pair (a < b) with >= min_cn common neighbors, emit
    (a, b, common_neighbors, adamic_adar) with the Adamic-Adar score
    sum over shared neighbors z of 1/ln(deg(z)).

    Pipeline: canonical-pair dedup -> full adjacency bucketed by center
    -> per-center vectorized neighbor-pair generation with in-bucket
    (a, b) combiner -> re-bucket by pair hash where score partials,
    with the edge set tagged into the same buckets, are summed and
    anti-merged vectorized per bucket (a high-cardinality multi-key
    Dataset.groupby.aggregate is a known Ray Data sort pathology —
    ~100x slower than the bucketed map_groups used here; same pattern
    as triangles.py closure). ``max_degree`` is the web-scale skew cap:
    centers above it are skipped (a hub shared by everyone carries ~no
    AA signal and O(deg^2) wedges); None (default, used by the SQL
    oracle) is exact."""
    from ..algos.triangles import _canonical_bucketed

    P = _nparts(num_partitions)
    B = max(P * 4, 16)
    cpairs = _canonical_bucketed(edges, B).materialize()

    def adj(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        ctr = np.concatenate([u, v])
        nbr = np.concatenate([v, u])
        return pa.table(
            {"part": pa.array(ctr % B), "ctr": pa.array(ctr), "nbr": pa.array(nbr)}
        )

    cap = max_degree

    def wedge_scores(t: pa.Table) -> pa.Table:
        a = t.column("ctr").to_numpy()
        b = t.column("nbr").to_numpy()
        order = np.lexsort((b, a))
        a, b, runlen = _filter_runs(a[order], b[order], cap)
        ii, jj = _all_pairs_per_run(a, b)
        if len(ii) == 0:
            e_ = pa.array([], pa.int64())
            return pa.table(
                {"part2": e_, "kind": pa.array([], pa.int8()), "a": e_, "b": e_,
                 "cn": e_, "aa": pa.array([], pa.float64())}
            )
        x, y = b[ii], b[jj]
        sc = 1.0 / np.log(runlen[jj].astype(np.float64))
        # in-bucket combiner: sum score + count per (a, b)
        ux, uy, inv = pair_unique_inverse(x, y)
        cn = np.bincount(inv)
        aa = np.bincount(inv, weights=sc)
        return pa.table(
            {
                "part2": _i64((ux + 31 * uy) % B),
                "kind": pa.array(np.ones(len(ux), np.int8)),
                "a": _i64(ux),
                "b": _i64(uy),
                "cn": _i64(cn),
                "aa": pa.array(aa.astype(np.float64)),
            }
        )

    partials = (
        cpairs.map_batches(adj, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("part")
        .map_groups(wedge_scores, batch_format="pyarrow")
    )

    def tag_edges(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        return pa.table(
            {
                "part2": _i64((u + 31 * v) % B),
                "kind": pa.array(np.zeros(len(u), np.int8)),
                "a": _i64(u),
                "b": _i64(v),
                "cn": _i64(np.zeros(len(u), np.int64)),
                "aa": pa.array(np.zeros(len(u), np.float64)),
            }
        )

    mc = int(min_cn)

    def merge_bucket(t: pa.Table) -> pa.Table:
        """Sum score partials per (a, b); drop pairs present as edges."""
        kind = t.column("kind").to_numpy()
        av = t.column("a").to_numpy()
        bv = t.column("b").to_numpy()
        sm = kind == 1
        if not sm.any():
            e_ = pa.array([], pa.int64())
            return pa.table(
                {"a": e_, "b": e_, "common_neighbors": e_,
                 "adamic_adar": pa.array([], pa.float64())}
            )
        ua, ub, inv = pair_unique_inverse(av[sm], bv[sm])
        cn = np.bincount(inv, weights=t.column("cn").to_numpy()[sm]).astype(np.int64)
        aa = np.bincount(inv, weights=t.column("aa").to_numpy()[sm])
        # anti-join: keep score pairs not present in the edge set
        # (sorted 16-byte pair keys — exact for full-width 64-bit ids)
        em = ~sm
        ke = np.sort(_pack2(av[em], bv[em]))
        keep = ~_member(ke, _pack2(ua, ub))
        keep &= cn >= mc
        return pa.table(
            {
                "a": _i64(ua[keep]),
                "b": _i64(ub[keep]),
                "common_neighbors": _i64(cn[keep]),
                "adamic_adar": pa.array(np.round(aa[keep], 8).astype(np.float64)),
            }
        )

    return (
        partials.union(cpairs.map_batches(tag_edges, batch_format="pyarrow"))
        .groupby("part2")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def edge_jaccard(
    edges: Dataset,
    num_partitions: int | None = None,
) -> Dataset:
    """Neighborhood Jaccard similarity of ADJACENT pairs (the classic
    link-strength / tie-strength signal): for every undirected edge
    (a < b) with at least one common neighbor,
    (a, b, common_neighbors, jaccard) with
    J = |N(a) ∩ N(b)| / (deg(a) + deg(b) - |N(a) ∩ N(b)|).

    Same wedge pipeline as adamic_adar but the pair-bucket merge is an
    INNER merge against the edge set (keep wedge pairs that ARE edges),
    then one hash join per endpoint brings the distinct-neighbor
    degrees."""
    from ..algos.triangles import _canonical_bucketed

    P = _nparts(num_partitions)
    B = max(P * 4, 16)
    cpairs = _canonical_bucketed(edges, B).materialize()

    def adj(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        ctr = np.concatenate([u, v])
        nbr = np.concatenate([v, u])
        return pa.table(
            {"part": pa.array(ctr % B), "ctr": pa.array(ctr), "nbr": pa.array(nbr)}
        )

    adj_ds = cpairs.map_batches(adj, batch_format="pyarrow", batch_size=1 << 20)

    def wedge_pairs(t: pa.Table) -> pa.Table:
        a = t.column("ctr").to_numpy()
        b = t.column("nbr").to_numpy()
        order = np.lexsort((b, a))
        a, b, _ = _filter_runs(a[order], b[order], None)
        ii, jj = _all_pairs_per_run(a, b)
        if len(ii) == 0:
            e_ = pa.array([], pa.int64())
            return pa.table(
                {"part2": e_, "kind": pa.array([], pa.int8()), "a": e_, "b": e_, "cn": e_}
            )
        ux, uy, inv = pair_unique_inverse(b[ii], b[jj])
        return pa.table(
            {
                "part2": _i64((ux + 31 * uy) % B),
                "kind": pa.array(np.ones(len(ux), np.int8)),
                "a": _i64(ux),
                "b": _i64(uy),
                "cn": _i64(np.bincount(inv)),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        return pa.table(
            {
                "part2": _i64((u + 31 * v) % B),
                "kind": pa.array(np.zeros(len(u), np.int8)),
                "a": _i64(u),
                "b": _i64(v),
                "cn": _i64(np.zeros(len(u), np.int64)),
            }
        )

    def inner_merge(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy()
        av = t.column("a").to_numpy()
        bv = t.column("b").to_numpy()
        sm = kind == 1
        em = ~sm
        if not sm.any() or not em.any():
            e_ = pa.array([], pa.int64())
            return pa.table({"a": e_, "b": e_, "cn": e_})
        ua, ub, inv = pair_unique_inverse(av[sm], bv[sm])
        cn = np.bincount(inv, weights=t.column("cn").to_numpy()[sm]).astype(np.int64)
        ke = np.sort(_pack2(av[em], bv[em]))
        hit = _member(ke, _pack2(ua, ub))
        return pa.table(
            {"a": _i64(ua[hit]), "b": _i64(ub[hit]), "cn": _i64(cn[hit])}
        )

    on_edges = (
        adj_ds.groupby("part")
        .map_groups(wedge_pairs, batch_format="pyarrow")
        .union(cpairs.map_batches(tag_edges, batch_format="pyarrow"))
        .groupby("part2")
        .map_groups(inner_merge, batch_format="pyarrow")
    )

    def deg_partial(t: pa.Table) -> pa.Table:
        ids, cnt = np.unique(t.column("ctr").to_numpy(), return_counts=True)
        return pa.table({"v": pa.array(ids), "_c": pa.array(cnt.astype(np.int64))})

    deg = (
        adj_ds.map_batches(deg_partial, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("v")
        .aggregate(Sum("_c", alias_name="d"))
        .materialize()
    )

    joined = on_edges.join(
        deg, join_type="inner", num_partitions=P, on=("a",), right_on=("v",)
    ).rename_columns({"d": "da"}).join(
        deg, join_type="inner", num_partitions=P, on=("b",), right_on=("v",),
        right_suffix="_b",
    )

    def finish(t: pa.Table) -> pa.Table:
        cn = t.column("cn").to_numpy()
        da = t.column("da").to_numpy().astype(np.float64)
        db = t.column("d").to_numpy().astype(np.float64)
        return pa.table(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "common_neighbors": pa.array(cn),
                "jaccard": pa.array(np.round(cn / (da + db - cn), 8)),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def degree_assortativity(
    edges: Dataset, num_partitions: int | None = None
) -> pd.DataFrame:
    """Degree assortativity of the undirected simple graph (Newman
    2002): Pearson correlation of endpoint degrees over the symmetrized
    edge list. All moments are exact int64 sums (combiner per batch,
    one tiny global sum); the single float expression at the end is
    bit-identical to the SQL oracle's."""
    from ..algos.triangles import _canonical_bucketed

    P = _nparts(num_partitions)
    B = max(P * 4, 16)
    cpairs = _canonical_bucketed(edges, B).materialize()

    def adj(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        return pa.table(
            {"ctr": pa.array(np.concatenate([u, v])),
             "nbr": pa.array(np.concatenate([v, u]))}
        )

    adj_ds = cpairs.map_batches(adj, batch_format="pyarrow", batch_size=1 << 20)

    def deg_partial(t: pa.Table) -> pa.Table:
        ids, cnt = np.unique(t.column("ctr").to_numpy(), return_counts=True)
        return pa.table({"v": pa.array(ids), "_c": pa.array(cnt.astype(np.int64))})

    deg = (
        adj_ds.map_batches(deg_partial, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("v")
        .aggregate(Sum("_c", alias_name="d"))
        .materialize()
    )

    pts = adj_ds.join(
        deg, join_type="inner", num_partitions=P, on=("ctr",), right_on=("v",)
    ).rename_columns({"d": "x"}).join(
        deg, join_type="inner", num_partitions=P, on=("nbr",), right_on=("v",),
        right_suffix="_y",
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("d").to_numpy().astype(np.int64)
        return pa.table(
            {
                "n": pa.array([np.int64(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxy": pa.array([(x * y).sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
            }
        )

    m = pts.map_batches(moments, batch_format="pyarrow").sum(
        ["n", "sx", "sy", "sxy", "sxx", "syy"]
    )
    n, sx, sy = m["sum(n)"], m["sum(sx)"], m["sum(sy)"]
    sxy, sxx, syy = m["sum(sxy)"], m["sum(sxx)"], m["sum(syy)"]
    r = (n * sxy - sx * sy) / (
        np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    )
    return pd.DataFrame(
        {"n_points": [np.int64(n)], "assortativity": [round(float(r), 8)]}
    )


def quotient_graph(
    edges: Dataset,
    labels: Dataset,
    id_col: str = "v",
    label_col: str = "label",
    num_partitions: int | None = None,
) -> Dataset:
    """Contract the graph by a vertex labeling (communities, components,
    hosts): edges(src, dst) x labels(v, label) -> (src_label, dst_label,
    n_edges), including intra-label rows — the supergraph construction
    step of multilevel community / coarsening pipelines.

    Two hash joins map endpoints to labels (the label table is joined,
    never broadcast — at web scale #labels is itself large), a per-batch
    combiner pre-aggregates label pairs, one small groupby sums."""
    P = _nparts(num_partitions)
    j1 = edges.join(
        labels, join_type="inner", num_partitions=P, on=("src",), right_on=(id_col,)
    ).select_columns(["dst", label_col]).rename_columns({label_col: "src_label"})
    j2 = j1.join(
        labels, join_type="inner", num_partitions=P, on=("dst",), right_on=(id_col,)
    ).select_columns(["src_label", label_col]).rename_columns({label_col: "dst_label"})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["src_label", "dst_label"]).aggregate([("src_label", "count")])
        return g.rename_columns(["src_label", "dst_label", "_c"])

    return (
        j2.map_batches(combine, batch_format="pyarrow", batch_size=1 << 20)
        .groupby(["src_label", "dst_label"])
        .aggregate(Sum("_c", alias_name="n_edges"))
    )


def modularity(
    edges: Dataset,
    labels: Dataset,
    id_col: str = "v",
    label_col: str = "label",
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Newman modularity Q of a vertex labeling on the undirected simple
    graph: Q = sum_c [ e_c/m - (deg_c / 2m)^2 ] over communities c,
    where m = #distinct undirected pairs, e_c = intra-community pairs,
    deg_c = sum of endpoint memberships. One row
    (n_edges, n_communities, modularity).

    Scale shape: canonical-pair dedup is hash-bucketed (never a global
    unique on the driver); labels attach via two hash joins (the label
    table is a joined side, not a broadcast); per-community sums use a
    per-batch combiner before the #communities-sized groupby; the final
    reduce ships four scalars per block. Q needs sum(deg_c^2), so the
    per-community aggregation is the one unavoidable shuffle."""
    P = _nparts(num_partitions)
    B = max(P * 4, 16)

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64, copy=False)
        d = t.column("dst").to_numpy().astype(np.int64, copy=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u, v = pair_unique(np.minimum(s, d), np.maximum(s, d))  # combiner
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    from ..edges import distinct_pairs

    pairs = distinct_pairs(
        edges.map_batches(canon, batch_format="pyarrow", batch_size=1 << 20), "u", "v"
    )
    j1 = pairs.join(
        labels, join_type="inner", num_partitions=P, on=("u",), right_on=(id_col,)
    ).select_columns(["v", label_col]).rename_columns({label_col: "lu"})
    j2 = j1.join(
        labels, join_type="inner", num_partitions=P, on=("v",), right_on=(id_col,)
    ).select_columns(["lu", label_col]).rename_columns({label_col: "lv"})

    def contrib(t: pa.Table) -> pa.Table:
        lu = t.column("lu").to_numpy()
        lv = t.column("lv").to_numpy()
        lab = np.concatenate([lu, lv])
        intra = np.concatenate(
            [(lu == lv).astype(np.int64), np.zeros(len(lv), np.int64)]
        )
        order = np.argsort(lab, kind="stable")
        lab, intra = lab[order], intra[order]
        starts = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
        return pa.table(
            {
                "label": pa.array(lab[starts]),
                "_i": pa.array(np.add.reduceat(intra, starts)),
                "_d": pa.array(np.diff(np.r_[starts, len(lab)]).astype(np.int64)),
            }
        )

    per = (
        j2.map_batches(contrib, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("label")
        .aggregate(Sum("_i", alias_name="intra"), Sum("_d", alias_name="deg"))
    )

    def finish(t: pa.Table) -> pa.Table:
        deg = t.column("deg").to_numpy().astype(np.float64)
        return pa.table(
            {
                "intra": pa.array([int(t.column("intra").to_numpy().sum())]),
                "deg": pa.array([float(deg.sum())]),
                "deg2": pa.array([float((deg * deg).sum())]),
                "ncomm": pa.array([len(t)]),
            }
        )

    tot = (
        per.map_batches(finish, batch_format="pyarrow", batch_size=1 << 20)
        .sum(["intra", "deg", "deg2", "ncomm"])
    )
    m = tot["sum(deg)"] / 2.0  # sum_c deg_c == 2m by construction
    q = (tot["sum(intra)"] / m - tot["sum(deg2)"] / (4.0 * m * m)) if m else 0.0
    return pd.DataFrame(
        {
            "n_edges": [int(m)],
            "n_communities": [int(tot["sum(ncomm)"])],
            "modularity": [round(float(q), 8)],
        }
    )


def powerlaw_alpha(edges: Dataset, dmin: int = 2) -> pd.DataFrame:
    """Clauset-Shalizi-Newman continuous MLE of the power-law exponent
    of the out-degree distribution tail (d >= dmin):

        alpha = 1 + n / sum_i ln( d_i / (dmin - 0.5) )

    — the standard quick skew diagnostic for web graphs (hub heaviness
    drives partitioning and combiner effectiveness). One row
    (dmin, n_tail, alpha).

    Degree counting reuses the combiner + small-groupby path of
    out_degrees; the MLE reduce ships two scalars per block."""
    from ..edges import out_degrees

    deg = out_degrees(edges, out="deg")

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy().astype(np.float64)
        d = d[d >= dmin]
        return pa.table(
            {
                "n": pa.array([len(d)], pa.int64()),
                "slog": pa.array([float(np.log(d).sum()) if len(d) else 0.0]),
            }
        )

    tot = deg.map_batches(partial, batch_format="pyarrow", batch_size=1 << 20).sum(
        ["n", "slog"]
    )
    n = int(tot["sum(n)"])
    denom = tot["sum(slog)"] - n * np.log(dmin - 0.5)
    alpha = 1.0 + n / denom if n and denom > 0 else float("nan")
    return pd.DataFrame(
        {
            "dmin": [int(dmin)],
            "n_tail": [n],
            "alpha": [round(float(alpha), 8)],
        }
    )


def reciprocity(edges: Dataset, num_partitions: int | None = None) -> pd.DataFrame:
    """Edge reciprocity of the directed graph: one row
    (n_edges, n_reciprocal, reciprocity) where n_reciprocal counts
    directed edges whose reverse also exists. Self-join on the full
    (src, dst) key — a hash shuffle join, no driver materialization."""
    P = _nparts(num_partitions)

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("dst"), "dst": t.column("src")})

    reversed_e = edges.map_batches(rev, batch_format="pyarrow", batch_size=1 << 20)
    n_recip = edges.join(
        reversed_e, join_type="inner", num_partitions=P, on=("src", "dst")
    ).count()
    n_edges = edges.count()
    return pd.DataFrame(
        {
            "n_edges": [np.int64(n_edges)],
            "n_reciprocal": [np.int64(n_recip)],
            "reciprocity": [round(n_recip / n_edges, 8) if n_edges else 0.0],
        }
    )


def clustering_coefficient(
    edges: Dataset, num_partitions: int | None = None
) -> Dataset:
    """Local clustering coefficient on the undirected simple graph:
    (v, degree, n_triangles, clustering) for every vertex, clustering =
    2T(v) / (d(v) (d(v)-1)) and 0.0 where d < 2.

    T(v) comes from the degree-oriented wedge pipeline
    (triangle_counts_per_vertex — sqrt(m)-bounded, fully bucketed);
    d(v) is the distinct-neighbor count via canonical-pair dedup +
    combiner counts. One left join lines them up."""
    from ..algos.triangles import triangle_counts_per_vertex

    P = _nparts(num_partitions)

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64, copy=False)
        d = t.column("dst").to_numpy().astype(np.int64, copy=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u, v = pair_unique(np.minimum(s, d), np.maximum(s, d))  # combiner
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    cpairs = edges.map_batches(canon, batch_format="pyarrow", batch_size=1 << 20)
    # global dedup of canonical pairs (sort + adjacent mask), then
    # per-block degree partials
    from ..edges import distinct_pairs

    def count_ends(t: pa.Table) -> pa.Table:
        ends = np.concatenate(
            [t.column("u").to_numpy(), t.column("v").to_numpy()]
        )
        ids, cnt = np.unique(ends, return_counts=True)  # in-block combiner
        return pa.table({"v": _i64(ids), "_c": _i64(cnt)})

    deg = (
        distinct_pairs(cpairs, "u", "v")
        .map_batches(count_ends, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("v")
        .aggregate(Sum("_c", alias_name="degree"))
    )
    tri = triangle_counts_per_vertex(edges, num_partitions=P)
    joined = deg.join(
        tri, join_type="left_outer", num_partitions=P,
        on=("v",), right_on=("v",), right_suffix="_t",
    )

    def coeff(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = t.column("degree").to_numpy().astype(np.float64)
        tr = pc.fill_null(t.column("n_triangles"), 0).to_numpy(zero_copy_only=False)
        denom = d * (d - 1.0)
        c = np.where(denom > 0, 2.0 * tr / np.where(denom > 0, denom, 1.0), 0.0)
        return pa.table(
            {
                "v": t.column("v"),
                "degree": t.column("degree"),
                "n_triangles": pa.array(tr.astype(np.int64)),
                "clustering": pa.array(np.round(c, 8)),
            }
        )

    return joined.map_batches(coeff, batch_format="pyarrow")


def dangling_share(edges, host_mod: int = 64):
    """Per-host crawl-frontier hygiene: of each host's outgoing links,
    how many point at pages that have no outgoing links themselves
    (dangling dsts — unfetched or terminal pages).

    -> (host, n_links, n_dangling). One src-set distinct (sort +
    adjacent mask) broadcast as a tagged union with the edge rows:
    a (key) range sort co-locates each dst with the src-set marker row
    if one exists, so membership is a per-run any() — no hash table,
    no driver-side set. Host key = src % host_mod for the derived doc
    graph (production: the host hash column).
    """
    import numpy as np
    import pyarrow as pa

    def src_marks(t: pa.Table) -> pa.Table:
        s = np.unique(t.column("src").to_numpy())
        return pa.table(
            {
                "key": pa.array(s),
                "kind": pa.array(np.zeros(len(s), np.int8)),
                "host": pa.array(np.zeros(len(s), np.int64)),
            }
        )

    def edge_rows(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        return pa.table(
            {
                "key": pa.array(dst),
                "kind": pa.array(np.ones(len(dst), np.int8)),
                "host": pa.array((src % host_mod).astype(np.int64)),
            }
        )

    tagged = edges.map_batches(src_marks, batch_format="pyarrow").union(
        edges.map_batches(edge_rows, batch_format="pyarrow")
    )

    def per_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"host": z, "n_links": z, "n_dangling": z})
        k = t.column("key").to_numpy()
        kind = t.column("kind").to_numpy()
        host = t.column("host").to_numpy()
        new = np.r_[True, k[1:] != k[:-1]]
        run = np.cumsum(new) - 1
        # run has a src marker iff any kind==0 row present
        has_src = np.zeros(run[-1] + 1, bool)
        has_src[run[kind == 0]] = True
        is_edge = kind == 1
        dangling = is_edge & ~has_src[run]
        n_links = np.bincount(host[is_edge], minlength=host_mod)
        n_dang = np.bincount(host[dangling], minlength=host_mod)
        keep = n_links > 0
        hosts = np.arange(host_mod, dtype=np.int64)
        return pa.table(
            {
                "host": pa.array(hosts[keep]),
                "n_links": pa.array(n_links[keep].astype(np.int64)),
                "n_dangling": pa.array(n_dang[keep].astype(np.int64)),
            }
        )

    from .sortagg import sorted_sum_by

    partials = tagged.sort("key").map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )
    return sorted_sum_by(
        partials, "host", sum_cols={"n_links": "n_links", "n_dangling": "n_dangling"}
    )


def butterflies(
    edges: Dataset,
    num_partitions: int | None = None,
    max_out_degree: int | None = None,
) -> pd.DataFrame:
    """Butterfly (2x2-biclique / C4) count of the directed link graph —
    the standard link-farm / bipartite-core density signal (Trawling's
    (2,2)-core): pairs of sources that both link to the same pair of
    destinations.

    One row (n_wedges, n_butterflies) with
    n_wedges = sum_s C(outdeg(s), 2) over distinct (src, dst) edges and
    n_butterflies = sum_{d1<d2} C(w(d1, d2), 2) where w is the number of
    sources linking to both d1 and d2.

    Shape: route edges by src%B so each source's out-list co-locates,
    enumerate its dst-pairs slab-bounded (a degree-d hub never
    materializes C(d,2) at once), pre-aggregate (d1, d2) wedge counts
    per group, re-aggregate globally by pair bucket, and fold the B
    per-bucket partials on the driver (O(B) rows). ``max_out_degree``
    optionally drops hub sources above the cap (documented-approximate
    mode for skewed crawls; default exact).
    """
    P = _nparts(num_partitions)
    B = max(P * 4, 16)

    def bucket_fold(t: pa.Table) -> pa.Table:
        d1 = t.column("d1").to_numpy()
        d2 = t.column("d2").to_numpy()
        if len(d1) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"n_wedges": z, "n_butterflies": z})
        _, _, inv = pair_unique_inverse(d1, d2)
        w = np.zeros(int(inv.max()) + 1, np.int64)  # exact int64 accumulation
        np.add.at(w, inv, t.column("w").to_numpy())
        return pa.table(
            {
                "n_wedges": _i64([int(w.sum())]),
                "n_butterflies": _i64([int((w * (w - 1) // 2).sum())]),
            }
        )

    parts = (
        _wedge_pair_partials(edges, B, max_out_degree)
        .groupby("part2")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .to_pandas()  # <= B one-row partials
    )
    return pd.DataFrame(
        {
            "n_wedges": [np.int64(parts["n_wedges"].sum()) if len(parts) else 0],
            "n_butterflies": [
                np.int64(parts["n_butterflies"].sum()) if len(parts) else 0
            ],
        }
    )


def _wedge_pair_partials(
    edges: Dataset, B: int, max_out_degree: int | None
) -> Dataset:
    """Shared co-citation wedge stage: (part2, d1, d2, w) partial rows —
    per src%B group, distinct out-lists enumerated pair-wise slab-bounded
    (a degree-d hub never materializes C(d,2) at once) with in-group
    (d1, d2) count pre-aggregation. d1 < d2 always; a pair's partials may
    span src groups, so consumers re-aggregate by part2."""
    from ..algos.triangles import _all_pairs_per_run_slabbed

    def route(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64, copy=False)
        d = t.column("dst").to_numpy().astype(np.int64, copy=False)
        return pa.table({"part": _i64(s % B), "src": _i64(s), "dst": _i64(d)})

    routed = edges.map_batches(route, batch_format="pyarrow", batch_size=1 << 20)

    def wedge_partials(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        if len(s):  # distinct (src, dst): all rows of a src are in-group
            keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
            s, d = s[keep], d[keep]
        s, d, _ = _filter_runs(s, d, max_out_degree)
        outs = {"part2": [], "d1": [], "d2": [], "w": []}
        for ii, jj in _all_pairs_per_run_slabbed(s, d):
            # dsts strictly ascend within a run, so d[ii] < d[jj]
            ux, uy, inv = pair_unique_inverse(d[ii], d[jj])
            outs["part2"].append((ux + 31 * uy) % B)
            outs["d1"].append(ux)
            outs["d2"].append(uy)
            outs["w"].append(np.bincount(inv).astype(np.int64))
        if not outs["d1"]:
            z = pa.array([], pa.int64())
            return pa.table({"part2": z, "d1": z, "d2": z, "w": z})
        return pa.table({k: _i64(np.concatenate(v)) for k, v in outs.items()})

    return routed.groupby("part").map_groups(wedge_partials, batch_format="pyarrow")


def cocitation_topk(
    edges: Dataset,
    k: int = 20,
    num_partitions: int | None = None,
    max_out_degree: int | None = None,
) -> pd.DataFrame:
    """Top-k co-cited destination pairs: (d1, d2, n_common) for the k
    pairs most often linked by the same source (co-citation strength —
    the classic related-page signal; its transpose is bibliographic
    coupling, obtainable by swapping src/dst upstream).

    Total order is (n_common DESC, d1, d2) so the boundary is
    deterministic under ties. Per-bucket local top-k bounds the driver
    fold at B*k rows; the wedge stage is shared with butterflies()."""
    P = _nparts(num_partitions)
    B = max(P * 4, 16)

    def bucket_topk(t: pa.Table) -> pa.Table:
        d1 = t.column("d1").to_numpy()
        d2 = t.column("d2").to_numpy()
        if len(d1) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"d1": z, "d2": z, "n_common": z})
        u1, u2, inv = pair_unique_inverse(d1, d2)
        w = np.zeros(len(u1), np.int64)
        np.add.at(w, inv, t.column("w").to_numpy())
        order = np.lexsort((u2, u1, -w))[:k]  # local top-k, same total order
        return pa.table(
            {"d1": _i64(u1[order]), "d2": _i64(u2[order]), "n_common": _i64(w[order])}
        )

    parts = (
        _wedge_pair_partials(edges, B, max_out_degree)
        .groupby("part2")
        .map_groups(bucket_topk, batch_format="pyarrow")
        .to_pandas()  # <= B*k rows
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "d1": pd.Series([], dtype=np.int64),
                "d2": pd.Series([], dtype=np.int64),
                "n_common": pd.Series([], dtype=np.int64),
            }
        )
    parts = parts.sort_values(
        ["n_common", "d1", "d2"], ascending=[False, True, True]
    ).head(k)
    return parts.reset_index(drop=True)


def adjacency_gamma_bits(
    edges: Dataset, num_partitions: int | None = None
) -> pd.DataFrame:
    """WebGraph-flavored adjacency compressibility estimate: per source,
    the distinct out-neighbors sorted ascending are coded as
    first = dst0 + 1 then successive gaps (>= 1 by distinctness), each
    value g costing the Elias-gamma 2*floor(log2(g)) + 1 bits. One row
    (n_edges, gamma_bits, raw_bits, ratio) with raw_bits = 64*n_edges.

    A high ratio means the crawl's id assignment destroys locality (the
    WebGraph BV result: lexicographic URL ids make gamma_bits tiny);
    routed by src%B so each out-list is whole in its group, per-group
    partials folded on the driver (O(B) rows). floor(log2) is computed
    exactly from the float64 exponent (frexp), not a logarithm.
    """
    P = _nparts(num_partitions)
    B = max(P * 4, 16)

    def route(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64, copy=False)
        d = t.column("dst").to_numpy().astype(np.int64, copy=False)
        return pa.table({"part": _i64(s % B), "src": _i64(s), "dst": _i64(d)})

    routed = edges.map_batches(route, batch_format="pyarrow", batch_size=1 << 20)

    def gap_partial(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        if len(s) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"n_edges": z, "gamma_bits": z})
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
        s, d = s[keep], d[keep]
        first = np.r_[True, s[1:] != s[:-1]]
        gaps = np.where(first, d + 1, d - np.r_[0, d[:-1]])
        # exact floor(log2(g)): frexp exponent - 1 (g integer < 2^53)
        ebits = np.frexp(gaps.astype(np.float64))[1].astype(np.int64) - 1
        bits = int((2 * ebits + 1).sum())
        return pa.table({"n_edges": _i64([len(d)]), "gamma_bits": _i64([bits])})

    parts = (
        routed.groupby("part")
        .map_groups(gap_partial, batch_format="pyarrow")
        .to_pandas()  # <= B one-row partials
    )
    n = int(parts["n_edges"].sum()) if len(parts) else 0
    g = int(parts["gamma_bits"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "n_edges": [np.int64(n)],
            "gamma_bits": [np.int64(g)],
            "raw_bits": [np.int64(64 * n)],
            "ratio": [round(g / (64.0 * n), 8) if n else 0.0],
        }
    )
