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
from ray.data.aggregate import Sum

from ..edges import _partial_counts


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

    def wedge_scores(g: pd.DataFrame) -> pd.DataFrame:
        a = g["ctr"].to_numpy()
        b = g["nbr"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[starts[1:], len(a)]
        pa_, pb_, sc_ = [], [], []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2 or (cap is not None and k > cap):
                continue
            i, j = np.triu_indices(k, 1)
            nb = b[s:e]
            pa_.append(nb[i])
            pb_.append(nb[j])
            sc_.append(np.full(len(i), 1.0 / np.log(k)))
        if not pa_:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
                 "cn": pd.Series([], dtype=np.int64), "aa": pd.Series([], dtype=np.float64)}
            )
        x, y, sc = np.concatenate(pa_), np.concatenate(pb_), np.concatenate(sc_)
        # in-bucket combiner: sum score + count per (a, b)
        key = np.stack([x, y], axis=1)
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        cn = np.bincount(inv)
        aa = np.bincount(inv, weights=sc)
        return pd.DataFrame(
            {
                "part2": (uk[:, 0] + 31 * uk[:, 1]) % B,
                "kind": np.ones(len(uk), np.int8),
                "a": uk[:, 0],
                "b": uk[:, 1],
                "cn": cn.astype(np.int64),
                "aa": aa,
            }
        )

    partials = (
        cpairs.map_batches(adj, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("part")
        .map_groups(wedge_scores, batch_format="pandas")
    )

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        return pd.DataFrame(
            {
                "part2": (u + 31 * v) % B,
                "kind": np.zeros(len(u), np.int8),
                "a": u,
                "b": v,
                "cn": np.zeros(len(u), np.int64),
                "aa": np.zeros(len(u), np.float64),
            }
        )

    mc = int(min_cn)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Sum score partials per (a, b); drop pairs present as edges."""
        sc = g[g["kind"] == 1]
        if not len(sc):
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
                 "common_neighbors": pd.Series([], dtype=np.int64),
                 "adamic_adar": pd.Series([], dtype=np.float64)}
            )
        key = np.stack([sc["a"].to_numpy(), sc["b"].to_numpy()], axis=1)
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        cn = np.bincount(inv, weights=sc["cn"].to_numpy()).astype(np.int64)
        aa = np.bincount(inv, weights=sc["aa"].to_numpy())
        ed = g[g["kind"] == 0]
        # anti-merge: keep score pairs not present in the edge set
        # (two-column pandas merge — safe for full-width 64-bit ids)
        if len(ed):
            sdf = pd.DataFrame({"a": uk[:, 0], "b": uk[:, 1]})
            m = sdf.merge(
                ed[["a", "b"]].drop_duplicates(), on=["a", "b"],
                how="left", indicator=True,
            )
            keep = (m["_merge"] == "left_only").to_numpy()
        else:
            keep = np.ones(len(uk), bool)
        keep &= cn >= mc
        return pd.DataFrame(
            {
                "a": uk[keep, 0],
                "b": uk[keep, 1],
                "common_neighbors": cn[keep],
                "adamic_adar": np.round(aa[keep], 8),
            }
        )

    return (
        partials.union(cpairs.map_batches(tag_edges, batch_format="pandas"))
        .groupby("part2")
        .map_groups(merge_bucket, batch_format="pandas")
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

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a = g["ctr"].to_numpy()
        b = g["nbr"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[starts[1:], len(a)]
        pa_, pb_ = [], []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, 1)
            nb = b[s:e]
            pa_.append(nb[i])
            pb_.append(nb[j])
        if not pa_:
            return pd.DataFrame(
                {"part2": pd.Series([], dtype=np.int64),
                 "kind": pd.Series([], dtype=np.int8),
                 "a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
                 "cn": pd.Series([], dtype=np.int64)}
            )
        x, y = np.concatenate(pa_), np.concatenate(pb_)
        key = np.stack([x, y], axis=1)
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        return pd.DataFrame(
            {
                "part2": (uk[:, 0] + 31 * uk[:, 1]) % B,
                "kind": np.ones(len(uk), np.int8),
                "a": uk[:, 0],
                "b": uk[:, 1],
                "cn": np.bincount(inv).astype(np.int64),
            }
        )

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        return pd.DataFrame(
            {
                "part2": (u + 31 * v) % B,
                "kind": np.zeros(len(u), np.int8),
                "a": u,
                "b": v,
                "cn": np.zeros(len(u), np.int64),
            }
        )

    def inner_merge(g: pd.DataFrame) -> pd.DataFrame:
        sc = g[g["kind"] == 1]
        ed = g[g["kind"] == 0]
        if not len(sc) or not len(ed):
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
                 "cn": pd.Series([], dtype=np.int64)}
            )
        key = np.stack([sc["a"].to_numpy(), sc["b"].to_numpy()], axis=1)
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        cn = np.bincount(inv, weights=sc["cn"].to_numpy()).astype(np.int64)
        sdf = pd.DataFrame({"a": uk[:, 0], "b": uk[:, 1], "cn": cn})
        return sdf.merge(ed[["a", "b"]].drop_duplicates(), on=["a", "b"], how="inner")

    on_edges = (
        adj_ds.groupby("part")
        .map_groups(wedge_pairs, batch_format="pandas")
        .union(cpairs.map_batches(tag_edges, batch_format="pandas"))
        .groupby("part2")
        .map_groups(inner_merge, batch_format="pandas")
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
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        pairs = np.unique(np.stack([u, v], axis=1), axis=0)
        return pa.table(
            {
                "u": pa.array(pairs[:, 0]),
                "v": pa.array(pairs[:, 1]),
                "part": pa.array((pairs[:, 0] * 31 + pairs[:, 1]) % B),
            }
        )

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        pairs = np.unique(
            np.stack([g["u"].to_numpy(), g["v"].to_numpy()], axis=1), axis=0
        )
        return pd.DataFrame({"u": pairs[:, 0], "v": pairs[:, 1]})

    pairs = (
        edges.map_batches(canon, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("part")
        .map_groups(dedup_pairs, batch_format="pandas")
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
        pairs = np.unique(
            np.stack([np.minimum(s, d), np.maximum(s, d)], axis=1), axis=0
        )
        return pa.table({"u": pa.array(pairs[:, 0]), "v": pa.array(pairs[:, 1])})

    cpairs = edges.map_batches(canon, batch_format="pyarrow", batch_size=1 << 20)
    # global dedup of canonical pairs: bucket by pair hash, unique per group
    B = max(P * 4, 16)

    def bucket(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        return pa.table(
            {"u": t.column("u"), "v": t.column("v"), "part": pa.array((u * 31 + v) % B)}
        )

    def dedup_count(g: pd.DataFrame) -> pd.DataFrame:
        pairs = np.unique(
            np.stack([g["u"].to_numpy(), g["v"].to_numpy()], axis=1), axis=0
        )
        ends = np.concatenate([pairs[:, 0], pairs[:, 1]])
        ids, cnt = np.unique(ends, return_counts=True)  # in-bucket combiner
        return pd.DataFrame({"v": ids, "_c": cnt.astype(np.int64)})

    deg = (
        cpairs.map_batches(bucket, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("part")
        .map_groups(dedup_count, batch_format="pandas")
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
