"""Triangle counting over the canonical edge table — bucketed joins.

Reference parity: test/count_triangles.c:90-133 counts each triangle at
one distinguished vertex by adjacency intersection. Here: degree
orientation + wedge closure, expressed as hash-bucketed map_groups
rounds (every shuffle has exactly B groups, every group body is
vectorized numpy / pandas-merge — no per-vertex Python, no broadcast of
the edge set):

  1. canonicalize (u < v unique) — bucket by pair hash, np.unique per bucket
  2. degrees — partial counts per batch, combined inside the join buckets
  3. orient each edge from smaller (degree, id) to larger: max out-degree
     becomes O(sqrt(m)), bounding hub wedge explosion (the power-law
     skew handling for this operator)
  4. wedges per source, pairs keyed (min_id, max_id)
  5. closure: wedge (b, c) joins canonical edge (b, c) — bucketed merge,
     sum of wedge multiplicities = triangle count.

All rows travel in one uniform narrow schema (part, kind, k1, k2, w) so
tagged unions stay zero-copy Arrow.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _rows(part, kind, k1, k2, w) -> pa.Table:
    n = len(part)
    return pa.table(
        {
            "part": pa.array(part, pa.int64()),
            "kind": pa.array(np.broadcast_to(np.int64(kind), (n,)) if np.isscalar(kind) else kind, pa.int64()),
            "k1": pa.array(k1, pa.int64()),
            "k2": pa.array(k2, pa.int64()),
            "w": pa.array(w if not np.isscalar(w) else np.broadcast_to(np.int64(w), (n,)), pa.int64()),
        }
    )


def _canonical_bucketed(edges: Dataset, B: int) -> Dataset:
    """unique (u < v) pairs, bucketed by pair hash with per-bucket np.unique."""

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64, copy=False)
        d = t.column("dst").to_numpy().astype(np.int64, copy=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        pairs = np.unique(np.stack([u, v], axis=1), axis=0)  # in-batch combiner
        u, v = pairs[:, 0], pairs[:, 1]
        part = (u + 31 * v) % B
        return _rows(part, 0, u, v, 0)

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        pairs = np.unique(
            np.stack([g["k1"].to_numpy(), g["k2"].to_numpy()], axis=1), axis=0
        )
        return pd.DataFrame({"u": pairs[:, 0], "v": pairs[:, 1]})

    return (
        edges.map_batches(canon, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(dedup, batch_format="pandas")
    )


def _degree_oriented(canon: Dataset, B: int) -> Dataset:
    """canonical (u, v) edges -> rows (part = a % B, k1 = a, k2 = b)
    oriented from smaller (degree, id) to larger — max out-degree
    becomes O(sqrt(m)), bounding hub wedge explosion."""

    # --- degree partials ------------------------------------------------
    def deg_partial(t: pa.Table) -> pa.Table:
        x = np.concatenate(
            [t.column("u").to_numpy(), t.column("v").to_numpy()]
        )
        ids, cnt = np.unique(x, return_counts=True)
        return _rows(ids % B, 1, ids, np.zeros(len(ids), np.int64), cnt.astype(np.int64))

    partials = canon.map_batches(deg_partial, batch_format="pyarrow", batch_size=131072)

    # --- join degree onto endpoint col (two bucketed rounds) -----------
    def tag_edges(col: str):
        def fn(t: pa.Table) -> pa.Table:
            u = t.column("u").to_numpy()
            v = t.column("v").to_numpy()
            du = (
                t.column("du").to_numpy()
                if "du" in t.column_names
                else np.zeros(len(u), np.int64)
            )
            key = u if col == "u" else v
            return _rows(key % B, 0, u, v, du)

        return fn

    def join_round(col: str):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["kind"] == 0]
            d = g[g["kind"] == 1].groupby("k1", as_index=False)["w"].sum()
            if len(e) == 0:
                return pd.DataFrame({"u": [], "v": [], "du": [], "dv": []}).astype(np.int64)
            key = e["k1"] if col == "u" else e["k2"]
            m = pd.DataFrame(
                {"u": e["k1"].to_numpy(), "v": e["k2"].to_numpy(), "prev": e["w"].to_numpy(), "key": key.to_numpy()}
            ).merge(d.rename(columns={"k1": "key", "w": "deg"}), on="key", how="left")
            if col == "u":
                return pd.DataFrame({"u": m["u"], "v": m["v"], "du": m["deg"].astype(np.int64)})
            return pd.DataFrame(
                {"u": m["u"], "v": m["v"], "du": m["prev"], "dv": m["deg"].astype(np.int64)}
            )

        return fn

    r1 = (
        canon.map_batches(tag_edges("u"), batch_format="pyarrow", batch_size=131072)
        .union(partials)
        .groupby("part")
        .map_groups(join_round("u"), batch_format="pandas")
    )

    def tag_r1(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy()
        return _rows(v % B, 0, t.column("u").to_numpy(), v, t.column("du").to_numpy())

    r2 = (
        r1.map_batches(tag_r1, batch_format="pyarrow", batch_size=131072)
        .union(partials)
        .groupby("part")
        .map_groups(join_round("v"), batch_format="pandas")
    )

    # --- orient ---------------------------------------------------------
    def orient(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        du = t.column("du").to_numpy()
        dv = t.column("dv").to_numpy()
        fwd = (du < dv) | ((du == dv) & (u < v))
        a = np.where(fwd, u, v)
        b = np.where(fwd, v, u)
        return _rows(a % B, 0, a, b, 0)

    return r2.map_batches(orient, batch_format="pyarrow", batch_size=131072)


def triangle_count(edges: Dataset, num_partitions: int | None = None) -> int:
    """Global triangle count of the undirected simple graph."""
    B = num_partitions or 32
    canon = _canonical_bucketed(edges, B).materialize()
    if canon.count() == 0:
        return 0
    oriented = _degree_oriented(canon, B)

    def wedge_gen(g: pd.DataFrame) -> pd.DataFrame:
        a = g["k1"].to_numpy()
        b = g["k2"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[starts[1:], len(a)]
        outs = []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, 1)
            nb = b[s:e]
            outs.append(np.stack([nb[i], nb[j]], axis=1))
        if not outs:
            return pd.DataFrame({"b": [], "c": [], "w": []}).astype(np.int64)
        pairs = np.concatenate(outs)  # already (min, max): nb sorted ascending
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pd.DataFrame({"b": uniq[:, 0], "c": uniq[:, 1], "w": cnt.astype(np.int64)})

    wedges = oriented.groupby("part").map_groups(wedge_gen, batch_format="pandas")

    # --- closure: wedge (b,c) must be a canonical edge ------------------
    def tag_wedges(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy()
        c = t.column("c").to_numpy()
        return _rows((b + 31 * c) % B, 1, b, c, t.column("w").to_numpy())

    def tag_canon(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        return _rows((u + 31 * v) % B, 0, u, v, 0)

    def close(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0][["k1", "k2"]]
        w = g[g["kind"] == 1][["k1", "k2", "w"]]
        if len(e) == 0 or len(w) == 0:
            return pd.DataFrame({"t": [0]})
        m = w.merge(e, on=["k1", "k2"], how="inner")
        return pd.DataFrame({"t": [int(m["w"].sum())]})

    closed = (
        wedges.map_batches(tag_wedges, batch_format="pyarrow", batch_size=131072)
        .union(canon.map_batches(tag_canon, batch_format="pyarrow", batch_size=131072))
        .groupby("part")
        .map_groups(close, batch_format="pandas")
    )
    return int(sum(r["t"] for r in closed.take_all()))


def triangle_counts_per_vertex(
    edges: Dataset, num_partitions: int | None = None
) -> Dataset:
    """Per-vertex triangle counts (v, n_triangles), vertices in >= 1
    triangle only — reference parity: test/count_triangles.c:90-133
    stores each triangle's count at a distinguished vertex; here every
    triangle credits all three corners (the count a user wants; the
    reference's global sum is ``triangle_count``).

    Same degree-oriented wedge pipeline as :func:`triangle_count`, but
    wedges keep their center vertex (no (b, c) compression) so each
    closed wedge names its full triangle (a, b, c); a final bucketed
    count aggregates per corner. Wedge volume is bounded by the
    sqrt(m) orientation cap exactly like the global count."""
    import pyarrow.compute as pc

    B = num_partitions or 32
    canon = _canonical_bucketed(edges, B).materialize()
    if canon.count() == 0:
        return canon.map_batches(
            lambda t: pa.table(
                {"v": pa.array([], pa.int64()), "n_triangles": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
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

    def close_per_vertex(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0][["k1", "k2"]]
        w = g[g["kind"] == 1][["k1", "k2", "w"]]
        if len(e) == 0 or len(w) == 0:
            return pd.DataFrame({"v": [], "n": []}).astype(np.int64)
        m = w.merge(e, on=["k1", "k2"], how="inner")
        # each closed wedge is one triangle (ctr=w, b=k1, c=k2); credit
        # every corner, combiner-count inside the bucket
        corners = np.concatenate(
            [m["w"].to_numpy(), m["k1"].to_numpy(), m["k2"].to_numpy()]
        )
        ids, cnt = np.unique(corners, return_counts=True)
        return pd.DataFrame({"v": ids, "n": cnt.astype(np.int64)})

    per_bucket = (
        wedges.map_batches(tag_wedges, batch_format="pyarrow", batch_size=131072)
        .union(canon.map_batches(tag_canon, batch_format="pyarrow", batch_size=131072))
        .groupby("part")
        .map_groups(close_per_vertex, batch_format="pandas")
    )
    from ray.data.aggregate import Sum

    return (
        per_bucket.groupby("v")
        .aggregate(Sum("n", alias_name="n_triangles"))
        .select_columns(["v", "n_triangles"])
    )
