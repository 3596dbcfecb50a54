"""Triangle counting over the canonical edge table — bucketed joins.

Reference parity: test/count_triangles.c:90-133 counts each triangle at
one distinguished vertex by adjacency intersection. Here: degree
orientation + wedge closure, expressed as hash-bucketed map_groups
rounds (every shuffle has exactly B groups, every group body is
vectorized numpy over zero-copy Arrow columns — no per-vertex Python,
no pandas round-trips, no broadcast of the edge set):

  1. canonicalize (u < v unique) — combiner + sort-distinct (distinct_pairs)
  2. degrees — partial counts per batch, combined inside the join buckets
  3. orient each edge from smaller (degree, id) to larger: max out-degree
     becomes O(sqrt(m)), bounding hub wedge explosion (the power-law
     skew handling for this operator)
  4. wedges per source, pairs keyed (min_id, max_id)
  5. closure: wedge (b, c) joins canonical edge (b, c) — bucketed
     sorted-key membership, sum of wedge multiplicities = triangle count.

All rows travel in one uniform narrow schema (part, kind, k1, k2, w) so
tagged unions stay zero-copy Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..segops import pair_unique, pair_unique_counts


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


def _i64(values) -> pa.Array:
    return pa.array(np.asarray(values, np.int64), pa.int64())


def _pack2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """16-byte big-endian (a, b) keys — memcmp-sortable, so one
    searchsorted does the pair join inside a bucket."""
    k = np.empty((len(a), 2), dtype=">i8")
    k[:, 0] = a
    k[:, 1] = b
    return k.reshape(-1).view("V16")


def _member(keys_sorted: np.ndarray, probe: np.ndarray) -> np.ndarray:
    if len(keys_sorted) == 0 or len(probe) == 0:
        return np.zeros(len(probe), bool)
    idx = np.clip(np.searchsorted(keys_sorted, probe), 0, len(keys_sorted) - 1)
    return keys_sorted[idx] == probe


def _all_pairs_per_run(a: np.ndarray, b: np.ndarray):
    """For rows sorted by a (b ascending within each a-run), emit every
    within-run pair (i < j) fully vectorized: returns (ii, jj) global
    index arrays — no per-run Python loop (the wedge hot path)."""
    n = len(a)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
    run_start = np.repeat(starts, np.diff(np.r_[starts, n]))  # per element
    lj = np.arange(n, dtype=np.int64) - run_start  # local index == #pairs as j
    tot = int(lj.sum())
    if tot == 0:
        z = np.zeros(0, np.int64)
        return z, z
    jj = np.repeat(np.arange(n, dtype=np.int64), lj)
    off = np.cumsum(lj) - lj
    step = np.arange(tot, dtype=np.int64) - np.repeat(off, lj)
    ii = np.repeat(run_start, lj) + step
    return ii, jj


def _all_pairs_per_run_slabbed(a: np.ndarray, b: np.ndarray, max_pairs: int = 1 << 22):
    """Yield the `_all_pairs_per_run` pair stream in slabs of at most
    ~``max_pairs`` pairs so an O(d^2) hub run never materializes all its
    pairs at once (round-3 ADVICE: unoriented adjacency buckets can hold
    degree-d hubs where C(d, 2) alone OOMs the worker). Slab boundaries
    cut in j-position space — each j contributes its local-run index in
    pairs — so a single giant run is itself split; the residual bound is
    one j-row (O(d) pairs), never O(d^2)."""
    n = len(a)
    if n == 0:
        return
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
    run_start = np.repeat(starts, np.diff(np.r_[starts, n]))
    lj = np.arange(n, dtype=np.int64) - run_start  # pairs contributed as j
    cum = np.cumsum(lj)
    if int(cum[-1]) == 0:
        return
    lo = 0
    while lo < n:
        target = (int(cum[lo - 1]) if lo else 0) + max_pairs
        hi = int(np.searchsorted(cum, target, side="left")) + 1
        hi = min(max(hi, lo + 1), n)
        ljs = lj[lo:hi]
        stot = int(ljs.sum())
        if stot:
            jj = np.repeat(np.arange(lo, hi, dtype=np.int64), ljs)
            off = np.cumsum(ljs) - ljs
            step = np.arange(stot, dtype=np.int64) - np.repeat(off, ljs)
            ii = np.repeat(run_start[lo:hi], ljs) + step
            yield ii, jj
        lo = hi


def _canonical_bucketed(edges: Dataset, B: int) -> Dataset:
    """unique (u < v) pairs: in-batch lexsort combiner + global
    sort+adjacent-mask distinct (see edges.distinct_pairs — measured
    ~5-10x faster than the old bucket-hash groupby/map_groups).
    ``B`` kept for signature compatibility (unused here)."""

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy().astype(np.int64, copy=False)
        d = t.column("dst").to_numpy().astype(np.int64, copy=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u, v = pair_unique(np.minimum(s, d), np.maximum(s, d))  # combiner
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    from ..edges import distinct_pairs

    return distinct_pairs(
        edges.map_batches(canon, batch_format="pyarrow", batch_size=131072),
        "u",
        "v",
    )


def _edges_with_degrees(canon: Dataset, B: int) -> Dataset:
    """canonical (u, v) edges annotated with both endpoint degrees
    (u, v, du, dv) — two bucketed join rounds against per-batch degree
    partials (no degree table broadcast)."""

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
        def fn(t: pa.Table) -> pa.Table:
            kind = t.column("kind").to_numpy()
            k1 = t.column("k1").to_numpy()
            k2 = t.column("k2").to_numpy()
            w = t.column("w").to_numpy()
            em = kind == 0
            u, v, prev = k1[em], k2[em], w[em]
            cols = ["u", "v", "du"] if col == "u" else ["u", "v", "du", "dv"]
            if len(u) == 0:
                return pa.table({c: pa.array([], pa.int64()) for c in cols})
            dm = ~em
            uids, inv = np.unique(k1[dm], return_inverse=True)
            deg = np.bincount(inv, weights=w[dm]).astype(np.int64)
            key = u if col == "u" else v
            # every endpoint's degree partial lands in this bucket (same
            # key % B routing), so the lookup always hits
            deg_of = deg[np.searchsorted(uids, key)]
            if col == "u":
                vals = [u, v, deg_of]
            else:
                vals = [u, v, prev, deg_of]
            return pa.table({c: _i64(x) for c, x in zip(cols, vals)})

        return fn

    r1 = (
        canon.map_batches(tag_edges("u"), batch_format="pyarrow", batch_size=131072)
        .union(partials)
        .groupby("part")
        .map_groups(join_round("u"), batch_format="pyarrow")
    )

    def tag_r1(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy()
        return _rows(v % B, 0, t.column("u").to_numpy(), v, t.column("du").to_numpy())

    return (
        r1.map_batches(tag_r1, batch_format="pyarrow", batch_size=131072)
        .union(partials)
        .groupby("part")
        .map_groups(join_round("v"), batch_format="pyarrow")
    )


def _degree_oriented(canon: Dataset, B: int) -> Dataset:
    """canonical (u, v) edges -> rows (part = a % B, k1 = a, k2 = b)
    oriented from smaller (degree, id) to larger — max out-degree
    becomes O(sqrt(m)), bounding hub wedge explosion."""
    r2 = _edges_with_degrees(canon, B)

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


def _sorted_runs(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    a = t.column("k1").to_numpy()
    b = t.column("k2").to_numpy()
    order = np.lexsort((b, a))
    return a[order], b[order]


def triangle_count(edges: Dataset, num_partitions: int | None = None) -> int:
    """Global triangle count of the undirected simple graph."""
    B = num_partitions or 32
    canon = _canonical_bucketed(edges, B).materialize()
    if canon.count() == 0:
        return 0
    oriented = _degree_oriented(canon, B)

    def wedge_gen(t: pa.Table) -> pa.Table:
        a, b = _sorted_runs(t)
        ii, jj = _all_pairs_per_run(a, b)
        if len(ii) == 0:
            e = pa.array([], pa.int64())
            return pa.table({"b": e, "c": e, "w": e})
        # b ascending within each a-run, ii < jj -> pairs arrive (min, max)
        ub, uc, cnt = pair_unique_counts(b[ii], b[jj])
        return pa.table({"b": _i64(ub), "c": _i64(uc), "w": _i64(cnt)})

    wedges = oriented.groupby("part").map_groups(wedge_gen, batch_format="pyarrow")

    # --- closure: wedge (b,c) must be a canonical edge ------------------
    def tag_wedges(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy()
        c = t.column("c").to_numpy()
        return _rows((b + 31 * c) % B, 1, b, c, t.column("w").to_numpy())

    def tag_canon(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        return _rows((u + 31 * v) % B, 0, u, v, 0)

    def close(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy()
        k1 = t.column("k1").to_numpy()
        k2 = t.column("k2").to_numpy()
        w = t.column("w").to_numpy()
        em = kind == 0
        ke = np.sort(_pack2(k1[em], k2[em]))
        wm = ~em
        hit = _member(ke, _pack2(k1[wm], k2[wm]))
        return pa.table({"t": pa.array([int(w[wm][hit].sum())], pa.int64())})

    closed = (
        wedges.map_batches(tag_wedges, batch_format="pyarrow", batch_size=131072)
        .union(canon.map_batches(tag_canon, batch_format="pyarrow", batch_size=131072))
        .groupby("part")
        .map_groups(close, batch_format="pyarrow")
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

    def close_per_vertex(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy()
        k1 = t.column("k1").to_numpy()
        k2 = t.column("k2").to_numpy()
        w = t.column("w").to_numpy()
        em = kind == 0
        ke = np.sort(_pack2(k1[em], k2[em]))
        wm = ~em
        hit = _member(ke, _pack2(k1[wm], k2[wm]))
        if not hit.any():
            e = pa.array([], pa.int64())
            return pa.table({"v": e, "n": e})
        # each closed wedge is one triangle (ctr=w, b=k1, c=k2); credit
        # every corner, combiner-count inside the bucket
        corners = np.concatenate([w[wm][hit], k1[wm][hit], k2[wm][hit]])
        ids, cnt = np.unique(corners, return_counts=True)
        return pa.table({"v": _i64(ids), "n": _i64(cnt)})

    per_bucket = (
        wedges.map_batches(tag_wedges, batch_format="pyarrow", batch_size=131072)
        .union(canon.map_batches(tag_canon, batch_format="pyarrow", batch_size=131072))
        .groupby("part")
        .map_groups(close_per_vertex, batch_format="pyarrow")
    )
    from ray.data.aggregate import Sum

    return (
        per_bucket.groupby("v")
        .aggregate(Sum("n", alias_name="n_triangles"))
        .select_columns(["v", "n_triangles"])
    )


def _edge_supports(canon: Dataset, B: int) -> Dataset:
    """canonical (u, v) edges -> (u, v, sup): per-edge triangle support.
    Same degree-oriented centered-wedge closure as
    :func:`triangle_counts_per_vertex`, but each closed wedge credits
    its triangle's three EDGES instead of its corners; partial counts
    combine in-bucket, one range sort finalizes (the dup_spans
    merge-sum pattern). Edges in no triangle produce no row."""
    from ..segops import pair_unique_counts

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

    def close_per_edge(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy()
        k1 = t.column("k1").to_numpy()
        k2 = t.column("k2").to_numpy()
        w = t.column("w").to_numpy()
        em = kind == 0
        ke = np.sort(_pack2(k1[em], k2[em]))
        wm = ~em
        hit = _member(ke, _pack2(k1[wm], k2[wm]))
        if not hit.any():
            e = pa.array([], pa.int64())
            return pa.table({"u": e, "v": e, "cnt": e})
        ctr, b, c = w[wm][hit], k1[wm][hit], k2[wm][hit]
        # the triangle (ctr, b, c) supports edges (ctr,b), (ctr,c), (b,c)
        ea = np.concatenate([np.minimum(ctr, b), np.minimum(ctr, c), b])
        eb = np.concatenate([np.maximum(ctr, b), np.maximum(ctr, c), c])
        u, v, cnt = pair_unique_counts(ea, eb)  # in-bucket combiner
        return pa.table({"u": _i64(u), "v": _i64(v), "cnt": _i64(cnt)})

    partial = (
        wedges.map_batches(tag_wedges, batch_format="pyarrow", batch_size=131072)
        .union(canon.map_batches(tag_canon, batch_format="pyarrow", batch_size=131072))
        .groupby("part")
        .map_groups(close_per_edge, batch_format="pyarrow")
    )

    def merge_counts(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        c = t.column("cnt").to_numpy()
        if len(u) == 0:
            e = pa.array([], pa.int64())
            return pa.table({"u": e, "v": e, "sup": e})
        new = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        gid = np.cumsum(new) - 1
        tot = np.bincount(gid, weights=c).astype(np.int64)
        st = np.flatnonzero(new)
        return pa.table({"u": _i64(u[st]), "v": _i64(v[st]), "sup": _i64(tot)})

    return partial.sort(["u", "v"]).map_batches(
        merge_counts, batch_format="pyarrow", batch_size=None
    )


def ktruss(
    edges: Dataset,
    k: int = 3,
    num_partitions: int | None = None,
    max_rounds: int = 64,
) -> Dataset:
    """k-truss subgraph: the maximal edge set where every edge sits in
    >= k-2 triangles OF THE SUBGRAPH — iterative support peel to the
    fixpoint (the edge analogue of k-core; k >= 3). Returns canonical
    (u, v) rows.

    Each peel round is one bucketed triangle enumeration over the
    surviving edges (O(m^1.5) work bounded by the degree orientation,
    never materialized on the driver); rounds end at the first
    no-change pass. (Reference analogue: SURVEY.md §2.5 community /
    dense-subgraph mining; SQL oracle = unrolled peel rounds, the
    kcore_peel pattern.)"""
    assert k >= 3, "2-truss is the whole graph; k-truss needs k >= 3"
    B = num_partitions or 32
    cur = _canonical_bucketed(edges, B).materialize()
    n_cur = cur.count()

    def keep_fn(t: pa.Table) -> pa.Table:
        m = t.column("sup").to_numpy() >= (k - 2)
        return pa.table(
            {"u": t.column("u").filter(pa.array(m)), "v": t.column("v").filter(pa.array(m))}
        )

    for _ in range(max_rounds):
        if n_cur == 0:
            break
        nxt = (
            _edge_supports(cur, B)
            .map_batches(keep_fn, batch_format="pyarrow")
            .materialize()
        )
        n_nxt = nxt.count()
        if n_nxt == n_cur:
            break
        cur, n_cur = nxt, n_nxt
    return cur
