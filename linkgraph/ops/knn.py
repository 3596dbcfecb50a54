"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k: the query matrix is broadcast once
(``ray.put``), every batch computes a vectorized matmul and emits its
local top-k per query (combiner), then a tiny groupby finalizes global
top-k — so the shuffle carries at most k rows per (query, block).

The scale path (``knn_cosine_lsh``) buckets vectors by random
hyperplane signs and only scores within matching buckets — approximate,
recall grows with n_tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..hashing import splitmix64


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def _emb_matrix(t: pa.Table, col: str = "emb") -> np.ndarray:
    """Fixed-dim list<float> column -> (n, dim) float64 matrix via one
    zero-copy flatten + reshape (no per-row object boxing)."""
    arr = t.column(col).combine_chunks()
    return arr.flatten().to_numpy().reshape(len(arr), -1).astype(np.float64)


def _first_pair_idx(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Indices of one representative per distinct (a, b) pair, in
    original order (the numpy drop_duplicates)."""
    k = np.empty((len(a), 2), dtype=">i8")
    k[:, 0] = a
    k[:, 1] = b
    _, idx = np.unique(k.reshape(-1).view("V16"), return_index=True)
    return np.sort(idx)


def knn_cosine(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> Dataset:
    """Exact top-k cosine neighbors for the given query vector ids.

    Returns (query_id, neighbor_id, rank) — rank 1..k ordered by
    (sim desc, neighbor_id asc) for determinism on ties."""
    import ray

    import pyarrow.compute as pc

    qset = sorted(set(int(q) for q in query_ids))
    qdf = embeddings.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=pa.array(qset, pa.int64()))),
        batch_format="pyarrow",
    ).to_pandas()
    q_ids = qdf[id_col].to_numpy().astype(np.int64)
    Q = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((q_ids, Q))

    # STATELESS tasks, not an actor pool: the per-task state is one
    # tiny broadcast (the query matrix, ray.put once; ray.get of a
    # local shared object is ~µs per task), so actor-pool startup buys
    # nothing and measured as ~4s of a ~5s stage. Actor pools remain
    # where per-actor setup is real work (LSH tables, IVF lists).
    def local_topk(t: pa.Table) -> pa.Table:
        q_ids_, Q_ = ray.get(ref)
        ids = t.column(id_col).to_numpy().astype(np.int64)
        B = _normalize(
            np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        sims = Q_ @ B.T  # (nq, nb)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids_)):
            s = sims[qi]
            cand = np.arange(len(ids))
            if exclude_self:
                cand = cand[ids != q_ids_[qi]]
            if len(cand) == 0:
                continue
            # local top-k by (sim desc, id asc)
            order = np.lexsort((ids[cand], -s[cand]))[:k]
            sel = cand[order]
            out_q.append(np.full(len(sel), q_ids_[qi], np.int64))
            out_n.append(ids[sel])
            out_s.append(s[sel])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    local = embeddings.map_batches(local_topk, batch_format="pyarrow")
    return _combine_topk(local, k)


def _final_topk_all(k: int, dedup: bool = False):
    """ALL queries' global top-k in ONE vectorized pass over the
    combined local-topk rows (lexsort by (query, sim desc, id asc) +
    per-run rank) — the fan-in finalizer used when the combined rows
    are small (they are bounded by n_queries x k x n_blocks)."""

    def fn(t: pa.Table) -> pa.Table:
        e_ = pa.array([], pa.int64())
        if t.num_rows == 0:
            return pa.table({"query_id": e_, "neighbor_id": e_, "rank": e_})
        order = np.lexsort(
            (
                t.column("neighbor_id").to_numpy(),
                -t.column("sim").to_numpy(),
                t.column("query_id").to_numpy(),
            )
        )
        q = t.column("query_id").to_numpy()[order]
        n_ = t.column("neighbor_id").to_numpy()[order]
        if dedup:
            # a (q, n) pair found in several tables/lists has the same
            # sim, so duplicates are adjacent after the sort
            m = np.empty(len(q), bool)
            m[0] = True
            m[1:] = (q[1:] != q[:-1]) | (n_[1:] != n_[:-1])
            q, n_ = q[m], n_[m]
        new = np.empty(len(q), bool)
        new[0] = True
        new[1:] = q[1:] != q[:-1]
        starts = np.flatnonzero(new)
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(q)]))
        li = np.arange(len(q), dtype=np.int64) - run_start
        keep = li < k
        return pa.table(
            {
                "query_id": pa.array(q[keep].astype(np.int64)),
                "neighbor_id": pa.array(n_[keep].astype(np.int64)),
                "rank": pa.array(li[keep] + 1),
            }
        )

    return fn


def _combine_topk(local: Dataset, k: int, dedup: bool = False) -> Dataset:
    """Finalize per-block local top-k rows into global per-query top-k.

    The combined rows are analytically bounded (n_queries x k x
    n_blocks), so the normal path is a single fan-in task (one
    vectorized multi-query finalizer) — replacing a full
    groupby("query_id") sort shuffle that cost ~2s of pure machinery
    for a few hundred rows. A cardinality guard keeps the groupby path
    for pathological block counts."""
    mat = local.materialize()
    if mat.count() <= 4_000_000:
        return mat.repartition(1).map_batches(
            _final_topk_all(k, dedup=dedup), batch_format="pyarrow", batch_size=None
        )
    return mat.groupby("query_id").map_groups(
        _final_topk(k, dedup=dedup), batch_format="pyarrow"
    )


def _final_topk(k: int, dedup: bool = False):
    """Per-query-group global top-k (sim desc, neighbor_id asc), ranked
    1..k — vectorized over the Arrow group, no pandas round-trip."""

    def fn(t: pa.Table) -> pa.Table:
        qid = t.column("query_id").to_numpy()
        nid = t.column("neighbor_id").to_numpy()
        sim = t.column("sim").to_numpy()
        if dedup:
            # a (q, n) pair colliding in several tables has the same sim
            keep = _first_pair_idx(qid, nid)
            qid, nid, sim = qid[keep], nid[keep], sim[keep]
        order = np.lexsort((nid, -sim))[:k]
        return pa.table(
            {
                "query_id": pa.array(qid[order].astype(np.int64)),
                "neighbor_id": pa.array(nid[order].astype(np.int64)),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return fn


def _deterministic_planes(n_tables: int, n_planes: int, dim: int, seed: int = 7) -> np.ndarray:
    raw = splitmix64(
        np.arange(n_tables * n_planes * dim, dtype=np.uint64) + np.uint64(seed)
    )
    return ((raw.astype(np.float64) / 2**64) - 0.5).reshape(n_tables, n_planes, dim)


def _embedding_dim(embeddings: Dataset) -> int:
    row = embeddings.limit(1).take(1)[0]
    return len(row["embedding"])


class _LshBucketRows:
    """Emit one row per (vector, table): hyperplane sign code + the
    normalized embedding, bucketed by hash(table, code). Stateful actor:
    planes built once per actor in __init__."""

    def __init__(self, n_tables: int, n_planes: int, dim: int, id_col: str, B: int):
        self.planes = _deterministic_planes(n_tables, n_planes, dim)
        self.id_col = id_col
        self.B = B

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_numpy().astype(np.int64)
        M = _normalize(
            np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        T, Pn, dim = self.planes.shape
        n = len(ids)
        signs = np.einsum("tpd,nd->tnp", self.planes, M) > 0  # (T, n, Pn)
        codes = np.zeros((T, n), np.int64)
        for p in range(Pn):
            codes |= signs[:, :, p].astype(np.int64) << p
        table = np.repeat(np.arange(T, dtype=np.int64), n)
        code = codes.reshape(-1)
        vid = np.tile(ids, T)
        part = splitmix64(
            (table * np.int64(1_000_003) + code).astype(np.uint64)
        ).view(np.int64) % self.B
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(M, (T, 1)).reshape(-1)), dim
        )
        return pa.table(
            {
                "part": pa.array(part),
                "table": pa.array(table),
                "code": pa.array(code),
                "vid": pa.array(vid),
                "emb": emb,
            }
        )


def knn_cosine_lsh(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    num_buckets: int = 64,
) -> Dataset:
    """Approximate top-k cosine neighbors — fully distributed:

    map_batches emits (table, plane-sign code) bucket rows carrying the
    normalized vector -> ONE groupby(part) shuffle -> vectorized exact
    scoring of query x member inside each (table, code) segment ->
    per-query global top-k. Cost tracks bucket collisions, never n^2,
    and nothing is collected on the driver (the round-1 version was a
    driver-side triple loop). Recall grows with n_tables; deterministic
    seeded planes."""
    qset = np.array(sorted(set(int(q) for q in query_ids)), np.int64)
    dim = _embedding_dim(embeddings)
    rows = embeddings.map_batches(
        _LshBucketRows,
        batch_format="pyarrow",
        batch_size=32768,
        concurrency=(1, 4),
        fn_constructor_args=(n_tables, n_planes, dim, id_col, num_buckets),
    )

    def score_bucket(t: pa.Table) -> pa.Table:
        tb = t.column("table").to_numpy()
        cd = t.column("code").to_numpy()
        ids = t.column("vid").to_numpy()
        M = _emb_matrix(t)
        order = np.lexsort((ids, cd, tb))
        tb, cd, ids, M = tb[order], cd[order], ids[order], M[order]
        isq = np.isin(ids, qset)
        new = np.r_[True, (tb[1:] != tb[:-1]) | (cd[1:] != cd[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(tb)]
        out_q, out_n, out_s = [], [], []
        for s, e in zip(starts, ends):
            qi = np.flatnonzero(isq[s:e])
            if len(qi) == 0 or e - s < 2:
                continue
            Q = M[s:e][qi]
            sims = Q @ M[s:e].T  # (nq, m)
            qid = ids[s:e][qi]
            nid = ids[s:e]
            for r in range(len(qi)):
                keep = nid != qid[r]
                out_q.append(np.full(int(keep.sum()), qid[r], np.int64))
                out_n.append(nid[keep])
                out_s.append(sims[r][keep])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        q = np.concatenate(out_q)
        n = np.concatenate(out_n)
        s = np.concatenate(out_s)
        # in-bucket combiner: a (q, n) pair can collide in many tables
        keep = _first_pair_idx(q, n)
        return pa.table(
            {
                "query_id": pa.array(q[keep]),
                "neighbor_id": pa.array(n[keep].astype(np.int64)),
                "sim": pa.array(s[keep].astype(np.float64)),
            }
        )

    local = rows.groupby("part").map_groups(score_bucket, batch_format="pyarrow")
    return _combine_topk(local, k, dedup=True)


def train_ivf_centroids(
    embeddings: Dataset,
    n_lists: int,
    id_col: str = "vec_id",
    sample_cap: int = 65536,
    iters: int = 8,
    seed: int = 11,
) -> np.ndarray:
    """Train IVF coarse-quantizer centroids on a BOUNDED deterministic
    sample (FAISS-style: k-means on <= sample_cap vectors regardless of
    corpus size, so the driver never holds more than sample_cap x dim).
    Sampling key is splitmix64(id) — stable across runs and cluster
    sizes. Returns (n_lists, dim) L2-normalized centroids."""
    n = embeddings.count()
    frac = min(1.0, sample_cap / max(n, 1))

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        u = splitmix64(ids.view(np.uint64)).astype(np.float64) / 2**64
        return t.take(pa.array(np.flatnonzero(u < frac)))

    sdf = embeddings.map_batches(keep, batch_format="pyarrow").to_pandas()
    if len(sdf) == 0:
        # empty corpus (or the sample missed everything): no quantizer
        # to train — callers fall back to _empty_knn on the empty set.
        return np.zeros((0, 0), np.float64)
    X = _normalize(np.stack(sdf["embedding"].to_numpy()).astype(np.float64))
    k = min(n_lists, len(X))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), k, replace=False)]
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)  # cosine assignment (all normalized)
        sums = np.zeros_like(C)
        np.add.at(sums, a, X)
        cnt = np.bincount(a, minlength=k).astype(np.float64)
        nz = cnt > 0
        C[nz] = sums[nz] / cnt[nz, None]  # empty lists keep old centroid
        C = _normalize(C)
    return C


class _IvfAssignRows:
    """Emit IVF rows: every vector -> its home list (member row); every
    query vector -> its nprobe nearest lists (probe rows). Centroids are
    fetched once per actor in __init__ (broadcast via ray.put)."""

    def __init__(self, cref, qref, nprobe: int, id_col: str, B: int):
        import ray

        self.C = ray.get(cref)
        self.qset = None if qref is None else ray.get(qref)
        self.nprobe = min(nprobe, len(self.C))
        self.id_col = id_col
        self.B = B

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_numpy().astype(np.int64)
        M = _normalize(
            np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        sims = M @ self.C.T  # (n, n_lists)
        home = np.argmax(sims, axis=1).astype(np.int64)
        n, dim = M.shape
        out_list = [home]
        out_vid = [ids]
        out_isq = [np.zeros(n, np.int8)]
        out_rows = [np.arange(n)]
        # qset None = every vector is a query (kNN-graph construction)
        qpos = (
            np.arange(n) if self.qset is None else np.flatnonzero(np.isin(ids, self.qset))
        )
        if len(qpos):
            # top-nprobe lists per query (includes its home list)
            top = np.argpartition(-sims[qpos], self.nprobe - 1, axis=1)[:, : self.nprobe]
            out_list.append(top.reshape(-1).astype(np.int64))
            out_vid.append(np.repeat(ids[qpos], self.nprobe))
            out_isq.append(np.ones(len(qpos) * self.nprobe, np.int8))
            out_rows.append(np.repeat(qpos, self.nprobe))
        lst = np.concatenate(out_list)
        rows = np.concatenate(out_rows)
        part = splitmix64(lst.astype(np.uint64)).view(np.int64) % self.B
        emb = pa.FixedSizeListArray.from_arrays(pa.array(M[rows].reshape(-1)), dim)
        return pa.table(
            {
                "part": pa.array(part),
                "list": pa.array(lst),
                "vid": pa.array(np.concatenate(out_vid)),
                "isq": pa.array(np.concatenate(out_isq)),
                "emb": emb,
            }
        )


def knn_cosine_ivf(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    n_lists: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    num_buckets: int = 64,
    centroids: np.ndarray | None = None,
) -> Dataset:
    """Approximate top-k cosine neighbors via IVF (inverted-file) — the
    second scale path beside LSH:

    1. coarse quantizer: k-means centroids trained on a bounded sample
       (``train_ivf_centroids``), broadcast once via ``ray.put``;
    2. map_batches assigns every vector to its home list and fans each
       QUERY out to its nprobe nearest lists;
    3. ONE groupby(part) shuffle; exact vectorized scoring of probe x
       member inside each list segment (a member lives in exactly one
       list, so (query, neighbor) pairs are emitted at most once);
    4. per-query global top-k.

    Cost ~ n * nprobe / n_lists candidates per query vs n for brute
    force; recall grows with nprobe. Nothing unbounded on the driver."""
    import ray

    qset = np.array(sorted(set(int(q) for q in query_ids)), np.int64)
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_lists, id_col)
    if centroids.size == 0 or len(qset) == 0:
        return _empty_knn()
    cref = ray.put(centroids)
    qref = ray.put(qset)
    rows = embeddings.map_batches(
        _IvfAssignRows,
        batch_format="pyarrow",
        batch_size=32768,
        concurrency=(1, 4),
        fn_constructor_args=(cref, qref, nprobe, id_col, num_buckets),
    )

    def score_bucket(t: pa.Table) -> pa.Table:
        lst = t.column("list").to_numpy()
        ids = t.column("vid").to_numpy()
        isq = t.column("isq").to_numpy().astype(bool)
        M = _emb_matrix(t)
        order = np.lexsort((ids, lst))
        lst, ids, isq, M = lst[order], ids[order], isq[order], M[order]
        starts = np.flatnonzero(np.r_[True, lst[1:] != lst[:-1]])
        ends = np.r_[starts[1:], len(lst)]
        out_q, out_n, out_s = [], [], []
        for s, e in zip(starts, ends):
            qi = np.flatnonzero(isq[s:e])
            mi = np.flatnonzero(~isq[s:e])
            if len(qi) == 0 or len(mi) == 0:
                continue
            sims = M[s:e][qi] @ M[s:e][mi].T  # (nq, nm)
            qid, nid = ids[s:e][qi], ids[s:e][mi]
            for r in range(len(qi)):
                keep = nid != qid[r]
                out_q.append(np.full(int(keep.sum()), qid[r], np.int64))
                out_n.append(nid[keep])
                out_s.append(sims[r][keep])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )

    local = rows.groupby("part").map_groups(score_bucket, batch_format="pyarrow")
    return _combine_topk(local, k)


def _empty_knn():
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    )


def knn_graph_ivf(
    embeddings: Dataset,
    k: int = 5,
    n_lists: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    num_buckets: int = 64,
    centroids: np.ndarray | None = None,
) -> Dataset:
    """Approximate kNN GRAPH (every vector is a query) via an IVF
    self-join — the similarity-graph construction step of embedding
    pipelines (near-dup clustering, diversity sampling, graph-based
    ANN indexes):

    1. shared coarse quantizer (sample-trained k-means, broadcast);
    2. every vector emits 1 member row (home list) + nprobe probe rows;
    3. ONE groupby(list-hash) shuffle; per list a single (nq x nm)
       matmul scores probes against members, fully vectorized top-k
       per probe row (np.argpartition, no per-query Python loop);
    4. global per-vector top-k inside vector-hash buckets (vectorized
       sort + head — never a per-query group fn at n-query scale).

    Returns (src, dst, sim, nn_rank): for each vector its k most
    cosine-similar neighbors. Candidate cost ~ n^2 * nprobe / n_lists
    bounded per list; nothing driver-side beyond the centroid sample."""
    import ray

    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_lists, id_col)
    if centroids.size == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                    "nn_rank": pa.array([], pa.int64()),
                }
            )
        )
    cref = ray.put(centroids)
    rows = embeddings.map_batches(
        _IvfAssignRows,
        batch_format="pyarrow",
        batch_size=32768,
        concurrency=(1, 4),
        fn_constructor_args=(cref, None, nprobe, id_col, num_buckets),
    )

    B = num_buckets

    def score_list(t: pa.Table) -> pa.Table:
        lst = t.column("list").to_numpy()
        ids = t.column("vid").to_numpy()
        isq = t.column("isq").to_numpy().astype(bool)
        M = _emb_matrix(t)
        order = np.lexsort((ids, lst))
        lst, ids, isq, M = lst[order], ids[order], isq[order], M[order]
        starts = np.flatnonzero(np.r_[True, lst[1:] != lst[:-1]])
        ends = np.r_[starts[1:], len(lst)]
        out_q, out_n, out_s = [], [], []
        for s, e in zip(starts, ends):
            qi = np.flatnonzero(isq[s:e])
            mi = np.flatnonzero(~isq[s:e])
            if len(qi) == 0 or len(mi) == 0:
                continue
            sims = M[s:e][qi] @ M[s:e][mi].T  # (nq, nm)
            qid, nid = ids[s:e][qi], ids[s:e][mi]
            sims[qid[:, None] == nid[None, :]] = -np.inf  # mask self
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rsel = np.repeat(np.arange(len(qi)), kk)
            csel = top.reshape(-1)
            sv = sims[rsel, csel]
            keep = np.isfinite(sv)
            out_q.append(np.repeat(qid, kk)[keep])
            out_n.append(nid[csel][keep])
            out_s.append(sv[keep])
        if not out_q:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        q = np.concatenate(out_q)
        return pa.table(
            {
                "bucket": pa.array(splitmix64(q.astype(np.uint64)).view(np.int64) % B),
                "src": pa.array(q),
                "dst": pa.array(np.concatenate(out_n).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )

    local = rows.groupby("part").map_groups(score_list, batch_format="pyarrow")

    def final_topk(t: pa.Table) -> pa.Table:
        # a probe pair can repeat only if a vector probes a list twice
        # (it can't: lists are argpartition-distinct) — dedup anyway for
        # safety, then vectorized per-src top-k
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        sim = t.column("sim").to_numpy()
        keep = _first_pair_idx(src, dst)
        src, dst, sim = src[keep], dst[keep], sim[keep]
        order = np.lexsort((dst, -sim, src))
        src, dst, sim = src[order], dst[order], sim[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(src)]))
        rank = np.arange(len(src), dtype=np.int64) - run_start
        top = rank < k
        return pa.table(
            {
                "src": pa.array(src[top].astype(np.int64)),
                "dst": pa.array(dst[top].astype(np.int64)),
                "sim": pa.array(np.round(sim[top], 8)),
                "nn_rank": pa.array(rank[top] + 1),
            }
        )

    return local.groupby("bucket").map_groups(final_topk, batch_format="pyarrow")
