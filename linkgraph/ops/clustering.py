"""Distributed k-means clustering and SemDeDup semantic dedup.

``kmeans_assign`` is Lloyd's algorithm over an embedding Dataset,
fully distributed and deterministic: seeds are the k vectors with the
smallest splitmix64(id) (order-independent, cluster-size-independent),
per-iteration centroid updates are combiner-reduced partial sums
(every batch ships at most k (count, sum-vector) rows regardless of
corpus size), and all cross-engine float boundaries are rounded to a
fixed number of decimals so a DuckDB replay reproduces the assignment
bit-exactly (the same make-the-iteration-SQL-replayable trick as
katz_4 / gcn_2layer). Similarity is cosine in float64; argmax ties
break to the smallest cluster id on both sides.

``semdedup_pairs`` is the SemDeDup pass (Abbas et al. 2023,
arXiv:2303.09540): cluster the embedding space, then emit near-
duplicate pairs only WITHIN each cluster — the cluster shuffle turns
the all-pairs O(n^2) search into sum over clusters of O(|c|^2), with
k chosen so |c| stays bounded (k ~ n / target_cluster_size at scale).

(Reference analogue: SURVEY.md §2.7 dedup family; the clustering
itself has no HOOVER counterpart — it is part of the LLM-training-
data operator set this engine adds on top of the reference surface.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..hashing import splitmix64

_DP = 6  # decimals every cross-engine float crossing is rounded to
_PAIR_SLAB = 8192  # row-slab bound for within-cluster pairwise cosine


def _mat(t: pa.Table, col: str) -> np.ndarray:
    return np.stack(t.column(col).to_numpy(zero_copy_only=False)).astype(np.float64)


def _cos(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Rounded cosine similarity matrix (n, k) in float64."""
    nm = np.linalg.norm(M, axis=1)
    nc = np.linalg.norm(C, axis=1)
    nm = np.where(nm == 0, 1.0, nm)
    nc = np.where(nc == 0, 1.0, nc)
    return np.round((M @ C.T) / nm[:, None] / nc[None, :], _DP)


def _seed_centroids(
    embeddings: Dataset, k: int, id_col: str, emb_col: str
) -> np.ndarray:
    """The k embeddings with the smallest splitmix64(id), ordered by id
    ascending (= cluster index). Local top-k per batch, tiny final
    merge: at most k rows per block ever leave a worker."""

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        hv = splitmix64(ids.view(np.uint64))
        keep = np.argsort(hv, kind="stable")[:k]
        return pa.table(
            {
                "id": pa.array(ids[keep]),
                "hv": pa.array(hv[keep].view(np.int64)),
                "emb": t.column(emb_col).take(pa.array(keep)),
            }
        )

    part = embeddings.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if len(part) == 0:
        return np.zeros((0, 0), np.float64)
    hv = part["hv"].to_numpy().view(np.uint64)
    part = part.iloc[np.argsort(hv, kind="stable")[:k]].sort_values("id")
    C = np.stack(part["emb"].to_numpy()).astype(np.float64)
    return np.round(C, _DP)


def _partial_sums(cref, emb_col: str):
    """Per-batch k-means combiner (stateless task — the centroid
    broadcast is a zero-copy shared-memory fetch per task, so no actor
    pool spin-up; the kNN stage learned this the hard way in round 4):
    assign each vector to its nearest centroid and emit at most k
    (cluster, count, sum-vector) rows — shuffle volume per batch is
    O(k * dim), independent of batch size."""

    def fn(t: pa.Table) -> pa.Table:
        import ray

        C = ray.get(cref)
        M = _mat(t, emb_col)
        a = np.argmax(_cos(M, C), axis=1)
        k, dim = C.shape
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        sums = np.zeros((k, dim), np.float64)
        np.add.at(sums, a, M)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "cluster": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(cnt[nz]),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums[nz].reshape(-1)), dim
                ),
            }
        )

    return fn


def kmeans_fit(
    embeddings: Dataset,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd's k-means; returns the (k, dim) centroid
    matrix (each coordinate rounded to 6 decimals — the deterministic
    cross-engine contract). Per iteration one map_batches pass emits
    k-row partials; the driver reduces only O(k * dim * num_blocks)
    floats, never a vector table."""
    import ray

    C = _seed_centroids(embeddings, k, id_col, emb_col)
    if C.size == 0:
        return C
    for _ in range(iters):
        cref = ray.put(C)
        part = embeddings.map_batches(
            _partial_sums(cref, emb_col), batch_format="pyarrow"
        ).to_pandas()
        k_eff, dim = C.shape
        cnt = np.zeros(k_eff, np.int64)
        sums = np.zeros((k_eff, dim), np.float64)
        cl = part["cluster"].to_numpy()
        np.add.at(cnt, cl, part["cnt"].to_numpy())
        np.add.at(sums, cl, np.stack(part["sums"].to_numpy()))
        nz = cnt > 0
        C = C.copy()
        C[nz] = np.round(sums[nz] / cnt[nz, None], _DP)  # empty: keep previous
    return C


def _assign_fn(cref, id_col: str, emb_col: str, with_emb: bool):
    def fn(t: pa.Table) -> pa.Table:
        import ray

        C = ray.get(cref)
        M = _mat(t, emb_col)
        a = np.argmax(_cos(M, C), axis=1).astype(np.int64)
        cols = {id_col: t.column(id_col), "cluster": pa.array(a)}
        if with_emb:
            cols[emb_col] = t.column(emb_col)
        return pa.table(cols)

    return fn


def kmeans_assign(
    embeddings: Dataset,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    _with_emb: bool = False,
) -> Dataset:
    """(id_col, cluster) for every vector — Lloyd's k-means assignment
    after ``iters`` distributed iterations. Integer-only output."""
    import ray

    C = kmeans_fit(embeddings, k, iters, id_col, emb_col)
    if C.size == 0:
        return embeddings.map_batches(
            lambda t: pa.table(
                {id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    cref = ray.put(C)
    return embeddings.map_batches(
        _assign_fn(cref, id_col, emb_col, _with_emb), batch_format="pyarrow"
    )


def semdedup_pairs(
    embeddings: Dataset,
    k: int = 8,
    iters: int = 4,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    pair_slab: int | None = None,
) -> Dataset:
    """SemDeDup: near-duplicate pairs (a < b) restricted to vectors in
    the SAME k-means cluster. ONE shuffle (groupby cluster); per-group
    work is a vectorized |c| x |c| cosine matmul slabbed to
    ``pair_slab`` rows at a time (default _PAIR_SLAB), so total cost is
    sum |c|^2 compute with bounded memory even when k was chosen too
    small for the corpus — pick k ~ n / target_cluster_size to bound
    it at scale (vs the O(n^2) exact pass in
    ops/dedup.embedding_dup_pairs)."""
    slab = pair_slab or _PAIR_SLAB
    assigned = kmeans_assign(embeddings, k, iters, id_col, emb_col, _with_emb=True)

    def pairs_in_cluster(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        M = _mat(t, emb_col)
        n = len(ids)
        nm = np.linalg.norm(M, axis=1)
        nm = np.where(nm == 0, 1.0, nm)
        out_a, out_b = [], []
        # slab the row side so an oversized cluster (k chosen too small
        # for the corpus) costs bounded memory, not an n x n matrix
        for s in range(0, n, slab):
            e = min(s + slab, n)
            S = np.round((M[s:e] @ M.T) / nm[s:e, None] / nm[None, :], _DP)
            ii, jj = np.nonzero(S >= threshold)
            gi = ii + s
            keep = gi < jj  # upper triangle only
            out_a.append(ids[gi[keep]])
            out_b.append(ids[jj[keep]])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"a": pa.array(lo), "b": pa.array(hi)})

    return assigned.groupby("cluster").map_groups(
        pairs_in_cluster, batch_format="pyarrow"
    )
