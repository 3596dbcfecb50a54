"""Distributed k-means + SemDeDup (linkgraph/ops/clustering.py) vs an
exact single-process numpy replica of the declared semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from linkgraph.hashing import splitmix64
from linkgraph.ops.clustering import kmeans_assign, kmeans_fit, semdedup_pairs

DIM = 16


def _synth(n: int, seed: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic embeddings with planted structure: 4 loose blobs
    plus a planted near-dup pair per blob."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, DIM))
    ids = np.arange(n, dtype=np.int64)
    M = centers[ids % 4] + 0.3 * rng.normal(size=(n, DIM))
    # plant near-dups: vector i+1 ~ vector i for every 10th i
    for i in range(0, n - 1, 10):
        M[i + 1] = M[i] + 1e-4 * rng.normal(size=DIM)
    return ids, M.astype(np.float32)


def _ds(ids: np.ndarray, M: np.ndarray, blocks: int = 4) -> ray.data.Dataset:
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(M.reshape(-1)), M.shape[1]
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _ref_cos(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    nm = np.linalg.norm(M, axis=1)
    nc = np.linalg.norm(C, axis=1)
    nm = np.where(nm == 0, 1.0, nm)
    nc = np.where(nc == 0, 1.0, nc)
    return np.round((M @ C.T) / nm[:, None] / nc[None, :], 6)


def _ref_kmeans(ids, M32, k, iters):
    M = M32.astype(np.float64)
    hv = splitmix64(ids.view(np.uint64))
    seed_ids = np.sort(ids[np.argsort(hv, kind="stable")[:k]])
    C = np.round(M[np.searchsorted(ids, seed_ids)], 6)
    for _ in range(iters):
        a = np.argmax(_ref_cos(M, C), axis=1)
        cnt = np.bincount(a, minlength=len(C))
        sums = np.zeros_like(C)
        np.add.at(sums, a, M)
        nz = cnt > 0
        C = C.copy()
        C[nz] = np.round(sums[nz] / cnt[nz, None], 6)
    return C, np.argmax(_ref_cos(M, C), axis=1)


def test_kmeans_matches_replica_and_partition_invariant():
    ids, M = _synth(200)
    C_ref, a_ref = _ref_kmeans(ids, M, k=6, iters=3)
    for blocks in (1, 7):
        df = (
            kmeans_assign(_ds(ids, M, blocks), k=6, iters=3)
            .to_pandas()
            .sort_values("vec_id")
        )
        assert np.array_equal(df["cluster"].to_numpy(), a_ref)
    C = kmeans_fit(_ds(ids, M), k=6, iters=3)
    assert np.array_equal(C, C_ref)  # bit-exact: every crossing rounded


def test_kmeans_clusters_recover_blobs():
    # with k = number of planted blobs, co-blob vectors should mostly
    # co-cluster (the blobs are well separated at 0.3 sigma)
    ids, M = _synth(200)
    df = kmeans_assign(_ds(ids, M), k=4, iters=5).to_pandas().sort_values("vec_id")
    a = df["cluster"].to_numpy()
    # k-means may split one blob across two clusters (seeds are hash-
    # random), but every blob should still have a clear dominant
    # cluster, and distinct blobs should map to distinct dominants.
    dominants = []
    for blob in range(4):
        members = a[ids % 4 == blob]
        counts = np.bincount(members)
        assert counts.max() >= 0.5 * len(members)
        dominants.append(int(counts.argmax()))
    assert len(set(dominants)) >= 3


def test_semdedup_finds_planted_pairs_subset_of_exact():
    ids, M = _synth(200)
    df = semdedup_pairs(_ds(ids, M), k=4, iters=3, threshold=0.95).to_pandas()
    got = set(zip(df["a"], df["b"]))
    # exact all-pairs reference at the same threshold
    S = _ref_cos(M.astype(np.float64), M.astype(np.float64))
    iu, ju = np.triu_indices(len(ids), 1)
    exact = set(zip(ids[iu[S[iu, ju] >= 0.95]], ids[ju[S[iu, ju] >= 0.95]]))
    assert got <= exact  # cluster restriction never invents pairs
    planted = {(i, i + 1) for i in range(0, len(ids) - 1, 10)}
    # planted dups are near-identical -> same cluster -> all recovered
    assert planted <= got


def test_kmeans_empty_and_fewer_than_k():
    ids = np.array([7, 3], dtype=np.int64)
    M = np.eye(2, DIM, dtype=np.float32) + 1
    df = kmeans_assign(_ds(ids, M, 1), k=8, iters=2).to_pandas()
    assert len(df) == 2 and set(df["cluster"]) <= {0, 1}
    empty = _ds(np.array([], np.int64), np.zeros((0, DIM), np.float32), 1)
    assert kmeans_assign(empty, k=4, iters=2).to_pandas().empty


def test_semdedup_slab_path_matches_unslabbed():
    ids, M = _synth(150)
    full = semdedup_pairs(_ds(ids, M), k=3, iters=2, threshold=0.9).to_pandas()
    # force many slabs per cluster (the param travels inside the
    # serialized closure, so the Ray workers genuinely slab)
    slabbed = semdedup_pairs(
        _ds(ids, M), k=3, iters=2, threshold=0.9, pair_slab=7
    ).to_pandas()
    key = lambda df: set(zip(df["a"], df["b"]))
    assert key(full) == key(slabbed) and len(full) > 0
