"""Round-3 VERDICT items: embedding_dup_pairs size guard (divert to the
LSH scale path above the broadcast budget) and the vectorized MinHash
signature blob decode (_bin_to_mat reads the Arrow buffer directly)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.ops.dedup import _SigToBinary, _bin_to_mat, embedding_dup_pairs


def _emb_ds(n=60, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, dim))
    M[1] = M[0] + 0.001 * rng.normal(size=dim)  # one planted near-dup
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in M], pa.list_(pa.float32())
                ),
            }
        )
    )


def test_embedding_dup_pairs_over_budget_raises_by_default():
    # round-3 ADVICE: the exact-recall contract must not silently turn
    # approximate — over-budget calls raise unless the caller opts in.
    ds = _emb_ds()
    with pytest.raises(ValueError, match="fallback='lsh'"):
        embedding_dup_pairs(ds, threshold=0.95, max_broadcast_rows=10)


def test_embedding_dup_pairs_diverts_to_lsh_above_budget():
    ds = _emb_ds()
    with pytest.warns(UserWarning, match="diverting to embedding_dup_lsh"):
        out = embedding_dup_pairs(
            ds, threshold=0.95, max_broadcast_rows=10, fallback="lsh"
        )
    df = out.to_pandas()
    assert list(df.columns) == ["a", "b"]
    exact = embedding_dup_pairs(ds, threshold=0.95).to_pandas()
    got = {(int(r.a), int(r.b)) for r in df.itertuples()}
    want = {(int(r.a), int(r.b)) for r in exact.itertuples()}
    assert got <= want  # in-bucket scoring is exact -> precision 1.0
    assert (0, 1) in got  # the planted dup survives the divert


def test_bin_to_mat_roundtrip():
    rng = np.random.default_rng(7)
    num_perm = 8
    M = rng.integers(0, 1 << 63, (33, num_perm)).astype(np.uint64)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(33, dtype=np.int64)),
            "sig": pa.array([row for row in M], pa.list_(pa.uint64())),
        }
    )
    blobs = _SigToBinary(num_perm)(t)
    back = _bin_to_mat(blobs.column("sig"), num_perm)
    assert back.shape == (33, num_perm)
    assert (back == M).all()
    # sliced/offset arrays decode correctly too
    sl = blobs.column("sig").combine_chunks().slice(5, 10)
    assert (_bin_to_mat(sl, num_perm) == M[5:15]).all()
    assert _bin_to_mat(pa.chunked_array([], pa.binary()), num_perm).shape == (0, num_perm)
