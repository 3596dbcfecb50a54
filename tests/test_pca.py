"""Distributed PCA vs numpy on the same data."""

import numpy as np
import pyarrow as pa
import ray


def emb_ds(n=400, d=16, seed=7, parts=5):
    rng = np.random.default_rng(seed)
    # anisotropic cloud so components are well-separated
    scales = np.linspace(3.0, 0.1, d)
    m = (rng.normal(size=(n, d)) * scales).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m)),
        }
    )
    return ray.data.from_arrow(t).repartition(parts), m


def test_pca_covariance_exact():
    from linkgraph.ops.pca import pca_covariance

    ds, m = emb_ds()
    got = pca_covariance(ds)
    m64 = m.astype(np.float64)
    want = np.cov(m64, rowvar=False, bias=True)
    g = np.zeros_like(want)
    g[got["i"].to_numpy() - 1, got["j"].to_numpy() - 1] = got["cov"].to_numpy()
    assert np.allclose(g, np.round(want, 8), atol=2e-8)
    assert len(got) == m.shape[1] ** 2


def test_pca_fit_matches_numpy_eigh():
    from linkgraph.ops.pca import pca_fit

    ds, m = emb_ds()
    mu, comps, var = pca_fit(ds, k=4)
    m64 = m.astype(np.float64)
    assert np.allclose(mu, m64.mean(axis=0), atol=1e-12)
    cov = np.cov(m64, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    assert np.allclose(var, w[order], atol=1e-9)
    for r in range(4):
        ref = v[:, order[r]]
        j = int(np.argmax(np.abs(comps[r])))
        if ref[j] < 0:
            ref = -ref
        assert np.allclose(comps[r], ref, atol=1e-8)
    # deterministic sign: the largest-|entry| coordinate is positive
    for r in range(4):
        assert comps[r, int(np.argmax(np.abs(comps[r])))] > 0


def test_pca_project_variance_ordering_and_partition_invariance():
    from linkgraph.ops.pca import pca_project

    ds, m = emb_ds()
    df = pca_project(ds, k=4).to_pandas().sort_values("vec_id")
    p = np.vstack(df["proj"].to_numpy())
    v = p.var(axis=0)
    assert all(v[i] >= v[i + 1] - 1e-9 for i in range(3))  # ordered components
    # partition invariance: 1 block vs 5 blocks, same projection
    ds1, _ = emb_ds(parts=1)
    df1 = pca_project(ds1, k=4).to_pandas().sort_values("vec_id")
    p1 = np.vstack(df1["proj"].to_numpy())
    assert np.allclose(p, p1, atol=1e-7)
