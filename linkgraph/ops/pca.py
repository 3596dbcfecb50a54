"""Distributed PCA over an embedding column — the whitening /
dimensionality-reduction stage an embedding pipeline runs before ANN
or clustering (e.g. ahead of ops/knn.py's IVF or ops/clustering.py's
SemDeDup pass).

Scale shape: the fit is ONE pass of d²-bounded combiners — each batch
emits the flattened partial second-moment matrix plus the mean vector
partial as (idx, val) rows (1 + d + d² doubles per batch, independent
of batch row count), folded by a single tiny range-sort; the driver
receives exactly one (d+1)(d+1)-sized table, eigendecomposes, and the
projection pass is an embarrassingly-parallel map_batches with the
(k × d) component matrix riding the task closure.  Nothing grows with
the corpus: at 10^12 rows the shuffle still carries
#blocks × (d² + d + 1) rows.

Float parity contract (shared with the SQL oracle): inputs are fp32;
every product is computed AFTER promotion to float64 (the oracle
CASTs to DOUBLE before multiplying — DuckDB would otherwise round
each product to fp32 and drift ~1e-5 past the 8-dp rounding).

Eigenvector sign is normalized deterministically (the
largest-|entry| coordinate of each component is made positive), so
the projection is reproducible across runs and partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .sortagg import sorted_sum_by


def _mat64(t: pa.Table, col: str) -> np.ndarray:
    m = np.vstack(
        [np.asarray(x, dtype=np.float64) for x in t.column(col).to_pylist()]
    )
    return m


def pca_moments(embeddings: Dataset, emb_col: str = "embedding") -> pd.DataFrame:
    """One-pass global moments: DataFrame with rows idx 0 -> count,
    1..d -> per-dim sums, d+1.. -> flattened d x d second-moment sums
    (row-major).  All float64, exact up to float addition order."""

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"idx": pa.array([], pa.int64()), "val": pa.array([], pa.float64())}
            )
        m = _mat64(t, emb_col)
        d = m.shape[1]
        s = m.sum(axis=0)
        ss = m.T @ m
        vals = np.concatenate([[float(len(m))], s, ss.ravel()])
        return pa.table(
            {
                "idx": pa.array(np.arange(len(vals), dtype=np.int64)),
                "val": pa.array(vals),
            }
        )

    folded = sorted_sum_by(
        embeddings.select_columns([emb_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "idx",
        sum_cols={"val": "val"},
    )
    return folded.to_pandas().sort_values("idx").reset_index(drop=True)


def pca_covariance(embeddings: Dataset, emb_col: str = "embedding") -> pd.DataFrame:
    """Population covariance matrix as (i, j, cov) rows (1-based dims,
    cov rounded to 8 dp — the oracle-shared export precision)."""
    mom = pca_moments(embeddings, emb_col)
    v = mom["val"].to_numpy()
    n = v[0]
    d = int((-1 + (1 + 4 * (len(v) - 1)) ** 0.5) / 2)  # 1 + d + d*d = len
    mu = v[1 : 1 + d] / n
    ss = v[1 + d :].reshape(d, d)
    cov = ss / n - np.outer(mu, mu)
    ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij")
    return pd.DataFrame(
        {
            "i": ii.ravel().astype("int64"),
            "j": jj.ravel().astype("int64"),
            "cov": np.round(cov.ravel(), 8),
        }
    )


def pca_fit(
    embeddings: Dataset, k: int = 8, emb_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean[d], components[k x d], explained_variance[k]) from the
    one-pass moments; deterministic component signs."""
    mom = pca_moments(embeddings, emb_col)
    v = mom["val"].to_numpy()
    n = v[0]
    d = int((-1 + (1 + 4 * (len(v) - 1)) ** 0.5) / 2)
    mu = v[1 : 1 + d] / n
    cov = v[1 + d :].reshape(d, d) / n - np.outer(mu, mu)
    w, vec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = vec[:, order].T.copy()
    for r in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    return mu, comps, w[order]


def pca_project(
    embeddings: Dataset,
    k: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    mean: np.ndarray | None = None,
    components: np.ndarray | None = None,
) -> Dataset:
    """Project every vector onto the top-k components ->
    Dataset(id_col, proj: list<double>[k]).  Fit is self-trained unless
    (mean, components) are supplied; the k x d matrix rides the task
    closure (broadcast once per task, never per batch)."""
    if mean is None or components is None:
        mean, components, _ = pca_fit(embeddings, k, emb_col)

    def project(t: pa.Table) -> pa.Table:
        m = _mat64(t, emb_col) if len(t) else np.zeros((0, len(mean)))
        p = (m - mean) @ components.T
        return pa.table(
            {
                id_col: t.column(id_col),
                "proj": pa.array(list(np.round(p, 8))),
            }
        )

    return embeddings.select_columns([id_col, emb_col]).map_batches(
        project, batch_format="pyarrow"
    )
