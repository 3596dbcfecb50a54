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
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..hashing import splitmix64


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


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

    class LocalTopK:
        def __init__(self, ref):
            self.q_ids, self.Q = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy().astype(np.int64)
            B = _normalize(
                np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(
                    np.float64
                )
            )
            sims = self.Q @ B.T  # (nq, nb)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.q_ids)):
                s = sims[qi]
                cand = np.arange(len(ids))
                if exclude_self:
                    cand = cand[ids != self.q_ids[qi]]
                if len(cand) == 0:
                    continue
                # local top-k by (sim desc, id asc)
                order = np.lexsort((ids[cand], -s[cand]))[: k]
                sel = cand[order]
                out_q.append(np.full(len(sel), self.q_ids[qi], np.int64))
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

    local = embeddings.map_batches(
        LocalTopK, batch_format="pyarrow", concurrency=2, fn_constructor_args=(ref,)
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return local.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def knn_cosine_lsh(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
) -> Dataset:
    """Approximate top-k: random-hyperplane LSH bucket join, then exact
    scoring within buckets. Deterministic planes (seeded splitmix64)."""
    import ray

    qset = sorted(set(int(q) for q in query_ids))
    pdf = embeddings.to_pandas()
    dim = len(pdf["embedding"].iloc[0])
    # deterministic planes from a seeded integer stream
    raw = splitmix64(np.arange(n_tables * n_planes * dim, dtype=np.uint64) + np.uint64(7))
    planes = ((raw.astype(np.float64) / 2**64) - 0.5).reshape(n_tables, n_planes, dim)

    M = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
    ids = pdf[id_col].to_numpy().astype(np.int64)
    signs = np.einsum("tpd,nd->tnp", planes, M) > 0  # (tables, n, planes)
    codes = np.zeros((n_tables, len(ids)), np.int64)
    for p in range(n_planes):
        codes |= signs[:, :, p].astype(np.int64) << p

    qmask = np.isin(ids, qset)
    rows = []
    for t in range(n_tables):
        for qi in np.nonzero(qmask)[0]:
            bucket = np.nonzero(codes[t] == codes[t, qi])[0]
            for b in bucket:
                if ids[b] != ids[qi]:
                    rows.append((ids[qi], ids[b]))
    if not rows:
        return _empty_knn()
    cand = pd.DataFrame(sorted(set(rows)), columns=["query_id", "neighbor_id"])
    qidx = {int(v): i for i, v in enumerate(ids)}
    sims = np.array(
        [
            float(M[qidx[a]] @ M[qidx[b]])
            for a, b in zip(cand["query_id"], cand["neighbor_id"])
        ]
    )
    cand["sim"] = sims
    out = (
        cand.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
        .groupby("query_id")
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    import ray.data

    return ray.data.from_pandas(out[["query_id", "neighbor_id", "rank"]])


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
