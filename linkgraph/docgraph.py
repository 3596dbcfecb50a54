"""Deterministic edge table derived from the driver's ``documents`` table.

The driver's DuckDB-oracle harness needs graph queries whose input is
derivable from the provided parquet tables by ANSI SQL. This module
derives a fixed-out-degree directed graph over ``doc_id`` with pure
integer arithmetic — identical in numpy (here) and SQL
(``__ray_entry__.oracle_sql``):

    for j in 0..7:
        dst(doc, j) = doc % 64                             if j == 0   (hub edges -> skew)
                    = ((doc + 1) * (2j + 3) + 97 j^2) % N  otherwise
    drop dst == doc, dedup (src, dst)

The ``j = 0`` rule concentrates in-degree on vertices 0..63 (N/64
in-degree each) so the oracle graph exercises the hub-skew path of the
engine, mirroring the power-law RMAT generator of the reference
(tools/generate_graph.c:8-19).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .edges import distinct_edges

N_SLOTS = 8
HUB_MOD = 64


def derive_edges_np(doc_ids: np.ndarray, n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    d = np.asarray(doc_ids, dtype=np.int64)
    srcs, dsts = [], []
    for j in range(N_SLOTS):
        if j == 0:
            dst = d % HUB_MOD
        else:
            dst = ((d + 1) * (2 * j + 3) + 97 * j * j) % n_docs
        srcs.append(d)
        dsts.append(dst)
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    keep = src != dst
    return src[keep], dst[keep]


def derive_edges_sql(n_docs_expr: str = "(SELECT count(*) FROM documents)") -> str:
    """The identical derivation as a SQL subquery producing (src, dst)."""
    return f"""
    SELECT DISTINCT src, dst FROM (
      SELECT d.doc_id AS src,
             CASE WHEN t.j = 0 THEN d.doc_id % {HUB_MOD}
                  ELSE ((d.doc_id + 1) * (2*t.j + 3) + 97*t.j*t.j) % {n_docs_expr}
             END AS dst
      FROM documents d CROSS JOIN (SELECT unnest(range(0, {N_SLOTS})) AS j) t
    ) WHERE src <> dst
    """


class _DeriveEdges:
    def __init__(self, n_docs: int):
        self.n_docs = n_docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        src, dst = derive_edges_np(batch.column("doc_id").to_numpy(), self.n_docs)
        return pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})


def doc_edges(documents: Dataset, n_docs: int, dedup: bool = True) -> Dataset:
    """documents -> derived (src:int64, dst:int64) edge table."""
    edges = documents.select_columns(["doc_id"]).map_batches(
        _DeriveEdges(n_docs), batch_format="pyarrow"
    )
    if dedup:
        edges = distinct_edges(edges)
    return edges
