"""BM25 ranked retrieval over the documents table.

The search primitive of a corpus pipeline: given a bag-of-words query,
score every document with Okapi BM25 (Lucene IDF variant) and return
the top-k. Fully distributed and deterministic:

- pass 1 tokenizes once into a COMPACT per-doc stats table
  (doc_id, dl, tf_0..tf_{T-1}) — integers only, materialized (it is
  read twice; its size is n_docs x (T+2) int64, negligible vs text);
- corpus stats (N, avgdl, per-term df) reduce via per-batch partial
  rows — one tiny driver collect of O(T x blocks) ints;
- pass 2 scores each doc vectorized with the stats inlined in the
  closure, keeps a local top-k per block, and a single small final
  block ranks the survivors.

Every float expression is written in the exact operation order the
DuckDB oracle uses, and the score is rounded to 6 dp before the
(score DESC, doc_id ASC) ordering, so the oracle replays rank-exactly.

(Reference analogue: none in HOOVER — part of the LLM-corpus operator
set; SURVEY.md §2.7 top-k machinery.)
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .text import TOKEN_RE

K1 = 1.2
B = 0.75
_DP = 6


class _DocTermStats:
    """(doc_id, text) -> (doc_id, dl, tf_0..tf_{T-1}); regex compiled
    once per actor."""

    def __init__(self, terms: tuple[str, ...]):
        self.tok = re.compile(TOKEN_RE)
        self.terms = terms

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = len(texts)
        dl = np.zeros(n, np.int64)
        tf = np.zeros((len(self.terms), n), np.int64)
        for i, x in enumerate(texts):
            toks = [w.lower() for w in self.tok.findall(x)]
            dl[i] = len(toks)
            for j, term in enumerate(self.terms):
                tf[j, i] = toks.count(term)
        cols = {"doc_id": t.column("doc_id"), "dl": pa.array(dl)}
        for j in range(len(self.terms)):
            cols[f"tf{j}"] = pa.array(tf[j])
        return pa.table(cols)


def bm25_topk(
    docs: Dataset,
    terms: tuple[str, ...],
    k: int = 10,
) -> Dataset:
    """Top-k documents by BM25 for the given query terms: a k-row
    Dataset (doc_id, score, bm25_rank), ranked by (rounded score DESC,
    doc_id ASC)."""
    T = len(terms)
    stats = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(
            _DocTermStats,
            fn_constructor_args=(tuple(terms),),
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=(1, 8),
        )
        .materialize()
    )

    def partial(t: pa.Table) -> pa.Table:
        row = {
            "n": pa.array([t.num_rows], pa.int64()),
            "sdl": pa.array([int(np.sum(t.column("dl").to_numpy()))], pa.int64()),
        }
        for j in range(T):
            row[f"df{j}"] = pa.array(
                [int(np.count_nonzero(t.column(f"tf{j}").to_numpy()))], pa.int64()
            )
        return pa.table(row)

    agg = stats.map_batches(partial, batch_format="pyarrow").to_pandas()
    N = int(agg["n"].sum())
    if N == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "bm25_rank": pa.array([], pa.int64()),
                }
            )
        )
    avgdl = int(agg["sdl"].sum()) / N
    df = [int(agg[f"df{j}"].sum()) for j in range(T)]
    # Lucene BM25 idf; same op order as the SQL oracle
    idf = [math.log((float(N) - df[j] + 0.5) / (df[j] + 0.5) + 1.0) for j in range(T)]

    def score_topk(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy().astype(np.float64)
        s = np.zeros(t.num_rows, np.float64)
        for j in range(T):
            tf = t.column(f"tf{j}").to_numpy().astype(np.float64)
            s = s + idf[j] * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * (dl / avgdl))
            )
        s = np.round(s, _DP)
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        order = np.lexsort((ids, -s))[:k]
        return pa.table({"doc_id": pa.array(ids[order]), "score": pa.array(s[order])})

    def final_rank(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        s = t.column("score").to_numpy()
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "score": pa.array(s[order]),
                "bm25_rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    local = stats.map_batches(score_topk, batch_format="pyarrow")
    # survivors: <= k rows per block -> one tiny final block
    return local.repartition(1).map_batches(
        final_rank, batch_format="pyarrow", batch_size=None
    )
