"""Paragraph(chunk)-level exact dedup — the seventh dedup family:
per-document duplicated-content ratio at sub-document granularity (the
RefinedWeb/Gopher-style "repeated passage" signal; exact_dedup is
whole-doc, dup_span_pairs is substring-level, this is the fixed-chunk
middle ground a 100-TB curation pass actually filters on).

Semantics (ANSI-SQL-replayable, oracled in __ray_entry__):
  * tokens = text split on single spaces
  * chunks = non-overlapping windows of ``chunk_tokens`` tokens
    (final partial chunk kept), re-joined with spaces
  * a chunk is duplicated iff its string occurs >1 time in the WHOLE
    corpus (any doc, including repeats inside one doc)
  * per doc: n_chunks, n_dup, dup_ratio = n_dup / n_chunks (exact
    IEEE division — no rounding, both sides compute one divide)

Distributed shape: chunk rows travel as (doc_id, chunk-hash) int64
pairs (the string never leaves the extracting batch — hash64 is the
corpus-wide identity, the ops/dedup.py convention; equal strings hash
equal, collisions are the same 2^-64 risk every dedup family accepts).
One groupby on chunk-hash (unique-chunk cardinality), one hash join
rows x counts, one per-doc groupby with in-batch combiner. No stage
holds more than a batch of strings.

(Reference analogue: SURVEY.md §2.7 dedup; the chunked identity mirrors
the reference's fixed-width record hashing in its trace comparators,
tools/compare_traces.py:12-27.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ..hashing import hash64_str_signed


class ChunkHashRows:
    """documents(doc_id, text) -> (doc_id, chash) rows, one per chunk.

    Vectorized: split once per batch (Arrow kernel), then one
    list_slice + binary_join per chunk INDEX (max_chunks iterations of
    C-level kernels — no per-row Python)."""

    def __init__(self, chunk_tokens: int = 16):
        self.w = chunk_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch.column("text"), " ")
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy()
        w = self.w
        max_chunks = int(-(-nt.max() // w)) if len(nt) else 0
        out_doc: list[np.ndarray] = []
        out_hash: list[np.ndarray] = []
        for c in range(max_chunks):
            mask = nt > c * w
            if not mask.any():
                break
            sl = pc.list_slice(toks, c * w, (c + 1) * w)
            joined = pc.binary_join(sl, " ")
            sel = joined.to_numpy(zero_copy_only=False)[mask]
            out_doc.append(doc[mask])
            out_hash.append(hash64_str_signed(sel))
        if not out_doc:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "chash": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc)),
                "chash": pa.array(np.concatenate(out_hash)),
            }
        )


def para_dedup_stats(
    docs: Dataset,
    chunk_tokens: int = 16,
    num_partitions: int = 8,
) -> Dataset:
    """documents(doc_id, text) -> (doc_id, n_chunks, n_dup, dup_ratio)."""
    chunker = ChunkHashRows(chunk_tokens)
    rows = docs.map_batches(
        # stateless task pool (not a capped actor pool): the chunker is
        # a tiny picklable config object, and task parallelism follows
        # the input block count
        chunker, batch_format="pyarrow"
    ).materialize()

    # chunk-hash cardinality ~ row count: hash groupby/join machinery
    # is the bottleneck at this shape — use the sortagg kernels (range
    # sort + per-block run kernels; see ops/sortagg.py)
    from .sortagg import attach_by_key, sorted_sum_by

    def count_partial(t: pa.Table) -> pa.Table:
        h, c = np.unique(t.column("chash").to_numpy(), return_counts=True)
        return pa.table(
            {"chash": pa.array(h), "_c": pa.array(c.astype(np.int64))}
        )

    counts = sorted_sum_by(
        rows.map_batches(count_partial, batch_format="pyarrow", batch_size=1 << 20),
        key="chash",
        sum_cols={"_c": "cnt"},
    )

    joined = attach_by_key(
        rows, counts, key="chash", stat_cols=["cnt"], row_cols=["doc_id"]
    )

    def dup_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "_d": pa.array(
                    (t.column("cnt").to_numpy() > 1).astype(np.int64)
                ),
            }
        )

    agg = sorted_sum_by(
        joined.map_batches(dup_rows, batch_format="pyarrow", batch_size=None),
        key="doc_id",
        sum_cols={"_d": "n_dup"},
        count_col="n_chunks",
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_chunks").to_numpy().astype(np.float64)
        d = t.column("n_dup").to_numpy().astype(np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chunks": t.column("n_chunks"),
                "n_dup": t.column("n_dup"),
                "dup_ratio": pa.array(d / n),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
