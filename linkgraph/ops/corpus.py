"""End-to-end training-corpus selection: join the PageRank prior, the
quality-filter verdict and the exact-dedup keeper flag into one
per-document selection table.

This is the composition a Common-Crawl -> training-corpus pipeline
actually ships: rank (link-graph authority prior) x quality (C4+Gopher
verdict) x dedup (md5-group keeper), `selected = keep AND is_keeper`,
with the rank carried for downstream mixture weighting. Each input is
one row per doc, so the join is a tagged union + ONE range sort on
doc_id + a vectorized per-run pivot — no hash table, no driver-side
merge, the sortagg.py exchange shape.

``keeper_flags`` marks each doc that is the min-doc_id member of its
md5 content group via one (digest, doc_id) sort — first-of-run is the
keeper (same guarantee the other sortagg kernels rest on: equal keys
land in one sorted block).

Scale note: the pivot assumes each doc_id appears exactly once per
input (true by construction for all three); the rank input is O(V)
not O(E) and stays a Dataset end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_TAG_RANK, _TAG_KEEP, _TAG_KEEPER = 0, 1, 2


def keeper_flags(docs: Dataset) -> Dataset:
    """(doc_id, text) -> (doc_id, is_keeper): 1 iff the doc is the
    min-doc_id member of its exact-content (md5) group.

    A digest GROUP can straddle a sorted-block boundary (the sort only
    co-locates equal (digest, doc_id) tuples, not whole digest runs), so
    first-of-run within a block over-flags: the continuation block's
    first row would also read as a keeper. Correction pass: collect each
    block's (first_digest, first_doc, last_digest) — O(#blocks), tiny —
    order blocks by their first (digest, doc_id) tuple (unique, so the
    order is the global sort order), and every block whose first digest
    equals its predecessor's last digest has its first row UNFLAGGED.
    One O(N) exchange total; the corrective state is #blocks rows on
    the driver, never O(docs)."""
    import pandas as pd

    from .dedup import md5_digest_series

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "digest": md5_digest_series(df["text"])}
        )

    d = (
        docs.map_batches(digest, batch_format="pandas", batch_size=8192)
        .sort(["digest", "doc_id"])
        .materialize()
    )

    def bounds(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "first_digest": pa.array([], pa.string()),
                    "first_doc": pa.array([], pa.int64()),
                    "last_digest": pa.array([], pa.string()),
                }
            )
        dg = t.column("digest")
        return pa.table(
            {
                "first_digest": dg.slice(0, 1),
                "first_doc": t.column("doc_id").slice(0, 1),
                "last_digest": dg.slice(len(t) - 1, 1),
            }
        )

    b = (
        d.map_batches(bounds, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["first_digest", "first_doc"])
    )
    unflag = {
        (fd, int(fdoc))
        for prev_last, fd, fdoc in zip(
            b["last_digest"].shift(1), b["first_digest"], b["first_doc"]
        )
        if prev_last is not None and prev_last == fd
    }

    def first_of_run(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "is_keeper": z})
        dg = t.column("digest").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy()
        flag = np.r_[True, dg[1:] != dg[:-1]]
        if (dg[0], int(ids[0])) in unflag:
            flag[0] = False
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "is_keeper": pa.array(flag.astype(np.int64)),
            }
        )

    return d.map_batches(first_of_run, batch_format="pyarrow", batch_size=None)


def _tagged(ds: Dataset, tag: int, val_col: str) -> Dataset:
    import pyarrow.compute as pc

    def conv(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "_t": pa.array(np.full(len(t), tag, np.int8)),
                "_v": pc.cast(t.column(val_col), pa.float64()),
            }
        )

    return ds.map_batches(conv, batch_format="pyarrow")


def corpus_select(docs: Dataset, ranks: Dataset) -> Dataset:
    """(docs: doc_id+text, ranks: doc_id+pr_rank) ->
    (doc_id, pr_rank, keep, is_keeper, selected)."""
    from .text import quality_filter

    qf = quality_filter(docs)  # doc_id, keep, reasons
    kf = keeper_flags(docs)  # doc_id, is_keeper

    def pivot(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            z = pa.array([], pa.int64())
            return pa.table(
                {
                    "doc_id": z,
                    "pr_rank": pa.array([], pa.float64()),
                    "keep": z,
                    "is_keeper": z,
                    "selected": z,
                }
            )
        k = t.column("doc_id").to_numpy()
        tag = t.column("_t").to_numpy()
        val = t.column("_v").to_numpy()
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        run = np.cumsum(np.r_[True, k[1:] != k[:-1]]) - 1
        vals = np.zeros((3, len(starts)), np.float64)
        vals[tag, run] = val  # (tag, run) unique: one row per input per doc
        keep = vals[_TAG_KEEP].astype(np.int64)
        keeper = vals[_TAG_KEEPER].astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(k[starts]),
                "pr_rank": pa.array(vals[_TAG_RANK]),
                "keep": pa.array(keep),
                "is_keeper": pa.array(keeper),
                "selected": pa.array(keep * keeper),
            }
        )

    tagged = (
        _tagged(ranks, _TAG_RANK, "pr_rank")
        .union(_tagged(qf, _TAG_KEEP, "keep"))
        .union(_tagged(kf, _TAG_KEEPER, "is_keeper"))
    )
    return tagged.sort("doc_id").map_batches(
        pivot, batch_format="pyarrow", batch_size=None
    )
