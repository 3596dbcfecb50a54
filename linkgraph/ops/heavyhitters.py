"""Misra-Gries heavy hitters — the bounded-memory top-k family member
(CMS = ops/cms.py counts-by-hash, HLL = ops/hll.py distincts, MG =
frequent ITEMS with identity preserved).

Why it exists next to the exact top-k (ops/text.top_k_tokens): the
exact path's shuffle is bounded by the vocabulary, which is fine for
word tokens but unbounded for URL/host streams at 10^12 docs. MG keeps
AT MOST k counters per block no matter the cardinality; each per-block
summary is a set of (item, lower_bound) pairs plus the block's
decrement total err_b. Summaries merge by exact lower-bound summation
(one tiny groupby), and the classic sandwich holds:

    sum(lower_bounds)  <=  true_count  <=  sum(lower_bounds) + sum(err_b)

so any item with true frequency above the summed error is GUARANTEED
to survive — tested against exact counts in pytest. The final merge
moves O(blocks x k) rows; nothing depends on merge order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _mg_block(items: np.ndarray, k: int) -> tuple[dict, int]:
    """Classic Misra-Gries over one block: at most k counters.
    Returns (counters, total_decrement)."""
    counts: dict = {}
    err = 0
    for it in items:
        if it in counts:
            counts[it] += 1
        elif len(counts) < k:
            counts[it] = 1
        else:
            # decrement all; drop zeros (vector step amortizes this)
            err += 1
            dead = []
            for c in counts:
                counts[c] -= 1
                if counts[c] == 0:
                    dead.append(c)
            for c in dead:
                del counts[c]
    return counts, err


def _mg_block_fast(items: np.ndarray, k: int) -> tuple[dict, int]:
    """Vectorized MG: count the block exactly with np.unique (cheap —
    one sort), then convert to an MG summary: keep the top-k items,
    subtract the (k+1)-th largest count from each (the standard
    batch-MG reduction; same guarantees, one pass)."""
    vals, cnts = np.unique(items, return_counts=True)
    if len(vals) <= k:
        return dict(zip(vals.tolist(), cnts.tolist())), 0
    order = np.argsort(cnts, kind="stable")[::-1]
    thresh = int(cnts[order[k]])  # (k+1)-th largest
    keep = order[:k]
    lb = cnts[keep] - thresh
    m = lb > 0
    # per-ITEM error bound: a kept item lost exactly thresh, a dropped
    # item had count <= thresh, an absent item lost 0 — so thresh, not
    # the total decrement mass, bounds every item's block error
    return dict(zip(vals[keep][m].tolist(), lb[m].tolist())), thresh


def heavy_hitters(
    ds: Dataset, col: str, k: int = 64, top: int = 20
) -> pd.DataFrame:
    """Approximate top-`top` items of `col` with bounded per-block
    state: per-block batch-MG summaries (<= k counters each), exact
    lower-bound merge, sandwich-bound columns.

    Returns (item, est_count, max_count) — true count is guaranteed in
    [est_count, max_count]; max_count = est + total decrement."""

    def summarize(t: pa.Table) -> pa.Table:
        items = t.column(col).to_numpy(zero_copy_only=False)
        counters, err = _mg_block_fast(items, k)
        its = list(counters)
        # kind 1 = counter row, kind 0 = the block's error row (always
        # emitted — an all-ties block can have err > 0 with NO counters)
        return pa.table(
            {
                "item": pa.array(its + [its[0] if its else ""], pa.string()),
                "lb": pa.array([counters[i] for i in its] + [err], pa.int64()),
                "kind": pa.array([1] * len(its) + [0], pa.int8()),
            }
        )

    parts = ds.map_batches(summarize, batch_format="pyarrow").to_pandas()
    total_err = int(parts.loc[parts["kind"] == 0, "lb"].sum())
    cr = parts[parts["kind"] == 1]
    merged = cr.groupby("item", sort=False)["lb"].sum().sort_values(ascending=False)
    out = merged.head(top).reset_index()
    out.columns = ["item", "est_count"]
    out["max_count"] = out["est_count"] + total_err
    return out
