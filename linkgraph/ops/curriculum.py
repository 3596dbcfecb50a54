"""Curriculum ordering: exact global rank -> ntile phase assignment.

The training-data curriculum primitive (easy->hard scheduling over a
difficulty score, here the bigram-LM fluency score of ops/lm.py): every
document gets an exact global rank under (score, doc_id) order and an
ntile(n) phase with DuckDB window semantics (the first N mod n phases
hold one extra row).

Scale shape: ONE range-sort shuffle (Ray's distributed sort) is the
only all-to-all. Global row numbers then need only the per-block
(first key, row count) table — O(#blocks) rows on the driver, never
O(docs): blocks of a sorted dataset are disjoint key ranges, so
ordering blocks by their first (score, doc_id) tuple (unique — doc_id
is unique) IS the global order, and a prefix sum of block sizes gives
each block's starting rank. A second stateless pass adds
offset + arange. Same bounds-pass idiom as corpus.keeper_flags.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def global_rank(
    ds: Dataset, key_cols: list[str], rank_col: str = "rn"
) -> tuple[Dataset, int]:
    """Sort by key_cols and append the exact 0-based global row number.

    Key tuples must be unique (callers include a unique id column).
    Returns (ranked dataset — sorted, with rank_col added, total rows).
    """
    d = ds.sort(key_cols).materialize()

    def bounds(t: pa.Table) -> pa.Table:
        cols = {}
        for c in key_cols:
            cols[f"k_{c}"] = t.column(c).slice(0, 1) if len(t) else t.column(c)
        cols["n"] = pa.array([len(t)] * min(len(t), 1), pa.int64())
        return pa.table(cols)

    b = (
        d.map_batches(bounds, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values([f"k_{c}" for c in key_cols])
    )
    total = int(b["n"].sum())
    offs = np.r_[0, np.cumsum(b["n"].to_numpy())[:-1]]
    offset_of = {
        tuple(row): int(o)
        for row, o in zip(b[[f"k_{c}" for c in key_cols]].itertuples(index=False), offs)
    }

    def number(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(rank_col, pa.array([], pa.int64()))
        first = tuple(t.column(c)[0].as_py() for c in key_cols)
        o = offset_of[first]
        return t.append_column(
            rank_col, pa.array(o + np.arange(len(t), dtype=np.int64))
        )

    return d.map_batches(number, batch_format="pyarrow", batch_size=None), total


def ntile_of(rn: np.ndarray, total: int, n: int) -> np.ndarray:
    """DuckDB/ANSI ntile over 0-based ranks: the first total%n tiles
    get one extra row. Returns 1-based tile numbers."""
    base, rem = divmod(total, n)
    cut = rem * (base + 1)
    small = rn < cut
    tile = np.where(
        small,
        rn // max(base + 1, 1),
        rem + np.where(base > 0, (rn - cut) // max(base, 1), 0),
    )
    return (tile + 1).astype(np.int64)


def curriculum_phases(docs: Dataset, n_phases: int = 4) -> Dataset:
    """documents(doc_id, text) -> (doc_id, lm_score, phase): ntile
    curriculum phases under ascending bigram-LM fluency (phase 1 =
    least fluent). Oracle: ntile(n) OVER (ORDER BY lm_score, doc_id)."""
    from .lm import lm_score

    scores = lm_score(docs).select_columns(["doc_id", "lm_score"])
    ranked, total = global_rank(scores, ["lm_score", "doc_id"])

    def phase(t: pa.Table) -> pa.Table:
        rn = t.column("rn").to_numpy()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lm_score": t.column("lm_score"),
                "phase": pa.array(ntile_of(rn, total, n_phases)),
            }
        )

    return ranked.map_batches(phase, batch_format="pyarrow")
