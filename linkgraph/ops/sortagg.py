"""Sort-based aggregation/join kernels for HIGH-CARDINALITY int64 keys.

Ray Data's hash ``groupby.aggregate`` and hash ``join`` pay per-group /
per-probe machinery that dominates when the key cardinality approaches
the row count (measured in this repo: 90 s for a 2.9M-row -> 1M-group
count vs ~5 s by sort; the same finding as edges.distinct_pairs' 12x).
Both kernels here ride ONE ``Dataset.sort`` (a range-partitioned
all-to-all — the same exchange a hash shuffle pays) and then do the
per-key work with numpy reduceat inside each sorted block:

* ``sorted_sum_by``      — groupby(key).sum(...) / count, plus "carry"
  columns that are constant within a key group (Min-style carry).
* ``attach_by_key``      — broadcast a stats table's columns onto a big
  row table sharing the key: the tagged-union trick (stats rows and
  data rows sort TOGETHER on the key, so each block holds every run's
  stats row) — a hash join with no hash table.

Correctness rests on the distinct_pairs guarantee: ``sort(key)``
range-partitions by value comparison, so ALL rows with an equal key
land in the same output block; ``batch_size=None`` keeps batches
aligned to sorted blocks (re-slicing could split an equal-key run).

(Reference analogue: the sort+reduceat segment kernels of segops.py,
applied at the Dataset level; SURVEY.md §2.7 grouped aggregates.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def sorted_sum_by(
    ds: Dataset,
    key: str,
    sum_cols: dict[str, str] | None = None,
    carry_cols: list[str] | None = None,
    count_col: str | None = None,
    min_cols: dict[str, str] | None = None,
) -> Dataset:
    """Exact groupby(key) by global range sort + per-block reduceat.

    ``sum_cols``   {input_col: output_col} summed per key group
    ``carry_cols`` columns constant within a key group, carried through
                   (first value of the run)
    ``count_col``  if set, emit the group row count under this name
    ``min_cols``   {input_col: output_col} min-reduced per key group
    """
    sum_cols = sum_cols or {}
    carry_cols = carry_cols or []
    min_cols = min_cols or {}

    def block(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy()
        if len(k) == 0:
            # empty-block stub keeps every column's ORIGINAL dtype so
            # all blocks agree on schema
            cols: dict = {key: t.column(key)}
            for c in carry_cols:
                cols[c] = t.column(c)
            for c, out in sum_cols.items():
                cols[out] = t.column(c)
            for c, out in min_cols.items():
                cols[out] = t.column(c)
            if count_col:
                cols[count_col] = pa.array([], pa.int64())
            return pa.table(cols)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        cols = {key: pa.array(k[starts])}
        for c in carry_cols:
            cols[c] = pa.array(t.column(c).to_numpy()[starts])
        for c, out in sum_cols.items():
            cols[out] = pa.array(np.add.reduceat(t.column(c).to_numpy(), starts))
        for c, out in min_cols.items():
            cols[out] = pa.array(np.minimum.reduceat(t.column(c).to_numpy(), starts))
        if count_col:
            n = np.diff(np.r_[starts, len(k)])
            cols[count_col] = pa.array(n.astype(np.int64))
        return pa.table(cols)

    return ds.sort(key).map_batches(block, batch_format="pyarrow", batch_size=None)


def attach_by_key(
    rows: Dataset,
    stats: Dataset,
    key: str,
    stat_cols: list[str],
    row_cols: list[str],
    stat_type: "pa.DataType | None" = None,
    outer: bool = False,
    fill=0,
) -> Dataset:
    """Hash-join replacement: append ``stat_cols`` (from the stats
    table, ONE row per key) to every row of ``rows`` sharing the key.

    Tagged union: stats rows ship with _k=0 and dummy row columns, data
    rows with _k=1 and dummy stat columns; one sort on ``key`` lands
    each key's whole run (stats row + its data rows) in one block, and
    a vectorized per-run broadcast fills the stat columns in. Rows
    whose key has no stats row are DROPPED (inner-join semantics) —
    unless ``outer=True``, in which case they are kept with ``fill``
    in every stat column (left-outer semantics).

    ``stat_type`` is the wire dtype of the stat columns (the union
    schema must agree across both sides); default float64. Pass
    ``pa.int64()`` for id-valued stats — 64-bit ids do NOT round-trip
    through float64.
    """
    st = stat_type if stat_type is not None else pa.float64()
    np_st = st.to_pandas_dtype()

    def tag_stats(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {key: t.column(key), "_k": pa.array(np.zeros(len(t), np.int8))}
        for c in stat_cols:
            cols[c] = pc.cast(t.column(c), st)
        for c in row_cols:
            cols[c] = pa.array(np.zeros(len(t), np.int64))
        return pa.table(cols)

    def tag_rows(t: pa.Table) -> pa.Table:
        cols = {key: t.column(key), "_k": pa.array(np.ones(len(t), np.int8))}
        for c in stat_cols:
            cols[c] = pa.array(np.zeros(len(t), np_st))
        for c in row_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    tagged = stats.map_batches(tag_stats, batch_format="pyarrow").union(
        rows.map_batches(tag_rows, batch_format="pyarrow")
    )

    def block(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy()
        empty_cols: dict = {key: pa.array([], pa.int64())}
        for c in stat_cols:
            empty_cols[c] = pa.array([], st)
        for c in row_cols:
            empty_cols[c] = pa.array([], pa.int64())
        if len(k) == 0:
            return pa.table(empty_cols)
        tagv = t.column("_k").to_numpy()
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        run_id = np.cumsum(np.r_[True, k[1:] != k[:-1]]) - 1
        # position of the (unique) stats row of each run; runs without
        # one get -1 and their rows drop (inner join)
        stat_pos = np.full(len(starts), -1, np.int64)
        sp = np.flatnonzero(tagv == 0)
        stat_pos[run_id[sp]] = sp
        keep = (
            (tagv == 1) if outer else (tagv == 1) & (stat_pos[run_id] >= 0)
        )
        src = stat_pos[run_id[keep]]
        cols = {key: pa.array(k[keep])}
        for c in stat_cols:
            vals = t.column(c).to_numpy()[src]
            if outer:
                vals = np.where(src >= 0, vals, np.asarray(fill, vals.dtype))
            cols[c] = pa.array(vals)
        for c in row_cols:
            cols[c] = pa.array(t.column(c).to_numpy()[keep])
        return pa.table(cols)

    return tagged.sort(key).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )
