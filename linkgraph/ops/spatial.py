"""Grid-bucketed radius self-join — the implicit-edge discovery of the
reference (``should_have_edge`` Euclidean predicate over candidate
pairs from interacting partitions, reference src/hoover.cpp:629-711,
test/community_detection.cpp:206-228; ``might_interact`` = the ±1-cell
neighborhood expansion, inc/hoover.h:84-91).

Points are bucketed into cells of side ``radius``; each point is
expanded into its 3^d neighbor cells (one ``home`` copy at shift 0,
ghost copies elsewhere), rows are range-sorted by exact cell key, and
candidate pairs are generated ONLY within a cell run — per-cell work is
bounded by local density, never by bucket occupancy (a round-4 fix: the
previous bucket-granularity join compared home points against the whole
hash bucket, which is O(n^2 / B) at fixed cell size). Emit-once rule:
a pair (a < b) is kept only where the LOWER-id side is the home copy —
that happens in exactly one cell (a's home cell), so the output is
exact AND duplicate-free with no global distinct stage (tests assert
both). Exact verification by Euclidean distance inside the cell run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def radius_join(
    points: Dataset,
    radius: float,
    dims: tuple[str, ...] = ("x", "y"),
    id_col: str = "id",
    num_buckets: int = 64,
) -> Dataset:
    """Self-join: pairs (a < b) with Euclidean distance <= radius.

    points: Dataset with id_col + coordinate columns.
    ``num_buckets`` kept for signature compatibility (unused — rows
    co-locate by exact cell key via the range sort).
    """
    from ..algos.triangles import _all_pairs_per_run_slabbed

    d = len(dims)
    r = float(radius)
    shifts = np.stack(
        np.meshgrid(*([np.array([-1, 0, 1])] * d), indexing="ij"), axis=-1
    ).reshape(-1, d)

    def cell_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        X = np.stack([t.column(c).to_numpy().astype(np.float64) for c in dims], axis=1)
        base = np.floor(X / r).astype(np.int64)  # (n, d)
        out_cell, out_id, out_home = [], [], []
        out_X = []
        for s in shifts:
            cell = base + s
            key = cell[:, 0]
            for j in range(1, d):
                key = key * np.int64(0x9E3779B1) + cell[:, j]
            out_cell.append(key)
            out_id.append(ids)
            out_home.append(np.all(s == 0) * np.ones(len(ids), np.int64))
            out_X.append(X)
        cols = {
            "cell": pa.array(np.concatenate(out_cell)),
            id_col: pa.array(np.concatenate(out_id)),
            "home": pa.array(np.concatenate(out_home)),
        }
        Xc = np.concatenate(out_X)
        for j, c in enumerate(dims):
            cols[c] = pa.array(Xc[:, j])
        return pa.table(cols)

    rows = points.map_batches(cell_rows, batch_format="pyarrow", batch_size=1 << 16)

    def cell_pairs(t: pa.Table) -> pa.Table:
        e_ = pa.array([], pa.int64())
        cell = t.column("cell").to_numpy()
        n = len(cell)
        if n < 2:
            return pa.table({"a": e_, "b": e_})
        ids = t.column(id_col).to_numpy()
        home = t.column("home").to_numpy().astype(bool)
        X = np.stack([t.column(c).to_numpy() for c in dims], axis=1)
        outs_a, outs_b = [], []
        # rows arrive sorted by cell (the range sort); positional i<j
        # pairs within each cell run, in bounded slabs (a dense cell
        # never materializes all its pairs at once)
        for ii, jj in _all_pairs_per_run_slabbed(cell, ids):
            xi, xj = ids[ii], ids[jj]
            lo_is_i = xi < xj
            # emit-once: the lower-id side must be the home copy here
            okhome = np.where(lo_is_i, home[ii], home[jj])
            cand = okhome & (xi != xj)
            if not cand.any():
                continue
            ii, jj = ii[cand], jj[cand]
            d2 = ((X[ii] - X[jj]) ** 2).sum(axis=1)
            keep = d2 <= r * r
            xi, xj = ids[ii][keep], ids[jj][keep]
            outs_a.append(np.minimum(xi, xj))
            outs_b.append(np.maximum(xi, xj))
        if not outs_a:
            return pa.table({"a": e_, "b": e_})
        return pa.table(
            {
                "a": pa.array(np.concatenate(outs_a).astype(np.int64)),
                "b": pa.array(np.concatenate(outs_b).astype(np.int64)),
            }
        )

    # sort co-locates equal cell keys in one block (range partition by
    # value comparison) and keeps them adjacent; batch_size=None keeps
    # batches aligned to the sorted blocks
    return rows.sort("cell").map_batches(
        cell_pairs, batch_format="pyarrow", batch_size=None
    )
