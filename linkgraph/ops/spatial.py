"""Grid-bucketed radius self-join — the implicit-edge discovery of the
reference (``should_have_edge`` Euclidean predicate over candidate
pairs from interacting partitions, reference src/hoover.cpp:629-711,
test/community_detection.cpp:206-228; ``might_interact`` = the ±1-cell
neighborhood expansion, inc/hoover.h:84-91).

Points are bucketed into cells of side ``radius``; each candidate pair
shares a cell after expanding every point into its 3^d neighbor cells
(emit-once rule: the pair is generated only in the cell of the LOWER id
point to avoid duplicates). Exact verification by distance inside the
bucket — vectorized, no all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    """
    d = len(dims)
    r = float(radius)
    shifts = np.stack(
        np.meshgrid(*([np.array([-1, 0, 1])] * d), indexing="ij"), axis=-1
    ).reshape(-1, d)

    def cell_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        X = np.stack([t.column(c).to_numpy().astype(np.float64) for c in dims], axis=1)
        base = np.floor(X / r).astype(np.int64)  # (n, d)
        out_part, out_id, out_home = [], [], []
        out_X = []
        for s in shifts:
            cell = base + s
            key = cell[:, 0]
            for j in range(1, d):
                key = key * np.int64(0x9E3779B1) + cell[:, j]
            out_part.append(key % num_buckets)
            out_id.append(ids)
            out_home.append(np.all(s == 0) * np.ones(len(ids), np.int64))
            out_X.append(X)
        cols = {
            "part": pa.array(np.concatenate(out_part)),
            id_col: pa.array(np.concatenate(out_id)),
            "home": pa.array(np.concatenate(out_home)),
        }
        Xc = np.concatenate(out_X)
        for j, c in enumerate(dims):
            cols[c] = pa.array(Xc[:, j])
        return pa.table(cols)

    rows = points.map_batches(cell_rows, batch_format="pyarrow", batch_size=1 << 16)

    def bucket_pairs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        homev = t.column("home").to_numpy().astype(np.int64)
        # dedup (id, home) keeping one representative per pair
        kkey = np.empty((len(ids), 2), dtype=">i8")
        kkey[:, 0] = ids
        kkey[:, 1] = homev
        _, uidx = np.unique(kkey.reshape(-1).view("V16"), return_index=True)
        uidx = np.sort(uidx)
        ids = ids[uidx]
        home = homev[uidx].astype(bool)
        X = np.stack([t.column(c).to_numpy()[uidx] for c in dims], axis=1)
        e_ = pa.array([], pa.int64())
        # candidates: home point a vs any point b in the bucket, a < b
        ha = np.nonzero(home)[0]
        if len(ha) == 0 or len(ids) < 2:
            return pa.table({"a": e_, "b": e_})
        D = X[ha, None, :] - X[None, :, :]
        dist2 = (D**2).sum(axis=2)
        ii, jj = np.nonzero(dist2 <= r * r)
        a = ids[ha][ii]
        b = ids[jj]
        keep = a < b
        p = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
        if len(p) == 0:
            return pa.table({"a": e_, "b": e_})
        return pa.table(
            {"a": pa.array(p[:, 0].astype(np.int64)), "b": pa.array(p[:, 1].astype(np.int64))}
        )

    pairs = rows.groupby("part").map_groups(bucket_pairs, batch_format="pyarrow")
    # a pair can be found in several buckets -> global distinct
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])
