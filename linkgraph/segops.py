"""Vectorized segment aggregation kernels (numpy) used by the engine.

These replace the reference's fused neighbor aggregates
(``hvr_neighbors_min``, reference src/hoover.cpp:2058-2110) with
sort + ``reduceat`` segment kernels over whole partitions — no per-row
Python in any per-iteration path.
"""

from __future__ import annotations

import numpy as np


def seg_sum(idx: np.ndarray, vals: np.ndarray, n: int) -> np.ndarray:
    """Dense sum of `vals` grouped by local index (0..n-1)."""
    return np.bincount(idx, weights=vals, minlength=n)


def seg_min_sparse(idx: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(unique_idx, min_per_idx) via sort + minimum.reduceat."""
    if len(idx) == 0:
        return idx, vals
    order = np.argsort(idx, kind="stable")
    si, sv = idx[order], vals[order]
    starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
    return si[starts], np.minimum.reduceat(sv, starts)


def seg_sum_sparse(idx: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(unique_idx, sum_per_idx); vals may be 1-D or 2-D (vector messages
    — reduceat sums along axis 0, e.g. GCN feature aggregation)."""
    if len(idx) == 0:
        return idx, vals
    order = np.argsort(idx, kind="stable")
    si, sv = idx[order], vals[order]
    starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
    return si[starts], np.add.reduceat(sv, starts, axis=0)


def label_count_combine(
    idx: np.ndarray, labels: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Combine (idx, label, count) triples: sum counts per (idx, label)."""
    if len(idx) == 0:
        return idx, labels, counts
    order = np.lexsort((labels, idx))
    si, sl, sc = idx[order], labels[order], counts[order]
    new = np.r_[True, (si[1:] != si[:-1]) | (sl[1:] != sl[:-1])]
    starts = np.flatnonzero(new)
    return si[starts], sl[starts], np.add.reduceat(sc, starts)


def label_vote(
    idx: np.ndarray, labels: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per idx: label with max count, ties -> smallest label.

    Input must be unique (idx, label) pairs. Returns (unique_idx, winner).
    """
    if len(idx) == 0:
        return idx, labels
    # order by (idx asc, count desc, label asc); first row per idx wins
    order = np.lexsort((labels, -counts, idx))
    si, sl = idx[order], labels[order]
    starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
    return si[starts], sl[starts]


# ---------------------------------------------------------------------------
# pair-key kernels: lexsort-based replacements for np.unique(axis=0),
# which sorts a void view and is ~3x slower on (int64, int64) pairs
# (round-4 profiling: 194ms -> 67ms at 236k pairs).
# ---------------------------------------------------------------------------


def pair_unique(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (a, b) pairs, sorted lexicographically by (a, b)."""
    if len(a) == 0:
        return a, b
    order = np.lexsort((b, a))
    a2, b2 = a[order], b[order]
    m = np.empty(len(a2), bool)
    m[0] = True
    m[1:] = (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])
    return a2[m], b2[m]


def pair_unique_counts(
    a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct (a, b) pairs (lex-sorted) plus per-pair multiplicities."""
    if len(a) == 0:
        return a, b, np.zeros(0, np.int64)
    order = np.lexsort((b, a))
    a2, b2 = a[order], b[order]
    new = np.empty(len(a2), bool)
    new[0] = True
    new[1:] = (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.r_[starts, len(a2)])
    return a2[new], b2[new], counts


def pair_unique_inverse(
    a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct (a, b) pairs (lex-sorted) plus the inverse mapping
    (``inv[i]`` = index of row i's pair in the unique arrays) —
    drop-in for ``np.unique(..., return_inverse=True)`` semantics."""
    if len(a) == 0:
        return a, b, np.zeros(0, np.int64)
    order = np.lexsort((b, a))
    a2, b2 = a[order], b[order]
    new = np.empty(len(a2), bool)
    new[0] = True
    new[1:] = (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])
    gid_sorted = np.cumsum(new) - 1
    inv = np.empty(len(a2), np.int64)
    inv[order] = gid_sorted
    return a2[new], b2[new], inv
