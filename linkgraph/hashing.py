"""Stable 64-bit hashing for vertex ids and content fingerprints.

The reference encodes vertex identity as ``(pe << 32) | offset``
(reference inc/hvr_common.h:53-67) which couples identity to placement.
Here identity is a stable content hash — ``hash64(url)`` — and
placement is derived (``v % num_parts``), so vertices can live anywhere
(SURVEY.md §1.2).

All functions are vectorized (pandas' C siphash via
``pandas.util.hash_array`` for strings; splitmix64 in numpy for ints)
and deterministic across processes and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Fixed 16-byte key so hashes are stable across processes/runs/machines.
_HASH_KEY = "linkgraph2024#01"


def hash64_str(values) -> np.ndarray:
    """Stable uint64 hash of an array-like of strings (vectorized, C impl)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY)


def hash64_one(value: str) -> int:
    return int(hash64_str([value])[0])


def hash64_str_signed(values) -> np.ndarray:
    """int64 bit-view of hash64_str — the vertex-id dtype of the edge
    table (Ray Data shuffles int64 keys natively; uint64 keys don't)."""
    return hash64_str(values).view(np.int64)


def hash64_one_signed(value: str) -> int:
    return int(hash64_str_signed([value])[0])


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — uniform mixing of uint64 ints.

    Used for deterministic, order-independent synthetic data generation
    (every derived quantity is a pure function of the row index).
    """
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        z = x.astype(np.uint64, copy=True)
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def mix2(a: np.ndarray, b) -> np.ndarray:
    """Mix two uint64 streams into one (for per-(row, slot) randomness)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    return splitmix64(a * np.uint64(0x100000001B3) ^ splitmix64(b))


def uniform01(u: np.ndarray) -> np.ndarray:
    """Map uint64 -> float64 in [0, 1)."""
    return (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
