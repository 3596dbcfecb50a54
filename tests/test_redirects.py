"""Pointer-doubling redirect resolution vs the sequential numpy
oracle — random functional graphs (chains, trees, cycles), all-terminal
and all-cycle edge cases, and partition-count invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.ops.redirects import resolve_pointers, resolve_pointers_np


def ptr_ds(v, p):
    return ray.data.from_arrow(
        pa.table({"v": pa.array(v, pa.int64()), "p": pa.array(p, pa.int64())})
    )


def check(v, p, max_hops=32, **kw):
    got = (
        resolve_pointers(ptr_ds(v, p), max_hops=max_hops, **kw)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    want = resolve_pointers_np(np.asarray(v), np.asarray(p), max_hops=max_hops)
    order = np.argsort(np.asarray(v))
    assert got["v"].tolist() == np.asarray(v)[order].tolist()
    assert got["final"].tolist() == want[order].tolist()
    return got


@pytest.mark.parametrize("seed", [0, 7])
def test_random_functional_graph(seed):
    rng = np.random.RandomState(seed)
    n = 300
    v = np.arange(n)
    # ~40% redirects to random targets (cycles arise naturally)
    is_r = rng.rand(n) < 0.4
    p = np.where(is_r, rng.randint(0, n, n), v)
    got = check(v, p)
    # terminals always resolve to themselves
    terms = v[~is_r]
    sub = got[got["v"].isin(terms)]
    assert (sub["final"] == sub["v"]).all()


def test_all_terminals():
    v = np.arange(50)
    check(v, v.copy())


def test_pure_cycle_reports_unresolved():
    # one 6-cycle, no terminals reachable: every vertex -> -1
    v = np.arange(6)
    p = (v + 1) % 6
    got = check(v, p)
    assert (got["final"] == -1).all()


def test_long_chain_within_budget():
    # straight chain of 30 redirects into a terminal: resolves fully
    n = 31
    v = np.arange(n)
    p = np.minimum(v + 1, n - 1)
    got = check(v, p)
    assert (got["final"] == n - 1).all()


def test_chain_exceeding_budget():
    # chain longer than 2^ceil(log2(max_hops)) from its tail end:
    # far vertices cannot reach the terminal within the hop budget
    n = 40
    v = np.arange(n)
    p = np.minimum(v + 1, n - 1)
    got = check(v, p, max_hops=8)
    assert got["final"].tolist()[-1] == n - 1  # the terminal itself
    assert (got["final"].values[: n - 9] == -1).all()  # too far away


def test_partition_invariance():
    rng = np.random.RandomState(3)
    n = 200
    v = np.arange(n)
    p = np.where(rng.rand(n) < 0.5, rng.randint(0, n, n), v)
    a = check(v, p, num_partitions=2)
    b = check(v, p, num_partitions=7)
    assert a.equals(b)
