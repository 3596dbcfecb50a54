"""Exact distributed quantiles vs numpy selection — random floats,
heavy ties, tiny inputs, and the refinement path (bins smaller than
the population so multiple rounds actually run)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.ops.quantiles import exact_quantiles


def ds_of(vals):
    return ray.data.from_arrow(pa.table({"value": pa.array(np.asarray(vals, np.float64))}))


def want(vals, q):
    s = np.sort(np.asarray(vals, np.float64))
    return s[int(np.floor(q * (len(s) - 1)))]


QS = (0.5, 0.9, 0.99)


def check(vals, **kw):
    t = exact_quantiles(ds_of(vals), "value", qs=QS, **kw)
    got = dict(zip(t.column("q").to_pylist(), t.column("value").to_pylist()))
    for q in QS:
        assert got[q] == want(vals, q), (q, got[q], want(vals, q))


def test_random_uniform():
    rng = np.random.RandomState(0)
    check(rng.rand(40_000) * 1000 - 500)


def test_forced_refinement_rounds():
    # bins=16, collect cap 50: needs several refinement rounds
    rng = np.random.RandomState(1)
    check(rng.randn(20_000), bins=16, max_collect=50)


def test_heavy_ties():
    rng = np.random.RandomState(2)
    vals = np.repeat([1.0, 2.0, 2.0, 3.0], 5000) + np.where(
        rng.rand(20_000) < 0.1, 0.5, 0.0
    )
    check(vals, bins=8, max_collect=100)


def test_all_equal():
    check(np.full(1000, 7.25), bins=8, max_collect=10)


def test_tiny_inputs():
    check([3.0])
    check([5.0, -1.0])
    check([2.0, 2.0, 2.0])


def test_rank_convention_matches_sql():
    # n=11, q=0.5 -> 0-based rank 5 (the 6th element)
    vals = np.arange(11, dtype=float)[::-1]
    t = exact_quantiles(ds_of(vals), "value", qs=(0.5,))
    assert t.column("rank").to_pylist() == [6]
    assert t.column("value").to_pylist() == [5.0]


def test_exact_quantiles_by_key_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from linkgraph.ops.quantiles import exact_quantiles_by_key

    rng = np.random.default_rng(7)
    keys = rng.choice(["a", "b", "c"], 3000)
    vals = rng.normal(size=3000) * (1 + (keys == "b"))
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys, "value": vals})).repartition(5)
    t = exact_quantiles_by_key(ds, "k", "value", qs=(0.5, 0.9), max_collect=64).to_pandas()
    for kv in "abc":
        sub = np.sort(vals[keys == kv])
        for q in (0.5, 0.9):
            row = t[(t.k == kv) & (t.q == q)].iloc[0]
            assert row["value"] == sub[int(np.floor(q * (len(sub) - 1)))]
