"""sortagg kernels vs pandas groupby/merge on random high-cardinality
keys, across partition counts (block-boundary independence)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from linkgraph.ops.sortagg import attach_by_key, sorted_sum_by


def _rand_table(n, n_keys, seed):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n).astype(np.int64),
            "a": rng.integers(0, 100, n).astype(np.int64),
            "b": rng.standard_normal(n),
        }
    )


@pytest.mark.parametrize("blocks", [1, 7])
def test_sorted_sum_by_matches_pandas(blocks):
    df = _rand_table(5000, 1500, seed=2)
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = (
        sorted_sum_by(
            ds, key="k", sum_cols={"a": "sa", "b": "sb"}, count_col="n"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k")
        .agg(sa=("a", "sum"), sb=("b", "sum"), n=("a", "size"))
        .reset_index()
    )
    assert len(got) == len(want)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert (got["sa"].to_numpy() == want["sa"].to_numpy()).all()
    assert np.allclose(got["sb"], want["sb"], atol=1e-9)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_sorted_sum_by_carry():
    # carry column constant within each key group
    df = _rand_table(2000, 400, seed=5)
    df["c"] = (df["k"] * 17 + 3).astype(np.int64)  # pure function of k
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        sorted_sum_by(ds, key="k", sum_cols={"a": "sa"}, carry_cols=["c"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (got["c"].to_numpy() == got["k"].to_numpy() * 17 + 3).all()


@pytest.mark.parametrize("blocks", [1, 6])
def test_attach_by_key_matches_merge(blocks):
    rng = np.random.default_rng(11)
    rows = pd.DataFrame(
        {
            "k": rng.integers(0, 800, 4000).astype(np.int64),
            "d": np.arange(4000, dtype=np.int64),
        }
    )
    # stats over a SUBSET of keys: rows with absent keys must drop
    keys = np.unique(rows["k"])[: 600]
    stats = pd.DataFrame({"k": keys, "s": keys * 0.5 + 1.0})
    got = (
        attach_by_key(
            ray.data.from_pandas(rows).repartition(blocks),
            ray.data.from_pandas(stats),
            key="k",
            stat_cols=["s"],
            row_cols=["d"],
        )
        .to_pandas()
        .sort_values("d")
        .reset_index(drop=True)
    )
    want = rows.merge(stats, on="k", how="inner").sort_values("d").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["d"].to_numpy() == want["d"].to_numpy()).all()
    assert np.allclose(got["s"], want["s"])
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()


def test_attach_by_key_empty_stats():
    rows = pd.DataFrame({"k": np.arange(10, dtype=np.int64), "d": np.arange(10, dtype=np.int64)})
    stats = pd.DataFrame({"k": np.array([], np.int64), "s": np.array([], np.float64)})
    got = attach_by_key(
        ray.data.from_pandas(rows), ray.data.from_pandas(stats),
        key="k", stat_cols=["s"], row_cols=["d"],
    ).to_pandas()
    assert len(got) == 0
