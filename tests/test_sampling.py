"""Deterministic per-key sampling vs a pandas oracle and across
partitioning layouts (combiner-safety property)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from linkgraph.ops import sample_per_key
from linkgraph.ops.sampling import _A, _B, _M


def make_events(n=2000, n_users=37, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
        }
    )


def oracle(df, k):
    d = df.copy()
    d["_p"] = (d["event_id"] * _A + _B) % _M
    d = d.sort_values(["user_id", "_p", "event_id"], kind="mergesort")
    return d.groupby("user_id", sort=False).head(k)[["user_id", "event_id"]]


def as_set(df):
    return {(int(r["user_id"]), int(r["event_id"])) for _, r in df.iterrows()}


def test_sample_per_key_matches_oracle():
    df = make_events()
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = sample_per_key(ds, k=5).to_pandas()
    want = oracle(df, 5)
    assert as_set(got) == as_set(want)
    assert got.groupby("user_id").size().max() <= 5


def test_sample_per_key_partition_invariant():
    df = make_events(n=3000, n_users=11, seed=17)
    ds1 = ray.data.from_arrow(pa.Table.from_pandas(df))
    ds8 = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    a = as_set(sample_per_key(ds1, k=3).to_pandas())
    b = as_set(sample_per_key(ds8, k=3).to_pandas())
    assert a == b


def test_sample_per_key_small_groups_kept_whole():
    df = pd.DataFrame(
        {"event_id": np.arange(4, dtype=np.int64),
         "user_id": np.array([1, 1, 2, 3], dtype=np.int64)}
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = sample_per_key(ds, k=10).to_pandas()
    assert as_set(got) == as_set(df[["user_id", "event_id"]])
