"""Misra-Gries heavy hitters: sandwich bound + guaranteed recall."""

import os
import sys
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.ops.heavyhitters import _mg_block_fast, heavy_hitters


def _zipf_items(n=60000, seed=3):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.4, size=n)
    ranks = ranks[ranks < 500]
    return np.array([f"host{r}" for r in ranks], dtype=object)


class TestMGBlock:
    def test_small_block_exact(self):
        counters, err = _mg_block_fast(np.array(list("aabbc"), object), k=8)
        assert counters == {"a": 2, "b": 2, "c": 1} and err == 0

    def test_reduction_bounds(self):
        items = np.array(list("aaaaabbbccd"), object)
        counters, err = _mg_block_fast(items, k=2)
        true = Counter(items.tolist())
        for it, c in true.items():
            lb = counters.get(it, 0)
            assert lb <= c <= lb + err


class TestHeavyHitters:
    def test_sandwich_and_recall(self):
        items = _zipf_items()
        true = Counter(items.tolist())
        ds = ray.data.from_arrow(
            pa.table({"host": pa.array(items.tolist(), pa.string())})
        ).repartition(8)
        out = heavy_hitters(ds, "host", k=64, top=20)
        est = dict(zip(out["item"], out["est_count"]))
        max_allowed = out["max_count"].iloc[0] - out["est_count"].iloc[0]
        # sandwich: est <= true <= est + total_err, for every reported item
        for it, e in est.items():
            assert e <= true[it] <= e + max_allowed
        # guaranteed recall: any item with true count > total error must
        # appear in the merged summary with positive estimate
        for it, c in true.most_common(5):
            if c > max_allowed:
                assert it in est
        # top-1 item identified correctly (its margin dwarfs the error)
        assert out["item"].iloc[0] == true.most_common(1)[0][0]
