"""compress_ratio and dangling_share semantics."""

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.ops.graphstats import dangling_share
from linkgraph.ops.text import compress_ratio


class TestCompressRatio:
    def test_exact_zlib_and_ordering(self):
        rep = "spam " * 200
        prose = (
            "a quick brown fox jumps over the lazy dog while seventeen "
            "ravens argue about the precise taxonomy of breakfast pastries"
        )
        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array([rep, prose]),
                }
            )
        )
        out = compress_ratio(docs).to_pandas().set_index("doc_id")
        for d, t in ((0, rep), (1, prose)):
            assert out.loc[d, "raw_bytes"] == len(t.encode())
            assert out.loc[d, "zlib_bytes"] == len(zlib.compress(t.encode(), 6))
        # repetitive text compresses far below prose
        assert out.loc[0, "ratio"] < 0.1 < out.loc[1, "ratio"]


class TestDanglingShare:
    def test_hand_graph(self):
        # srcs: 0, 65; dsts 7 and 130 have no out-edges (dangling)
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([0, 0, 65, 65], pa.int64()),
                    "dst": pa.array([65, 7, 0, 130], pa.int64()),
                }
            )
        )
        out = (
            dangling_share(edges, host_mod=64)
            .to_pandas()
            .set_index("host")
            .sort_index()
        )
        # host 0 (src 0): links to 65 (a src -> ok) and 7 (dangling)
        assert out.loc[0].tolist() == [2, 1]
        # host 1 (src 65): links to 0 (ok) and 130 (dangling)
        assert out.loc[1].tolist() == [2, 1]

    def test_no_dangling_when_all_srcs(self):
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([1, 2, 3], pa.int64()),
                    "dst": pa.array([2, 3, 1], pa.int64()),
                }
            )
        )
        out = dangling_share(edges, host_mod=64).to_pandas()
        assert int(out["n_dangling"].sum()) == 0
        assert int(out["n_links"].sum()) == 3
