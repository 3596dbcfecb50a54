"""snapshot_churn: hand oracle + pandas replay on the derived graphs."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.ops.snapshot import perturb_edges, snapshot_churn


def _edges(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


class TestSnapshotChurn:
    def test_hand_graph(self):
        old = _edges([(0, 1), (0, 2), (1, 2), (65, 3)])  # host 0,0,1,1
        new = _edges([(0, 1), (1, 2), (1, 4), (64, 9)])
        out = (
            snapshot_churn(old, new, host_mod=64)
            .to_pandas()
            .set_index("host")
            .sort_index()
        )
        # host 0: (0,1) stable, (0,2) removed, (64,9) added
        assert out.loc[0].tolist() == [1, 1, 1]  # added, removed, stable
        # host 1: (1,2) stable, (65,3) removed, (1,4) added
        assert out.loc[1].tolist() == [1, 1, 1]

    def test_duplicate_rows_do_not_double_count(self):
        old = _edges([(5, 6), (5, 6)])
        new = _edges([(5, 6), (5, 6), (5, 7)])
        out = snapshot_churn(old, new, host_mod=64).to_pandas()
        row = out.set_index("host").loc[5]
        assert row["n_stable"] == 1 and row["n_added"] == 1 and row["n_removed"] == 0

    def test_pandas_replay_on_doc_graph(self):
        from linkgraph.docgraph import doc_edges

        sf = "/root/testdata/sf0.001"
        docs = ray.data.read_parquet(
            os.path.join(sf, "documents.parquet"), columns=["doc_id"]
        )
        n = docs.count()
        t0 = doc_edges(docs, n)
        t1 = perturb_edges(t0, docs, n)
        got = (
            snapshot_churn(t0, t1, host_mod=64)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )

        # independent pandas replay
        a = t0.to_pandas().drop_duplicates()
        drop = (a["src"] * 31 + a["dst"]) % 11 != 0
        ids = np.arange(n)
        d = ids[ids % 6 == 0]
        add = pd.DataFrame({"src": d, "dst": (d * 17 + 5) % n})
        add = add[add["src"] != add["dst"]]
        b = pd.concat([a[drop], add]).drop_duplicates()
        ka = set(map(tuple, a.values))
        kb = set(map(tuple, b.values))
        rows = []
        for h in range(64):
            sa = {e for e in ka if e[0] % 64 == h}
            sb = {e for e in kb if e[0] % 64 == h}
            if sa or sb:
                rows.append(
                    (h, len(sb - sa), len(sa - sb), len(sa & sb))
                )
        want = pd.DataFrame(
            rows, columns=["host", "n_added", "n_removed", "n_stable"]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
