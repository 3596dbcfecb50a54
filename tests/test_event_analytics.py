"""window_topk and funnel_counts: hand-data semantics."""

import os
import sys
from datetime import datetime

import numpy as np
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.ops.windows import funnel_counts, window_topk


def _events(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            rows, columns=["ts", "user_id", "event_type", "value"]
        ).astype({"ts": "datetime64[us]"})
    )


def T(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


class TestWindowTopK:
    def test_rank_and_tiebreak(self):
        ev = _events(
            [(T(1), 1, "b", 1.0)] * 3
            + [(T(2), 1, "a", 1.0)] * 3
            + [(T(3), 1, "c", 1.0)] * 5
            + [(T(4), 1, "d", 1.0)]
            + [(datetime(2024, 1, 1, 1, 5), 1, "x", 1.0)]
        )
        out = window_topk(ev, minutes=60, k=3).to_pandas()
        w0 = out[out["window_start"] == out["window_start"].min()]
        w0 = w0.sort_values("rnk")
        # c(5) first; a and b tie at 3 -> 'a' before 'b'
        assert w0["event_type"].tolist() == ["c", "a", "b"]
        assert w0["n_events"].tolist() == [5, 3, 3]
        assert w0["rnk"].tolist() == [1, 2, 3]
        w1 = out[out["window_start"] != out["window_start"].min()]
        assert w1["event_type"].tolist() == ["x"] and w1["rnk"].tolist() == [1]


class TestFunnel:
    def test_strict_order(self):
        ev = _events(
            [
                # user 1: full ordered funnel
                (T(1), 1, "view", 0.0),
                (T(2), 1, "click", 0.0),
                (T(3), 1, "purchase", 0.0),
                # user 2: click BEFORE view -> stops at view stage
                (T(2), 2, "click", 0.0),
                (T(3), 2, "view", 0.0),
                (T(4), 2, "purchase", 0.0),
                # user 3: view + click only
                (T(1), 3, "view", 0.0),
                (T(5), 3, "click", 0.0),
                # user 4: purchase only -> not even view stage
                (T(1), 4, "purchase", 0.0),
            ]
        )
        out = funnel_counts(ev).set_index("stage")["n_users"]
        assert out["view"] == 3  # users 1, 2, 3
        assert out["click"] == 2  # users 1, 3
        assert out["purchase"] == 1  # user 1


def test_window_triangles_vs_bruteforce():
    import itertools

    import pyarrow as pa
    import ray.data

    from linkgraph.ops.windows import window_triangles

    rng = np.random.default_rng(13)
    m = 3000
    src = rng.integers(0, 60, m)
    dst = rng.integers(0, 60, m)
    ts = rng.integers(0, 4, m) * 3600 + rng.integers(0, 3600, m)
    t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "ts_sec": pa.array(ts, pa.int64()),
        }
    )
    got = (
        window_triangles(ray.data.from_arrow(t).repartition(8), minutes=60)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    want = {}
    for w in sorted(set((ts // 3600) * 3600)):
        es = {
            (min(s, d), max(s, d))
            for s, d, tt in zip(src, dst, ts)
            if (tt // 3600) * 3600 == w and s != d
        }
        verts = sorted({v for e in es for v in e})
        n = sum(
            1
            for a, b, c in itertools.combinations(verts, 3)
            if (a, b) in es and (a, c) in es and (b, c) in es
        )
        want[w] = n
    assert dict(zip(got["window_start"], got["n_triangles"])) == want
    assert any(v > 0 for v in want.values())  # non-degenerate fixture


def test_window_cc_vs_bruteforce():
    import pyarrow as pa
    import ray.data

    from linkgraph.ops.windows import window_cc

    rng = np.random.default_rng(29)
    m = 2000
    src = rng.integers(0, 120, m)
    dst = rng.integers(0, 120, m)
    ts = rng.integers(0, 4, m) * 3600 + rng.integers(0, 3600, m)
    t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "ts_sec": pa.array(ts, pa.int64()),
        }
    )
    got = window_cc(ray.data.from_arrow(t).repartition(8), minutes=60).to_pandas()
    got = got.sort_values("window_start").reset_index(drop=True)

    def uf_components(es):
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in es:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return len(parent), len({find(v) for v in parent})

    want = {}
    for w in sorted(set((ts // 3600) * 3600)):
        es = {
            (min(s, d), max(s, d))
            for s, d, tt in zip(src, dst, ts)
            if (tt // 3600) * 3600 == w and s != d
        }
        want[w] = uf_components(es)
    assert {
        int(r.window_start): (int(r.n_vertices), int(r.n_components))
        for r in got.itertuples()
    } == want
    assert any(nc > 1 for _, nc in want.values()) or len(want) > 1


def test_window_cc_disconnected():
    import pyarrow as pa
    import ray.data

    from linkgraph.ops.windows import window_cc

    # one window: two separate components + an isolated self-loop (dropped)
    t = pa.table(
        {
            "src": pa.array([1, 2, 10, 7], pa.int64()),
            "dst": pa.array([2, 3, 11, 7], pa.int64()),
            "ts_sec": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    df = window_cc(ray.data.from_arrow(t), minutes=60).to_pandas()
    assert len(df) == 1
    assert int(df["n_vertices"][0]) == 5  # 1,2,3,10,11 (7 self-loop dropped)
    assert int(df["n_components"][0]) == 2


def test_window_pagerank_vs_bruteforce():
    import pyarrow as pa
    import ray.data

    from linkgraph.ops.windows import window_pagerank

    rng = np.random.default_rng(31)
    m = 3000
    src = rng.integers(0, 150, m)
    dst = rng.integers(0, 150, m)
    ts = rng.integers(0, 4, m) * 3600 + rng.integers(0, 3600, m)
    t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "ts_sec": pa.array(ts, pa.int64()),
        }
    )
    got = window_pagerank(
        ray.data.from_arrow(t).repartition(8), minutes=60, iters=5, k=3
    ).to_pandas()

    w = (ts // 3600) * 3600
    want_rows = []
    for wk in sorted(set(w.tolist())):
        es = sorted({(a, b) for a, b, x in zip(src, dst, w) if x == wk and a != b})
        ids = sorted({v for e in es for v in e})
        idx = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        deg = np.zeros(n)
        for a, _ in es:
            deg[idx[a]] += 1
        r = np.full(n, 1.0 / n)
        for _ in range(5):
            msg = np.zeros(n)
            for a, b in es:
                msg[idx[b]] += r[idx[a]] / deg[idx[a]]
            dm = r[deg == 0].sum()
            r = 0.15 / n + 0.85 * (msg + dm / n)
        rr = np.round(r, 8)
        order = sorted(range(n), key=lambda i: (-rr[i], ids[i]))[:3]
        for rank, i in enumerate(order, 1):
            want_rows.append((wk, ids[i], rr[i], rank))

    got_rows = [
        (int(a), int(b), float(c), int(d))
        for a, b, c, d in zip(
            got["window_start"], got["v"], got["pr_rank"], got["rank"]
        )
    ]
    assert sorted(got_rows) == sorted(want_rows)
    assert len({r[0] for r in want_rows}) >= 3  # several windows
