"""GCN propagation, count-min sketch / MIDAS scoring, radius join —
reference apps gcn.cpp, midas.cpp + count_min_sketch, and the implicit
Euclidean edge discovery (community_detection.cpp:206-228)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from oracles import random_edges


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def test_gcn_matches_dense_oracle():
    from linkgraph.algos.gcn import (
        GCNLayerProgram,
        deterministic_features,
        deterministic_weights,
        gcn_features,
    )

    edges = sorted(set(random_edges(40, 120, seed=13)))
    out, eng = gcn_features(edges_ds(edges), dim=4, layers=2, num_parts=3)
    rows = {r["v"]: [r["h0"], r["h1"], r["h2"], r["h3"]] for r in out.take_all()}
    eng.shutdown()

    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    H = deterministic_features(np.array(verts, np.uint64), 4)
    W = deterministic_weights(4, 4)
    for _ in range(2):
        agg = H.copy()
        for s, d in edges:
            agg[idx[d]] += H[idx[s]]
        H = np.maximum(agg @ W, 0.0)
    for v in verts:
        assert np.allclose(rows[v], H[idx[v]], atol=1e-9), v


def test_cms_bounds_and_merge():
    from linkgraph.ops.cms import CountMinSketch

    keys = np.array([1, 2, 3, 1, 1, 2, 9, 9, 9, 9], np.uint64)
    cms = CountMinSketch(width=256, depth=4)
    cms.add(keys)
    est = cms.query(np.array([1, 2, 3, 9, 777], np.uint64))
    true = np.array([3, 2, 1, 4, 0])
    assert (est >= true).all()  # never undercounts
    assert (est[:4] == true[:4]).all()  # tiny load -> exact
    # merge associativity
    a = CountMinSketch(width=256, depth=4)
    b = CountMinSketch(width=256, depth=4)
    a.add(keys[:5])
    b.add(keys[5:])
    a.merge(b)
    assert (a.table == cms.table).all() and a.total == cms.total


def test_sketch_edge_counts_distributed():
    from linkgraph.ops.cms import sketch_edge_counts
    from linkgraph.hashing import splitmix64

    edges = [(1, 2)] * 5 + [(3, 4)] * 2 + [(5, 6)]
    cms = sketch_edge_counts(edges_ds(edges), width=512, depth=4)
    k = splitmix64(np.array([1, 3, 5], np.uint64)) ^ np.array([2, 4, 6], np.uint64)
    assert (cms.query(k) >= np.array([5, 2, 1])).all()
    assert cms.total == 8


def test_midas_flags_burst():
    from linkgraph.ops.cms import edge_anomaly_scores

    # 8 ticks of background edges + edge (7, 8) appearing once per tick;
    # tick 9: (7, 8) bursts
    per_tick = 16
    rows_s, rows_d = [], []
    for tick in range(10):
        if tick < 9:
            s = list(range(tick, tick + per_tick - 1)) + [7]
            d = [x + 100 for x in s[:-1]] + [8]
        else:
            s = [7] * per_tick  # the burst
            d = [8] * per_tick
        rows_s.extend(s)
        rows_d.extend(d)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(rows_s, pa.int64()), "dst": pa.array(rows_d, pa.int64())})
    )
    out = edge_anomaly_scores(ds, batch_size=per_tick).to_pandas()
    burst = out[(out["src"] == 7) & (out["dst"] == 8) & (out["tick"] == 9)]
    steady = out[(out["src"] == 7) & (out["dst"] == 8) & (out["tick"].between(1, 8))]
    assert len(burst) and burst["score"].min() > 10 * max(steady["score"].max(), 1e-9)


def test_radius_join_vs_bruteforce():
    from linkgraph.ops.spatial import radius_join

    n = 200
    rng = np.random.RandomState(3)
    x, y = rng.rand(n) * 10, rng.rand(n) * 10
    ids = np.arange(n, dtype=np.int64)
    pts = ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "x": pa.array(x), "y": pa.array(y)})
    )
    r = 0.7
    got = {(row["a"], row["b"]) for row in radius_join(pts, r).take_all()}
    want = set()
    for i in range(n):
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        for j in np.nonzero(d2 <= r * r)[0]:
            if i < j:
                want.add((i, int(j)))
    assert got == want and len(want) > 0


def test_token_zipf_alpha_matches_numpy():
    """CSN MLE over token counts vs a direct numpy replay."""
    import re
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data

    from linkgraph.ops.text import token_zipf_alpha

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    # Zipf-ish draw so the tail is non-trivial
    p = 1.0 / np.arange(1, 41)
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=30, p=p)) for _ in range(50)]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(50), pa.int64()), "text": pa.array(texts)})
    )
    got = token_zipf_alpha(docs, cmin=2)
    c = Counter()
    for t in texts:
        c.update(re.findall(r"[A-Za-z0-9]+", t))
    tail = np.array([x for x in c.values() if x >= 2], float)
    alpha = 1.0 + len(tail) / (np.log(tail).sum() - len(tail) * np.log(1.5))
    assert int(got["n_tail"][0]) == len(tail)
    assert abs(float(got["alpha"][0]) - round(alpha, 8)) < 1e-6


def test_source_mix_weights():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from linkgraph.ops.text import source_mix

    docs = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(["a", "a", "b", "c"]),
                "n_chars": pa.array([100, 300, 400, 200], pa.int64()),
            }
        )
    )
    df = source_mix(docs).set_index("source")
    assert df.loc["a", "n_docs"] == 2 and df.loc["a", "n_bytes"] == 400
    assert abs(df["weight"].sum() - 1.0) < 1e-9
    assert df.loc["b", "weight"] == 0.4
