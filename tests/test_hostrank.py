"""weighted_pagerank_dataset vs an exact numpy recurrence, string keys
and data-dependent weights (the hostrank path)."""

import numpy as np
import pyarrow as pa
import ray

from linkgraph.algos.dataset_impl import weighted_pagerank_dataset


def numpy_wpr(edges, iters=5, damping=0.85):
    verts = sorted({v for e in edges for v in e[:2]})
    vi = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    outw = np.zeros(n)
    for s, _, w in edges:
        outw[vi[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[outw == 0].sum()
        m = np.zeros(n)
        for s, t, w in edges:
            m[vi[t]] += r[vi[s]] / outw[vi[s]] * w
        r = (1 - damping) / n + damping * (m + dang / n)
    return {v: r[vi[v]] for v in verts}


def test_weighted_pr_string_keys():
    edges = [
        ("a", "b", 3.0),
        ("a", "c", 1.0),
        ("b", "c", 2.0),
        ("c", "a", 1.0),
        ("d", "a", 5.0),  # d is a source only; e below is dangling
        ("b", "e", 1.0),
    ]
    t = pa.table(
        {
            "src_host": [e[0] for e in edges],
            "dst_host": [e[1] for e in edges],
            "n_links": np.array([e[2] for e in edges]),
        }
    )
    want = numpy_wpr(edges)
    # both execution paths: in-driver (small collapsed graph) and the
    # distributed join path (local_threshold=0 forces it)
    for thresh in (2_000_000, 0):
        out = weighted_pagerank_dataset(
            ray.data.from_arrow(t), src_col="src_host", dst_col="dst_host",
            weight_col="n_links", iters=5, num_partitions=2,
            local_threshold=thresh,
        ).to_pandas()
        assert len(out) == 5
        for _, row in out.iterrows():
            assert abs(row["rank"] - want[row["v"]]) < 1e-12, (thresh, row["v"])
        # weight-sensitivity: b receives 3x a's share vs c's 1x
        got = dict(zip(out["v"], out["rank"]))
        assert got["b"] > got["e"]
