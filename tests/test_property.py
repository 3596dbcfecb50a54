"""Property-based tests (hypothesis): random graphs, engine == oracle."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

from linkgraph.algos import connected_components, pagerank, triangle_count
from linkgraph.algos.kcore import kcore
from oracles import cc_oracle, pagerank_oracle, triangle_oracle

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


edge_list = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=120,
).map(lambda es: sorted(set(es)))


@given(edges=edge_list)
@settings(**SETTINGS)
def test_cc_property(edges):
    out, _, eng = connected_components(edges_ds(edges), num_parts=2)
    got = {r["v"]: r["label"] for r in out.take_all()}
    eng.shutdown()
    assert got == cc_oracle(edges)


@given(edges=edge_list)
@settings(**SETTINGS)
def test_pagerank_property(edges):
    out, _, eng = pagerank(edges_ds(edges), num_parts=2, tol=1e-10)
    got = {r["v"]: r["rank"] for r in out.take_all()}
    eng.shutdown()
    want = pagerank_oracle(edges, tol=1e-10)
    assert set(got) == set(want)
    assert all(abs(got[v] - want[v]) < 1e-6 for v in want)


@given(edges=edge_list)
@settings(**SETTINGS)
def test_triangles_property(edges):
    assert triangle_count(edges_ds(edges), num_partitions=2) == triangle_oracle(edges)


def _kcore_oracle(edges, k):
    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    active = set(nbrs)
    while True:
        drop = {v for v in active if len(nbrs[v] & active) < k}
        if not drop:
            return active
        active -= drop


@given(edges=edge_list, k=st.integers(1, 4))
@settings(**SETTINGS)
def test_kcore_property(edges, k):
    out, _, eng = kcore(edges_ds(edges), k, num_parts=2)
    got = {r["v"] for r in out.take_all() if r["in_kcore"]}
    eng.shutdown()
    assert got == _kcore_oracle(edges, k)


# ---- round-4: lexsort pair kernels vs np.unique ground truth --------------

import numpy as np

pair_arrays = st.lists(
    st.tuples(st.integers(-(2**62), 2**62), st.integers(-(2**62), 2**62)),
    min_size=0,
    max_size=200,
)


@given(pairs=pair_arrays)
@settings(**SETTINGS)
def test_pair_kernels_property(pairs):
    from linkgraph.segops import (
        pair_unique,
        pair_unique_counts,
        pair_unique_inverse,
    )

    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    ua, ub = pair_unique(a, b)
    want = sorted(set(pairs))
    assert list(zip(ua.tolist(), ub.tolist())) == want
    ca, cb, cnt = pair_unique_counts(a, b)
    assert list(zip(ca.tolist(), cb.tolist())) == want
    from collections import Counter

    wc = Counter(pairs)
    assert cnt.tolist() == [wc[p] for p in want]
    ia, ib, inv = pair_unique_inverse(a, b)
    assert list(zip(ia.tolist(), ib.tolist())) == want
    for k, p in enumerate(pairs):
        assert (ia[inv[k]], ib[inv[k]]) == p
