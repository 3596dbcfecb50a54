"""Incremental edge streams + warm restart (reference parity: the
streaming edge-insert benchmarks, test/update_rates.cpp:31-56 and
test/connected_components.c:62-86 — batches of edges arrive, the
algorithm re-converges incrementally from prior state)."""

import pyarrow as pa

import ray.data

from linkgraph.algos.cc import CCProgram
from linkgraph.algos.pagerank import PageRankProgram
from linkgraph.engine import SuperstepEngine
from oracles import cc_oracle, pagerank_oracle, random_edges


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def test_streaming_cc_matches_batch_oracle():
    batches = [random_edges(80, 120, seed=s) for s in (1, 2, 3, 4)]
    eng = SuperstepEngine(num_parts=3, symmetrize=True).load_edges(
        edges_ds(batches[0]), streaming=True
    )
    seen = list(batches[0])
    eng.run(CCProgram(), max_iters=100)
    for b in batches[1:]:
        eng.extend_edges(edges_ds(b))
        seen += b
        eng.run(CCProgram(), max_iters=100, warm_start=True)
        got = {
            r["v"]: r["label"]
            for r in eng.state_dataset(columns=["label"]).take_all()
        }
        want = cc_oracle(seen)
        # engine ids are the uint64 view of int64 — nonneg here, direct
        assert got == want
    eng.shutdown()


def test_streaming_pagerank_warm_restart():
    b1 = random_edges(60, 150, seed=7)
    b2 = random_edges(60, 150, seed=8)
    eng = SuperstepEngine(num_parts=3).load_edges(edges_ds(b1), streaming=True)
    eng.run(PageRankProgram(tol=1e-10), max_iters=100)
    eng.extend_edges(edges_ds(b2))
    s = eng.run(PageRankProgram(tol=1e-10), max_iters=100, warm_start=True)
    got = {r["v"]: r["rank"] for r in eng.state_dataset(columns=["rank"]).take_all()}
    eng.shutdown()
    want = pagerank_oracle(sorted(set(b1 + b2)), tol=1e-12, max_iters=500)
    # warm restart converges to the same fixpoint on the extended graph;
    # note warm init is not a probability distribution, but the PageRank
    # update is a contraction to the same unique fixpoint either way
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-5, (v, got[v], want[v])


def test_incremental_merge_equals_cold_rebuild():
    """The incremental (searchsorted-merge) finalize must produce
    bit-identical edge structures to a cold build of the union — the
    delta-only update_edge_info contract (reference
    src/hoover.cpp:450-600), including batch-vs-prior dedup and
    batch-internal dedup."""
    import numpy as np
    import ray

    batches = [random_edges(200, 700, seed=s) for s in (11, 12, 13)]
    batches[1] += batches[0][:50]  # duplicates across batches
    batches[2] += batches[2][:30]  # duplicates inside a batch
    eng = SuperstepEngine(num_parts=4, symmetrize=True).load_edges(
        edges_ds(batches[0]), streaming=True
    )
    for b in batches[1:]:
        eng.extend_edges(edges_ds(b))
        assert eng.last_rebuild["mode"] == "incremental"
    cold = SuperstepEngine(num_parts=4, symmetrize=True).load_edges(
        edges_ds([e for b in batches for e in b])
    )
    assert cold.last_rebuild["mode"] == "full"
    got = ray.get([a.edge_arrays.remote() for a in eng.actors])
    want = ray.get([a.edge_arrays.remote() for a in cold.actors])
    for (gs, gd, gp), (ws, wd, wp) in zip(got, want):
        np.testing.assert_array_equal(gp, wp)
        np.testing.assert_array_equal(gd, wd)
        np.testing.assert_array_equal(gs, ws)
    # phase 2 (vertex index, degrees, CSR order) must ALSO be identical
    # between the incremental remap and the full rebuild
    got_i = ray.get([a.index_arrays.remote() for a in eng.actors])
    want_i = ray.get([a.index_arrays.remote() for a in cold.actors])
    for g, w in zip(got_i, want_i):
        for ga, wa in zip(g, w):
            np.testing.assert_array_equal(ga, wa)
    # and the delta exchange must reproduce the full exchange's outgoing
    # indices (stored-index shift + new-id splice == full re-answer)
    got_x = ray.get([a.exchange_arrays.remote() for a in eng.actors])
    want_x = ray.get([a.exchange_arrays.remote() for a in cold.actors])
    for (gr, ge), (wr, we) in zip(got_x, want_x):
        np.testing.assert_array_equal(ge, we)
        for ga, wa in zip(gr, wr):
            np.testing.assert_array_equal(ga, wa)
    eng.shutdown()
    cold.shutdown()


def test_incremental_merge_with_deletions_equals_cold():
    """Deletions compact the sorted run in place (order-preserving mask);
    a later insert batch still merges incrementally and matches a cold
    build of the surviving edge set."""
    import numpy as np
    import ray

    b0 = random_edges(150, 500, seed=21)
    dels = b0[::5]
    b1 = random_edges(150, 300, seed=22)
    eng = SuperstepEngine(num_parts=4, symmetrize=True).load_edges(
        edges_ds(b0), streaming=True
    )
    eng.delete_edges(edges_ds(dels))
    eng.extend_edges(edges_ds(b1))
    assert eng.last_rebuild["mode"] == "incremental"
    # symmetrized deletion removes BOTH directions of each deleted pair
    gone = set(dels) | {(b, a) for a, b in dels}
    survivors = [e for e in b0 if e not in gone] + b1
    cold = SuperstepEngine(num_parts=4, symmetrize=True).load_edges(edges_ds(survivors))
    got = ray.get([a.edge_arrays.remote() for a in eng.actors])
    want = ray.get([a.edge_arrays.remote() for a in cold.actors])
    for (gs, gd, gp), (ws, wd, wp) in zip(got, want):
        np.testing.assert_array_equal(gp, wp)
        np.testing.assert_array_equal(gd, wd)
        np.testing.assert_array_equal(gs, ws)
    eng.shutdown()
    cold.shutdown()
