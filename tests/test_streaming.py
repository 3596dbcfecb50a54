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
