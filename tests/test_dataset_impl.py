"""Pure-Dataset-ops kernel variants match the same oracles as the actor
engine (SURVEY.md §7 step 4a vs 4b)."""

import pyarrow as pa

import ray.data

from linkgraph.algos.dataset_impl import cc_dataset, pagerank_dataset
from oracles import FIXTURE_GRAPHS, cc_oracle, pagerank_oracle, random_edges


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def test_pagerank_dataset_matches_engine_oracle():
    edges = FIXTURE_GRAPHS["two_cliques_bridge"] + [(9, 1)]  # add a dangling-ish vertex
    got = {r["v"]: r["rank"] for r in pagerank_dataset(edges_ds(edges), iters=6, num_partitions=2).take_all()}
    want = pagerank_oracle(edges, tol=0, max_iters=6)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])


def test_cc_dataset_matches_oracle():
    edges = random_edges(60, 120, seed=21)
    got = {r["v"]: r["label"] for r in cc_dataset(edges_ds(edges), num_partitions=2).take_all()}
    assert got == cc_oracle(edges)
