"""Engine-level behavior: checkpoint/resume mid-convergence, metrics
lineage, degree tables (SURVEY.md §7 steps 3, 6)."""

import json
import os

import pyarrow as pa
import pytest

import ray.data

from linkgraph.algos import pagerank
from linkgraph.algos.pagerank import PageRankProgram
from linkgraph.edges import degree_histogram, in_degrees, out_degrees
from linkgraph.engine import SuperstepEngine
from oracles import pagerank_oracle, random_edges


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def test_degree_tables():
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 0)]
    ds = edges_ds(edges)
    out = {r["src"]: r["out_deg"] for r in out_degrees(ds).take_all()}
    assert out == {0: 3, 1: 1, 2: 1}
    ind = {r["dst"]: r["in_deg"] for r in in_degrees(ds).take_all()}
    assert ind == {1: 1, 2: 2, 3: 1, 0: 1}
    hist = {r["deg"]: r["n_vertices"] for r in degree_histogram(ds).take_all()}
    assert hist == {3: 1, 1: 2}


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    edges = random_edges(120, 500, seed=3)
    ds = edges_ds(edges)

    # uninterrupted run
    out, s_full, eng = pagerank(ds, num_parts=3, tol=1e-12, max_iters=40)
    want = {r["v"]: r["rank"] for r in out.take_all()}
    eng.shutdown()

    # interrupted run: stop after 7 iterations, then resume from checkpoint
    ck = str(tmp_path / "ck")
    eng1 = SuperstepEngine(num_parts=3).load_edges(ds)
    eng1.run(
        PageRankProgram(tol=1e-12),
        max_iters=7,
        checkpoint_dir=ck,
        checkpoint_every=3,
    )
    eng1.shutdown()  # simulate driver death

    eng2 = SuperstepEngine(num_parts=3).load_edges(ds)
    summary = eng2.run(
        PageRankProgram(tol=1e-12),
        max_iters=40,
        checkpoint_dir=ck,
        checkpoint_every=5,
        resume=True,
    )
    out2 = eng2.state_dataset(id_col="v", columns=["rank"])
    got = {r["v"]: r["rank"] for r in out2.take_all()}
    eng2.shutdown()

    assert summary["iterations"] == s_full["iterations"]  # resumed, not restarted
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12

    # metrics + manifest lineage present
    lines = [json.loads(l) for l in open(os.path.join(ck, "metrics.jsonl"))]
    assert all("iter" in m and "sec" in m and "delta" in m for m in lines)
    manifests = sorted(
        d for d in os.listdir(ck) if d.startswith("iter=")
    )
    mf = json.load(open(os.path.join(ck, manifests[-1], "MANIFEST.json")))
    assert mf["num_parts"] == 3 and "lineage" in mf and "globals" in mf


def test_partition_count_invariance():
    edges = random_edges(100, 400, seed=9)
    ds = edges_ds(edges)
    results = []
    for parts in (1, 2, 5):
        out, _, eng = pagerank(ds, num_parts=parts, tol=1e-12)
        results.append(sorted((r["v"], round(r["rank"], 12)) for r in out.take_all()))
        eng.shutdown()
    assert results[0] == results[1] == results[2]


def test_checkpoint_wrong_partition_count_ignored(tmp_path):
    edges = random_edges(50, 150, seed=5)
    ds = edges_ds(edges)
    ck = str(tmp_path / "ck")
    eng1 = SuperstepEngine(num_parts=2).load_edges(ds)
    eng1.run(PageRankProgram(), max_iters=4, checkpoint_dir=ck, checkpoint_every=2)
    eng1.shutdown()
    # resume with different P: checkpoint must be ignored (fresh start), not corrupt
    eng2 = SuperstepEngine(num_parts=3).load_edges(ds)
    s = eng2.run(PageRankProgram(tol=1e-12), max_iters=30, checkpoint_dir=str(tmp_path / "ck2"), resume=True)
    got = {r["v"]: r["rank"] for r in eng2.state_dataset(columns=["rank"]).take_all()}
    eng2.shutdown()
    want = pagerank_oracle(edges, tol=1e-12)
    assert all(abs(got[v] - want[v]) < 1e-6 for v in want)
