"""Benchmark harness (driver contract: prints ONE JSON line to stdout).

Headline pipeline: deterministic synthetic Common-Crawl-style pages
(power-law outlinks) -> text+link extraction -> hashed edge table ->
PageRank (10 fixed iterations), connected components (to convergence),
label propagation (5 iters), triangle count — plus the doc-ops track
(MinHash dedup, knn, windows) over $GRAFT_SF_DIR tables.

Scaling evidence (BASELINE.json: >=0.8 efficiency N -> 4N):
``python bench.py --scaling`` runs the identical job on identical input
in fresh processes at num_cpus=8 and num_cpus=32 with the SAME
partition count P, and reports PageRank edges/sec at both plus
efficiency = (tp_32 / tp_8) / 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "100000"))
N_SITES = 64
NUM_PARTS = int(os.environ.get("GRAFT_BENCH_PARTS", "32"))  # fixed across scaling runs
PR_ITERS = 10
LP_ITERS = 5


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data

    from linkgraph import synth
    from linkgraph.algos.cc import CCProgram
    from linkgraph.algos.labelprop import LabelPropProgram
    from linkgraph.algos.pagerank import PageRankProgram
    from linkgraph.algos.triangles import triangle_count
    from linkgraph.edges import build_edges
    from linkgraph.engine import SuperstepEngine

    q: dict[str, float] = {}
    extra: dict[str, float] = {}
    t_all = time.perf_counter()

    # 1. pages -> extraction -> deduplicated hashed edge table
    t0 = time.perf_counter()
    pages = synth.pages_dataset(N_PAGES, N_SITES, parallelism=NUM_CPUS * 4)
    edges = build_edges(pages).materialize()
    n_edges = edges.count()
    q["extract_edges"] = time.perf_counter() - t0
    extra["n_pages"] = N_PAGES
    extra["n_edges"] = n_edges
    extra["pages_per_sec_extract"] = round(N_PAGES / q["extract_edges"], 1)

    # 2. graph load (hash shuffle into partition-pinned actors)
    t0 = time.perf_counter()
    eng_dir = SuperstepEngine(num_parts=NUM_PARTS).load_edges(edges)
    q["graph_load"] = time.perf_counter() - t0

    # 3. PageRank, 10 fixed supersteps
    t0 = time.perf_counter()
    s = eng_dir.run(PageRankProgram(tol=0.0), max_iters=PR_ITERS)
    q["pagerank_10"] = time.perf_counter() - t0
    extra["pagerank_edges_per_sec"] = round(s["edges_per_sec"], 1)
    eng_dir.shutdown()

    # 4. CC to convergence + LP on the symmetrized graph (one load, two programs)
    t0 = time.perf_counter()
    eng_sym = SuperstepEngine(num_parts=NUM_PARTS, symmetrize=True).load_edges(edges)
    q["graph_load_sym"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    s_cc = eng_sym.run(CCProgram(), max_iters=100)
    q["cc_converge"] = time.perf_counter() - t0
    extra["cc_iterations"] = s_cc["iterations"]
    extra["cc_edges_per_sec"] = round(s_cc["edges_per_sec"], 1)
    t0 = time.perf_counter()
    eng_sym.run(LabelPropProgram(), max_iters=LP_ITERS)
    q["labelprop_5"] = time.perf_counter() - t0
    eng_sym.shutdown()

    # 5. triangles (join pipeline)
    t0 = time.perf_counter()
    extra["n_triangles"] = triangle_count(edges)
    q["triangles"] = time.perf_counter() - t0

    # 6. doc-ops track over the sf tables
    from linkgraph.ops import knn_cosine, minhash_dedup_pairs, tumbling_window

    t0 = time.perf_counter()
    docs = ray.data.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    minhash_dedup_pairs(docs.select_columns(["doc_id", "text"]), threshold=0.7).count()
    q["minhash_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    emb = ray.data.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    knn_cosine(emb, [0, 1, 2, 3, 4], k=10).count()
    q["knn_cosine"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ev = ray.data.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    tumbling_window(ev, minutes=60).count()
    q["tumbling_window"] = time.perf_counter() - t0

    total = time.perf_counter() - t_all
    result = {
        "metric": "linkgraph_bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in q.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "num_parts": NUM_PARTS,
        **extra,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, same input, fresh processes at 8 and 32 CPUs."""
    out = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        out[ncpu] = json.loads(r.stdout.strip().splitlines()[-1])
    tp8 = out[8]["pagerank_edges_per_sec"]
    tp32 = out[32]["pagerank_edges_per_sec"]
    eff = (tp32 / tp8) / (32 / 8)
    # end-to-end (extraction+graph) efficiency as a second signal
    core8 = sum(out[8]["queries"][k] for k in ("extract_edges", "graph_load", "pagerank_10", "cc_converge"))
    core32 = sum(out[32]["queries"][k] for k in ("extract_edges", "graph_load", "pagerank_10", "cc_converge"))
    eff_e2e = (core8 / core32) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "pagerank_edges_per_sec_8": tp8,
        "pagerank_edges_per_sec_32": tp32,
        "core_sec_8": round(core8, 3),
        "core_sec_32": round(core32, 3),
        "scaling_efficiency_e2e": round(eff_e2e, 3),
        "num_parts": NUM_PARTS,
        "n_pages": N_PAGES,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
