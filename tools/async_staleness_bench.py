"""Bounded-staleness (async-slack) experiment — round-4 VERDICT item
10, the reference's defining execution trait (its default async mode;
our BSP default corresponds to HVR_STRICT).

Runs PageRank to tol on an RMAT graph under BSP (staleness=0) and
stale-by-{1,2} remote-message application, reporting supersteps to
convergence, wall time, and the L1 distance of the final ranks from
the BSP fixpoint (asynchronous iteration of a contraction converges to
the SAME fixpoint — the distance shows how close at the stop rule).

Run: python tools/async_staleness_bench.py [--scale 20] [--parts 32]
Emits one JSON line per arm.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--edge-factor", type=int, default=8)
    ap.add_argument("--parts", type=int, default=32)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from linkgraph.algos.pagerank import PageRankProgram
    from linkgraph.engine import SuperstepEngine
    from linkgraph.synth import rmat_dataset

    edges = rmat_dataset(args.edge_factor << args.scale, scale=args.scale, seed=7).materialize()
    base = None
    for s in (0, 1, 2):
        eng = SuperstepEngine(num_parts=args.parts).load_edges(edges)
        t0 = time.perf_counter()
        m = eng.run(PageRankProgram(tol=args.tol), max_iters=200, staleness=s)
        dt = time.perf_counter() - t0
        ranks = (
            eng.state_dataset(columns=["rank"])
            .to_pandas()
            .sort_values("v")["rank"]
            .to_numpy()
        )
        eng.shutdown()
        if s == 0:
            base = ranks
        print(
            json.dumps(
                {
                    "arm": f"stale-{s}" if s else "bsp",
                    "iters": m["iterations"],
                    "converged": m["converged"],
                    "wall_sec": round(dt, 3),
                    "edges_per_sec": round(m["edges_per_sec"]),
                    "l1_vs_bsp": float(np.abs(ranks - base).sum()),
                }
            ),
            flush=True,
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
