"""In-engine two-level exchange benchmark — VERDICT r4 item 2.

Unlike tools/exchange_tree_bench.py (which isolated the exchange
pattern synthetically), this runs the REAL engine end-to-end on an
RMAT graph with the node-topology relay actually wired into the
superstep DAG (SuperstepEngine(node_groups=G)), and reports:

  - PageRank + CC wall time / edges-per-sec, flat vs G in {2, 4}
  - analytic pulls-per-superstep: flat P^2 vs two-level P + G*P
  - bit-exactness check of the final ranks between arms

On ONE node every pull is a shared-memory ref resolution, so flat is
expected to win here (round-4 finding); the point of this artifact is
that the relay path's measured overhead is small and the results are
bit-identical, so on a real G-node cluster — where each bundle crosses
the interconnect once instead of every packed object landing on every
node — the same flag turns on the G*P+P exchange.

Run: python tools/two_level_engine_bench.py [--scale 20] [--parts 32]
Emits one JSON line per (arm, algo).
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from linkgraph.algos.cc import CCProgram
    from linkgraph.algos.pagerank import PageRankProgram
    from linkgraph.engine import SuperstepEngine
    from linkgraph.synth import rmat_dataset

    edges = rmat_dataset(args.edge_factor << args.scale, scale=args.scale, seed=7).materialize()
    P = args.parts
    ranks = {}
    for G in (None, 2, 4):
        arm = "flat" if G is None else f"G={G}"
        pulls = P * P if G is None else P + G * P
        eng = SuperstepEngine(num_parts=P, node_groups=G).load_edges(edges)
        for name, prog_fn, kw in (
            ("pagerank", lambda: PageRankProgram(tol=0.0), {"max_iters": args.iters}),
            ("cc", CCProgram, {"max_iters": 50}),
        ):
            if name == "cc":
                eng2 = SuperstepEngine(
                    num_parts=P, symmetrize=True, node_groups=G
                ).load_edges(edges)
            else:
                eng2 = eng
            t0 = time.perf_counter()
            m = eng2.run(prog_fn(), **kw)
            dt = time.perf_counter() - t0
            if name == "pagerank":
                df = (
                    eng2.state_dataset(columns=["rank"])
                    .to_pandas()
                    .sort_values("v")
                    .reset_index(drop=True)
                )
                ranks[arm] = df["rank"].to_numpy()
            if name == "cc":
                eng2.shutdown()
            print(
                json.dumps(
                    {
                        "arm": arm,
                        "algo": name,
                        "parts": P,
                        "pulls_per_superstep": pulls,
                        "iters": m["iterations"],
                        "wall_sec": round(dt, 3),
                        "edges_per_sec": round(m["edges_per_sec"]),
                        "n_edges": m["n_edges"],
                    }
                ),
                flush=True,
            )
        eng.shutdown()
    flat = ranks["flat"]
    for arm, r in ranks.items():
        same = bool(np.array_equal(flat.view(np.int64), r.view(np.int64)))
        print(json.dumps({"arm": arm, "bit_exact_vs_flat": same}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
