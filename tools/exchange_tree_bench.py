"""Two-level (tree) packed-exchange experiment — VERDICT r3 item 9.

The engine's superstep exchange is FLAT: each of P partition actors
publishes ONE packed message object and every actor reads all P of them
-> P^2 object reads per superstep (engine.py module docstring "Scale
notes"). This experiment isolates that exchange pattern and measures a
TWO-LEVEL alternative at increasing P:

  flat : P sources publish; P dests each read P objects      (P^2 reads)
  tree : sources publish once (as flat); G aggregators each read
         the P source objects, merge their group's g = P/G
         sections into one object; members read 1 object each
                                                             (G*P + P reads)

Message payloads mimic the engine's packed blocks (int32 dst-local
indices + float64 values, combiner-reduced), sized from an RMAT-like
degree draw so hub skew is present. Compute per superstep is the same
in both arms (the merge work the aggregators do is work the dests
would do in flat), so the difference is pure exchange overhead.

Run:  python tools/exchange_tree_bench.py [--steps 20]
Emits one JSON line per (P, arm) plus a crossover summary.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import ray


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


@ray.remote(num_cpus=0)  # P actors must coexist at P > cores; work is tiny
class Part:
    """One partition: holds a per-destination message plan (sizes drawn
    RMAT-ishly once) and packs/merges like the engine's packed blocks."""

    def __init__(self, pid: int, P: int, rows_per_dest: int, seed: int):
        rng = np.random.default_rng(seed * 1000 + pid)
        # hub skew: a few destinations get 10x traffic
        w = rng.pareto(1.3, P) + 1.0
        w = w / w.sum()
        self.sizes = np.maximum((w * rows_per_dest * P).astype(np.int64), 8)
        self.P = P
        self.pid = pid
        self.idx = [
            rng.integers(0, 1 << 20, s).astype(np.int32) for s in self.sizes
        ]
        self.vals = [rng.random(s) for s in self.sizes]
        self.state = np.zeros(1 << 20)

    def pack(self):
        """One packed object: contiguous arrays + per-dest offsets
        (the engine's scatter_packed layout)."""
        offs = np.zeros(self.P + 1, np.int64)
        np.cumsum(self.sizes, out=offs[1:])
        return {
            "offs": offs,
            "idx": np.concatenate(self.idx),
            "vals": np.concatenate(self.vals),
        }

    def gather_flat(self, packed_refs):
        """Read all P packed objects, reduce own slice (flat dest)."""
        packed = ray.get(list(packed_refs))
        acc_i = []
        acc_v = []
        for pk in packed:
            lo, hi = pk["offs"][self.pid], pk["offs"][self.pid + 1]
            acc_i.append(pk["idx"][lo:hi])
            acc_v.append(pk["vals"][lo:hi])
        i = np.concatenate(acc_i)
        v = np.concatenate(acc_v)
        np.add.at(self.state, i, v)  # the 'apply'
        return len(i)

    def aggregate(self, gid: int, G: int, packed_refs):
        """Tree level 1: read the P source objects, slice out THIS
        group's g destination sections, merge into one packed object.
        Sources publish exactly as in flat (one object each)."""
        packed = ray.get(list(packed_refs))
        g = self.P // G
        lo_d = gid * g
        sizes = np.zeros(g, np.int64)
        for pk in packed:
            sizes += np.diff(pk["offs"][lo_d : lo_d + g + 1])
        offs = np.zeros(g + 1, np.int64)
        np.cumsum(sizes, out=offs[1:])
        idx = np.empty(int(sizes.sum()), np.int32)
        vals = np.empty(int(sizes.sum()), np.float64)
        cur = offs[:-1].copy()
        for pk in packed:
            po = pk["offs"]
            for m in range(g):
                a, b = po[lo_d + m], po[lo_d + m + 1]
                n = b - a
                idx[cur[m] : cur[m] + n] = pk["idx"][a:b]
                vals[cur[m] : cur[m] + n] = pk["vals"][a:b]
                cur[m] += n
        return {"offs": offs, "idx": idx, "vals": vals}

    def gather_tree(self, local: int, pk):
        """Tree level 2: read ONE merged object (auto-resolved by Ray —
        passed as a top-level arg, zero-copy views), reduce own slice."""
        lo, hi = pk["offs"][local], pk["offs"][local + 1]
        i = pk["idx"][lo:hi]
        np.add.at(self.state, i, pk["vals"][lo:hi])
        return len(i)


def run_arm(parts, P: int, G: int | None, steps: int) -> float:
    """Return seconds per superstep (tree when G, flat otherwise)."""
    t0 = time.perf_counter()
    for _ in range(steps):
        if G is None:
            packed = [p.pack.remote() for p in parts]
            ray.get([p.gather_flat.remote(packed) for p in parts])
        else:
            g = P // G
            packed = [p.pack.remote() for p in parts]
            # aggregator role round-robins over the first G actors
            merged = [
                parts[gid % P].aggregate.remote(gid, G, packed) for gid in range(G)
            ]
            futs = []
            for d in range(P):
                gid, local = divmod(d, g)
                futs.append(parts[d].gather_tree.remote(local, merged[gid]))
            ray.get(futs)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--rows-per-dest", type=int, default=2000)
    ap.add_argument("--ps", type=int, nargs="*", default=[16, 32, 64, 128])
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    results = []
    for P in args.ps:
        parts = [Part.remote(i, P, args.rows_per_dest, seed=3) for i in range(P)]
        ray.get([p.pack.remote() for p in parts])  # warm
        # G must DIVIDE P (each of the g = P/G members maps to exactly
        # one aggregator); nearest power-of-two to sqrt(P)
        G = max(2, 1 << ((P.bit_length()) // 2))
        assert P % G == 0, (P, G)
        for arm, Ga in (("flat", None), (f"tree_g{P // G}", G)):
            s0 = _steal()
            sec = run_arm(parts, P, Ga, args.steps)
            share = (_steal() - s0) / (sec * args.steps * 100.0 * os.cpu_count())
            row = {
                "P": P,
                "arm": arm,
                "sec_per_superstep": round(sec, 4),
                "steal_share": round(share, 4),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        for p in parts:
            ray.kill(p)

    # crossover: first P where tree beats flat
    cross = None
    for P in args.ps:
        f = next(r for r in results if r["P"] == P and r["arm"] == "flat")
        t = next(r for r in results if r["P"] == P and r["arm"] != "flat")
        if t["sec_per_superstep"] < f["sec_per_superstep"]:
            cross = P
            break
    print(json.dumps({"crossover_P": cross, "results": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
