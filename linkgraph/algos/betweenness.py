"""Approximate betweenness centrality: multi-source Brandes over the
undirected graph, one engine run.

Each sampled source costs one forward BFS (hop distance + shortest-path
counts sigma) and one level-synchronous backward sweep (dependency
delta), all expressed as the engine's packed sum-exchange — the same
physical plan as PageRank, so the 100-TB scale story is identical: no
per-source adjacency rebuild, no driver-side graph, O(E) per superstep.
Sampling k sources gives the standard unbiased estimator (Brandes &
Pich 2007): bc_hat(v) = (n/k) * sum_s delta_s(v) when normalize=True.

Semantics checked against a pure-Python Brandes oracle in
tests/test_betweenness.py. (Reference analogue: SURVEY.md §2.5 —
the reference ships BFS/centrality-style vertex programs over the
same scatter/gather runtime; betweenness composes its update_distances
forward pass, src/hoover.cpp:2024-2056, with a reverse accumulation.)
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram


class BrandesProgram(VertexProgram):
    """Two-phase per source: phase 0 forward (discover dist level by
    level, sigma = sum of predecessor sigmas), phase 1 backward
    (delta(v) += sigma(v) * sum over successors w of (1+delta(w)) /
    sigma(w), levels Lmax..1), phase 2 harvest bc += delta and reseed
    the next source. Driver globals carry (phase, lvl, si); apply()
    precomputes the next scatter into state['sval'] so vertex_values
    stays a pure state read. burst_safe=False: every superstep's phase
    transition is a driver decision."""

    reduce = "sum"
    state_columns = ("bc",)
    burst_safe = False

    def __init__(self, sources):
        self.sources = [
            np.int64(s).astype(np.uint64) if s < 0 else np.uint64(s) for s in sources
        ]

    @staticmethod
    def _seed(ctx, st, s):
        i = int(np.searchsorted(ctx.verts, s))
        if i < ctx.n_local and ctx.verts[i] == s:
            st["dist"][i] = 0.0
            st["sigma"][i] = 1.0
            st["sval"][i] = 1.0

    def init_state(self, ctx):
        n = ctx.n_local
        st = {
            "dist": np.full(n, np.inf),
            "sigma": np.zeros(n),
            "delta": np.zeros(n),
            "bc": np.zeros(n),
            "sval": np.zeros(n),
        }
        self._seed(ctx, st, self.sources[0])
        return st

    def vertex_values(self, ctx):
        return ctx.state["sval"]

    def driver_init(self, stats):
        return {"phase": 0, "lvl": 1, "si": 0, "Lmax": 0}

    def apply(self, ctx, idx, vals, g):
        st = ctx.state
        dist, sigma, delta, sval = st["dist"], st["sigma"], st["delta"], st["sval"]
        phase, lvl = g["phase"], g["lvl"]
        n_new = 0
        if phase == 0:
            if len(idx):
                fresh = np.isinf(dist[idx]) & (vals > 0)
                fi = idx[fresh]
                dist[fi] = float(lvl)
                sigma[fi] = vals[fresh]
                n_new = len(fi)
            sval[:] = 0.0
            mask = dist == float(lvl)
            sval[mask] = sigma[mask]
        elif phase == 1:
            if len(idx):
                take = dist[idx] == float(lvl)
                ti = idx[take]
                delta[ti] += sigma[ti] * vals[take]
            sval[:] = 0.0
            mask = dist == float(lvl)
            # discovered vertices always have sigma >= 1
            sval[mask] = (1.0 + delta[mask]) / sigma[mask]
        else:  # phase 2: harvest this source, reseed the next
            fin = np.isfinite(dist) & (dist > 0)
            st["bc"][fin] += delta[fin]
            dist[:] = np.inf
            sigma[:] = 0.0
            delta[:] = 0.0
            sval[:] = 0.0
            si = g["si"]
            if si < len(self.sources):
                self._seed(ctx, st, self.sources[si])
        return {"n_new": n_new}

    def driver_step(self, stats, g, it):
        phase = g["phase"]
        m = {"phase": phase, "lvl": g["lvl"], "si": g["si"]}
        if phase == 0:
            n_new = int(sum(s["n_new"] for s in stats))
            m["n_new"] = n_new
            if n_new:
                g = {**g, "lvl": g["lvl"] + 1, "Lmax": g["lvl"]}
            elif g["Lmax"] == 0:  # isolated source: straight to harvest
                g = {**g, "phase": 2, "si": g["si"] + 1}
            else:
                g = {**g, "phase": 1, "lvl": g["Lmax"]}
        elif phase == 1:
            if g["lvl"] > 1:
                g = {**g, "lvl": g["lvl"] - 1}
            else:
                g = {**g, "phase": 2, "si": g["si"] + 1}
        else:
            if g["si"] >= len(self.sources):
                return g, True, m
            g = {**g, "phase": 0, "lvl": 1, "Lmax": 0}
        return g, False, m


def top_degree_sources(edges, k: int) -> list[int]:
    """Deterministic source sample: the k vertices with the highest
    undirected degree, ties broken by smaller id. Distributed combiner
    count + small sort; only k ids reach the driver."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def ends(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        keep = s != d
        v, c = np.unique(np.concatenate([s[keep], d[keep]]), return_counts=True)
        return pa.table({"v": pa.array(v), "_c": pa.array(c.astype(np.int64))})

    deg = (
        edges.map_batches(ends, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("v")
        .aggregate(Sum("_c", alias_name="deg"))
    )

    def neg(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t.column("v"), "negdeg": pa.array(-t.column("deg").to_numpy())}
        )

    top = deg.map_batches(neg, batch_format="pyarrow").sort(["negdeg", "v"]).limit(k)
    return [int(r["v"]) for r in top.take(k)]


def betweenness(
    edges,
    k_sources: int = 4,
    sources: list[int] | None = None,
    num_parts: int = 8,
    max_iters: int = 400,
    normalize: bool = False,
    engine: SuperstepEngine | None = None,
):
    """edges -> (Dataset(v, bc), summary, engine). bc is the raw Brandes
    dependency sum over the sampled sources (directions counted once per
    ordered (s, t) pair, the undirected-multigraph convention); with
    normalize=True it is scaled by n_vertices / n_sources (the sampling
    estimator)."""
    if sources is None:
        sources = top_degree_sources(edges, k_sources)
    eng = engine or SuperstepEngine(num_parts=num_parts, symmetrize=True).load_edges(
        edges
    )
    summary = eng.run(BrandesProgram(sources), max_iters=max_iters)
    out = eng.state_dataset(id_col="v", columns=["bc"])
    if normalize:
        import pyarrow as pa

        scale = summary["n_vertices"] / max(len(sources), 1)

        def sc(t: pa.Table) -> pa.Table:
            return pa.table(
                {"v": t.column("v"), "bc": pa.array(t.column("bc").to_numpy() * scale)}
            )

        out = out.map_batches(sc, batch_format="pyarrow")
    return out, summary, eng
