"""PageRank as a vertex program on the superstep engine.

Semantics follow the reference's comparison benchmarks (reference
bench/graphx/PageRankExample.scala:45-47 and
bench/giraph/SimplePageRankComputation.java — HOOVER itself ships no
PageRank app, SURVEY.md §2.5):

    rank' = (1-d)/N + d * (sum_in(rank_src / outdeg_src) + dangling_mass / N)

with dangling mass (rank held by zero-out-degree vertices) redistributed
uniformly, converging when sum(|delta|) < tol.
"""

from __future__ import annotations

import numpy as np

from ..engine import SuperstepEngine, VertexProgram


class PageRankProgram(VertexProgram):
    reduce = "sum"
    state_columns = ("rank",)

    def __init__(self, damping: float = 0.85, tol: float = 1e-8, precision: str = "double"):
        """precision='single' ships rank/outdeg contributions as float32
        (gather-side accumulation stays float64): per-partial quantization
        ~6e-8 relative — inside the 1e-6 correctness bar but NOT the
        bit-level partition-count-invariance guarantee, so 'double' is the
        default. The knob halves per-edge message bytes + the hot random
        gather's value-array footprint for bandwidth-starved clusters."""
        self.d = damping
        self.tol = tol
        self.conv_tol = tol if tol > 0 else None
        if precision not in ("double", "single"):
            raise ValueError(precision)
        self.ship_dtype = np.float32 if precision == "single" else None

    def conv_stat(self, stats):
        return stats["delta"]

    def init_state(self, ctx):
        n = ctx.n_local
        return {"rank": np.full(n, 1.0 / max(ctx.n_total, 1), dtype=np.float64)}

    def vertex_values(self, ctx):
        # per-vertex contribution rank(v) / outdeg(v); the engine
        # gathers it onto out-edges per destination partition
        return ctx.state["rank"] * ctx.inv_outdeg

    def scatter_extras(self, ctx):
        # dangling mass of the ranks being scattered; summed across
        # partitions inside the exchange — no driver round-trip
        return {"dangling": float(ctx.state["rank"][ctx.out_deg == 0].sum())}

    def apply(self, ctx, idx, vals, g):
        n, N, d = ctx.n_local, max(ctx.n_total, 1), self.d
        incoming = np.zeros(n, dtype=np.float64)
        if len(idx):
            incoming[idx] = vals
        new = (1.0 - d) / N + d * (incoming + g["dangling"] / N)
        delta = float(np.abs(new - ctx.state["rank"]).sum())
        ctx.state["rank"] = new
        return {"delta": delta}

    def driver_step(self, stats, g, it):
        delta = float(sum(s["delta"] for s in stats))
        return g, delta < self.tol, {"delta": delta}


class PersonalizedPageRankProgram(PageRankProgram):
    """Random walk with restart to a source set S: the teleport vector
    is p(v) = 1/|S| for v in S, 0 elsewhere (topic-sensitive PageRank,
    Haveliwala 2002) — the standard seed-expansion primitive for
    link-graph crawl prioritization.

        rank' = (1-d) p(v) + d (sum_in(rank_u / outdeg_u) + dangling * p(v))

    Dangling mass restarts at the sources too, preserving sum(rank)=1."""

    def __init__(self, sources, damping: float = 0.85, tol: float = 1e-8):
        super().__init__(damping=damping, tol=tol)
        self.sources = np.unique(np.asarray(sources, np.uint64))
        if len(self.sources) == 0:
            raise ValueError("PersonalizedPageRank requires a non-empty source set")

    def _teleport(self, ctx):
        p = np.zeros(ctx.n_local, np.float64)
        if ctx.n_local == 0:
            return p
        pos = np.searchsorted(ctx.verts, self.sources)
        ok = pos < ctx.n_local
        ok[ok] = ctx.verts[pos[ok]] == self.sources[ok]
        p[pos[ok]] = 1.0 / len(self.sources)
        return p

    def init_state(self, ctx):
        p = self._teleport(ctx)
        ctx.ppr_p = p  # cached teleport vector
        return {"rank": p.copy()}

    def apply(self, ctx, idx, vals, g):
        d = self.d
        p = ctx.ppr_p
        incoming = np.zeros(ctx.n_local, dtype=np.float64)
        if len(idx):
            incoming[idx] = vals
        new = (1.0 - d) * p + d * (incoming + g["dangling"] * p)
        delta = float(np.abs(new - ctx.state["rank"]).sum())
        ctx.state["rank"] = new
        return {"delta": delta}


class WeightedPageRankProgram(PageRankProgram):
    """PageRank over weighted edges via the engine's per-edge value
    channel (edge_weight_mode='mul'): the shipped per-source value is
    rank(u) / W(u) with W(u) the total out-edge weight, the engine
    multiplies each copy by its edge's weight where the edge lives, so

        rank' = (1-d)/N + d (sum_in(rank_u * w_uv / W_u) + dangling/N)

    Weights are a deterministic function of the endpoint ids, identical
    in the SQL oracle (linkgraph.algos.sssp.id_weight by default)."""

    edge_weight_mode = "mul"

    def __init__(self, weight_fn=None, damping: float = 0.85, tol: float = 1e-8):
        super().__init__(damping=damping, tol=tol)
        if weight_fn is None:
            from .sssp import id_weight

            weight_fn = id_weight
        self.edge_weight_fn = weight_fn

    def vertex_values(self, ctx):
        w = ctx.w_out_sum
        with np.errstate(divide="ignore", invalid="ignore"):
            v = ctx.state["rank"] / w
        v[w == 0] = 0.0
        return v


def personalized_pagerank(
    edges,
    sources,
    num_parts: int = 8,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iters: int = 100,
    engine: SuperstepEngine | None = None,
):
    """edges (src, dst) + seed set -> (Dataset(v, rank), summary, engine)."""
    eng = engine or SuperstepEngine(num_parts=num_parts).load_edges(edges)
    prog = PersonalizedPageRankProgram(sources, damping=damping, tol=tol)
    summary = eng.run(prog, max_iters=max_iters)
    return eng.state_dataset(id_col="v", columns=["rank"]), summary, eng


def weighted_pagerank(
    edges,
    num_parts: int = 8,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iters: int = 100,
    weight_fn=None,
    engine: SuperstepEngine | None = None,
):
    """edges (src, dst) -> (Dataset(v, rank), summary, engine) with
    deterministic id-derived edge weights."""
    eng = engine or SuperstepEngine(num_parts=num_parts).load_edges(edges)
    prog = WeightedPageRankProgram(weight_fn, damping=damping, tol=tol)
    summary = eng.run(prog, max_iters=max_iters)
    return eng.state_dataset(id_col="v", columns=["rank"]), summary, eng


def pagerank(
    edges,
    num_parts: int = 8,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iters: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    engine: SuperstepEngine | None = None,
    node_groups: int | None = None,
    staleness: int = 0,
):
    """edges Dataset (src, dst) -> (Dataset(v, rank), summary metrics).

    ``node_groups`` wires the two-level node-topology exchange
    (bit-exact vs flat); ``staleness`` enables bounded-staleness
    message application (same fixpoint, engine.run docstring)."""
    eng = engine or SuperstepEngine(
        num_parts=num_parts, node_groups=node_groups
    ).load_edges(edges)
    prog = PageRankProgram(damping=damping, tol=tol)
    summary = eng.run(
        prog,
        max_iters=max_iters,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        staleness=staleness,
    )
    out = eng.state_dataset(id_col="v", columns=["rank"])
    return out, summary, eng
