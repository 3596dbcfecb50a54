"""Bow-tie decomposition of a directed web graph (Broder et al.,
"Graph structure in the Web", WWW 2000): classify every vertex
relative to the largest strongly connected component as

    CORE     — member of the largest SCC,
    IN       — reaches the core (but is not in it),
    OUT      — reachable from the core (but not in it),
    TENDRIL  — weakly connected to the core, neither IN nor OUT
               (includes Broder's tubes and tendrils),
    DISC     — in another weak component entirely.

Pipeline (everything stays on the engine actors — no driver-side
graph):

1. SCC via the forward-backward peeling engine (algos/scc.py) with
   ``keep_engines=True`` — the final per-partition scc state stays on
   the backward engine's actors.
2. The core label is the scc with the most members (tie: max label),
   found with a per-block partial-argmax combiner over the tiny
   (scc, count) aggregate — no global sort.
3. Two seeded reachability fixpoints: forward on the original
   orientation (=> OUT) and forward on the transposed engine
   (=> vertices that reach the core, i.e. IN). Both programs seed
   themselves from the imported scc state ref (reach := scc == core)
   — the seed set never transits the driver.
4. Weak connectivity for TENDRIL vs DISC comes from the undirected
   min-label CC (algos/cc.py); the classification is one hash join of
   the two per-vertex state datasets.

(Reference analogue: SURVEY.md §2.5 applications family — this is the
web-graph structural analysis the reference's SCC/CC building blocks
exist to serve; the multi-phase state handoff mirrors the coupled
pattern of test/pas.cpp via engine state refs.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..engine import VertexProgram
from .cc import connected_components
from .scc import NA, UMAX, strongly_connected_components

_ZERO = np.uint64(0)


class _ReachBase(VertexProgram):
    """Flag fixpoint: reach spreads along the engine's edge orientation
    from the seed set {v : scc(v) == core}. Ships 0 (flagged) / UMAX
    through the min-reduce combiner; monotone, so frontier-gated."""

    reduce = "min"
    conv_tol = 0.5
    frontier = True
    col = "reach"  # overridden by subclasses

    def __init__(self, core: int):
        self.core = (
            np.int64(core).astype(np.uint64) if core < 0 else np.uint64(core)
        )

    def conv_stat(self, stats):
        return float(stats["changed"])

    def init_state(self, ctx):
        # scc is overwritten by the imported ref right after this
        return {
            self.col: np.zeros(ctx.n_local, np.uint8),
            "scc": np.full(ctx.n_local, NA, np.uint64),
        }

    def vertex_values(self, ctx):
        st = ctx.state
        if not getattr(self, "_seeded", False):
            st[self.col] = (st["scc"] == self.core).astype(np.uint8)
            self._seeded = True
        return np.where(st[self.col] == 1, _ZERO, UMAX)

    def apply(self, ctx, idx, vals, g):
        st = ctx.state
        changed = 0
        ctx.changed_idx = np.empty(0, np.int64)
        if len(idx):
            acc = (st[self.col][idx] == 0) & (vals == _ZERO)
            changed = int(acc.sum())
            st[self.col][idx[acc]] = 1
            ctx.changed_idx = idx[acc]
        return {"changed": changed}

    def driver_step(self, stats, g, it):
        changed = int(sum(s["changed"] for s in stats))
        return g, changed == 0, {"flags_set": changed}


class _ReachOut(_ReachBase):
    state_columns = ("reach_out", "scc")
    col = "reach_out"


class _ReachIn(_ReachBase):
    state_columns = ("reach_in", "scc")
    col = "reach_in"


def _largest_scc(scc_out: Dataset) -> int:
    """Core label = scc with the most members, tie-broken by max label.
    Per-block partial argmax over the (scc, count) aggregate keeps the
    driver read to one row per block."""

    def top1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"scc": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        lab = t.column("scc").to_numpy()
        n = t.column("count()").to_numpy()
        i = np.lexsort((lab, n))[-1]
        return pa.table({"scc": pa.array([lab[i]]), "n": pa.array([int(n[i])])})

    parts = scc_out.groupby("scc").count().map_batches(top1, batch_format="pyarrow").take_all()
    best = max(parts, key=lambda r: (r["n"], r["scc"]))
    return int(best["scc"])


def bowtie(
    edges: Dataset,
    num_parts: int = 8,
    max_iters: int = 200,
    num_partitions_join: int | None = None,
) -> tuple[Dataset, dict]:
    """edges (src, dst; directed) -> (Dataset(v, cls), summary)."""
    edges = edges.materialize()

    scc_out, summ, eng_f, eng_b = strongly_connected_components(
        edges, num_parts=num_parts, max_iters=max_iters, keep_engines=True
    )
    core = _largest_scc(scc_out)

    refs = eng_b.export_state_refs(["scc"])
    s_out = eng_f.run(_ReachOut(core), max_iters=max_iters, import_state=refs)
    s_in = eng_b.run(_ReachIn(core), max_iters=max_iters, import_state=refs)
    eng_b.import_state_refs(eng_f.export_state_refs(["reach_out"]))
    st = eng_b.state_dataset(id_col="v", columns=["scc", "reach_in", "reach_out"])

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("v"),
                "scc": pa.array(t.column("scc").to_numpy().astype(np.int64)),
                "reach_in": t.column("reach_in"),
                "reach_out": t.column("reach_out"),
            }
        )

    st = st.map_batches(cast, batch_format="pyarrow").materialize()
    eng_f.shutdown()
    eng_b.shutdown()

    cc_out, _, eng_c = connected_components(edges, num_parts=num_parts)
    cc_out = cc_out.materialize()
    eng_c.shutdown()

    def pick(t: pa.Table) -> pa.Table:
        m = t.column("v").to_numpy() == core
        return pa.table({"label": pa.array(t.column("label").to_numpy()[m])})

    cc_core = int(cc_out.map_batches(pick, batch_format="pyarrow").take_all()[0]["label"])

    P = num_partitions_join or max(2, num_parts)
    joined = st.join(cc_out, join_type="inner", num_partitions=P, on=("v",))

    _CLS = np.array(["CORE", "IN", "OUT", "TENDRIL", "DISC"])

    def classify(t: pa.Table) -> pa.Table:
        scc = t.column("scc").to_numpy()
        rin = t.column("reach_in").to_numpy()
        rout = t.column("reach_out").to_numpy()
        lab = t.column("label").to_numpy()
        code = np.select(
            [scc == core, rin == 1, rout == 1, lab == cc_core],
            [0, 1, 2, 3],
            default=4,
        )
        return pa.table({"v": t.column("v"), "cls": pa.array(_CLS[code])})

    out = joined.map_batches(classify, batch_format="pyarrow")
    summary = {
        **summ,
        "core": core,
        "out_iters": s_out["iterations"],
        "in_iters": s_in["iterations"],
    }
    return out, summary
