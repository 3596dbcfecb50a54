"""Minimum spanning forest by distributed Borůvka over deterministic
distinct edge weights.

Weights are the symmetric splitmix edge keys of algos/matching.py
shifted into non-negative int64 (pe = edge_priority >> 1): distinct
w.h.p., so the MSF is UNIQUE and every round is deterministic — the
same bit-exact-SQL-replayable trick that hard-oracles MIS, coloring
and matching. (A data-weighted variant only changes the pe column.)

Per Borůvka round, entirely in Dataset ops:

  1. relabel   edges join the (v, comp) label table twice; keep
               cross-component edges.
  2. arg-min   min pe per component over both directions (groupby
               Min; pe distinct => the min IDENTIFIES one edge).
  3. choose    cross edges whose pe equals either endpoint
               component's min join the forest. With distinct
               weights the chosen set is cycle-free (classic
               Borůvka invariant; each component contributes its
               unique minimum incident edge).
  4. hook      each component points at its min edge's other
               component — out-degree-1 pseudo-forest whose only
               cycles are mutual pairs; break them to
               min(c, p(c)), leaving rooted trees (roots
               self-point).
  5. collapse  the hook pseudo-forest partitions components into
               merge groups; in-driver pointer doubling under the
               size gate, engine min-label CC over the O(#components)
               hook edge list above it (any consistent representative
               per group yields the same partition — the forest is
               invariant to the choice); relabel the edge table.

Components at least halve per round => <= log2(V) rounds; every stage
is a bounded hash join / groupby over (int64, int64) tables — no
driver-side state beyond the loop counter and the cross-edge count.

(Reference analogue: SURVEY.md §2.1 update_vertices iterative family;
the hook/compress structure is the same pointer discipline as the
reference's AVL vertex-map indirection, compressed in bulk.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Min

from ..ops.sortagg import attach_by_key
from .matching import edge_priority


def _rename(ds: Dataset, mapping: dict) -> Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.schema.names])

    return ds.map_batches(fn, batch_format="pyarrow")


def _collapse_hooks_engine(chosen: Dataset, num_parts: int) -> Dataset:
    """Above-gate hook collapse: the hook pseudo-forest (one (c, other)
    edge per active component) partitions components into merge groups;
    ANY consistent representative per group yields the same Borůvka
    partition, so the battle-tested engine min-label CC over the hook
    edge list is the scale path (one engine run over O(#components)
    edges per round). Returns (c, cn)."""
    from .cc import connected_components

    hedges = chosen.map_batches(
        lambda t: pa.table({"src": t.column("c"), "dst": t.column("other")}),
        batch_format="pyarrow",
    )
    out, _, eng = connected_components(hedges, num_parts=num_parts)
    roots = _rename(out, {"v": "c", "label": "cn"}).materialize()
    eng.shutdown()
    return roots


def edge_weight63(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Distinct non-negative int64 edge weight (symmetric)."""
    return (edge_priority(lo, hi) >> np.uint64(1)).astype(np.int64)


def _resolve_np(v: np.ndarray, p: np.ndarray, iters: int = 20) -> np.ndarray:
    """In-driver pointer doubling (gate path): (v, p) with self-pointing
    roots -> root per v, depth up to 2^iters."""
    order = np.argsort(v)
    vs = v[order]
    f = p[order]
    for _ in range(iters):
        nf = f[np.searchsorted(vs, f)]
        if (nf == f).all():
            break
        f = nf
    out = np.empty_like(f)
    out[order] = f
    return out


def spanning_forest(
    edges: Dataset,
    num_partitions: int | None = None,
    max_rounds: int = 40,
    local_resolve_threshold: int = 5_000_000,
) -> tuple[Dataset, Dataset, dict]:
    """edges (src, dst; undirected, self-loops dropped) ->
    (forest edges Dataset(lo, hi), labels Dataset(v, comp), summary).

    The edge table carries its endpoint component labels (ca, cb) as
    columns, refreshed in place each round — so a round is: one count
    (cross edges left?), one groupby (min pe per component), one
    sortagg attach (chosen = rows whose pe IS their component's min),
    a pointer-collapse over the O(#components) hook table (in-driver
    below ``local_resolve_threshold`` — at driver/bench scale the hook
    table is tiny and per-op scheduling latency would dominate; engine
    min-label CC over the hook edges above it), and two attaches to
    relabel the edge table. Everything that scales with |E| is a
    bounded sort/groupby; driver state is O(#hooks) only under the
    gate, matching the guarded-broadcast convention (hostrank,
    embedding_dup).

    The labels are a free byproduct: forest components ARE the
    connected components (cross-checked against the CC oracle in
    tests).
    """
    import ray

    I64 = pa.int64()
    # missing-label sentinel for the outer attaches: int64 min cannot
    # collide with a real component label (labels are vertex ids, and
    # hashed web ids are SIGNED int64 — a -1 sentinel silently broke
    # relabeling on negative ids, regression-tested)
    FILL = np.iinfo(np.int64).min

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        m = s != d
        s, d = s[m], d[m]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi)})

    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .count()
        .select_columns(["lo", "hi"])
    )

    def init_ed(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy()
        hi = t.column("hi").to_numpy()
        return pa.table(
            {
                "lo": t.column("lo"),
                "hi": t.column("hi"),
                "pe": pa.array(edge_weight63(lo, hi)),
                "ca": t.column("lo"),
                "cb": t.column("hi"),
            }
        )

    ed = und.map_batches(init_ed, batch_format="pyarrow").materialize()

    forest_parts: list[Dataset] = []
    rounds = 0
    for _ in range(max_rounds):
        cross = ed.map_batches(
            lambda t: t.filter(
                pa.array(t.column("ca").to_numpy() != t.column("cb").to_numpy())
            ),
            batch_format="pyarrow",
        ).materialize()
        if cross.count() == 0:
            break
        rounds += 1

        def both(t: pa.Table) -> pa.Table:
            pe = t.column("pe").to_numpy()
            lo = t.column("lo").to_numpy()
            hi = t.column("hi").to_numpy()
            return pa.table(
                {
                    "c": pa.array(
                        np.concatenate(
                            [t.column("ca").to_numpy(), t.column("cb").to_numpy()]
                        )
                    ),
                    "pe": pa.array(np.concatenate([pe, pe])),
                    "lo": pa.array(np.concatenate([lo, lo])),
                    "hi": pa.array(np.concatenate([hi, hi])),
                    "other": pa.array(
                        np.concatenate(
                            [t.column("cb").to_numpy(), t.column("ca").to_numpy()]
                        )
                    ),
                }
            )

        dirs = cross.map_batches(both, batch_format="pyarrow").materialize()
        mins = dirs.groupby("c").aggregate(Min("pe", alias_name="mp"))
        # chosen = the one row per component whose pe IS the component
        # minimum (pe distinct => unique); hooks fall out directly
        chosen = attach_by_key(
            dirs, mins.select_columns(["c", "mp"]),
            key="c", stat_cols=["mp"], row_cols=["pe", "lo", "hi", "other"],
            stat_type=I64,
        ).map_batches(
            lambda t: t.filter(
                pa.array(t.column("pe").to_numpy() == t.column("mp").to_numpy())
            ),
            batch_format="pyarrow",
        ).materialize()

        forest_parts.append(chosen.select_columns(["lo", "hi"]))

        # hook table: one row per active component -> pointer collapse
        n_hooks = chosen.count()
        if n_hooks <= local_resolve_threshold:
            hdf = chosen.select_columns(["c", "other"]).to_pandas()
            hv = hdf["c"].to_numpy()
            hp = hdf["other"].to_numpy()
            # break mutual-pair cycles: p(p(c)) == c -> min(c, p(c))
            pos = np.argsort(hv)
            hv_s, hp_s = hv[pos], hp[pos]
            pp = hp_s[np.searchsorted(hv_s, hp_s)]
            hp_s = np.where(pp == hv_s, np.minimum(hv_s, hp_s), hp_s)
            root = _resolve_np(hv_s, hp_s)
            roots = ray.data.from_arrow(
                pa.table({"c": pa.array(hv_s), "cn": pa.array(root)})
            )
        else:
            # any consistent representative per merge group gives the
            # same partition => same forest (oracle compares edges)
            roots = _collapse_hooks_engine(
                chosen, num_parts=num_partitions or 8
            )

        # relabel the edge table's component columns (outer: components
        # without a hook this round keep their label)
        e1 = attach_by_key(
            _rename(ed, {"ca": "c"}), roots,
            key="c", stat_cols=["cn"], row_cols=["lo", "hi", "pe", "cb"],
            stat_type=I64, outer=True, fill=FILL,
        )

        def apply_a(t: pa.Table) -> pa.Table:
            cn = t.column("cn").to_numpy()
            c = t.column("c").to_numpy()
            return pa.table(
                {
                    "lo": t.column("lo"),
                    "hi": t.column("hi"),
                    "pe": t.column("pe"),
                    "ca": pa.array(np.where(cn != FILL, cn, c)),
                    "cb": t.column("cb"),
                }
            )

        e2 = attach_by_key(
            _rename(
                e1.map_batches(apply_a, batch_format="pyarrow"), {"cb": "c"}
            ),
            roots,
            key="c", stat_cols=["cn"], row_cols=["lo", "hi", "pe", "ca"],
            stat_type=I64, outer=True, fill=FILL,
        )

        def apply_b(t: pa.Table) -> pa.Table:
            cn = t.column("cn").to_numpy()
            c = t.column("c").to_numpy()
            return pa.table(
                {
                    "lo": t.column("lo"),
                    "hi": t.column("hi"),
                    "pe": t.column("pe"),
                    "ca": t.column("ca"),
                    "cb": pa.array(np.where(cn != FILL, cn, c)),
                }
            )

        ed = e2.map_batches(apply_b, batch_format="pyarrow").materialize()

    if forest_parts:
        forest = forest_parts[0]
        for part in forest_parts[1:]:
            forest = forest.union(part)
        forest = (
            forest.groupby(["lo", "hi"]).count().select_columns(["lo", "hi"])
        )
    else:
        z = pa.array([], pa.int64())
        forest = ray.data.from_arrow(pa.table({"lo": z, "hi": z}))

    # labels: vertex -> component, read off the relabeled edge table
    # (ca == label of lo's component, cb of hi's); vertices appear in
    # >=1 edge row, duplicates collapse via groupby min (all equal)
    def vlab(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": pa.array(
                    np.concatenate(
                        [t.column("lo").to_numpy(), t.column("hi").to_numpy()]
                    )
                ),
                "comp": pa.array(
                    np.concatenate(
                        [t.column("ca").to_numpy(), t.column("cb").to_numpy()]
                    )
                ),
            }
        )

    labels = (
        ed.map_batches(vlab, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Min("comp", alias_name="comp"))
    )
    return forest.materialize(), labels.materialize(), {"rounds": rounds}
