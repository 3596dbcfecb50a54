"""Exact distributed quantiles by iterative histogram refinement — no
global sort, no driver-side data.

Nearest-rank (lower) convention shared bit-exactly with the SQL
oracle: the q-quantile of n values is the element of 0-based sorted
rank floor(q * (n - 1)).

Passes over the data (each a streaming map_batches + tiny reduce):

1. one aggregate pass -> (count, min, max);
2. histogram passes: every active quantile owns a CHAIN of bin
   predicates (each "this value fell in bin b of the level's
   formula"); each pass sub-bins the chain members (per-batch numpy
   bincount partials, groupby-bin sum — at most ``bins`` rows per
   quantile reach the driver) and appends the bin containing the
   residual rank. Membership is decided by replaying the SAME integer
   bin formula every pass — never by comparing against derived float
   endpoints — so a value can neither migrate nor vanish between
   passes (float-roundoff-proof); populations shrink by ~``bins``x
   per round;
3. one final filtered collect of the last chain's members
   (<= max_collect values), np.partition for the exact element.

Equal-value pile-ups terminate early: a zero-width level cannot
sub-bin, and the collect handles any population that stops shrinking.
This is the classic distributed selection algorithm (parallel search
on value space) — the exact-aggregation analogue of the reference's
global coupled metrics (SURVEY.md §2.7 global aggregates;
inc/hoover.h:61-68); a t-digest would be the approximate path, but
the exact op is SQL-replayable and scales the same way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def _chain_mask(v: np.ndarray, glo: float, ghi: float, chain) -> np.ndarray:
    m = (v >= glo) & (v <= ghi)
    for lo, hi, bins, b in chain:
        if hi <= lo:
            m &= v == lo
            continue
        idx = np.clip(((v - lo) * (bins / (hi - lo))).astype(np.int64), 0, bins - 1)
        m &= idx == b
    return m


def exact_quantiles(
    ds: Dataset,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 4096,
    max_collect: int = 65536,
    max_rounds: int = 8,
) -> pa.Table:
    """-> pa.Table (q, rank, value): exact nearest-rank-lower
    quantiles of ``ds[col]`` (float64). Small output — returned
    materialized."""
    from ray.data.aggregate import Count, Max, Min, Sum

    base = ds.select_columns([col]).materialize()
    agg = base.aggregate(Min(col), Max(col), Count())
    n = int(agg["count()"])
    if n == 0:
        raise ValueError("exact_quantiles of an empty dataset")
    glo, ghi = float(agg[f"min({col})"]), float(agg[f"max({col})"])

    # per quantile: [chain, level_lo, level_hi, residual_rank, population]
    state = {q: [[], glo, ghi, int(np.floor(q * (n - 1))), n] for q in qs}

    for _ in range(max_rounds):
        active = [
            q
            for q, s in state.items()
            if s[4] > max_collect and s[2] > s[1]  # big AND splittable
        ]
        if not active:
            break
        specs = [(qi, tuple(state[q][0]), state[q][1], state[q][2]) for qi, q in enumerate(active)]

        def hist(t: pa.Table, specs=specs, bins=bins, col=col, glo=glo, ghi=ghi) -> pa.Table:
            v = t.column(col).to_numpy()
            out_q, out_b, out_c = [], [], []
            for qi, chain, lo, hi in specs:
                m = _chain_mask(v, glo, ghi, chain)
                if m.any():
                    sub = v[m]
                    idx = np.clip(
                        ((sub - lo) * (bins / (hi - lo))).astype(np.int64), 0, bins - 1
                    )
                    c = np.bincount(idx, minlength=bins)
                    nz = np.flatnonzero(c)
                    out_q.extend([qi] * len(nz))
                    out_b.extend(nz.tolist())
                    out_c.extend(c[nz].tolist())
            return pa.table(
                {
                    "qi": pa.array(np.asarray(out_q, np.int64)),
                    "bin": pa.array(np.asarray(out_b, np.int64)),
                    "c": pa.array(np.asarray(out_c, np.int64)),
                }
            )

        rows = (
            base.map_batches(hist, batch_format="pyarrow", batch_size=1 << 20)
            .groupby(["qi", "bin"])
            .aggregate(Sum("c", alias_name="c"))
            .take_all()
        )  # <= len(active) * bins tiny rows
        per_q: dict[int, dict[int, int]] = {}
        for row in rows:
            per_q.setdefault(row["qi"], {})[row["bin"]] = row["c"]
        progressed = False
        for qi, chain, lo, hi in specs:
            q = active[qi]
            s = state[q]
            counts = per_q.get(qi, {})
            acc, r = 0, s[3]
            w = (hi - lo) / bins
            for b in sorted(counts):
                c = counts[b]
                if acc + c > r:
                    s[0] = list(chain) + [(lo, hi, bins, b)]
                    s[1] = lo + b * w
                    s[2] = min(hi, lo + (b + 1) * w)
                    s[3] = r - acc
                    if c < s[4]:
                        progressed = True
                    s[4] = c
                    break
                acc += c
        if not progressed:  # massive tie pile-up: collect handles it
            break

    # ONE tagged collect pass serves every still-unresolved quantile
    resolved: dict[float, float] = {}
    pending = []
    for q in sorted(state):
        chain, lo, hi, r, pop = state[q]
        if hi <= lo:  # zero-width level: every remaining value == lo
            resolved[q] = float(lo)
        else:
            pending.append((len(pending), q, tuple(chain)))
    if pending:
        gspecs = [(qi, chain) for qi, _, chain in pending]

        def grab(t: pa.Table, gspecs=gspecs, col=col, glo=glo, ghi=ghi) -> pa.Table:
            v = t.column(col).to_numpy()
            out_i, out_v = [], []
            for qi, chain in gspecs:
                sel = v[_chain_mask(v, glo, ghi, chain)]
                out_i.append(np.full(len(sel), qi, np.int64))
                out_v.append(sel)
            return pa.table(
                {
                    "qi": pa.array(np.concatenate(out_i) if out_i else np.zeros(0, np.int64)),
                    "val": pa.array(np.concatenate(out_v) if out_v else np.zeros(0)),
                }
            )

        parts_i, parts_v = [], []
        for b in base.map_batches(
            grab, batch_format="pyarrow", batch_size=1 << 20
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            parts_i.append(b.column("qi").to_numpy())
            parts_v.append(b.column("val").to_numpy())
        all_i = np.concatenate(parts_i) if parts_i else np.zeros(0, np.int64)
        all_v = np.concatenate(parts_v) if parts_v else np.zeros(0)
        for qi, q, _ in pending:
            vals = all_v[all_i == qi]
            r, pop = state[q][3], state[q][4]
            assert len(vals) == pop and r < pop, (q, len(vals), pop, r)
            resolved[q] = float(np.partition(vals, r)[r])

    out_q, out_rank, out_val = [], [], []
    for q in sorted(state):
        out_q.append(q)
        out_rank.append(int(np.floor(q * (n - 1))) + 1)  # 1-based, matches SQL rn
        out_val.append(resolved[q])
    return pa.table(
        {
            "q": pa.array(np.asarray(out_q, np.float64)),
            "rank": pa.array(np.asarray(out_rank, np.int64)),
            "value": pa.array(np.asarray(out_val, np.float64)),
        }
    )


def exact_quantiles_by_key(
    ds: Dataset,
    key_col: str,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    **kw,
) -> pa.Table:
    """Per-key exact quantiles -> pa.Table (key_col, q, rank, value).

    LOW-CARDINALITY-KEY path: one histogram-refinement run per key over
    a filtered view of the (materialized once) base — K x rounds
    streaming passes, zero driver data. For high-cardinality keys the
    right shape is keyed histograms inside one refinement loop (state
    per (key, q) on the driver); not needed for the event-type-scale
    keys this serves, and documented here as the scale limit."""
    import pyarrow.compute as pc

    base = ds.select_columns([key_col, col]).materialize()
    keys = sorted(base.unique(key_col))
    outs = []
    for kv in keys:
        sub = base.map_batches(
            lambda t, kv=kv: t.filter(pc.equal(t.column(key_col), kv)),
            batch_format="pyarrow",
        )
        t = exact_quantiles(sub, col, qs=qs, **kw)
        outs.append(
            pa.table(
                {
                    key_col: pa.array([kv] * t.num_rows),
                    "q": t.column("q"),
                    "rank": t.column("rank"),
                    "value": t.column("value"),
                }
            )
        )
    return pa.concat_tables(outs) if outs else pa.table(
        {key_col: pa.array([]), "q": pa.array([], pa.float64()),
         "rank": pa.array([], pa.int64()), "value": pa.array([], pa.float64())}
    )
