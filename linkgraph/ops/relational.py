"""Relational broadcast-join kernels over the TPC-H-shaped tables.

The pattern the 100-TB brief names explicitly: when one join side fits
a node's memory (dimension tables — customer, nation), broadcast it
ONCE with ``ray.put`` and resolve the join inside ``map_batches`` with
a vectorized searchsorted — no shuffle of the fact table at all. The
fact side (orders / lineitem) streams; the only exchange is the final
tiny groupby combine.

Contrast: the high-cardinality fact-fact joins in this repo use the
tagged-union range-sort kernels (ops/sortagg.py); this module is the
other half of the join story.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


class _BroadcastLookup:
    """Sorted-key broadcast map: keys (int64, sorted) -> values."""

    def __init__(self, keys: np.ndarray, values: np.ndarray):
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.values = values[order]

    def get(self, probe: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.keys, probe)
        idx = np.clip(idx, 0, len(self.keys) - 1)
        found = self.keys[idx] == probe
        if not found.all():
            raise KeyError("probe keys missing from broadcast side")
        return self.values[idx]


def revenue_by_nation(
    orders: Dataset, customer: Dataset, nation: Dataset
) -> Dataset:
    """orders x customer x nation -> (n_name, n_orders, revenue).

    Dimension tables are collected ONCE (they are the small side by
    construction: 25 nations, customers = orders/10), shipped to every
    map task via the object store (`ray.put` under Ray Data's closure
    capture), and probed with vectorized searchsorted. Per-block
    partials bound the final combine to (blocks x nations) rows.
    Revenue is an int64 cent sum — exact, associative, oracle-stable
    (float summation order would not be).
    """
    import ray

    cust = customer.select_columns(["c_custkey", "c_nationkey"]).to_pandas()
    nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    c_lut = _BroadcastLookup(
        cust["c_custkey"].to_numpy(np.int64), cust["c_nationkey"].to_numpy(np.int64)
    )
    names = nat.sort_values("n_nationkey")["n_name"].tolist()
    nkeys = nat.sort_values("n_nationkey")["n_nationkey"].to_numpy(np.int64)
    c_ref = ray.put(c_lut)  # one object-store copy, read by every task

    def partial(t: pa.Table) -> pa.Table:
        lut = ray.get(c_ref)
        ck = t.column("o_custkey").to_numpy()
        nk = lut.get(ck)
        # floor(x*100 + 0.5): identical IEEE ops in numpy and DuckDB
        # (np.round's half-to-even vs SQL round's half-away would
        # diverge on exact ties)
        cents = np.floor(
            t.column("o_totalprice").to_numpy() * 100 + 0.5
        ).astype(np.int64)
        pos = np.searchsorted(nkeys, nk)
        n_orders = np.bincount(pos, minlength=len(nkeys)).astype(np.int64)
        # integer accumulation (np.add.at), NOT bincount(weights=...)
        # whose float64 path loses exactness past 2^53 — the "exact
        # int64 cent sum" contract must hold at any block size
        rev = np.zeros(len(nkeys), np.int64)
        np.add.at(rev, pos, cents)
        keep = n_orders > 0
        return pa.table(
            {
                "n_nationkey": pa.array(nkeys[keep]),
                "n_orders": pa.array(n_orders[keep]),
                "revenue_cents": pa.array(rev[keep]),
            }
        )

    from .sortagg import sorted_sum_by

    combined = sorted_sum_by(
        orders.select_columns(["o_custkey", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "n_nationkey",
        sum_cols={"n_orders": "n_orders", "revenue_cents": "revenue_cents"},
    )

    name_of = {int(k): n for k, n in zip(nkeys, names)}

    def finish(t: pa.Table) -> pa.Table:
        nk = t.column("n_nationkey").to_pylist()
        return pa.table(
            {
                "n_name": pa.array([name_of[k] for k in nk], pa.string()),
                "n_orders": t.column("n_orders"),
                "revenue_cents": t.column("revenue_cents"),
            }
        )

    return combined.map_batches(finish, batch_format="pyarrow")


def q6_revenue(lineitem: Dataset) -> "pa.Table":
    """TPC-H Q6-shaped selective scan aggregate: forecasted revenue
    from lineitems shipped in 1996 with discount 5-7% and quantity
    < 24. The read is pruned to the four needed columns; the predicate
    and product run vectorized per batch; the result is ONE integer.

    Exactness: revenue = sum(cents(price) * bps(discount)) as int64
    (cents = floor(x*100 + 0.5), bps = floor(x*100 + 0.5)) — integer
    summation is associative, so block order cannot perturb the oracle
    hash the way float accumulation would.
    """
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").to_numpy()
        qty = t.column("l_quantity").to_numpy()
        disc = t.column("l_discount").to_numpy()
        price = t.column("l_extendedprice").to_numpy()
        y = ship.astype("datetime64[Y]").astype(np.int64) + 1970
        bps = np.floor(disc * 100 + 0.5).astype(np.int64)
        keep = (y == 1996) & (bps >= 5) & (bps <= 7) & (qty < 24)
        cents = np.floor(price[keep] * 100 + 0.5).astype(np.int64)
        rev = int((cents * bps[keep]).sum())
        return pa.table(
            {
                "revenue_i": pa.array([rev], pa.int64()),
                "n_items": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    parts = lineitem.map_batches(
        partial, batch_format="pyarrow", batch_size=131072
    ).to_pandas()
    return pa.table(
        {
            "revenue_i": pa.array([int(parts["revenue_i"].sum())], pa.int64()),
            "n_items": pa.array([int(parts["n_items"].sum())], pa.int64()),
        }
    )
