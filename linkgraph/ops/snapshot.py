"""Crawl-over-crawl churn: per-host added / removed / stable edge
counts between two link-graph snapshots.

The web graph a crawler sees changes between crawls; the churn table
(which hosts gained/lost links) is both a freshness signal and the
input to incremental re-rank decisions. Semantics: an edge present
only in the old snapshot is `removed`, only in the new one `added`,
in both `stable`; counts are grouped by a host key derived from the
edge source.

Shape at scale: ONE all-to-all (the (src, dst) range sort over the
tagged union of both snapshots — the same exchange a hash shuffle
pays); per-block work is numpy reduceat over equal-key runs (the
sortagg.py kernel family); the per-host aggregate moves only
O(blocks x hosts) partial rows. Neither snapshot is assumed
deduplicated across the union — tags combine with bitwise OR, so a
duplicate (edge, snapshot) pair cannot double-count.

Reference analogue: the reference's streaming update_rates workload
measures insert throughput between converged states
(src/hoover.cpp:1097-1180); this op is the batch diff of two such
states, expressed as Dataset transforms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_T_OLD = np.int64(1)
_T_NEW = np.int64(2)


def _tag(ds: Dataset, tag: int) -> Dataset:
    def add(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "tag": pa.array(np.full(len(t), tag, np.int64)),
            }
        )

    return ds.map_batches(add, batch_format="pyarrow")


def snapshot_churn(old: Dataset, new: Dataset, host_mod: int = 64) -> Dataset:
    """(src, dst) x2 snapshots -> (host, n_added, n_removed, n_stable).

    ``host_mod``: the host key is ``src % host_mod`` (the doc-graph's
    hub buckets double as hosts in the derived test graph; production
    passes the real ``hash64(host(url))`` column instead — the kernel
    only needs src-key determinism).
    """

    def classify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            z = pa.array([], pa.int64())
            return pa.table(
                {"host": z, "n_added": z, "n_removed": z, "n_stable": z}
            )
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        tag = t.column("tag").to_numpy()
        # equal-(src, dst) runs — the sort co-locates them in one block
        starts = np.flatnonzero(
            np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
        )
        tags = np.bitwise_or.reduceat(tag, starts)
        host = (src[starts] % host_mod).astype(np.int64)
        out = {}
        for col, want in (
            ("n_added", _T_NEW),
            ("n_removed", _T_OLD),
            ("n_stable", _T_OLD | _T_NEW),
        ):
            out[col] = np.bincount(
                host[tags == want], minlength=host_mod
            ).astype(np.int64)
        hosts = np.arange(host_mod, dtype=np.int64)
        keep = (out["n_added"] | out["n_removed"] | out["n_stable"]) != 0
        return pa.table(
            {
                "host": pa.array(hosts[keep]),
                "n_added": pa.array(out["n_added"][keep]),
                "n_removed": pa.array(out["n_removed"][keep]),
                "n_stable": pa.array(out["n_stable"][keep]),
            }
        )

    from .sortagg import sorted_sum_by

    partials = (
        _tag(old, int(_T_OLD))
        .union(_tag(new, int(_T_NEW)))
        .sort(["src", "dst"])
        .map_batches(classify, batch_format="pyarrow", batch_size=None)
    )
    return sorted_sum_by(
        partials,
        "host",
        sum_cols={
            "n_added": "n_added",
            "n_removed": "n_removed",
            "n_stable": "n_stable",
        },
    )


# deterministic second-crawl perturbation for the derived doc graph —
# shared integer arithmetic with the SQL oracle in __ray_entry__:
#   drop  edges where (src*31 + dst) % 11 == 0
#   add   (d, (d*17 + 5) % n_docs) for d % 6 == 0, excluding self-loops
def perturb_edges(edges: Dataset, docs: Dataset, n_docs: int) -> Dataset:
    def drop(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        keep = (src * 31 + dst) % 11 != 0
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    def added(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy().astype(np.int64)
        d = d[d % 6 == 0]
        dst = (d * 17 + 5) % n_docs
        keep = dst != d
        return pa.table({"src": pa.array(d[keep]), "dst": pa.array(dst[keep])})

    return edges.map_batches(drop, batch_format="pyarrow").union(
        docs.map_batches(added, batch_format="pyarrow")
    )
