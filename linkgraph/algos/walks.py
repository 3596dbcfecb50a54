"""Random-walk corpus generation (DeepWalk / node2vec-style, uniform
transition) over the partitioned engine graph.

Training-data op for embedding pipelines: seeded walks from every
non-dangling vertex; walk state hops between partition actors exactly
like superstep messages (packed per destination partition), each
partition records the visits it hosts, and the corpus is assembled as a
Dataset from per-partition Arrow tables (``from_arrow_refs`` — nothing
is collected on the driver).

Determinism: the next hop is ``splitmix64(mix(v0, rep, t)) % outdeg``
over the DST-SORTED neighbor list, so walks depend only on (graph,
seed), not on the partition count or scheduling — the same invariance
the iterative algorithms guarantee.

(Reference analogue: multi-hop traversal state of update_distances,
src/hoover.cpp:2024-2056, generalized to stochastic traversal; walk
hand-off uses the hvr_send_msg-style routed exchange.)
"""

from __future__ import annotations

import ray

from ..engine import SuperstepEngine


def random_walks(
    engine: SuperstepEngine,
    walk_len: int = 10,
    n_per_vertex: int = 1,
    seed: int = 7,
):
    """-> Dataset(walk_v0, walk_rep, step, v): one row per visit; a walk
    is the step-ordered sequence for a (walk_v0, walk_rep) pair. Walks
    stop early at dangling (out-degree-0) vertices."""
    actors = engine.actors
    packed = [a.walks_start.remote(n_per_vertex, seed) for a in actors]
    for t in range(1, walk_len + 1):
        packed = [a.walks_step.remote(t, walk_len, *packed) for a in actors]
    ray.wait(packed, num_returns=len(packed))
    refs = [a.walks_collect.remote() for a in actors]
    return ray.data.from_arrow_refs(refs)


def assemble_walks(visits) -> "ray.data.Dataset":
    """(walk_v0, walk_rep, step, v) visit rows -> one row per walk with
    the full path as a list column (the shuffle is by walk key, so each
    group is one walk)."""
    import numpy as np
    import pandas as pd

    def to_path(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("step")
        return pd.DataFrame(
            {
                "walk_v0": [g["walk_v0"].iloc[0]],
                "walk_rep": [g["walk_rep"].iloc[0]],
                "path": [g["v"].to_numpy(dtype=np.int64)],
            }
        )

    return visits.groupby(["walk_v0", "walk_rep"]).map_groups(
        to_path, batch_format="pandas"
    )
