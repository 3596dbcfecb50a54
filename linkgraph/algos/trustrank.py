"""TrustRank + spam mass over the link graph — the web-spam companion
to PageRank (Gyongyi et al., VLDB'04): personalized PageRank seeded at
a TRUSTED host whitelist, then spam mass = the fraction of a page's
PageRank that does NOT flow from trusted seeds:

    trust_k(v) = (1-d)*tele(v) + d*(sum_in trust/deg + dang_t*tele(v)),
    tele = uniform over seed pages, trust_0 = tele          (PPR form)
    pr_k(v)    = (1-d)/n + d*(sum_in pr/deg + dang_p/n),  pr_0 = 1/n
    spam_mass(v) = (pr(v) - trust(v)) / pr(v)

Both rank vectors are fixed-iteration unrolled (iteration-exact vs the
__ray_entry__ SQL oracle) and ride ONE fused superstep loop: the ranks
table carries both columns, so each iteration costs a single edge join,
a single two-column combiner + groupby, one two-column dangling
aggregate — half the exchanges of running PPR and PageRank separately.
spam_mass is computed FROM the two 8-dp rounded vectors so both sides
divide bit-identical inputs.

Unlike personalized_pagerank's explicit source list, the seed set here
is a Dataset (a host whitelist at 100 TB is millions of pages): the
teleport column is materialized once via one hash join verts x seeds.
Nothing seed-sized ever transits the driver.

(Reference analogue: SURVEY.md §2.5 PageRank family; seeded restart
mirrors the reference's coupled-value teleportation in bench/pagerank,
reference bench/hoover_pagerank.c:88-120.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..edges import out_degrees
from .dataset_impl import _vertices


def _fused_ranks(
    edges: Dataset,
    seeds: Dataset,
    iters: int,
    damping: float,
    num_partitions: int,
) -> tuple[Dataset, float]:
    """One superstep loop carrying (trust, pr) together ->
    (Dataset(v, tele, t, p), n_vertices)."""
    d = damping
    verts = _vertices(edges, num_partitions).materialize()
    n = verts.count()
    n_seeds = seeds.count()

    def mark(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t.column("v"), "_seed": pa.array(np.ones(len(t), np.int8))}
        )

    vt = verts.join(
        seeds.map_batches(mark, batch_format="pyarrow"),
        join_type="left_outer", num_partitions=num_partitions,
        on=("v",), right_on=("v",),
    )

    deg = out_degrees(edges, out="deg").materialize()

    # dangling flag materialized ONCE: per iteration the dangling mass
    # is then a single filtered aggregate over ranks — no join, no
    # second full-aggregate pass (the held/total formulation costs a
    # join + 2 aggregates per superstep).
    vtd = vt.join(
        deg, join_type="left_outer", num_partitions=num_partitions,
        on=("v",), right_on=("src",),
    )

    def init(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.fill_null(t.column("_seed"), 0).to_numpy(zero_copy_only=False)
        tele = s.astype(np.float64) / n_seeds
        dng = (
            pc.is_null(t.column("deg")).to_numpy(zero_copy_only=False).astype(np.int8)
        )
        return pa.table(
            {
                "v": t.column("v"),
                "tele": pa.array(tele),
                "dng": pa.array(dng),
                "t": pa.array(tele),
                "p": pa.array(np.full(len(t), 1.0 / n)),
            }
        )

    ranks = vtd.map_batches(init, batch_format="pyarrow").materialize()

    ewd = edges.join(
        deg, join_type="inner", num_partitions=num_partitions,
        on=("src",), right_on=("src",), right_suffix="_r",
    ).materialize()

    for _ in range(iters):

        def dang_partial(t: pa.Table) -> pa.Table:
            m = t.column("dng").to_numpy(zero_copy_only=False) == 1
            return pa.table(
                {
                    "st": pa.array([float(t.column("t").to_numpy()[m].sum())]),
                    "sp": pa.array([float(t.column("p").to_numpy()[m].sum())]),
                }
            )

        dsum = ranks.map_batches(
            dang_partial, batch_format="pyarrow", batch_size=1 << 20
        ).aggregate(Sum("st", alias_name="st"), Sum("sp", alias_name="sp"))
        dang_t = dsum["st"] or 0.0
        dang_p = dsum["sp"] or 0.0

        msgs = ewd.join(
            ranks, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("v",),
        )

        def contrib(tbl: pa.Table) -> pa.Table:
            deg_ = tbl.column("deg").to_numpy()
            tt = pa.table(
                {
                    "dst": tbl.column("dst"),
                    "ct": pa.array(tbl.column("t").to_numpy() / deg_),
                    "cp": pa.array(tbl.column("p").to_numpy() / deg_),
                }
            )
            g = tt.group_by("dst").aggregate([("ct", "sum"), ("cp", "sum")])
            return g.rename_columns(["dst", "ct", "cp"])

        incoming = (
            msgs.map_batches(contrib, batch_format="pyarrow", batch_size=1 << 20)
            .groupby("dst")
            .aggregate(Sum("ct", alias_name="mt"), Sum("cp", alias_name="mp"))
        )
        joined = ranks.select_columns(["v", "tele", "dng"]).join(
            incoming, join_type="left_outer", num_partitions=num_partitions,
            on=("v",), right_on=("dst",),
        )

        def apply(tbl: pa.Table, dt: float = dang_t, dp: float = dang_p) -> pa.Table:
            import pyarrow.compute as pc

            mt = pc.fill_null(tbl.column("mt"), 0.0).to_numpy(zero_copy_only=False)
            mp = pc.fill_null(tbl.column("mp"), 0.0).to_numpy(zero_copy_only=False)
            tele = tbl.column("tele").to_numpy()
            t_new = (1 - d) * tele + d * (mt + dt * tele)
            p_new = (1 - d) / n + d * (mp + dp / n)
            return pa.table(
                {
                    "v": tbl.column("v"),
                    "tele": tbl.column("tele"),
                    "dng": tbl.column("dng"),
                    "t": pa.array(t_new),
                    "p": pa.array(p_new),
                }
            )

        ranks = joined.map_batches(apply, batch_format="pyarrow").materialize()

    return ranks, float(n)


def trustrank_dataset(
    edges: Dataset,
    seeds: Dataset,
    iters: int = 5,
    damping: float = 0.85,
    num_partitions: int | None = None,
) -> Dataset:
    """edges(src, dst) x seeds(v) -> Dataset(v, trust) after ``iters``
    unrolled PPR iterations over the uniform-seed teleport (trust NOT
    rounded — callers round at export)."""
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
    ranks, _ = _fused_ranks(edges, seeds, iters, damping, num_partitions)
    return ranks.map_batches(
        lambda t: pa.table({"v": t.column("v"), "trust": t.column("t")}),
        batch_format="pyarrow",
    )


def spam_mass_engine(
    edges: Dataset,
    sources,
    iters: int = 5,
    damping: float = 0.85,
    num_parts: int = 8,
):
    """Engine-path spam mass for an explicit seed-id array: PageRank
    then seeded PPR as two vertex programs over ONE loaded engine (the
    graph hashes into partition actors once; each fixed-iteration run
    costs only combiner-reduced exchanges — the bench path). The
    Dataset-seeded ``spam_mass`` stays the scale path for whitelist
    sets too large for a driver-side array.

    -> (Dataset(v, trust_rank, spam_mass), engine) — caller shuts the
    engine down after consuming the Dataset."""
    import pyarrow.compute as pc

    from ..engine import SuperstepEngine
    from .pagerank import PageRankProgram, PersonalizedPageRankProgram

    eng = SuperstepEngine(num_parts=num_parts).load_edges(edges)
    eng.run(PageRankProgram(damping=damping, tol=0.0), max_iters=iters)
    pr = eng.state_dataset(id_col="v", columns=["rank"]).materialize()
    eng.run(
        PersonalizedPageRankProgram(sources, damping=damping, tol=0.0),
        max_iters=iters,
    )
    tr = (
        eng.state_dataset(id_col="v", columns=["rank"])
        .map_batches(
            lambda t: pa.table({"v": t.column("v"), "trust": t.column("rank")}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    out = tr.join(
        pr, join_type="inner", num_partitions=num_parts,
        on=("v",), right_on=("v",),
    )

    def finish(t: pa.Table) -> pa.Table:
        trv = np.round(t.column("trust").to_numpy(), 8)
        p = np.round(t.column("rank").to_numpy(), 8)
        sm = np.where(p > 0, np.round((p - trv) / np.where(p > 0, p, 1.0), 8), 0.0)
        return pa.table(
            {
                "v": t.column("v"),
                "trust_rank": pa.array(trv),
                "spam_mass": pa.array(sm),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow"), eng


def spam_mass(
    edges: Dataset,
    seeds: Dataset,
    iters: int = 5,
    damping: float = 0.85,
    num_partitions: int | None = None,
) -> Dataset:
    """-> (v, trust_rank, spam_mass): trust_rank = round(trust, 8);
    spam_mass = round((pr8 - trust8) / pr8, 8) from the two ROUNDED
    vectors (bit-stable vs the SQL oracle)."""
    if num_partitions is None:
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
    ranks, _ = _fused_ranks(edges, seeds, iters, damping, num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        tr = np.round(t.column("t").to_numpy(), 8)
        p = np.round(t.column("p").to_numpy(), 8)
        sm = np.where(p > 0, np.round((p - tr) / np.where(p > 0, p, 1.0), 8), 0.0)
        return pa.table(
            {
                "v": t.column("v"),
                "trust_rank": pa.array(tr),
                "spam_mass": pa.array(sm),
            }
        )

    return ranks.map_batches(finish, batch_format="pyarrow")
