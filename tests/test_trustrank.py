"""TrustRank / spam mass vs a dense-numpy PPR replay."""

import numpy as np
import pyarrow as pa

import ray.data

from linkgraph.algos import spam_mass, trustrank_dataset
from oracles import FIXTURE_GRAPHS, random_edges


def edges_ds(edges):
    return pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )


def ppr_numpy(edges, seeds, n, iters=5, d=0.85):
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    deg = np.bincount(src, minlength=n).astype(float)
    tele = np.zeros(n)
    tele[list(seeds)] = 1.0 / len(seeds)
    r = tele.copy()
    for _ in range(iters):
        dang = r[deg == 0].sum()
        msg = np.zeros(n)
        np.add.at(msg, dst, r[src] / deg[src])
        r = (1 - d) * tele + d * (msg + dang * tele)
    return r


def pr_numpy(edges, n, iters=5, d=0.85):
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    deg = np.bincount(src, minlength=n).astype(float)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[deg == 0].sum()
        msg = np.zeros(n)
        np.add.at(msg, dst, r[src] / deg[src])
        r = (1 - d) / n + d * (msg + dang / n)
    return r


def test_trustrank_matches_numpy():
    edges = random_edges(200, 900, seed=13)
    n = max(max(e) for e in edges) + 1
    present = sorted({v for e in edges for v in e})
    seeds = present[:10]
    seeds_ds = ray.data.from_arrow(pa.table({"v": pa.array(seeds, pa.int64())}))
    out = trustrank_dataset(
        ray.data.from_arrow(edges_ds(edges)), seeds_ds, iters=5
    ).to_pandas()
    want = ppr_numpy(edges, seeds, n)
    assert len(out) == len(present)
    for v, tr in zip(out["v"], out["trust"]):
        assert abs(tr - want[v]) < 1e-9


def test_spam_mass_seeded_low_unreachable_high():
    """Pages reachable only from untrusted sources carry spam mass ~1;
    the seeds themselves carry low spam mass."""
    # two chains: trusted 0->1->2, spam 10->11->12, plus 2->1 back edge
    edges = [(0, 1), (1, 2), (2, 1), (10, 11), (11, 12), (12, 11)]
    seeds_ds = ray.data.from_arrow(pa.table({"v": pa.array([0], pa.int64())}))
    out = spam_mass(
        ray.data.from_arrow(edges_ds(edges)), seeds_ds, iters=5
    ).to_pandas()
    sm = dict(zip(out["v"], out["spam_mass"]))
    tr = dict(zip(out["v"], out["trust_rank"]))
    # trusted-chain nodes hold trust mass; spam chain holds none
    assert tr[1] > 0 and tr[2] > 0
    assert tr[11] == 0 and tr[12] == 0
    assert sm[11] == 1.0 and sm[12] == 1.0
    assert sm[1] < 0.5 and sm[2] < 0.5


def test_spam_mass_engine_matches_dataset_impl():
    """Engine path (two vertex programs, one loaded graph) and Dataset
    path agree to the 8-dp export on the same graph + seeds."""
    from linkgraph.algos import spam_mass_engine

    edges = random_edges(120, 500, seed=21)
    present = sorted({v for e in edges for v in e})
    seeds = present[:7]
    ds_out = spam_mass(
        ray.data.from_arrow(edges_ds(edges)),
        ray.data.from_arrow(pa.table({"v": pa.array(seeds, pa.int64())})),
        iters=5,
    ).to_pandas().set_index("v").sort_index()
    eng_out, eng = spam_mass_engine(
        ray.data.from_arrow(edges_ds(edges)), np.asarray(seeds, np.uint64), iters=5,
        num_parts=3,
    )
    eng_df = eng_out.to_pandas().set_index("v").sort_index()
    eng.shutdown()
    assert list(ds_out.index) == list(eng_df.index)
    assert np.allclose(ds_out["trust_rank"], eng_df["trust_rank"], atol=2e-8)
    assert np.allclose(ds_out["spam_mass"], eng_df["spam_mass"], atol=2e-7)


def test_spam_mass_matches_numpy_rounded():
    edges = FIXTURE_GRAPHS["two_triangles_bridge"] if "two_triangles_bridge" in FIXTURE_GRAPHS else random_edges(60, 240, seed=3)
    n = max(max(e) for e in edges) + 1
    present = sorted({v for e in edges for v in e})
    seeds = present[:5]
    seeds_ds = ray.data.from_arrow(pa.table({"v": pa.array(seeds, pa.int64())}))
    out = spam_mass(ray.data.from_arrow(edges_ds(edges)), seeds_ds, iters=5).to_pandas()
    tr8 = np.round(ppr_numpy(edges, seeds, n), 8)
    pr8 = np.round(pr_numpy(edges, n), 8)
    for v, t, s in zip(out["v"], out["trust_rank"], out["spam_mass"]):
        assert abs(t - tr8[v]) < 1e-8
        want = round((pr8[v] - tr8[v]) / pr8[v], 8) if pr8[v] > 0 else 0.0
        assert abs(s - want) < 1e-7
