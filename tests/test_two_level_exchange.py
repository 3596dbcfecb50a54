"""Node-topology two-level exchange (engine.combine_group): results
must be BIT-EXACT vs the flat exchange for every reduce family —
sum (PageRank incl. extras/dangling order), min (CC), labelvote
(label propagation) — and for vertex-to-vertex messages (msgping).

4 groups over 8 partitions simulate a 4-node cluster on this box
(group = contiguous partition range = one virtual node); on a real
deployment each group maps to a STRICT_SPREAD placement-group node.
"""

import numpy as np
import pyarrow as pa

import ray.data

from linkgraph.engine import SuperstepEngine


def _edges(n=400, m=2400, seed=3):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    # a few hubs for skew + some dangling vertices
    src[: m // 8] = rng.integers(0, 4, m // 8)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def _run(prog_factory, node_groups, symmetrize=False, **run_kw):
    eng = SuperstepEngine(
        num_parts=8, symmetrize=symmetrize, node_groups=node_groups
    ).load_edges(_edges())
    m = eng.run(prog_factory(), **run_kw)
    cols = prog_factory().state_columns
    df = eng.state_dataset(columns=list(cols)).to_pandas().sort_values("v")
    eng.shutdown()
    return df.reset_index(drop=True), m


def test_pagerank_bit_exact_across_exchange_modes():
    from linkgraph.algos.pagerank import PageRankProgram

    flat, mf = _run(lambda: PageRankProgram(tol=1e-12), None, max_iters=30)
    two, mt = _run(lambda: PageRankProgram(tol=1e-12), 4, max_iters=30)
    assert mf["iterations"] == mt["iterations"]
    assert flat["v"].tolist() == two["v"].tolist()
    # bit-exact: the relay concatenates member slices in partition order,
    # so the gather's float accumulation order is unchanged
    assert np.array_equal(
        flat["rank"].to_numpy().view(np.int64), two["rank"].to_numpy().view(np.int64)
    )


def test_cc_and_labelprop_exact_across_exchange_modes():
    from linkgraph.algos.cc import CCProgram
    from linkgraph.algos.labelprop import LabelPropProgram

    for prog, sym in ((CCProgram, True), (LabelPropProgram, True)):
        flat, _ = _run(prog, None, symmetrize=sym, max_iters=20)
        two, _ = _run(prog, 4, symmetrize=sym, max_iters=20)
        assert flat["label"].tolist() == two["label"].tolist(), prog.__name__


def test_messages_and_odd_group_split():
    # PingProgram exercises send_messages (m_ids/m_vals bundling); G=3
    # over P=8 exercises uneven contiguous group splits
    from linkgraph.algos.msgping import PingProgram

    flat, _ = _run(lambda: PingProgram(n=400, offset=7), None, max_iters=6)
    two, _ = _run(lambda: PingProgram(n=400, offset=7), 3, max_iters=6)
    for c in flat.columns:
        assert flat[c].tolist() == two[c].tolist(), c


def test_bounded_staleness_same_fixpoint():
    # stale-by-1 remote messages: asynchronous iteration of the PageRank
    # contraction converges to the SAME fixpoint (allclose 1e-6), with
    # possibly different superstep count; BSP stays the default
    from linkgraph.algos.pagerank import PageRankProgram
    from linkgraph.engine import SuperstepEngine

    edges = _edges()
    bsp_eng = SuperstepEngine(num_parts=8).load_edges(edges)
    mb = bsp_eng.run(PageRankProgram(tol=1e-8), max_iters=300)
    bsp = (
        bsp_eng.state_dataset(columns=["rank"]).to_pandas().sort_values("v")
    )
    bsp_eng.shutdown()
    st_eng = SuperstepEngine(num_parts=8).load_edges(_edges())
    ms = st_eng.run(PageRankProgram(tol=1e-8), max_iters=300, staleness=1)
    st = st_eng.state_dataset(columns=["rank"]).to_pandas().sort_values("v")
    st_eng.shutdown()
    assert mb["converged"] and ms["converged"]
    assert np.allclose(
        bsp["rank"].to_numpy(), st["rank"].to_numpy(), atol=1e-6, rtol=0
    )


def test_two_level_transposed_and_resume():
    # transposed() inherits node_groups (bit-exact vs flat transpose);
    # checkpoint/resume under the two-level exchange reproduces the
    # uninterrupted run exactly
    import tempfile

    from linkgraph.algos.pagerank import PageRankProgram
    from linkgraph.engine import SuperstepEngine

    ranks = {}
    for G in (None, 4):
        eng = SuperstepEngine(num_parts=8, node_groups=G).load_edges(_edges())
        tr = eng.transposed()
        assert tr._group_starts == eng._group_starts
        tr.run(PageRankProgram(tol=0.0), max_iters=10)
        ranks[G] = (
            tr.state_dataset(columns=["rank"])
            .to_pandas()
            .sort_values("v")["rank"]
            .to_numpy()
        )
        tr.shutdown()
        eng.shutdown()
    assert np.array_equal(
        ranks[None].view(np.int64), ranks[4].view(np.int64)
    )

    with tempfile.TemporaryDirectory() as ck:
        full = SuperstepEngine(num_parts=8, node_groups=3).load_edges(_edges())
        full.run(PageRankProgram(tol=0.0), max_iters=12)
        want = (
            full.state_dataset(columns=["rank"])
            .to_pandas()
            .sort_values("v")["rank"]
            .to_numpy()
        )
        full.shutdown()
        e1 = SuperstepEngine(num_parts=8, node_groups=3).load_edges(_edges())
        e1.run(
            PageRankProgram(tol=0.0),
            max_iters=6,
            checkpoint_dir=ck,
            checkpoint_every=3,
        )
        e1.shutdown()
        e2 = SuperstepEngine(num_parts=8, node_groups=3).load_edges(_edges())
        e2.run(
            PageRankProgram(tol=0.0),
            max_iters=12,
            checkpoint_dir=ck,
            resume=True,
            checkpoint_every=3,
        )
        got = (
            e2.state_dataset(columns=["rank"])
            .to_pandas()
            .sort_values("v")["rank"]
            .to_numpy()
        )
        e2.shutdown()
        assert np.array_equal(want.view(np.int64), got.view(np.int64))


def test_reduce_mode_relay():
    # node_combine="reduce": relay re-aggregates per dst vertex.
    # Exact for min (CC) and labelvote (LP); allclose for float sums
    # (PageRank) with identical iteration counts; messages unaffected.
    from linkgraph.algos.cc import CCProgram
    from linkgraph.algos.labelprop import LabelPropProgram
    from linkgraph.algos.msgping import PingProgram
    from linkgraph.algos.pagerank import PageRankProgram
    from linkgraph.engine import SuperstepEngine

    def run_mode(prog_factory, combine, sym=False, **kw):
        eng = SuperstepEngine(
            num_parts=8, symmetrize=sym, node_groups=4, node_combine=combine
        ).load_edges(_edges())
        m = eng.run(prog_factory(), **kw)
        cols = prog_factory().state_columns
        df = (
            eng.state_dataset(columns=list(cols))
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        eng.shutdown()
        return df, m

    for prog, sym in ((CCProgram, True), (LabelPropProgram, True)):
        a, _ = run_mode(prog, "concat", sym=sym, max_iters=20)
        b, _ = run_mode(prog, "reduce", sym=sym, max_iters=20)
        assert a["label"].tolist() == b["label"].tolist(), prog.__name__

    a, ma = run_mode(lambda: PageRankProgram(tol=1e-10), "concat", max_iters=60)
    b, mb = run_mode(lambda: PageRankProgram(tol=1e-10), "reduce", max_iters=60)
    assert ma["iterations"] == mb["iterations"]
    assert np.allclose(a["rank"], b["rank"], atol=1e-12, rtol=0)

    a, _ = run_mode(lambda: PingProgram(n=400, offset=7), "concat", max_iters=6)
    b, _ = run_mode(lambda: PingProgram(n=400, offset=7), "reduce", max_iters=6)
    assert a["got"].tolist() == b["got"].tolist()
