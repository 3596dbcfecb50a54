"""Regression tests for the round-2 ADVICE findings:

1. PPR on a partition owning zero vertices (fewer vertices than parts)
   and empty-source validation (algos/pagerank.py).
2. sample_per_key priority arithmetic for ids >= ~3.47e9 — must stay
   inside int64 AND bit-match the DuckDB row_number() oracle
   (ops/sampling.py).
3. HITS with a large --iters on a hub-heavy graph must not overflow to
   inf/NaN (algos/hits.py per-iteration rescale).
4. IVF kNN entry points on an empty embeddings table fall back to the
   empty result instead of crashing k-means (ops/knn.py).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from linkgraph.ops.sampling import sample_per_key, sample_per_key_sql


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


def test_ppr_more_partitions_than_vertices():
    from linkgraph.algos import personalized_pagerank

    edges = [(1, 2), (2, 3), (3, 1)]
    out, _, eng = personalized_pagerank(
        edges_ds(edges), [1], num_parts=8, tol=0.0, max_iters=3
    )
    got = {r["v"]: r["rank"] for r in out.take_all()}
    eng.shutdown()
    assert set(got) == {1, 2, 3}
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_ppr_empty_sources_raises():
    from linkgraph.algos.pagerank import PersonalizedPageRankProgram

    with pytest.raises(ValueError):
        PersonalizedPageRankProgram([])


def test_sample_per_key_large_ids_match_duckdb():
    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            # ids straddling the old int64-wrap point (~3.47e9) up to 2**62
            "event_id": rng.integers(3_000_000_000, 1 << 62, n, dtype=np.int64),
            "user_id": rng.integers(0, 7, n).astype(np.int64),
        }
    ).drop_duplicates("event_id")
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = sample_per_key(ds, k=3).to_pandas()
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(sample_per_key_sql("events", k=3)).df()
    gs = {(int(r.user_id), int(r.event_id)) for r in got.itertuples()}
    ws = {(int(r.user_id), int(r.event_id)) for r in want.itertuples()}
    assert gs == ws


def test_hits_rescale_is_scale_invariant():
    # rescale_above=0.0 + check_every=1 forces the anti-overflow global
    # rescale EVERY iteration; the final L2-normalized scores must still
    # match the unscaled dense oracle (the recurrence is linear, so each
    # final vector is a pure scalar multiple of the unscaled one).
    from linkgraph.algos import hits_dataset
    from oracles import FIXTURE_GRAPHS
    from test_weighted import hits_oracle

    edges = FIXTURE_GRAPHS["star_hub"]
    df = hits_dataset(
        edges_ds(edges), iters=4, num_partitions=2, rescale_above=0.0,
        rescale_check_every=1,
    ).to_pandas()
    assert np.isfinite(df["hub"]).all() and np.isfinite(df["auth"]).all()
    want = hits_oracle(edges, iters=4)
    for _, r in df.iterrows():
        wh, wa = want[int(r["v"])]
        assert abs(r["hub"] - wh) < 1e-6
        assert abs(r["auth"] - wa) < 1e-6


def _empty_embeddings():
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )


def test_knn_ivf_empty_input():
    from linkgraph.ops.knn import knn_cosine_ivf

    ds = knn_cosine_ivf(_empty_embeddings(), [1, 2], k=5)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"query_id", "neighbor_id", "rank"}


def test_knn_graph_ivf_empty_input():
    from linkgraph.ops.knn import knn_graph_ivf

    ds = knn_graph_ivf(_empty_embeddings(), k=5)
    assert ds.count() == 0
    assert {"src", "dst", "sim", "nn_rank"} <= set(ds.schema().names)
