"""global_rank / ntile curriculum: exact row numbers across block
boundaries and DuckDB ntile parity of the phase formula."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from linkgraph.ops import global_rank, ntile_of
from linkgraph.ops.curriculum import curriculum_phases


def test_global_rank_multiblock():
    rng = np.random.default_rng(7)
    score = np.round(rng.random(1000), 3)  # heavy ties -> id tie-break
    ids = rng.permutation(1000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "s": score})
    ).repartition(16)
    ranked, total = global_rank(ds, ["s", "doc_id"])
    df = ranked.to_pandas()
    assert total == 1000
    assert sorted(df["rn"]) == list(range(1000))
    want = df.sort_values(["s", "doc_id"]).reset_index(drop=True)
    assert (want["rn"].to_numpy() == np.arange(1000)).all()


@pytest.mark.parametrize("total,n", [(10, 4), (1000, 7), (5, 8), (8, 8)])
def test_ntile_matches_duckdb(total, n):
    rn = np.arange(total)
    got = ntile_of(rn, total, n)
    want = duckdb.sql(
        f"SELECT ntile({n}) OVER (ORDER BY r) AS t "
        f"FROM (SELECT unnest(range({total})) AS r) ORDER BY r"
    ).df()["t"].to_numpy()
    assert (got == want).all()


def test_curriculum_phases_shape():
    docs = pa.table(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": [f"alpha beta gamma delta tok{i % 7} word" for i in range(40)],
        }
    )
    out = curriculum_phases(ray.data.from_arrow(docs), n_phases=4).to_pandas()
    assert len(out) == 40
    assert sorted(out["phase"].unique()) == [1, 2, 3, 4]
    counts = out["phase"].value_counts()
    assert counts.max() - counts.min() <= 1
    # phases are monotone in (lm_score, doc_id) order
    s = out.sort_values(["lm_score", "doc_id"])
    assert (np.diff(s["phase"].to_numpy()) >= 0).all()
