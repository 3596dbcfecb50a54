"""corpus_select composition: keeper flags + join semantics."""

import os
import sys

import numpy as np
import pyarrow as pa
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.ops.corpus import corpus_select, keeper_flags


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


GOOD = (
    "The quick brown fox jumps over the lazy dog and it runs far away "
    "to the green hills where a small river flows by an old stone mill "
    "and this is that place for everyone to visit on a warm day in June"
)


class TestKeeperFlags:
    def test_min_id_keeps(self):
        docs = _docs([(5, "aaa"), (2, "aaa"), (9, "bbb"), (7, "aaa")])
        out = keeper_flags(docs).to_pandas().set_index("doc_id")["is_keeper"]
        assert out.to_dict() == {2: 1, 5: 0, 7: 0, 9: 1}


class TestCorpusSelect:
    def test_selected_is_keep_and_keeper(self):
        # doc 0: good text, unique -> selected
        # doc 1: duplicate of doc 0 -> keeper=0 -> not selected
        # doc 2: bad text (too short), unique -> keep=0 -> not selected
        docs = _docs([(0, GOOD), (1, GOOD), (2, "tiny doc")])
        ranks = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "pr_rank": pa.array([0.5, 0.3, 0.2], pa.float64()),
                }
            )
        )
        out = (
            corpus_select(docs, ranks)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "selected"] == 1
        assert out.loc[1].tolist() == [0.3, 1, 0, 0]  # rank, keep, keeper, sel
        assert out.loc[2, "keep"] == 0 and out.loc[2, "selected"] == 0
        assert np.allclose(out["pr_rank"], [0.5, 0.3, 0.2])
