"""minhash_dedup_between: incremental crawl-vs-corpus dedup — recall
vs the self-join op, cross-side-only guarantee, stored-signature path."""

import os
import sys

import numpy as np
import pyarrow as pa
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.ops.dedup import (
    minhash_dedup_between,
    minhash_dedup_pairs,
    minhash_signatures,
)

WORDS = (
    "the quick brown fox jumps over lazy dog river stone mill hill "
    "green warm day june table sort merge join scan hash key part"
).split()


def _corpus_and_incoming(n_corpus=120, n_inc=40, n_dups=15, seed=11):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=30).tolist()) for _ in range(n_corpus)
    ]
    inc = [" ".join(rng.choice(WORDS, size=30).tolist()) for _ in range(n_inc)]
    # plant near-dups: first n_dups incoming docs are light edits of
    # corpus docs 0..n_dups
    for i in range(n_dups):
        toks = texts[i].split()
        toks[5] = "edited"
        inc[i] = " ".join(toks)
    c = pa.table(
        {
            "doc_id": pa.array(np.arange(n_corpus, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    i = pa.table(
        {
            "doc_id": pa.array(np.arange(n_inc, dtype=np.int64) + 1_000_000),
            "text": pa.array(inc),
        }
    )
    return ray.data.from_arrow(c), ray.data.from_arrow(i)


class TestDedupBetween:
    def test_cross_side_recall_vs_selfjoin(self):
        corpus, incoming = _corpus_and_incoming()
        got = minhash_dedup_between(corpus, incoming, threshold=0.7).to_pandas()
        # every returned pair is cross-side and oriented
        assert (got["corpus_id"] < 1_000_000).all()
        assert (got["incoming_id"] >= 1_000_000).all()

        # reference: the self-join op on the union, restricted cross-side
        both = corpus.union(incoming)
        ref = minhash_dedup_pairs(both, threshold=0.7).to_pandas()
        cross = ref[
            ((ref["a"] < 1_000_000) & (ref["b"] >= 1_000_000))
            | ((ref["b"] < 1_000_000) & (ref["a"] >= 1_000_000))
        ]
        want = {
            (min(a, b), max(a, b)) for a, b in zip(cross["a"], cross["b"])
        }
        have = {(a, b) for a, b in zip(got["corpus_id"], got["incoming_id"])}
        assert want  # the planted dups collide
        assert have == want  # identical signatures -> identical verdicts
        assert len(have) >= 12  # most of the 15 planted dups survive

    def test_stored_signature_path_identical(self):
        corpus, incoming = _corpus_and_incoming(seed=13)
        sigs = minhash_signatures(corpus).materialize()
        a = minhash_dedup_between(corpus, incoming).to_pandas()
        b = minhash_dedup_between(corpus, incoming, corpus_sigs=sigs).to_pandas()
        ka = sorted(zip(a["corpus_id"], a["incoming_id"]))
        kb = sorted(zip(b["corpus_id"], b["incoming_id"]))
        assert ka == kb

    def test_clean_incoming_returns_empty(self):
        corpus, _ = _corpus_and_incoming(seed=17)
        inc = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([9_000_000], pa.int64()),
                    "text": pa.array(
                        ["zeta omega completely unrelated vocabulary tokens "
                         "nowhere near the corpus shingle space at all"]
                    ),
                }
            )
        )
        out = minhash_dedup_between(corpus, inc, threshold=0.7).to_pandas()
        assert len(out) == 0
