"""Chunk-level dedup + bigram-LM scoring vs pure-Python oracles."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data

from linkgraph.ops import para_dedup_stats, lm_score


def docs_ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )


def _chunks(text, w):
    toks = text.split(" ")
    return [" ".join(toks[i : i + w]) for i in range(0, len(toks), w)]


def para_oracle(texts, w):
    counts = Counter()
    for t in texts:
        counts.update(_chunks(t, w))
    rows = {}
    for i, t in enumerate(texts):
        ch = _chunks(t, w)
        nd = sum(1 for c in ch if counts[c] > 1)
        rows[i] = (len(ch), nd, nd / len(ch))
    return rows


def test_para_dedup_planted():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(30)]
    # plant a shared 8-token chunk at a chunk boundary in docs 0 and 1
    shared = " ".join(vocab[:8])
    texts[0] = shared + " " + texts[0]
    texts[1] = shared + " " + texts[1]
    got = para_dedup_stats(docs_ds(texts), chunk_tokens=8).to_pandas()
    want = para_oracle(texts, 8)
    assert len(got) == len(texts)
    for r in got.itertuples():
        n, d, ratio = want[r.doc_id]
        assert (r.n_chunks, r.n_dup) == (n, d), r
        assert r.dup_ratio == ratio
    # the planted chunk is seen: docs 0 and 1 have >=1 dup chunk
    by_doc = dict(zip(got["doc_id"], got["n_dup"]))
    assert by_doc[0] >= 1 and by_doc[1] >= 1


def test_para_dedup_within_doc_repeat_counts():
    texts = ["a b a b", "c d e f"]
    got = para_dedup_stats(docs_ds(texts), chunk_tokens=2).to_pandas()
    by_doc = {r.doc_id: (r.n_chunks, r.n_dup) for r in got.itertuples()}
    # doc 0 = chunks ["a b", "a b"]: both duplicated (within one doc)
    assert by_doc[0] == (2, 2)
    assert by_doc[1] == (2, 0)


def lm_oracle(texts):
    bigrams = Counter()
    left = Counter()
    vocab = set()
    for t in texts:
        toks = t.split(" ")
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
            left[a] += 1
    v = len(vocab)
    out = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        lps = [
            math.log((bigrams[(a, b)] + 1) / (left[a] + v))
            for a, b in zip(toks, toks[1:])
        ]
        out[i] = (len(lps), round(sum(lps) / len(lps), 8) if lps else 0.0)
    return out


def test_lm_score_oracle():
    rng = np.random.default_rng(9)
    vocab = [f"t{i}" for i in range(20)]
    texts = [" ".join(rng.choice(vocab, size=int(n))) for n in rng.integers(1, 60, 25)]
    got = lm_score(docs_ds(texts)).to_pandas()
    want = lm_oracle(texts)
    assert len(got) == len(texts)
    for r in got.itertuples():
        n, s = want[r.doc_id]
        assert r.n_bigrams == n
        assert abs(r.lm_score - s) < 1e-7


def test_lm_score_common_beats_rare():
    """A doc of corpus-frequent bigrams scores higher than one of
    bigrams seen nowhere else."""
    base = ["x y " * 30 + "x y"] * 10
    texts = base + ["x y x y x y x", "q r s t u v w"]
    got = lm_score(docs_ds(texts)).to_pandas()
    by_doc = dict(zip(got["doc_id"], got["lm_score"]))
    assert by_doc[10] > by_doc[11]
