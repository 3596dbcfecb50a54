"""BM25 top-k (linkgraph/ops/bm25.py) vs a brute-force single-process
reference over crafted corpora."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from linkgraph.ops.bm25 import B, K1, bm25_topk


def _ref_bm25(texts, terms, k):
    toks = [[w.lower() for w in __import__("re").findall(r"[A-Za-z0-9]+", t)] for t in texts]
    N = len(texts)
    dl = [len(ts) for ts in toks]
    avgdl = sum(dl) / N
    rows = []
    for i, ts in enumerate(toks):
        s = 0.0
        for term in terms:
            tf = ts.count(term)
            df = sum(1 for u in toks if term in u)
            idf = math.log((float(N) - df + 0.5) / (df + 0.5) + 1.0)
            s = s + idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * (dl[i] / avgdl)))
        rows.append((i, round(s, 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return [(i, s, r + 1) for r, (i, s) in enumerate(rows[:k])]


def _docs_ds(texts, blocks=3):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(blocks)


def test_bm25_matches_bruteforce():
    rng = np.random.default_rng(11)
    vocab = ["data", "join", "hash", "scan", "dup", "group", "sort"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(80)
    ]
    terms = ("data", "dup")
    got = bm25_topk(_docs_ds(texts), terms, k=7).to_pandas()
    ref = _ref_bm25(texts, terms, 7)
    assert list(zip(got["doc_id"], got["score"], got["bm25_rank"])) == ref


def test_bm25_prefers_rare_term_docs():
    texts = ["data join scan"] * 20 + ["dup dup data"]
    got = bm25_topk(_docs_ds(texts), ("data", "dup"), k=3).to_pandas()
    assert got.iloc[0]["doc_id"] == 20  # the only doc with the rare term
    assert got.iloc[0]["score"] > got.iloc[1]["score"]


def test_bm25_term_absent_everywhere():
    texts = ["data join"] * 5
    got = bm25_topk(_docs_ds(texts, 1), ("zzz",), k=3).to_pandas()
    assert len(got) == 3 and (got["score"] == 0.0).all()
