"""DSIR importance weights, interpolated trigram LM, temperature mix,
and eigenvector centrality vs pure-Python/numpy oracles."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data

from linkgraph.algos.eigencent import eigencent_dataset
from linkgraph.ops.dsir import dsir_weights
from linkgraph.ops.lm import lm3_score
from linkgraph.ops.sampling import lang_temperature


def docs_ds(texts, langs=None):
    cols = {
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }
    if langs is not None:
        cols["lang"] = pa.array(langs)
    return ray.data.from_arrow(pa.table(cols))


def _grams(text):
    toks = text.split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def dsir_oracle(texts, langs, target="en"):
    cr, ct = Counter(), Counter()
    for t, l in zip(texts, langs):
        g = _grams(t)
        cr.update(g)
        if l == target:
            ct.update(g)
    tr, tt, v = sum(cr.values()), sum(ct.values()), len(cr)
    out = {}
    for i, t in enumerate(texts):
        g = _grams(t)
        s = sum(
            math.log((ct[x] + 1) / (tt + v)) - math.log((cr[x] + 1) / (tr + v))
            for x in g
        )
        out[i] = (len(g), round(s, 6))
    return out


def test_dsir_weights_oracle():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=25)) for _ in range(40)]
    langs = ["en" if i % 3 == 0 else "de" for i in range(40)]
    got = dsir_weights(docs_ds(texts, langs)).to_pandas()
    want = dsir_oracle(texts, langs)
    assert len(got) == 40
    for r in got.itertuples():
        n, w = want[r.doc_id]
        assert r.n_grams == n
        assert abs(r.dsir_logw - w) < 1e-9, (r.doc_id, r.dsir_logw, w)
    # target-language docs should look more target-like on average
    en = got[got["doc_id"] % 3 == 0]["dsir_logw"].mean()
    de = got[got["doc_id"] % 3 != 0]["dsir_logw"].mean()
    # same vocab both slices -> weights near 0 but ordering still holds
    # only statistically; assert finiteness + zero-doc handling instead
    assert np.isfinite(en) and np.isfinite(de)


def test_dsir_short_docs():
    texts = ["a", "a b", "x y z"]
    langs = ["en", "de", "en"]
    got = (
        dsir_weights(docs_ds(texts, langs)).to_pandas().set_index("doc_id")
    )
    want = dsir_oracle(texts, langs)
    for i in range(3):
        assert got.loc[i, "n_grams"] == want[i][0]
        assert abs(got.loc[i, "dsir_logw"] - want[i][1]) < 1e-9


def lm3_oracle(texts, lambdas=(0.6, 0.3, 0.1)):
    l3, l2, l1 = lambdas
    tgs = []
    for t in texts:
        toks = t.split(" ")
        tgs.append(list(zip(toks, toks[1:], toks[2:])))
    allt = [g for d in tgs for g in d]
    c123 = Counter(allt)
    c12 = Counter((a, b) for a, b, _ in allt)
    c23 = Counter((b, c) for _, b, c in allt)
    c2 = Counter(b for _, b, _ in allt)
    c3 = Counter(c for _, _, c in allt)
    t3 = len(allt)
    v = len({w for t in texts for w in t.split(" ")})
    out = {}
    for i, d in enumerate(tgs):
        if not d:
            out[i] = (0, 0.0)
            continue
        s = sum(
            math.log(
                l3 * (c123[g] + 1) / (c12[(g[0], g[1])] + v)
                + l2 * (c23[(g[1], g[2])] + 1) / (c2[g[1]] + v)
                + l1 * (c3[g[2]] + 1) / (t3 + v)
            )
            for g in d
        )
        out[i] = (len(d), round(s / len(d), 8))
    return out


def test_lm3_score_oracle():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(30)]
    texts += ["a", "a b"]  # <3 tokens -> score 0.0, n_trigrams 0
    got = lm3_score(docs_ds(texts)).to_pandas().set_index("doc_id")
    want = lm3_oracle(texts)
    assert len(got) == len(texts)
    for i in range(len(texts)):
        n, s = want[i]
        assert got.loc[i, "n_trigrams"] == n
        assert abs(got.loc[i, "lm3_score"] - s) < 1e-9, (i,)


def test_lang_temperature_oracle():
    langs = ["en"] * 50 + ["de"] * 20 + ["fr"] * 5
    texts = ["x"] * len(langs)
    got = (
        lang_temperature(docs_ds(texts, langs), alpha=0.7)
        .to_pandas()
        .set_index("lang")
    )
    n = {"en": 50, "de": 20, "fr": 5}
    denom = sum(v**0.7 for v in n.values())
    for l, c in n.items():
        assert got.loc[l, "n_docs"] == c
        w = c**0.7 / denom
        assert abs(got.loc[l, "weight"] - round(w, 8)) < 1e-12
        assert abs(got.loc[l, "quota"] - round(w * 75, 6)) < 1e-9
    # temperature flattens: en share drops below proportional, fr rises
    assert got.loc["en", "weight"] < 50 / 75
    assert got.loc["fr", "weight"] > 5 / 75


def eigen_oracle(edges, iters=4):
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    x = np.ones(len(verts))
    for _ in range(iters):
        m = np.zeros(len(verts))
        for s, d in edges:
            m[idx[d]] += x[idx[s]]
        x = m / m.sum()
    return {v: round(x[idx[v]], 8) for v in verts}


def test_eigencent_oracle():
    rng = np.random.default_rng(3)
    edges = list({(int(a), int(b)) for a, b in rng.integers(0, 40, (200, 2)) if a != b})
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = eigencent_dataset(ds, iters=4).to_pandas().set_index("v")
    want = eigen_oracle(edges)
    assert len(got) == len(want)
    for v, x in want.items():
        assert abs(got.loc[v, "eigencent"] - x) < 1e-7, (v,)
    # L1 norm ~1 (zero-in-degree vertices hold 0)
    assert abs(got["eigencent"].sum() - 1.0) < 1e-6
