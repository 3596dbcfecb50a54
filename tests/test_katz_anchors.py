"""Katz centrality + anchor-text index vs single-threaded oracles."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from linkgraph.algos import katz_dataset, katz_numpy
from linkgraph.ops import (
    DocAnchorTerms,
    anchor_top_terms,
    anchor_index_pages,
    page_anchor_pairs,
)
from linkgraph.synth import pages_table
from oracles import FIXTURE_GRAPHS, random_edges


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


@pytest.mark.parametrize("name", sorted(FIXTURE_GRAPHS))
def test_katz_fixtures(name):
    edges = FIXTURE_GRAPHS[name]
    out = katz_dataset(edges_ds(edges), iters=4, alpha=0.05).to_pandas()
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    n = int(max(src.max(), dst.max())) + 1
    want = katz_numpy(src, dst, n, iters=4, alpha=0.05)
    got = dict(zip(out["v"], out["katz"]))
    verts = set(src) | set(dst)
    assert set(got) == verts
    for v in verts:
        assert abs(got[v] - want[v]) < 1e-9


def test_katz_random_matches_numpy():
    edges = random_edges(300, 1500, seed=7)
    out = katz_dataset(edges_ds(edges), iters=5, alpha=0.03).to_pandas()
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    n = int(max(src.max(), dst.max())) + 1
    want = katz_numpy(src, dst, n, iters=5, alpha=0.03)
    for v, x in zip(out["v"], out["katz"]):
        assert abs(x - want[v]) < 1e-9


def _anchor_oracle(edge_list, terms_by_doc, k=3):
    """Per-dst top-k (count desc, term asc) over src-contributed terms."""
    from collections import Counter, defaultdict

    counts = defaultdict(Counter)
    for s, d in edge_list:
        for t in terms_by_doc.get(s, []):
            counts[d][t] += 1
    rows = []
    for d, c in counts.items():
        ranked = sorted(c.items(), key=lambda x: (-x[1], x[0]))[:k]
        for r, (t, n) in enumerate(ranked, 1):
            rows.append((d, t, n, r))
    return sorted(rows)


def test_anchor_top_terms_oracle():
    rng = np.random.default_rng(3)
    n_docs = 60
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [
        " ".join(rng.choice(vocab, size=10)) for _ in range(n_docs)
    ]
    edges = random_edges(n_docs, 400, seed=11)
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    dt = docs.map_batches(DocAnchorTerms(4), batch_format="pyarrow")
    got = anchor_top_terms(edges_ds(edges), dt, k=3).to_pandas()
    got_rows = sorted(
        zip(got["dst"], got["term"], got["n"], got["term_rank"])
    )
    terms_by_doc = {i: texts[i].split(" ")[:4] for i in range(n_docs)}
    want = _anchor_oracle(edges, terms_by_doc, k=3)
    assert got_rows == want


def test_anchor_index_pages_oracle():
    """Real-markup path vs a scalar per-page replay (page_anchor_pairs
    is itself asserted against the generator's target list)."""
    from collections import Counter, defaultdict

    from linkgraph.hashing import hash64_one_signed

    n = 150
    pt = pages_table(np.arange(n), n, 7)
    got = anchor_index_pages(ray.data.from_arrow(pt), k=3).to_pandas()
    counts = defaultdict(Counter)
    for url, html in zip(pt.column("url").to_pylist(), pt.column("html").to_pylist()):
        for target, anchor in page_anchor_pairs(html, url):
            for tok in anchor.split():
                counts[hash64_one_signed(target)][tok] += 1
    want = []
    for d, c in counts.items():
        ranked = sorted(c.items(), key=lambda x: (-x[1], x[0]))[:3]
        for r, (t, cnt) in enumerate(ranked, 1):
            want.append((d, t, cnt, r))
    got_rows = sorted(zip(got["dst"], got["term"], got["n"], got["term_rank"]))
    assert got_rows == sorted(want)


def test_page_anchor_pairs_matches_generator():
    """The scalar reference itself: anchors in the synthetic html are
    'link {t}' pointing at page t's absolutized url."""
    from linkgraph.synth import page_url

    n = 40
    pt = pages_table(np.arange(n), n, 5)
    for k, (url, html) in enumerate(
        zip(pt.column("url").to_pylist(), pt.column("html").to_pylist())
    ):
        for target, anchor in page_anchor_pairs(html, url):
            t = int(anchor.split()[1])
            assert target == page_url(t, 5)


@pytest.mark.parametrize("name", sorted(FIXTURE_GRAPHS))
def test_salsa_fixtures(name):
    from linkgraph.algos import salsa_dataset, salsa_numpy

    edges = FIXTURE_GRAPHS[name]
    out = salsa_dataset(edges_ds(edges), iters=5).to_pandas()
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    n = int(max(src.max(), dst.max())) + 1
    wh, wa = salsa_numpy(src, dst, n, iters=5)
    for v, h, a in zip(out["v"], out["hub"], out["auth"]):
        assert abs(h - wh[v]) < 1e-7
        assert abs(a - wa[v]) < 1e-7


def test_salsa_random_matches_numpy():
    from linkgraph.algos import salsa_dataset, salsa_numpy

    edges = random_edges(250, 1200, seed=17)
    out = salsa_dataset(edges_ds(edges), iters=6).to_pandas()
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    n = int(max(src.max(), dst.max())) + 1
    wh, wa = salsa_numpy(src, dst, n, iters=6)
    for v, h, a in zip(out["v"], out["hub"], out["auth"]):
        assert abs(h - wh[v]) < 1e-7
        assert abs(a - wa[v]) < 1e-7
