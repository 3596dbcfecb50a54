"""dup_span_pairs (substring-level cross-doc dedup) vs a brute-force
window oracle, incl. the non-ASCII per-window fallback path."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

import ray.data

from linkgraph.ops.dedup import dup_span_pairs


def _brute(texts, win, stride, min_shared, max_df):
    wins = {
        i: {t[p : p + win] for p in range(0, len(t) - win + 1, stride)}
        for i, t in enumerate(texts)
        if len(t) >= win
    }
    df = {}
    for s in set().union(*wins.values()) if wins else set():
        df[s] = sum(s in w for w in wins.values())
    keep = {s for s, n in df.items() if 2 <= n <= max_df}
    out = {}
    for a, b in itertools.combinations(sorted(wins), 2):
        n = len(wins[a] & wins[b] & keep)
        if n >= min_shared:
            out[(a, b)] = n
    return out


def _docs_ds(texts):
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ).repartition(4)


def _corpus(seed=11, n=60, planted=8):
    rng = np.random.default_rng(seed)
    words = [f"w{i:03d}" for i in range(40)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(30, 60))) for _ in range(n)
    ]
    span = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN AND AGAIN"
    for i in range(planted):  # plant a shared span at a stride-aligned offset
        texts[i] = texts[i][:16] + span + texts[i][16:]
    return texts


def test_dup_spans_matches_brute_force(ray_session):
    texts = _corpus()
    got = dup_span_pairs(_docs_ds(texts), win=24, stride=4, min_shared=2, max_df=32)
    got_map = {(int(r["a"]), int(r["b"])): int(r["n_shared"]) for r in got.take_all()}
    want = _brute(texts, 24, 4, 2, 32)
    assert got_map == want
    assert len(want) >= (8 * 7) // 2  # the planted clique is found


def test_dup_spans_max_df_drops_boilerplate(ray_session):
    # a span present in EVERY doc is boilerplate: with max_df < n it
    # must contribute nothing
    boiler = "COPYRIGHT 2026 EXAMPLE CORP ALL RIGHTS RESERVED FOOTER TEXT"
    # per-doc prefix of one distinct repeated letter so even windows
    # straddling the prefix/boiler boundary are doc-unique
    texts = [chr(65 + i) * 108 + boiler for i in range(20)]
    got = dup_span_pairs(_docs_ds(texts), win=24, stride=4, min_shared=1, max_df=10)
    assert got.count() == 0
    want = _brute(texts, 24, 4, 1, 10)
    assert want == {}


def test_dup_spans_random_corpora_property(ray_session):
    """Property check over random tiny-alphabet corpora (maximizes
    window collisions, boilerplate, and boundary cases): operator ==
    brute force for every sampled corpus."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    corpus = st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=2, max_size=12
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(texts=corpus)
    def run(texts):
        got = dup_span_pairs(_docs_ds(texts), win=6, stride=2, min_shared=1, max_df=6)
        got_map = {
            (int(r["a"]), int(r["b"])): int(r["n_shared"]) for r in got.take_all()
        }
        assert got_map == _brute(texts, 6, 2, 1, 6)

    run()


def test_dup_spans_short_docs_empty_result(ray_session):
    # every doc shorter than the window -> no rows, stable schema
    got = dup_span_pairs(_docs_ds(["short", "tiny", "abc"]), win=32)
    assert got.count() == 0
    sch = got.schema(fetch_if_missing=False)
    assert sch is None or set(sch.names) == {"a", "b", "n_shared"}


def test_dup_spans_non_ascii_path_consistent(ray_session):
    # identical window content in an ASCII doc and a doc with a
    # non-ASCII prefix placed so the shared span stays stride-aligned:
    # the fallback path must hash windows identically
    span = "SHARED SPAN CONTENT THAT IS LONG ENOUGH TO MATCH HERE"
    texts = [
        "aaaa" + span + " tail one",
        "σσσσ" + span + " tail two",  # 4 non-ASCII chars: same char offsets
    ]
    got = dup_span_pairs(_docs_ds(texts), win=16, stride=4, min_shared=1, max_df=8)
    rows = got.take_all()
    want = _brute(texts, 16, 4, 1, 8)
    assert {(int(r["a"]), int(r["b"])): int(r["n_shared"]) for r in rows} == want
    assert (0, 1) in want  # the span is actually shared
