"""Extraction invariants: byte-identical text per url (BASELINE.json
input_hint per-row invariant) and exact link-graph parity."""

import numpy as np
import pyarrow as pa
import pytest

from linkgraph import extract, synth
from linkgraph.edges import build_edges
from linkgraph.hashing import hash64_one_signed

N_PAGES, N_SITES = 64, 4


def test_extract_text_byte_identical():
    for k in range(N_PAGES):
        r = synth.page_record(k, N_PAGES, N_SITES)
        assert extract.extract_text(r["html"]) == r["text"], r["url"]


def test_extract_links_absolutized():
    for k in range(N_PAGES):
        r = synth.page_record(k, N_PAGES, N_SITES)
        links = extract.extract_links(r["html"], r["url"])
        assert links == r["out_urls"], r["url"]


def test_absolutize_forms():
    base = "https://site3.example/p/42"
    assert extract.absolutize("https://x.example/y", base) == "https://x.example/y"
    assert extract.absolutize("/p/7", base) == "https://site3.example/p/7"
    assert extract.absolutize("q.html", base) == "https://site3.example/p/q.html"


def test_pipeline_text_matches_golden():
    ds = synth.pages_dataset(N_PAGES, N_SITES, parallelism=4)
    out = ds.map_batches(extract.ExtractText(), batch_format="pyarrow")
    got = {r["url"]: r["text"] for r in out.take_all()}
    for k in range(N_PAGES):
        r = synth.page_record(k, N_PAGES, N_SITES)
        assert got[r["url"]] == r["text"]


def test_edge_table_matches_expected_set():
    ds = synth.pages_dataset(N_PAGES, N_SITES, parallelism=4)
    edges = build_edges(ds)
    rows = edges.take_all()
    got = {(r["src"], r["dst"]) for r in rows}
    expected = {
        (hash64_one_signed(s), hash64_one_signed(d))
        for s, d in synth.expected_edge_set(N_PAGES, N_SITES)
    }
    assert got == expected
    # dedup really deduplicated
    assert len(rows) == len(got)


def test_generation_deterministic_and_order_independent():
    t1 = synth.pages_table(np.arange(10), N_PAGES, N_SITES)
    t2 = synth.pages_table(np.arange(10)[::-1], N_PAGES, N_SITES)
    d1 = {u: h for u, h in zip(t1["url"].to_pylist(), t1["html"].to_pylist())}
    d2 = {u: h for u, h in zip(t2["url"].to_pylist(), t2["html"].to_pylist())}
    assert d1 == d2
