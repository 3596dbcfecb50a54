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


# ---- round-4: vectorized batch scan vs scalar reference (adversarial) ----

ADVERSARIAL_PAGES = [
    # (url, html) — crafted around the blob-separator edge cases
    ("https://s0.example/p/0", b'<p>hello</p><a href="/p/1">x</a>'),
    # unterminated href at page tail (must extract nothing, and must not
    # swallow the next page's first link in the concatenated scan)
    ("https://s0.example/p/1", b'<p>t</p><a href="/p/unterminated'),
    ("https://s0.example/p/2", b'<a href="/p/3">first</a><a href="/p/4">y</a>'),
    # page ends with <a href= (separator quote must not open a match)
    ("https://s0.example/p/3", b"<p>tail</p><a href="),
    ("https://s0.example/p/4", b'<a href="https://ext.example/z">z</a>'),
    # text overhang: '>' with no closing '<' at page end
    ("https://s0.example/p/5", b"<p>kept</p>overhang-after-last-gt"),
    ("https://s0.example/p/6", b">leading text node<p>more</p>"),
    # empty page, page with no markup at all
    ("https://s0.example/p/7", b""),
    ("https://s0.example/p/8", b"no tags here"),
    # relative (non-rooted) href
    ("https://s0.example/p/dir/9", b'<a href="q.html">q</a><a href="/r">r</a>'),
    # self link (dropped) + duplicate link (deduped)
    ("https://s0.example/p/10", b'<a href="/p/10">self</a><a href="/p/0">d</a>'
                                b'<a href="/p/0">d</a>'),
    # adjacent text nodes sharing delimiters
    ("https://s0.example/p/11", b"<b>a</b>b<i>c</i>"),
    # whitespace-only text node (stripped -> dropped)
    ("https://s0.example/p/12", b"<p>  </p><p>kept2</p>"),
    # ---- round-5 real-world HTML hardening ----
    # single-quoted / unquoted hrefs, attribute reorder, ws around '='
    ("https://s1.example/m/0", b"<a href='/sq/1'>s</a><a href=/uq/2>u</a>"),
    ("https://s1.example/m/1", b'<a class="x" rel=nofollow href = "/after/attrs">y</a>'),
    # data-href is NOT a link; a tag without href is not a link
    ("https://s1.example/m/2", b'<a data-href="/not/a/link">n</a><a name=z>t</a>'),
    # <base href> redirects relative AND rooted resolution
    (
        "https://s1.example/m/3",
        b'<base href="https://cdn.example/b/"><a href="rel.html">r</a>'
        b'<a href="/rooted">o</a>',
    ),
    # relative <base> resolves against the page url first
    ("https://s1.example/m/4", b"<base href='sub/'><a href='x'>x</a>"),
    # protocol-relative href takes the page scheme
    ("https://s1.example/m/5", b'<a href="//other.example/pp">p</a>'),
    # non-navigational hrefs are dropped
    (
        "https://s1.example/m/6",
        b'<a href="#frag">f</a><a href="javascript:void(0)">j</a>'
        b'<a href="mailto:a@b.c">m</a><a href="/kept">k</a>',
    ),
    # unterminated single-quote and unquoted at page tail
    ("https://s1.example/m/7", b"<p>t</p><a href='/sq/untermin"),
    ("https://s1.example/m/8", b"<p>t</p><a href=/uq/tail-ok"),
    # uppercase tag/attr
    ("https://s1.example/m/9", b'<A HREF="/upper">U</A>'),
]


def test_messy_html_link_semantics():
    links = dict(ADVERSARIAL_PAGES)

    def ex(u):
        return extract.extract_links(links[u], u)

    assert ex("https://s1.example/m/0") == [
        "https://s1.example/sq/1",
        "https://s1.example/uq/2",
    ]
    assert ex("https://s1.example/m/1") == ["https://s1.example/after/attrs"]
    assert ex("https://s1.example/m/2") == []
    # base redirects BOTH relative and rooted resolution
    assert ex("https://s1.example/m/3") == [
        "https://cdn.example/b/rel.html",
        "https://cdn.example/rooted",
    ]
    assert ex("https://s1.example/m/4") == ["https://s1.example/m/sub/x"]
    assert ex("https://s1.example/m/5") == ["https://other.example/pp"]
    assert ex("https://s1.example/m/6") == ["https://s1.example/kept"]
    assert ex("https://s1.example/m/7") == []
    assert ex("https://s1.example/m/8") == ["https://s1.example/uq/tail-ok"]
    assert ex("https://s1.example/m/9") == ["https://s1.example/upper"]


def test_build_edges_canonicalize_resolves_dot_segments():
    # ../ in a relative href only collapses under canonicalize=True
    import ray.data

    from linkgraph.edges import build_edges

    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["https://s.example/a/b/page"]),
                "html": pa.array(
                    [b'<a href="../up.html">u</a><a href="./same.html">s</a>'],
                    pa.binary(),
                ),
            }
        )
    )
    raw = {r["dst"] for r in build_edges(pages).take_all()}
    canon = {r["dst"] for r in build_edges(pages, canonicalize=True).take_all()}
    assert raw == {
        hash64_one_signed("https://s.example/a/b/../up.html"),
        hash64_one_signed("https://s.example/a/b/./same.html"),
    }
    assert canon == {
        hash64_one_signed("https://s.example/a/up.html"),
        hash64_one_signed("https://s.example/a/b/same.html"),
    }


def test_vectorized_extract_text_matches_scalar_adversarial():
    urls = [u for u, _ in ADVERSARIAL_PAGES]
    htmls = [h for _, h in ADVERSARIAL_PAGES]
    batch = pa.table({"url": pa.array(urls), "html": pa.array(htmls, pa.binary())})
    got = extract.ExtractText()(batch)
    want = [extract.extract_text(h) for h in htmls]
    assert got.column("text").to_pylist() == want


def test_vectorized_extract_edges_matches_scalar_adversarial():
    urls = [u for u, _ in ADVERSARIAL_PAGES]
    htmls = [h for _, h in ADVERSARIAL_PAGES]
    batch = pa.table({"url": pa.array(urls), "html": pa.array(htmls, pa.binary())})
    got = {(r["src"], r["dst"]) for r in extract.ExtractEdges()(batch).to_pylist()}
    want = set()
    for u, h in ADVERSARIAL_PAGES:
        su = hash64_one_signed(u)
        for link in extract.extract_links(h, u):
            d = hash64_one_signed(link)
            if su != d:
                want.add((su, d))
    assert got == want
    assert len(got) == len(want)


def test_vectorized_extract_edges_matches_scalar_synth():
    # full-batch parity on the deterministic synth corpus
    t = synth.pages_table(np.arange(N_PAGES), N_PAGES, N_SITES)
    batch = pa.table({"url": t["url"], "html": t["html"]})
    got = {(r["src"], r["dst"]) for r in extract.ExtractEdges()(batch).to_pylist()}
    want = set()
    for k in range(N_PAGES):
        r = synth.page_record(k, N_PAGES, N_SITES)
        su = hash64_one_signed(r["url"])
        for link in extract.extract_links(r["html"], r["url"]):
            d = hash64_one_signed(link)
            if su != d:
                want.add((su, d))
    assert got == want


def test_vectorized_extract_edges_empty_batch():
    batch = pa.table(
        {"url": pa.array([], pa.string()), "html": pa.array([], pa.binary())}
    )
    out = extract.ExtractEdges()(batch)
    assert out.num_rows == 0
    assert out.schema.names == ["src", "dst"]
    t = extract.ExtractText()(batch)
    assert t.num_rows == 0


def test_distinct_edges_exact_across_blocks():
    # duplicates deliberately spread across MANY input blocks: the
    # sort+mask dedup must still be exact (equal keys land in one sorted
    # block; adjacent-mask removes them all)
    import ray.data
    from linkgraph.edges import distinct_edges

    rng = np.random.default_rng(11)
    n = 40000
    src = rng.integers(-50, 50, n).astype(np.int64)
    dst = rng.integers(-50, 50, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(37)
    got = {(r["src"], r["dst"]) for r in distinct_edges(ds).take_all()}
    want = {(int(s), int(d)) for s, d in zip(src, dst)}
    assert got == want
    assert distinct_edges(ds).count() == len(want)  # no boundary dups survive


def test_typed_nofollow_extraction():
    import ray.data

    from linkgraph.edges import build_edges

    pages = [
        (
            "https://s.example/t/0",
            b'<a rel="nofollow" href="/a">x</a><a href="/b">y</a>'
            b"<a href='/c' rel='ugc nofollow'>z</a><a href=/d rel=nofollow>w</a>",
        ),
        # rel on another tag does not type this page's links; rel value
        # containing 'nofollow' as a substring of another token does not
        ("https://s.example/t/1", b'<a href="/e" rel="nofollowish">n</a>'),
        # duplicate edge follow+nofollow dedups to follow (min)
        (
            "https://s.example/t/2",
            b'<a rel=nofollow href="/f">1</a><a href="/f">2</a>',
        ),
    ]
    # scalar semantics
    got = extract.extract_links_typed(pages[0][1], pages[0][0])
    assert got == [
        ("https://s.example/a", 1),
        ("https://s.example/b", 0),
        ("https://s.example/c", 1),
        ("https://s.example/d", 1),
    ]
    assert extract.extract_links_typed(pages[1][1], pages[1][0]) == [
        ("https://s.example/e", 0)
    ]
    # vectorized parity (batch level)
    batch = pa.table(
        {
            "url": pa.array([u for u, _ in pages]),
            "html": pa.array([h for _, h in pages], pa.binary()),
        }
    )
    out = extract.ExtractEdges(typed=True)(batch).to_pylist()
    want = set()
    for u, h in pages:
        su = hash64_one_signed(u)
        links = {}
        for link, nf in extract.extract_links_typed(h, u):
            d = hash64_one_signed(link)
            if su != d:
                links[(su, d)] = min(nf, links.get((su, d), 1))
        want |= {(a, b, nf) for (a, b), nf in links.items()}
    assert {(r["src"], r["dst"], r["nofollow"]) for r in out} == want
    # end-to-end typed build: global dedup keeps min(nofollow)
    ds = ray.data.from_arrow(batch)
    edges = build_edges(ds, typed=True).to_pandas()
    f = edges[edges.src == hash64_one_signed("https://s.example/t/2")]
    assert f["nofollow"].tolist() == [0]
