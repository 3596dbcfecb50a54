"""Deterministic synthetic Common-Crawl-style pages (BASELINE.json input_hint).

Schema: ``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``. Every field is a pure function of the page index ``k``
and the generator parameters — no RNG state, no wall clock — so any row
range can be generated independently on any worker and two runs are
byte-identical (the analogue of the reference's seeded LCG edge streams,
reference test/connected_components.c:37-51, and the Graph500 Kronecker
generator, reference tools/generate_graph.c:8-35).

Outlink targets follow an inverse-CDF power law (``t = floor(N * u^5)``,
Zipf-ish alpha≈1.2) so the derived link graph has hub skew — the case
the engine's combiner / salted-reduce path exists for.

The ``text`` column is the golden extraction output: tests assert
``extract.extract_text(html) == text`` byte-identically per url.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import mix2, uniform01

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 UTC in microseconds

_VOCAB = {
    "en": ["the", "and", "of", "crawl", "web", "graph", "link", "page", "data", "rank"],
    "de": ["der", "die", "und", "ist", "seite", "netz", "graph", "daten", "rang", "ein"],
    "fr": ["le", "la", "et", "est", "page", "toile", "graphe", "avec", "rang", "une"],
    "es": ["el", "la", "y", "es", "red", "grafo", "enlace", "datos", "rango", "una"],
}
_LANG_CYCLE = ["de", "fr", "es"]
_ZIPF_BETA = 5.0  # t = floor(N * u^beta)  => density ~ t^(1/beta - 1), heavy head


def page_lang(k: int) -> str:
    if k % 10 != 0:
        return "en"
    return _LANG_CYCLE[(k // 10) % 3]


def page_url(k: int, n_sites: int) -> str:
    return f"https://site{k % n_sites}.example/p/{k}"


def _out_targets(k: int, n_pages: int, n_sites: int, avg_out: int) -> list[tuple[int, str]]:
    """Deterministic outlink targets for page k: list of (target_id, href).

    Mixes absolute and rooted-relative hrefs; rooted hrefs are forced to
    same-site targets so every href resolves to a real page url. Appends
    a duplicate link and a self link for larger pages to exercise edge
    dedup and self-loop dropping.
    """
    ks = np.uint64(k)
    n_out = 1 + int(mix2(ks, np.uint64(0)) % np.uint64(2 * avg_out - 1))
    s = k % n_sites
    out: list[tuple[int, str]] = []
    for j in range(n_out):
        u = float(uniform01(mix2(ks, np.uint64(j + 1))))
        t = min(int(n_pages * u**_ZIPF_BETA), n_pages - 1)
        if j % 3 == 1:
            # rooted href -> must target a same-site page
            t = min((t // n_sites) * n_sites + s, n_pages - 1)
            if t % n_sites != s:  # clip landed off-site at the tail
                t = s
            out.append((t, f"/p/{t}"))
        else:
            out.append((t, page_url(t, n_sites)))
    if n_out >= 6:
        out.append(out[0])  # duplicate edge
        out.append((k, f"/p/{k}"))  # self loop
    return out


def page_record(k: int, n_pages: int, n_sites: int, avg_out: int = 8) -> dict:
    """Full deterministic record for page k (url, ts, html, text, lang, out_urls)."""
    lang = page_lang(k)
    vocab = _VOCAB[lang]
    words = [vocab[int(mix2(np.uint64(k), np.uint64(100 + i)) % np.uint64(len(vocab)))] for i in range(20)]
    para = " ".join(words)
    title = f"title {k}"
    targets = _out_targets(k, n_pages, n_sites, avg_out)
    anchors = "".join(f'<a href="{href}">link {t}</a>' for t, href in targets)
    html = (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{para}</p>{anchors}</body></html>"
    )
    text = "\n".join([title, para] + [f"link {t}" for t, _ in targets])
    return {
        "url": page_url(k, n_sites),
        "warc_ts": EPOCH_US + k * 1_000_000,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
        "out_urls": [page_url(t, n_sites) for t, _ in targets],
    }


def pages_table(ids: np.ndarray, n_pages: int, n_sites: int, avg_out: int = 8) -> pa.Table:
    """Arrow pages table for the given page ids (vector of row indices)."""
    recs = [page_record(int(k), n_pages, n_sites, avg_out) for k in ids]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in recs], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in recs], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in recs], pa.binary()),
            "text": pa.array([r["text"] for r in recs], pa.string()),
            "lang": pa.array([r["lang"] for r in recs], pa.string()),
        }
    )


def pages_dataset(n_pages: int, n_sites: int = 16, avg_out: int = 8, parallelism: int = -1):
    """Lazy Ray Dataset of synthetic pages — generated in parallel on workers.

    Each block is produced independently from its row-id range (pure
    function of k), so generation scales out and never materializes on
    the driver.
    """
    import ray.data

    ds = ray.data.range(n_pages, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(
        lambda b: pages_table(b["id"], n_pages, n_sites, avg_out),
        batch_format="numpy",
        batch_size=4096,
    )


def expected_edge_set(n_pages: int, n_sites: int, avg_out: int = 8) -> set[tuple[str, str]]:
    """Oracle: the exact deduplicated (src_url, dst_url) set, self-loops dropped."""
    out = set()
    for k in range(n_pages):
        src = page_url(k, n_sites)
        for t, _ in _out_targets(k, n_pages, n_sites, avg_out):
            if t != k:
                out.add((src, page_url(t, n_sites)))
    return out
