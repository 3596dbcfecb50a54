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
    """Arrow pages table for the given page ids — vectorized generation
    (bit-exact with the scalar ``page_record`` reference; tests assert
    parity). All mixing is batched numpy; only string assembly loops."""
    ids = np.asarray(ids, dtype=np.uint64)
    n = len(ids)
    if n == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.timestamp("us")),
                "html": pa.array([], pa.binary()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
            }
        )
    kint = ids.astype(np.int64)
    site = (kint % n_sites).astype(np.int64)
    n_out = 1 + (mix2(ids, np.zeros(n, np.uint64)) % np.uint64(2 * avg_out - 1)).astype(
        np.int64
    )
    max_out = int(n_out.max())
    J = np.arange(1, max_out + 1, dtype=np.uint64)
    u = uniform01(mix2(ids[:, None], J[None, :]))  # (n, max_out)
    t = np.minimum((n_pages * u**_ZIPF_BETA).astype(np.int64), n_pages - 1)
    # rooted-href columns (j % 3 == 1, 0-based j = column index)
    for j in range(1, max_out, 3):
        t2 = np.minimum((t[:, j] // n_sites) * n_sites + site, n_pages - 1)
        t2 = np.where(t2 % n_sites != site, site, t2)
        t[:, j] = t2
    widx = (
        mix2(ids[:, None], (np.uint64(100) + np.arange(20, dtype=np.uint64))[None, :])
        % np.uint64(10)
    ).astype(np.int64)

    urls, htmls, texts, langs = [], [], [], []
    for i in range(n):
        k = int(kint[i])
        lang = page_lang(k)
        vocab = _VOCAB[lang]
        para = " ".join(vocab[w] for w in widx[i])
        title = f"title {k}"
        m = int(n_out[i])
        targets = []
        for j in range(m):
            tj = int(t[i, j])
            if j % 3 == 1:
                targets.append((tj, f"/p/{tj}"))
            else:
                targets.append((tj, page_url(tj, n_sites)))
        if m >= 6:
            targets.append(targets[0])
            targets.append((k, f"/p/{k}"))
        anchors = "".join(f'<a href="{href}">link {tt}</a>' for tt, href in targets)
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{para}</p>{anchors}</body></html>"
        )
        urls.append(page_url(k, n_sites))
        htmls.append(html.encode("utf-8"))
        texts.append("\n".join([title, para] + [f"link {tt}" for tt, _ in targets]))
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array((EPOCH_US + kint * 1_000_000), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
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


def rmat_edges(ids: np.ndarray, scale: int, a: float = 0.57, b: float = 0.19, c: float = 0.19, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized Graph500 Kronecker/RMAT edges for the given edge
    indices (mirrors the reference's power-law generator,
    tools/generate_graph.c:8-35). Pure function of the edge index —
    order-independent, reproducible, parallel-friendly."""
    ids = np.asarray(ids, dtype=np.uint64)
    u = np.zeros(len(ids), np.int64)
    v = np.zeros(len(ids), np.int64)
    ab, abc = a + b, a + b + c
    for i in range(scale):
        r = uniform01(mix2(ids, np.uint64(seed * 1000 + i)))
        bit_u = (r >= ab).astype(np.int64)
        bit_v = ((r >= abc) | ((r >= a) & (r < ab))).astype(np.int64)
        u |= bit_u << i
        v |= bit_v << i
    return u, v


def rmat_dataset(n_edges: int, scale: int, seed: int = 1, parallelism: int = 128):
    """Lazy Dataset of RMAT edges (src, dst), self-loops dropped."""
    import pyarrow as pa
    import ray.data

    def gen(batch) -> pa.Table:
        u, v = rmat_edges(batch["id"], scale, seed=seed)
        keep = u != v
        return pa.table({"src": pa.array(u[keep]), "dst": pa.array(v[keep])})

    ds = ray.data.range(n_edges, override_num_blocks=parallelism)
    # cap the batch size so small datasets keep parallel blocks: at
    # batch_size=1<<20 a 1M-edge dataset would coalesce all generator
    # blocks into ONE output block, serializing every downstream stage
    # (the streaming bench routes these batches — 1 block = 1 route task)
    bs = int(max(min(1 << 20, n_edges // 32), 1 << 14))
    return ds.map_batches(gen, batch_format="numpy", batch_size=bs)


def expected_edge_set(n_pages: int, n_sites: int, avg_out: int = 8) -> set[tuple[str, str]]:
    """Oracle: the exact deduplicated (src_url, dst_url) set, self-loops dropped."""
    out = set()
    for k in range(n_pages):
        src = page_url(k, n_sites)
        for t, _ in _out_targets(k, n_pages, n_sites, avg_out):
            if t != k:
                out.add((src, page_url(t, n_sites)))
    return out
