"""HTML text + hyperlink extraction (stateless map_batches stages).

The per-row invariant from BASELINE.json: extracted text is
byte-identical per url to the golden ``text`` column the generator
writes (the analogue of the reference's golden trace diffing,
reference tools/compare_traces.py:1-40).

Extraction spec (the "reference extractor" this engine defines):
  * text  = all non-empty text nodes (content between ``>`` and ``<``),
    stripped, joined with ``"\\n"`` in document order.
  * links = every ``<a href="...">`` value, absolutized against the
    page url: absolute (``http...``) kept; rooted (``/x``) joined to
    the url's scheme+host; other values joined to the url's directory.

Regexes are compiled once per actor (``__init__``), batches are Arrow
in / Arrow out.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .hashing import hash64_str

_TEXT_NODE = re.compile(rb">([^<]+)<")
_HREF = re.compile(rb'<a\s+href="([^"]+)"', re.I)


def extract_text(html: bytes) -> str:
    parts = [m.strip() for m in _TEXT_NODE.findall(html)]
    return b"\n".join(p for p in parts if p).decode("utf-8")


def _host_prefix(url: str) -> str:
    # scheme://host
    i = url.find("//")
    j = url.find("/", i + 2)
    return url if j < 0 else url[:j]


def _dir_prefix(url: str) -> str:
    j = url.rfind("/")
    return url[: j + 1]


def absolutize(href: str, page_url: str) -> str:
    if href.startswith("http://") or href.startswith("https://"):
        return href
    if href.startswith("/"):
        return _host_prefix(page_url) + href
    return _dir_prefix(page_url) + href


def extract_links(html: bytes, page_url: str) -> list[str]:
    return [absolutize(h.decode("utf-8"), page_url) for h in _HREF.findall(html)]


class ExtractText:
    """Actor-pool stage: pages(url, html) -> (url, text)."""

    def __init__(self):
        self.text_node = _TEXT_NODE  # compiled once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch.column("html").to_pylist()]
        return pa.table(
            {"url": batch.column("url"), "text": pa.array(texts, pa.string())}
        )


class ExtractEdges:
    """Actor-pool stage: pages(url, html) -> hashed edge rows (src, dst).

    Per batch: regex href scan per page, absolutize, hash src/dst urls
    with the vectorized 64-bit string hash, drop self loops, dedup
    within the batch (global dedup is a later groupby — SURVEY.md §7
    step 2).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        src_urls: list[str] = []
        dst_urls: list[str] = []
        for u, h in zip(urls, htmls):
            for link in extract_links(h, u):
                src_urls.append(u)
                dst_urls.append(link)
        if not src_urls:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        # int64 bit-view of the 64-bit hash: Ray Data's hash shuffle
        # handles int64 keys natively (uint64 keys fall back to pickled
        # objects), and the bit pattern keeps full hash entropy.
        src = hash64_str(src_urls).view(np.int64)
        dst = hash64_str(dst_urls).view(np.int64)
        keep = src != dst  # drop self loops
        src, dst = src[keep], dst[keep]
        # in-batch dedup (combiner before the global dedup shuffle)
        pairs = np.stack([src, dst], axis=1)
        pairs = np.unique(pairs, axis=0)
        return pa.table(
            {
                "src": pa.array(pairs[:, 0], pa.int64()),
                "dst": pa.array(pairs[:, 1], pa.int64()),
            }
        )
