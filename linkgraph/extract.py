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
from .segops import pair_unique

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


def _scan_batch(htmls: list[bytes], pattern: re.Pattern, sep: bytes):
    """ONE regex pass over the whole batch: pages joined with ``sep``,
    matches mapped back to page index by searchsorted on the page start
    offsets. Returns (page_idx int64 array, match starts, captures,
    page_starts) with cross-page artifacts NOT yet filtered — the caller
    knows which separator artifact its pattern can produce.

    This replaces the per-page ``findall`` loop (round-3 VERDICT item 5:
    extract was the top bench stage at 24%, dominated by per-page regex
    calls): the regex engine makes a single C-level sweep and the page
    attribution is one vectorized searchsorted."""
    blob = sep.join(htmls)
    n = len(htmls)
    lens = np.fromiter((len(h) for h in htmls), np.int64, n)
    page_starts = np.zeros(n, np.int64)
    if n > 1:
        np.cumsum(lens[:-1] + len(sep), out=page_starts[1:])
    starts: list[int] = []
    caps: list[bytes] = []
    for m in pattern.finditer(blob):
        starts.append(m.start())
        caps.append(m.group(1))
    return (
        np.searchsorted(page_starts, np.asarray(starts, np.int64), side="right") - 1,
        np.asarray(starts, np.int64),
        caps,
        page_starts,
        lens,
    )


class ExtractText:
    """Actor-pool stage: pages(url, html) -> (url, text).

    Per-page ``findall`` + strip + join (all C-level per page); a
    blob-scan variant was measured SLOWER here (0.33s vs 0.18s per 20k
    pages) because text nodes are dense — the per-match Python in a
    single finditer sweep costs more than the per-page findall calls it
    replaces, so the simple form stays."""

    def __init__(self):
        self.text_node = _TEXT_NODE  # compiled once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch.column("html").to_pylist()]
        return pa.table(
            {"url": batch.column("url"), "text": pa.array(texts, pa.string())}
        )


class ExtractEdges:
    """Actor-pool stage: pages(url, html) -> hashed edge rows (src, dst).

    Vectorized per batch (round-3 VERDICT item 5): ONE href regex sweep
    over the ``b'\\x00"'``-joined batch blob, Arrow-kernel absolutize by
    prefix class, per-page (not per-link) src hashing, in-batch dedup
    combiner (global dedup is a later groupby — SURVEY.md §7 step 2).

    Separator proof: the capture ``[^"]+`` cannot cross the separator
    quote, and the separator cannot complete ``<a\\s+href="`` (the quote
    is preceded by ``\\x00``, which is neither ``=`` nor ``\\s``). A
    page-tail unterminated ``href="...`` may close on the separator
    quote, but its capture then contains ``\\x00`` and is dropped, having
    consumed zero bytes of the following page — per-page semantics are
    bit-preserved (tests assert parity with scalar ``extract_links``).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        if not urls:
            return empty
        page_idx, _, caps, _, _ = _scan_batch(htmls, _HREF, b'\x00"')
        keep = [i for i, c in enumerate(caps) if b"\x00" not in c]
        if not keep:
            return empty
        if len(keep) != len(caps):
            caps = [caps[i] for i in keep]
            page_idx = page_idx[keep]
        hs = pa.array(caps, pa.binary()).cast(pa.string())  # utf-8 validated in C
        # absolutize, vectorized by prefix class (same precedence as the
        # scalar absolutize(): absolute > rooted > relative)
        take_idx = pa.array(page_idx)
        host_l = pc.take(pa.array([_host_prefix(u) for u in urls], pa.string()), take_idx)
        dir_l = pc.take(pa.array([_dir_prefix(u) for u in urls], pa.string()), take_idx)
        is_abs = pc.or_(pc.starts_with(hs, "http://"), pc.starts_with(hs, "https://"))
        is_root = pc.starts_with(hs, "/")
        dst_urls = pc.if_else(
            is_abs,
            hs,
            pc.if_else(
                is_root,
                pc.binary_join_element_wise(host_l, hs, ""),
                pc.binary_join_element_wise(dir_l, hs, ""),
            ),
        )
        # int64 bit-view of the 64-bit hash: Ray Data's hash shuffle
        # handles int64 keys natively (uint64 keys fall back to pickled
        # objects), and the bit pattern keeps full hash entropy. src urls
        # hash ONCE PER PAGE and fan out by take; dst urls are
        # dictionary-encoded first so each distinct target hashes once
        # (Zipf outlinks: ~5x fewer hash calls measured on synth pages).
        src = hash64_str(urls).view(np.int64)[page_idx]
        enc = pc.dictionary_encode(dst_urls)
        uh = hash64_str(enc.dictionary.to_numpy(zero_copy_only=False)).view(np.int64)
        dst = uh[enc.indices.to_numpy()]
        keep_m = src != dst  # drop self loops
        src, dst = src[keep_m], dst[keep_m]
        if len(src) == 0:
            return empty
        # in-batch dedup (combiner before the global dedup shuffle)
        src, dst = pair_unique(src, dst)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
