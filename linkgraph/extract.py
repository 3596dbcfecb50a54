"""HTML text + hyperlink extraction (stateless map_batches stages).

The per-row invariant from BASELINE.json: extracted text is
byte-identical per url to the golden ``text`` column the generator
writes (the analogue of the reference's golden trace diffing,
reference tools/compare_traces.py:1-40).

Extraction spec (the "reference extractor" this engine defines):
  * text  = all non-empty text nodes (content between ``>`` and ``<``),
    stripped, joined with ``"\\n"`` in document order.
  * links = every ``<a ... href=VALUE ...>`` anchor — VALUE double-
    quoted, single-quoted or unquoted, any attribute order, whitespace
    allowed around ``=`` (round-5 hardening: real Common-Crawl HTML) —
    resolved against the page's BASE url (the first ``<base href>`` if
    present, itself resolved against the page url; else the page url):
    absolute (``http(s)://``) kept; protocol-relative (``//h/p``) gets
    the base's scheme; rooted (``/x``) joins the base's scheme+host;
    other values join the base's directory. Non-navigational hrefs
    (``#frag``, ``javascript:``, ``mailto:``, ``data:``, ``tel:``) and
    invalid-UTF-8 values are dropped. ``../`` resolution is urlnorm's
    job (``canonicalize=True``, default-on for WARC ingest) so the raw
    extraction stays byte-reversible.

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
# href value: "..." | '...' | unquoted. \x00 is excluded from EVERY
# class (attribute scan + all three value forms), so in the blob scan
# a match can never cross the \x00 page separator — see ExtractEdges.
# (?<![\w-]) rejects data-href= and friends; quoted values use + so an
# empty href (self-link per HTML) is dropped like the other
# non-navigational forms.
_HREF_VAL = (
    rb"(?<![\w-])href\s*=\s*"
    rb"(?:\"([^\"\x00]+)\"|'([^'\x00]+)'|([^\s>\"'\x00][^\s>\x00]*))"
)
_HREF = re.compile(rb"<a\s[^>\x00]*?" + _HREF_VAL, re.I)
_BASE = re.compile(rb"<base\s[^>\x00]*?" + _HREF_VAL, re.I)
# rel attribute of an <a> tag (same anchoring as _HREF, so a rel match
# and an href match of the SAME tag share their match start offset —
# the alignment the vectorized typed scan relies on)
_REL = re.compile(
    rb"<a\s[^>\x00]*?(?<![\w-])rel\s*=\s*"
    rb"(?:\"([^\"\x00]+)\"|'([^'\x00]+)'|([^\s>\"'\x00][^\s>\x00]*))",
    re.I,
)
_NOFOLLOW = re.compile(rb"(?:^|[\s,])nofollow(?:$|[\s,])", re.I)
_SKIP_PREFIXES = ("#", "javascript:", "mailto:", "data:", "tel:")


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


def _href_group(m: re.Match) -> bytes:
    # exactly one of the three value alternatives matched
    return m.group(m.lastindex)


def absolutize(href: str, page_url: str) -> str:
    if href.startswith("http://") or href.startswith("https://"):
        return href
    if href.startswith("//"):
        return page_url.split("://", 1)[0] + ":" + href
    if href.startswith("/"):
        return _host_prefix(page_url) + href
    return _dir_prefix(page_url) + href


def page_base_url(html: bytes, page_url: str) -> str:
    """The url hrefs resolve against: the first ``<base href>`` (itself
    resolved against the page url when relative), else the page url."""
    m = _BASE.search(html)
    if not m:
        return page_url
    try:
        b = _href_group(m).decode("utf-8")
    except UnicodeDecodeError:
        return page_url
    return absolutize(b, page_url)


def _keep_href(h: str) -> bool:
    return not h.lower().startswith(_SKIP_PREFIXES)


def extract_links(html: bytes, page_url: str) -> list[str]:
    base = page_base_url(html, page_url)
    out = []
    for m in _HREF.finditer(html):
        try:
            h = _href_group(m).decode("utf-8")
        except UnicodeDecodeError:
            continue
        if _keep_href(h):
            out.append(absolutize(h, base))
    return out


def extract_links_typed(html: bytes, page_url: str) -> list[tuple[str, int]]:
    """Like extract_links, plus the EDGE TYPE: (url, nofollow) with
    nofollow=1 when the anchor carries ``rel=nofollow`` (the reference
    models typed edges via hvr_edge_type, inc/hvr_common.h:96-117; on
    the web the type that matters is the SEO no-endorsement flag).
    Anchors are matched to their rel attribute by tag start offset."""
    base = page_base_url(html, page_url)
    nf_starts = {
        m.start()
        for m in _REL.finditer(html)
        if _NOFOLLOW.search(_href_group(m))
    }
    out = []
    for m in _HREF.finditer(html):
        try:
            h = _href_group(m).decode("utf-8")
        except UnicodeDecodeError:
            continue
        if _keep_href(h):
            out.append((absolutize(h, base), int(m.start() in nf_starts)))
    return out


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
        caps.append(m.group(m.lastindex))  # the one alternative that matched
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
    over the ``b'\\x00'``-joined batch blob (plus one cheap ``<base``
    sweep), Arrow-kernel absolutize by prefix class, per-page (not
    per-link) src hashing, in-batch dedup combiner (global dedup is a
    later groupby — SURVEY.md §7 step 2).

    Separator proof: every character class in ``_HREF`` excludes
    ``\\x00`` and no literal in the pattern is ``\\x00``, so NO match
    can span the separator — a page-tail unterminated ``href="...``
    simply fails to match, exactly as it does under the scalar per-page
    scan (tests assert parity with ``extract_links``).

    ``canonicalize=True`` additionally rewrites the resolved target
    urls to RFC 3986 canonical form (linkgraph.urlnorm — dot-segment
    ``../`` resolution, case/port/percent normalization) before
    hashing; it runs per DICTIONARY-DISTINCT target, not per link.
    Page urls are canonicalized upstream (edges.build_edges) so src and
    dst hash the same spelling.
    """

    def __init__(self, canonicalize: bool = False, typed: bool = False):
        self.canonicalize = canonicalize
        self.typed = typed

    def _empty(self) -> pa.Table:
        cols = {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        if self.typed:
            cols["nofollow"] = pa.array([], pa.int8())
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = self._empty()
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        if not urls:
            return empty
        page_idx, starts, caps, _, _ = _scan_batch(htmls, _HREF, b"\x00")
        if len(caps) == 0:
            return empty
        if self.typed:
            # rel=nofollow anchors, matched by tag start offset (both
            # patterns anchor at '<a', so offsets align exactly)
            _, r_starts, r_caps, _, _ = _scan_batch(htmls, _REL, b"\x00")
            nf_starts = np.asarray(
                [s for s, c in zip(r_starts, r_caps) if _NOFOLLOW.search(c)],
                np.int64,
            )
            nofollow = np.isin(starts, nf_starts)
        else:
            nofollow = None
        # <base href> per page: one literal-anchored sweep; first match
        # per page wins (match order is position order)
        base_urls = list(urls)
        b_idx, _, b_caps, _, _ = _scan_batch(htmls, _BASE, b"\x00")
        if len(b_caps):
            firsts = np.unique(b_idx, return_index=True)[1]
            for j in firsts:
                pi = int(b_idx[j])
                try:
                    base_urls[pi] = absolutize(b_caps[j].decode("utf-8"), urls[pi])
                except UnicodeDecodeError:
                    pass
        try:
            hs = pa.array(caps, pa.binary()).cast(pa.string())  # utf-8 validated in C
        except pa.ArrowInvalid:
            # rare: drop individually-invalid hrefs, matching the scalar path
            keep = []
            for i, c in enumerate(caps):
                try:
                    c.decode("utf-8")
                    keep.append(i)
                except UnicodeDecodeError:
                    pass
            caps = [caps[i] for i in keep]
            page_idx = page_idx[keep]
            if nofollow is not None:
                nofollow = nofollow[keep]
            if not caps:
                return empty
            hs = pa.array(caps, pa.binary()).cast(pa.string())
        # drop non-navigational hrefs (fragment/javascript/mailto/...)
        low = pc.utf8_lower(hs)
        nav = None
        for p in _SKIP_PREFIXES:
            m = pc.starts_with(low, p)
            nav = m if nav is None else pc.or_(nav, m)
        nav = pc.invert(nav)
        if not pc.all(nav).as_py():
            keep_i = np.flatnonzero(nav.to_numpy(zero_copy_only=False))
            hs = hs.filter(nav)
            page_idx = page_idx[keep_i]
            if nofollow is not None:
                nofollow = nofollow[keep_i]
        if len(hs) == 0:
            return empty
        # absolutize against the page BASE, vectorized by prefix class
        # (same precedence as the scalar absolutize(): absolute >
        # protocol-relative > rooted > relative)
        take_idx = pa.array(page_idx)
        scheme_l = pc.take(
            pa.array([u.split("://", 1)[0] + ":" for u in base_urls], pa.string()),
            take_idx,
        )
        host_l = pc.take(
            pa.array([_host_prefix(u) for u in base_urls], pa.string()), take_idx
        )
        dir_l = pc.take(
            pa.array([_dir_prefix(u) for u in base_urls], pa.string()), take_idx
        )
        is_abs = pc.or_(pc.starts_with(hs, "http://"), pc.starts_with(hs, "https://"))
        is_proto = pc.starts_with(hs, "//")
        is_root = pc.starts_with(hs, "/")
        dst_urls = pc.if_else(
            is_abs,
            hs,
            pc.if_else(
                is_proto,
                pc.binary_join_element_wise(scheme_l, hs, ""),
                pc.if_else(
                    is_root,
                    pc.binary_join_element_wise(host_l, hs, ""),
                    pc.binary_join_element_wise(dir_l, hs, ""),
                ),
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
        dvals = enc.dictionary.to_numpy(zero_copy_only=False)
        if self.canonicalize:
            from .urlnorm import canonicalize_url

            dvals = np.array([canonicalize_url(u) for u in dvals], dtype=object)
        uh = hash64_str(dvals).view(np.int64)
        dst = uh[enc.indices.to_numpy()]
        keep_m = src != dst  # drop self loops
        src, dst = src[keep_m], dst[keep_m]
        if len(src) == 0:
            return empty
        if nofollow is not None:
            # typed in-batch dedup: min(nofollow) per (src, dst) — one
            # followed anchor makes the edge a follow edge
            nf = nofollow[keep_m].astype(np.int8)
            order = np.lexsort((nf, dst, src))
            src, dst, nf = src[order], dst[order], nf[order]
            first = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
            return pa.table(
                {
                    "src": pa.array(src[first]),
                    "dst": pa.array(dst[first]),
                    "nofollow": pa.array(nf[first]),
                }
            )
        # in-batch dedup (combiner before the global dedup shuffle)
        src, dst = pair_unique(src, dst)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
