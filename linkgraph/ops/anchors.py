"""Anchor-text indexing — the web-search aggregation PageRank feeds:
for every link target, the terms other pages use when linking to it,
ranked by inbound count (count desc, term asc ties).

Two front-ends over one distributed core:

* ``anchor_top_terms(edges, doc_terms, k)`` — driver-oracle surface:
  ``doc_terms`` are the anchor terms each SOURCE doc contributes to all
  of its outlinks (for the driver's documents table: the first
  ``n_terms`` tokens of the source's text — a deterministic, ANSI-SQL-
  replayable proxy for markup anchors). One hash join (edges x source
  terms) -> per-batch (dst, term) count combiner -> groupby sum ->
  vectorized per-dst top-k inside dst-hash buckets (the tfidf topk
  shape: lexsort + run offsets, no per-key Python).

* ``anchor_index_pages(pages, k)`` — the real-markup path for the
  synthetic Common-Crawl pages: ONE two-group regex sweep per batch
  over the separator-joined html blob (the extract.py blob-scan
  pattern) pulls (href, anchor text), hrefs absolutize + hash to the
  target vertex id, anchor text whitespace-tokenizes; then the same
  distributed count + top-k core. Oracled in pytest against a scalar
  per-page reference.

100-TB shape: the only all-to-all carries unique (dst, term, partial)
rows (combiner-reduced per batch); top-k runs inside dst-hash buckets
so no single group materializes more than one bucket.

(Reference analogue: grouped neighbor aggregation of SURVEY.md §2.7;
the per-target gather mirrors process_vertex_updates,
src/hoover.cpp:2555-2600.)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ..extract import absolutize
from ..hashing import hash64_str_signed


class DocAnchorTerms:
    """documents(doc_id, text) -> (doc_id, term) rows: the first
    ``n_terms`` whitespace tokens of each doc (duplicates kept — they
    weight the count exactly as SQL's unnest does)."""

    def __init__(self, n_terms: int = 4):
        self.n_terms = n_terms

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.list_slice(
            pc.split_pattern(batch.column("text"), " "), 0, self.n_terms
        )
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(batch.column("doc_id").to_numpy(), counts)
        return pa.table(
            {"doc_id": pa.array(doc), "term": pc.list_flatten(toks)}
        )


def anchor_top_terms(
    edges: Dataset,
    doc_terms: Dataset,
    k: int = 3,
    num_buckets: int = 32,
) -> Dataset:
    """edges(src, dst) x doc_terms(doc_id, term) ->
    (dst, term, n, term_rank): top-k anchor terms per link target by
    inbound contribution count; ties broken term asc."""
    joined = edges.join(
        doc_terms, join_type="inner", num_partitions=max(4, num_buckets // 4),
        on=("src",), right_on=("doc_id",),
    )

    def count_partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"dst": t.column("dst"), "term": t.column("term")})
        g = tt.group_by(["dst", "term"]).aggregate([([], "count_all")])  # combiner
        return g.rename_columns(["dst", "term", "_c"])

    partials = joined.map_batches(
        count_partial, batch_format="pyarrow", batch_size=1 << 20
    )
    return _topk_per_dst(partials, k)


def _topk_per_dst(partials: Dataset, k: int, num_buckets: int | None = None) -> Dataset:
    """(dst, term, _c) per-batch partial counts -> top-k per dst by
    (total count desc, term asc), via ONE range sort on (dst, term):
    equal keys land in one sorted block (the sortagg guarantee), so the
    global count is a per-block run-sum AND each dst's whole term set
    is contiguous — count aggregation and top-k selection fuse into a
    single post-sort kernel (replaces a high-cardinality (int, string)
    hash groupby + a bucket shuffle; ``num_buckets`` kept for signature
    compatibility). Within a dst run, terms arrive sorted asc, so the
    tie order is the row order itself."""

    def block(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tc = t.combine_chunks()
        dst = tc.column("dst").to_numpy()
        if len(dst) == 0:
            return pa.table(
                {
                    "dst": tc.column("dst"),
                    "term": tc.column("term"),
                    "n": pa.array([], pa.int64()),
                    "term_rank": pa.array([], pa.int64()),
                }
            )
        term = tc.column("term")
        c = tc.column("_c").to_numpy()
        # run starts where dst OR term changes (Arrow compare — the
        # strings never box to Python)
        tchange = pc.not_equal(term.slice(1), term.slice(0, len(term) - 1))
        tchange = tchange.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, (dst[1:] != dst[:-1]) | tchange])
        n = np.add.reduceat(c, starts).astype(np.int64)
        dst_g = dst[starts]
        # rank per dst by (n desc, in-block position asc = term asc)
        order = np.lexsort((np.arange(len(n)), -n, dst_g))
        ds = dst_g[order]
        o_starts = np.flatnonzero(np.r_[True, ds[1:] != ds[:-1]])
        run_start = np.repeat(o_starts, np.diff(np.r_[o_starts, len(ds)]))
        rank = np.arange(len(ds)) - run_start
        top = rank < k
        sel = order[top]
        return pa.table(
            {
                "dst": pa.array(dst_g[sel]),
                "term": pc.take(term, pa.array(starts[sel])),
                "n": pa.array(n[sel]),
                "term_rank": pa.array(rank[top] + 1),
            }
        )

    return partials.sort(["dst", "term"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


# --------------------------------------------------------------------------
# real-markup path over the synthetic Common-Crawl pages
# --------------------------------------------------------------------------

_A_TAG = re.compile(rb'<a\s+href="([^"]+)">([^<]*)</a>', re.I)


def page_anchor_pairs(html: bytes, page_url: str) -> list[tuple[str, str]]:
    """Scalar reference: (absolutized target url, anchor text) per <a>."""
    return [
        (absolutize(m.group(1).decode("utf-8"), page_url), m.group(2).decode("utf-8"))
        for m in _A_TAG.finditer(html)
    ]


class PageAnchorRows:
    """Actor-pool stage: pages(url, html) -> (dst, term) rows — dst is
    the hashed absolutized link target, term each whitespace token of
    the anchor text. ONE two-group regex sweep over the separator-joined
    batch blob (extract.ExtractEdges pattern); captures containing the
    separator byte are page-tail artifacts and dropped (separator proof
    as in ExtractEdges: ``[^"]+``/``[^<]*`` cannot span a completed
    cross-page match without swallowing ``\\x00``)."""

    def __init__(self):
        self.a_tag = _A_TAG  # compiled once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"dst": pa.array([], pa.int64()), "term": pa.array([], pa.string())}
        )
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        if not urls:
            return empty
        sep = b'\x00"'
        blob = sep.join(htmls)
        n = len(htmls)
        lens = np.fromiter((len(h) for h in htmls), np.int64, n)
        page_starts = np.zeros(n, np.int64)
        if n > 1:
            np.cumsum(lens[:-1] + len(sep), out=page_starts[1:])
        starts: list[int] = []
        hrefs: list[bytes] = []
        anchors: list[bytes] = []
        for m in self.a_tag.finditer(blob):
            if b"\x00" in m.group(1) or b"\x00" in m.group(2):
                continue
            starts.append(m.start())
            hrefs.append(m.group(1))
            anchors.append(m.group(2))
        if not starts:
            return empty
        pidx = (
            np.searchsorted(page_starts, np.asarray(starts, np.int64), side="right") - 1
        )
        targets = [
            absolutize(h.decode("utf-8"), urls[i]) for h, i in zip(hrefs, pidx)
        ]
        dsts = hash64_str_signed(targets)
        out_dst: list[int] = []
        out_term: list[str] = []
        for d, a in zip(dsts, anchors):
            for tok in a.decode("utf-8").split():
                out_dst.append(int(d))
                out_term.append(tok)
        t = pa.table(
            {"dst": pa.array(out_dst, pa.int64()), "term": pa.array(out_term)}
        )
        g = t.group_by(["dst", "term"]).aggregate([([], "count_all")])  # combiner
        return g.rename_columns(["dst", "term", "_c"])


def anchor_index_pages(pages: Dataset, k: int = 3, num_buckets: int = 32) -> Dataset:
    """pages(url, html) -> (dst, term, n, term_rank): top-k anchor
    terms per hashed link target from the real markup."""
    partials = pages.map_batches(
        PageAnchorRows, batch_format="pyarrow", concurrency=(1, 8)
    )
    return _topk_per_dst(partials, k)
