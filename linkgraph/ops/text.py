"""Text-analysis stages over the ``documents`` table — actor-pool
map_batches stages with per-actor compiled regexes (setup in __init__,
never per batch).

Tokenization spec shared with the DuckDB oracles: ASCII word tokens
``[A-Za-z0-9]+`` (locale-free so Python re and DuckDB RE2 agree).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = r"[A-Za-z0-9]+"

# marker stopwords per language for the n-gram/stopword language id
_LANG_MARKERS = {
    "en": {"the", "and", "of", "a", "to", "is", "in"},
    "de": {"der", "die", "und", "ist", "ein", "das", "mit"},
    "fr": {"le", "la", "et", "est", "une", "les", "des"},
    "es": {"el", "la", "y", "es", "una", "los", "con"},
}


class TokenCount:
    """(doc_id, text) -> (doc_id, n_tokens). Exact parity with
    ``len(regexp_extract_all(text, '[A-Za-z0-9]+'))`` in DuckDB."""

    def __init__(self):
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = np.fromiter((len(self.tok.findall(t)) for t in texts), np.int64, len(texts))
        return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": pa.array(n)})


class CharClasses:
    """(doc_id, text) -> exact character-class counts (quality signals)."""

    def __init__(self):
        self.alpha = re.compile(r"[A-Za-z]")
        self.digit = re.compile(r"[0-9]")
        self.space = re.compile(r" ")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(np.fromiter((len(t) for t in texts), np.int64, n)),
                "n_alpha": pa.array(
                    np.fromiter((len(self.alpha.findall(t)) for t in texts), np.int64, n)
                ),
                "n_digit": pa.array(
                    np.fromiter((len(self.digit.findall(t)) for t in texts), np.int64, n)
                ),
                "n_space": pa.array(
                    np.fromiter((len(self.space.findall(t)) for t in texts), np.int64, n)
                ),
            }
        )


class LangId:
    """Stopword-marker language id heuristic: argmax of per-language
    marker hit counts, zero-or-tied best -> 'und'. Deterministic and
    SQL-expressible — the driver oracle (__ray_entry__._langid_sql) is
    generated from _LANG_MARKERS; also pytest-tested on synthetic pages
    with known languages."""

    def __init__(self):
        self.tok = re.compile(TOKEN_RE)
        self.markers = _LANG_MARKERS

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds = []
        for t in texts:
            toks = self.tok.findall(t.lower())
            scores = {
                lang: sum(w in marks for w in toks)
                for lang, marks in self.markers.items()
            }
            best = max(scores.values())
            winners = sorted(l for l, s in scores.items() if s == best)
            preds.append(winners[0] if best > 0 and len(winners) == 1 else "und")
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds, pa.string())}
        )


# English stopwords for the quality-score stopword ratio (a fixed,
# documented list so the DuckDB oracle can repeat it verbatim)
QUALITY_STOPWORDS = (
    "the", "and", "of", "a", "to", "is", "in", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)


class QualityScore:
    """(doc_id, text) -> per-doc quality signals for corpus filtering
    (the C4/Gopher-style length/punctuation/stopword heuristics):

      n_tokens       ASCII word tokens ``[A-Za-z0-9]+``
      n_alnum        alphanumeric chars (== summed token lengths)
      n_stop         lowercased tokens in QUALITY_STOPWORDS
      mean_tok_len   n_alnum / n_tokens          (0.0 if no tokens)
      stop_ratio     n_stop / n_tokens           (0.0 if no tokens)
      punct_ratio    (len - n_alnum - n_space) / len  (0.0 if empty)

    All ratios are IEEE double divisions of the integer counts, so the
    DuckDB oracle reproduces them bit-exactly. Actor-pool stage: regexes
    compiled once per actor."""

    def __init__(self):
        self.tok = re.compile(TOKEN_RE)
        self.stop = set(QUALITY_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        n_tokens = np.zeros(n, np.int64)
        n_alnum = np.zeros(n, np.int64)
        n_stop = np.zeros(n, np.int64)
        n_space = np.zeros(n, np.int64)
        n_chars = np.zeros(n, np.int64)
        for i, t in enumerate(texts):
            toks = self.tok.findall(t)
            n_tokens[i] = len(toks)
            n_alnum[i] = sum(len(w) for w in toks)
            n_stop[i] = sum(w.lower() in self.stop for w in toks)
            n_space[i] = t.count(" ")
            n_chars[i] = len(t)
        safe_t = np.maximum(n_tokens, 1).astype(np.float64)
        safe_c = np.maximum(n_chars, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens),
                "n_stop": pa.array(n_stop),
                "mean_tok_len": pa.array(np.where(n_tokens > 0, n_alnum / safe_t, 0.0)),
                "stop_ratio": pa.array(np.where(n_tokens > 0, n_stop / safe_t, 0.0)),
                "punct_ratio": pa.array(
                    np.where(n_chars > 0, (n_chars - n_alnum - n_space) / safe_c, 0.0)
                ),
            }
        )


class Fingerprint:
    """(doc_id, text) -> 64-bit content fingerprint: md5-based whole-doc
    hash plus a rolling-window min-hash (winnowing-style robust
    fingerprint over 8-byte windows).

    ``fp_full`` is the first 8 md5 digest bytes little-endian — exactly
    DuckDB's ``md5_number_upper()`` — so the op is hard-verifiable
    cross-engine (the SQL oracle recomputes both columns)."""

    W = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        full = np.empty(len(texts), np.uint64)
        rolling = np.empty(len(texts), np.uint64)
        for i, t in enumerate(texts):
            b = t.encode("utf-8")
            full[i] = int.from_bytes(hashlib.md5(b).digest()[:8], "little")
            if len(b) >= self.W:
                a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                # polynomial rolling hash of each W-byte window, vectorized
                win = np.lib.stride_tricks.sliding_window_view(a, self.W)
                coeff = np.uint64(257) ** np.arange(self.W, dtype=np.uint64)
                with np.errstate(over="ignore"):
                    hashes = (win * coeff).sum(axis=1)
                rolling[i] = hashes.min()
            else:
                rolling[i] = full[i]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp_full": pa.array(full),
                "fp_rolling_min": pa.array(rolling),
            }
        )


def md5_digest_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())


class TokenPartialCounts:
    """(doc_id, text) -> per-batch (token, cnt) partials — the combiner
    half of distributed heavy hitters: the shuffle carries unique tokens
    per batch, never one row per occurrence."""

    def __init__(self):
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(self.tok.findall(t))
        toks = list(c.keys())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "cnt": pa.array([c[t] for t in toks], pa.int64()),
            }
        )


class DocTermCounts:
    """(doc_id, text) -> (doc_id, term, tf) exact per-doc term
    frequencies (each doc lives in one batch, so per-doc Counters are
    complete); regex compiled once per actor."""

    def __init__(self):
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids, terms, tfs = [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            c = Counter(self.tok.findall(t))
            ids.extend([d] * len(c))
            terms.extend(c.keys())
            tfs.extend(c.values())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(np.asarray(tfs, np.int64)),
            }
        )


def tfidf_top_terms(docs, n_docs: int, k: int = 3, num_buckets: int = 32):
    """Per-document top-k TF-IDF terms: (doc_id, term, tf, tfidf,
    term_rank), score = tf * ln(N / df), rank ties broken by term asc.

    Stages: per-batch doc-term counting (actor pool, complete per doc)
    -> df = groupby(term) sum of per-batch DISTINCT-doc partials (the
    doc-term rows ARE the distinct pairs) -> hash join tf x df on term
    (df is corpus-sized vocabulary: joined, never broadcast) -> top-k
    per doc inside doc-hash buckets (vectorized sort + head, no
    per-doc Python)."""
    from ray.data.aggregate import Sum

    dt = docs.map_batches(
        DocTermCounts, batch_format="pyarrow", concurrency=(1, 8)
    ).materialize()

    def df_partial(t: pa.Table) -> pa.Table:
        terms, cnt = np.unique(t.column("term").to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"term": pa.array(terms), "_c": pa.array(cnt.astype(np.int64))})

    dfreq = (
        dt.map_batches(df_partial, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("term")
        .aggregate(Sum("_c", alias_name="df"))
    )

    joined = dt.join(
        dfreq, join_type="inner", num_partitions=max(4, num_buckets // 4),
        on=("term",), right_on=("term",),
    )

    B = num_buckets
    N = float(n_docs)

    def score_bucket(t: pa.Table) -> pd.DataFrame:
        d = t.column("doc_id").to_numpy()
        tf = t.column("tf").to_numpy()
        df_ = t.column("df").to_numpy()
        return pd.DataFrame(
            {
                "bucket": d % B,
                "doc_id": d,
                "term": t.column("term").to_numpy(zero_copy_only=False),
                "tf": tf,
                "score": tf * np.log(N / df_),
            }
        )

    def topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tc = t.combine_chunks()
        doc = tc.column("doc_id").to_numpy()
        score = tc.column("score").to_numpy()
        # (doc asc, score desc, term asc): rank terms by Arrow sort index
        # so the string column never boxes into Python objects
        term_rank_order = pc.sort_indices(tc.column("term")).to_numpy()
        term_pos = np.empty(len(doc), np.int64)
        term_pos[term_rank_order] = np.arange(len(doc))
        order = np.lexsort((term_pos, -score, doc))
        doc_s = doc[order]
        starts = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(doc_s)]))
        rank = np.arange(len(doc_s)) - run_start
        top = rank < k
        sel = order[top]
        return pa.table(
            {
                "doc_id": pa.array(doc[sel]),
                "term": pc.take(tc.column("term"), pa.array(sel)),
                "tf": pc.take(tc.column("tf"), pa.array(sel)),
                "tfidf": pa.array(np.round(score[sel], 8)),
                "term_rank": pa.array(rank[top] + 1),
            }
        )

    return (
        joined.map_batches(score_bucket, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("bucket")
        .map_groups(topk, batch_format="pyarrow")
    )


class GramRows:
    """(doc_id, text) -> distinct per-doc token n-gram rows, pre-hashed
    into B shuffle buckets. Benchmark docs (doc_id % bench_mod == 0)
    additionally emit kind=0 rows — the contamination reference set
    travels in the SAME single shuffle as the doc grams (tagged union,
    the _attach_sig pattern of ops/dedup.py).

    Default (``hash_grams=True``, round-4 VERDICT item 8): only the
    64-bit gram hash travels the shuffle (int64 ``gram_h``), ~5-10x
    fewer wire bytes than the gram strings; ``hash_grams=False`` ships
    the strings for bit-exact-by-construction replay (no collision
    assumption at any corpus size)."""

    def __init__(
        self, n: int, bench_mod: int, num_buckets: int, hash_grams: bool = True
    ):
        self.tok = re.compile(TOKEN_RE)
        self.n = n
        self.mod = bench_mod
        self.B = num_buckets
        self.hash_grams = hash_grams

    # position-dependent odd multipliers: gram hash must be ORDER-
    # sensitive over its n token hashes
    _POS_MULT = (
        0x9E3779B97F4A7C15,
        0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9,
        0x27D4EB2F165667C5,
        0x94D049BB133111EB,
        0xBF58476D1CE4E5B9,
    )

    def _hashed_rows(self, doc_ids: np.ndarray, texts: list) -> pa.Table:
        """Fully vectorized hashed-gram emission: ONE vectorized hash of
        the flattened token stream, gram hashes mixed from n shifted
        token-hash arrays (position-dependent multipliers keep them
        order-sensitive), per-doc dedup via lexsort — no gram STRING is
        ever built (the string-join set construction dominated the
        per-doc Python cost, not the wire bytes)."""
        from ..hashing import hash64_str, splitmix64

        n = self.n
        toks = [self.tok.findall(t) for t in texts]
        lens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        flat = [w for ts in toks for w in ts]
        empty = pa.table(
            {
                "part": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "gram_h": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int8()),
            }
        )
        if not flat:
            return empty
        th = hash64_str(np.asarray(flat, object))  # uint64, one C call
        starts = np.r_[np.int64(0), np.cumsum(lens)]
        cnt = np.maximum(lens - n + 1, 0)
        total = int(cnt.sum())
        if total == 0:
            return empty
        drep = np.repeat(np.arange(len(lens), dtype=np.int64), cnt)
        base = np.repeat(starts[:-1], cnt)
        local = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        pos0 = base + local
        acc = np.zeros(total, np.uint64)
        for k in range(n):
            acc ^= th[pos0 + k] * np.uint64(self._POS_MULT[k % len(self._POS_MULT)])
        g = splitmix64(acc)
        # per-doc distinct grams
        order = np.lexsort((g, drep))
        drep, g = drep[order], g[order]
        keep = np.r_[True, (drep[1:] != drep[:-1]) | (g[1:] != g[:-1])]
        drep, g = drep[keep], g[keep]
        out_doc = doc_ids.astype(np.int64)[drep]
        # benchmark docs re-emit their grams as kind=0 reference rows
        bm = out_doc % self.mod == 0
        out_doc = np.r_[out_doc, np.full(int(bm.sum()), -1, np.int64)]
        g = np.r_[g, g[bm]]
        kind = np.r_[
            np.ones(len(drep), np.int8), np.zeros(int(bm.sum()), np.int8)
        ]
        return pa.table(
            {
                "part": pa.array((g % np.uint64(self.B)).astype(np.int64)),
                "doc_id": pa.array(out_doc),
                "gram_h": pa.array(g.view(np.int64)),
                "kind": pa.array(kind),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        doc_ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        if self.hash_grams:
            return self._hashed_rows(doc_ids, texts)
        out_doc, out_gram, out_kind = [], [], []
        for d, t in zip(doc_ids, texts):
            ts = self.tok.findall(t)
            if len(ts) < n:
                continue
            grams = {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}
            g = list(grams)
            out_doc.extend([int(d)] * len(g))
            out_gram.extend(g)
            out_kind.extend([1] * len(g))
            if int(d) % self.mod == 0:
                out_doc.extend([-1] * len(g))
                out_gram.extend(g)
                out_kind.extend([0] * len(g))
        h = pd.util.hash_array(np.asarray(out_gram, object))
        part = (h % self.B).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(part),
                "doc_id": pa.array(np.asarray(out_doc, np.int64)),
                "gram": pa.array(out_gram, pa.string()),
                "kind": pa.array(np.asarray(out_kind, np.int8)),
            }
        )


def ngram_contamination(
    docs,
    n: int = 3,
    bench_mod: int = 97,
    num_buckets: int = 64,
    replay_strings: bool = False,
):
    """Benchmark-decontamination scan: for every document, the share of
    its distinct token n-grams that also occur in the benchmark set
    (docs with doc_id % bench_mod == 0 — a deterministic stand-in for
    a held-out eval suite). Output (doc_id, n_grams, n_matched,
    contam); docs with < n tokens report (0, 0, 0.0).

    Scale shape: ONE gram-hash-bucketed shuffle carries doc grams and
    the tagged benchmark set together; per-doc partials leave the
    bucket combiner-reduced, so the final groupby sums ~#docs x
    buckets-touched tiny rows. DEFAULT wire format is the 64-bit gram
    hash (int64 only — the production shape; collision odds
    ~(#grams^2)/2^64, vanishing at any real corpus); set
    ``replay_strings=True`` to ship gram strings and match inside the
    bucket via Arrow dictionary codes — bit-exact by construction with
    no collision assumption (both modes replay the DuckDB oracle).

    (Reference analogue: SURVEY.md §2.7 set-ops family — membership of
    a derived key set against a reference set, the same inverted
    bucket pattern as shingle_jaccard_pairs above.)"""
    from ray.data.aggregate import Sum

    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        GramRows(n, bench_mod, num_buckets, hash_grams=not replay_strings),
        batch_format="pyarrow",
        batch_size=8192,
    )

    def bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tc = t.combine_chunks()
        if "gram_h" in tc.column_names:
            codes = tc.column("gram_h").to_numpy()
        else:
            codes = pc.dictionary_encode(
                tc.column("gram").combine_chunks()
            ).indices.to_numpy()
        kind = tc.column("kind").to_numpy()
        doc = tc.column("doc_id").to_numpy()
        bench = np.unique(codes[kind == 0])
        dmask = kind == 1
        dcodes, ddoc = codes[dmask], doc[dmask]
        if len(bench):
            pos = np.searchsorted(bench, dcodes)
            pos[pos >= len(bench)] = len(bench) - 1
            matched = bench[pos] == dcodes
        else:
            matched = np.zeros(len(dcodes), bool)
        uids, inv = np.unique(ddoc, return_inverse=True)
        ng = np.bincount(inv, minlength=len(uids)).astype(np.int64)
        nm = np.bincount(inv, weights=matched, minlength=len(uids)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uids),
                "n_grams": pa.array(ng),
                "n_matched": pa.array(nm),
            }
        )

    partials = rows.groupby("part").map_groups(bucket, batch_format="pyarrow")

    def base(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_grams": pa.array(z), "n_matched": pa.array(z)}
        )

    allrows = partials.union(
        docs.select_columns(["doc_id"]).map_batches(base, batch_format="pyarrow")
    )
    # high-cardinality final fold: range-sort + reduceat (sortagg), not
    # the hash groupby — at #docs x buckets-touched partial rows the
    # per-group hash machinery dominated the whole op (the lm_score
    # finding, 102s -> 9.4s)
    from .sortagg import sorted_sum_by

    agg = sorted_sum_by(
        allrows, "doc_id", sum_cols={"n_grams": "ng", "n_matched": "nm"}
    )

    def finish(t: pa.Table) -> pa.Table:
        ng = t.column("ng").to_numpy()
        nm = t.column("nm").to_numpy()
        contam = np.where(ng > 0, nm / np.maximum(ng, 1), 0.0)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(ng),
                "n_matched": pa.array(nm),
                "contam": pa.array(contam),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


class RepetitionStats:
    """(doc_id, text) -> Gopher-style intra-document repetition
    signals over token n-grams: total positions, distinct grams,
    dup_ratio = 1 - distinct/total, and the fraction of positions
    covered by the single most frequent gram (ties: lexicographically
    smallest, so the DuckDB replay is exact). Pure per-doc compute —
    no shuffle at any scale."""

    def __init__(self, n: int):
        self.tok = re.compile(TOKEN_RE)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        texts = batch.column("text").to_pylist()
        rows = len(texts)
        total = np.zeros(rows, np.int64)
        distinct = np.zeros(rows, np.int64)
        topc = np.zeros(rows, np.int64)
        for i, t in enumerate(texts):
            ts = self.tok.findall(t)
            if len(ts) < n:
                continue
            grams = [" ".join(ts[j : j + n]) for j in range(len(ts) - n + 1)]
            total[i] = len(grams)
            u, c = np.unique(np.asarray(grams, object), return_counts=True)
            distinct[i] = len(u)
            # np.unique sorts ascending -> argmax takes the smallest
            # gram among count ties, matching the SQL order-by rule
            topc[i] = c[np.argmax(c)]
        safe = np.maximum(total, 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_positions": pa.array(total),
                "n_distinct": pa.array(distinct),
                "dup_ratio": pa.array(np.where(total > 0, 1.0 - distinct / safe, 0.0)),
                "top_gram_frac": pa.array(np.where(total > 0, topc / safe, 0.0)),
            }
        )


def repetition_stats(docs, n: int = 2):
    """Per-document repeated-n-gram quality signals (the Gopher
    repetition filters): see RepetitionStats."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        RepetitionStats(n), batch_format="pyarrow", batch_size=8192
    )


# quality_filter rule thresholds (shared with the SQL oracle; every
# ratio is an IEEE double division of integer counts, so threshold
# comparisons are bit-identical across engines)
QF_MIN_TOKENS = 30
QF_TOKLEN_LO, QF_TOKLEN_HI = 3.0, 10.0
QF_STOP_MIN = 0.03
QF_PUNCT_MAX = 0.25
QF_DUP_MAX = 0.10
QF_TOP_MAX = 0.20


class QualityFilter:
    """(doc_id, text) -> (doc_id, keep, reasons): the composed corpus
    keep/drop verdict of an LLM-data pipeline, fusing the C4-style
    quality heuristics (QualityScore) and the Gopher repetition
    filters (RepetitionStats, 2-grams) into ONE per-doc pass with zero
    shuffle. ``reasons`` is a bitmask of failed rules:

      1  too few tokens           (n_tokens < QF_MIN_TOKENS)
      2  mean token length out of [QF_TOKLEN_LO, QF_TOKLEN_HI]
      4  stopword ratio too low   (< QF_STOP_MIN)
      8  punctuation ratio high   (> QF_PUNCT_MAX)
      16 duplicate-2-gram ratio   (> QF_DUP_MAX)
      32 top-gram coverage        (> QF_TOP_MAX)

    keep = 1 iff reasons == 0. Integer-only output."""

    def __init__(self):
        self.tok = re.compile(TOKEN_RE)
        self.stop = set(QUALITY_STOPWORDS)

    def _reasons(self, texts: list[str]) -> np.ndarray:
        reasons = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            ts = self.tok.findall(t)
            n_tokens = len(ts)
            n_alnum = sum(len(w) for w in ts)
            n_stop = sum(w.lower() in self.stop for w in ts)
            n_space = t.count(" ")
            n_chars = len(t)
            mean_len = n_alnum / n_tokens if n_tokens else 0.0
            stop_ratio = n_stop / n_tokens if n_tokens else 0.0
            punct = (n_chars - n_alnum - n_space) / n_chars if n_chars else 0.0
            dup_ratio = 0.0
            top_frac = 0.0
            if n_tokens >= 2:
                grams = [ts[j] + " " + ts[j + 1] for j in range(n_tokens - 1)]
                _, c = np.unique(np.asarray(grams, object), return_counts=True)
                dup_ratio = 1.0 - len(c) / len(grams)
                top_frac = c.max() / len(grams)
            r = 0
            if n_tokens < QF_MIN_TOKENS:
                r |= 1
            if mean_len < QF_TOKLEN_LO or mean_len > QF_TOKLEN_HI:
                r |= 2
            if stop_ratio < QF_STOP_MIN:
                r |= 4
            if punct > QF_PUNCT_MAX:
                r |= 8
            if dup_ratio > QF_DUP_MAX:
                r |= 16
            if top_frac > QF_TOP_MAX:
                r |= 32
            reasons[i] = r
        return reasons

    def __call__(self, batch: pa.Table) -> pa.Table:
        reasons = self._reasons(batch.column("text").to_pylist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "keep": pa.array((reasons == 0).astype(np.int64)),
                "reasons": pa.array(reasons),
            }
        )


def quality_filter(docs):
    """Composed C4+Gopher keep/drop verdict per document: see
    QualityFilter. One map_batches pass, no shuffle at any scale."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        QualityFilter, batch_format="pyarrow", batch_size=8192, concurrency=(1, 8)
    )


_QF_BITS = (1, 2, 4, 8, 16, 32)
_QF_BIT_COLS = ("n_short", "n_toklen", "n_stop", "n_punct", "n_dup", "n_top")


class _QualityBySourcePartials(QualityFilter):
    """Per-batch combiner for quality_by_source: run the fused verdict,
    then reduce to one row per source IN THE BATCH — the groupby only
    ever shuffles (sources x blocks) tiny count rows, never documents."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        reasons = self._reasons(batch.column("text").to_pylist())
        src = batch.column("source").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        cols = {
            "source": pa.array(uniq),
            "n_docs": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
            "n_keep": pa.array(
                np.bincount(inv, weights=(reasons == 0), minlength=len(uniq)).astype(
                    np.int64
                )
            ),
        }
        for bit, name in zip(_QF_BITS, _QF_BIT_COLS):
            cols[name] = pa.array(
                np.bincount(
                    inv, weights=(reasons & bit) != 0, minlength=len(uniq)
                ).astype(np.int64)
            )
        return pa.table(cols)


def quality_by_source(docs):
    """Per-source corpus quality report: (source, n_docs, n_keep,
    keep_rate, n_short, n_toklen, n_stop, n_punct, n_dup, n_top) —
    the quality_filter verdict aggregated by the documents table's
    ``source`` column. Combiner-first: the only shuffle carries one
    count row per (source, block)."""
    parts = docs.select_columns(["doc_id", "text", "source"]).map_batches(
        _QualityBySourcePartials,
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 8),
    )
    agg = parts.groupby("source").sum(["n_docs", "n_keep", *_QF_BIT_COLS])

    def finish(t: pa.Table) -> pa.Table:
        cols = {"source": t.column("source")}
        for name in ("n_docs", "n_keep", *_QF_BIT_COLS):
            cols[name] = t.column(f"sum({name})")
        nd = cols["n_docs"].to_numpy().astype(np.float64)
        nk = cols["n_keep"].to_numpy().astype(np.float64)
        cols["keep_rate"] = pa.array(nk / nd)  # n_docs >= 1 per group
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def top_k_tokens(docs, k: int = 100):
    """EXACT top-k most frequent tokens over the corpus: per-batch
    combiner -> groupby(token).sum -> global sort by (cnt desc, token
    asc) -> limit k. The only all-to-all carries unique-token partials;
    ties at the boundary break deterministically by token.

    (Reference analogue: top-5 pattern exchange in intrusion_detection,
    test/intrusion_detection.cpp:36-38 — sort/top-k over an aggregated
    table.)"""
    parts = docs.map_batches(TokenPartialCounts, batch_format="pyarrow", concurrency=(1, 8))
    agg = parts.groupby("token").sum("cnt")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"token": t.column("token"), "cnt": t.column("sum(cnt)")})

    return (
        agg.map_batches(rename, batch_format="pyarrow")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )


def token_zipf_alpha(docs, cmin: int = 2):
    """Clauset-Shalizi-Newman continuous MLE of the Zipf exponent of
    the corpus TOKEN-frequency distribution tail (count >= cmin) —
    the text-side twin of graphstats.powerlaw_alpha (vocabulary skew
    drives combiner effectiveness exactly as hub skew does):

        alpha = 1 + n / sum_i ln( c_i / (cmin - 0.5) )

    One row (cmin, n_tail, alpha). Token counting reuses the
    TokenPartialCounts combiner + one vocabulary-sized groupby; the MLE
    reduce ships two scalars per block."""
    import pandas as pd

    parts = docs.map_batches(
        TokenPartialCounts, batch_format="pyarrow", concurrency=(1, 8)
    )
    agg = parts.groupby("token").sum("cnt")

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("sum(cnt)").to_numpy().astype(np.float64)
        c = c[c >= cmin]
        return pa.table(
            {
                "n": pa.array([len(c)], pa.int64()),
                "slog": pa.array([float(np.log(c).sum()) if len(c) else 0.0]),
            }
        )

    tot = agg.map_batches(partial, batch_format="pyarrow", batch_size=1 << 20).sum(
        ["n", "slog"]
    )
    n = int(tot["sum(n)"])
    denom = tot["sum(slog)"] - n * np.log(cmin - 0.5)
    alpha = 1.0 + n / denom if n and denom > 0 else float("nan")
    return pd.DataFrame(
        {
            "cmin": [int(cmin)],
            "n_tail": [n],
            "alpha": [round(float(alpha), 8)],
        }
    )


def source_mix(docs):
    """Per-source training-mixture weights: (source, n_docs, n_bytes,
    weight) with weight = the source's byte share of the corpus — the
    bytes-proportional sampling table a pre-training mix starts from.
    One combiner + one tiny (n_sources) groupby."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"source": t.column("source"), "b": t.column("n_chars")})
        g = tt.group_by("source").aggregate([("b", "sum"), ([], "count_all")])
        return g.rename_columns(["source", "_b", "_n"])

    agg = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("source")
        .aggregate(Sum("_n", alias_name="n_docs"), Sum("_b", alias_name="n_bytes"))
    )

    def finish(df):
        import pandas as pd

        total = float(df["n_bytes"].sum())
        return pd.DataFrame(
            {
                "source": df["source"],
                "n_docs": df["n_docs"].astype("int64"),
                "n_bytes": df["n_bytes"].astype("int64"),
                "weight": np.round(df["n_bytes"].astype(float) / total, 8),
            }
        )

    # n_sources rows — a driver-side finish is the right size
    return finish(agg.to_pandas())


def phrase_count(docs, phrase: tuple[str, ...]):
    """Exact phrase (token-sequence) concordance: (doc_id, n_matches)
    for docs containing the phrase at least once.

    The one-shot query shape: a pure per-doc scan (tokenize, locate the
    first term, verify the successors) — zero shuffle, prunable at the
    read to (doc_id, text), embarrassingly parallel at any corpus size
    (the repeated-query shape would build a positional posting index
    instead; BM25's stats table is that path's tokenize pass). Matches
    may overlap ("a a a" contains "a a" twice), same as the SQL
    sliding-window oracle.
    """
    import re as _re

    import numpy as np
    import pyarrow as pa

    terms = tuple(phrase)
    L = len(terms)
    assert L >= 1

    def scan(t: pa.Table) -> pa.Table:
        pat = _re.compile(TOKEN_RE)
        texts = t.column("text").to_pylist()
        n = np.zeros(len(texts), np.int64)
        for i, x in enumerate(texts):
            toks = pat.findall(x)
            if len(toks) < L:
                continue
            a = np.array(toks, dtype=object)
            hit = a[: len(a) - L + 1] == terms[0]
            for j in range(1, L):
                hit &= a[j : len(a) - L + 1 + j] == terms[j]
            n[i] = int(hit.sum())
        keep = n > 0
        return pa.table(
            {
                "doc_id": pa.array(
                    t.column("doc_id").to_numpy(zero_copy_only=False)[keep]
                ),
                "n_matches": pa.array(n[keep]),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow", batch_size=4096)


def phrase_count_sql(phrase: tuple[str, ...]) -> str:
    """DuckDB replay: sliding-window equality over the shared
    tokenization, counted per doc, docs with >= 1 match."""
    L = len(phrase)
    conds = " AND ".join(
        f"ts[i + {j}] = '{w}'" for j, w in enumerate(phrase)
    )
    return (
        f"WITH t AS (SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS ts "
        "FROM documents), "
        f"w AS (SELECT doc_id, unnest(range(1, len(ts) - {L} + 2)) AS i, ts "
        f"FROM t WHERE len(ts) >= {L}), "
        f"m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches "
        f"FROM w WHERE {conds} GROUP BY doc_id) "
        "SELECT doc_id, n_matches FROM m"
    )


def compress_ratio(docs, level: int = 6):
    """Gopher/CCNet-style compressibility signal: (doc_id, raw_bytes,
    zlib_bytes, ratio). Highly repetitive/templated text compresses far
    below natural prose, so a low ratio flags boilerplate the n-gram
    filters miss. Pure per-doc map, zero shuffle; zlib is deterministic
    for a fixed level, so the pytest oracle is exact byte equality
    (not SQL-expressible -> rows-only at the driver)."""
    import zlib

    import numpy as np
    import pyarrow as pa

    def scan(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        raw = np.fromiter((len(x.encode()) for x in texts), np.int64, len(texts))
        comp = np.fromiter(
            (len(zlib.compress(x.encode(), level)) for x in texts),
            np.int64,
            len(texts),
        )
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "raw_bytes": pa.array(raw),
                "zlib_bytes": pa.array(comp),
                "ratio": pa.array(np.round(ratio, 8)),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow", batch_size=4096)
