"""Corpus bigram language-model scoring — the classic pre-training
quality filter (CCNet-style): train add-one-smoothed bigram statistics
on the WHOLE corpus in one pass, then score every document by its mean
log-probability under that model. Low scores = strings unlike the
corpus (boilerplate, garble); used as a filter/resample key.

Model (deterministic, ANSI-SQL-replayable — oracled in __ray_entry__):
  * tokens = text split on single spaces; bigrams = consecutive pairs
  * C2(w1,w2) = corpus bigram count; C1(w1) = corpus count of w1 as a
    bigram left (so sum_w2 C2 = C1 exactly)
  * V = exact distinct token count over ALL token positions
  * p(w2|w1) = (C2+1) / (C1+V)    (add-one smoothing)
  * lm_score(doc) = round(mean over the doc's bigrams of ln p, 8);
    docs with < 2 tokens score 0.0 with n_bigrams = 0

Distributed shape — NO string ever shuffles: bigram rows carry
(doc_id, h1, h12) where h1/h12 are 64-bit hashes of the left token and
of the pair (tokens hash inside the extracting batch; equal strings
hash equal — the 2^-64 collision risk every dedup family accepts, and
int64 keys shuffle ~20x faster than string pairs). Every aggregate and
join keys on corpus-cardinality hashes, so the hot path uses the
sortagg kernels (range sort + per-block run kernels — hash
groupby/join measured 90 s vs ~5 s at 1M groups): C2 counts per h12
(h1 carried as a run constant), C1 = sum_w2 C2 derived from the
pair-vocabulary-sized C2 table (never a second corpus pass) and
broadcast back via a tagged-union sort, the model stats broadcast onto
the corpus-sized bigram rows the same way, and the per-doc mean is one
more sorted run-sum. V is an exact distinct over per-batch-unique
token hashes. Float note: per-doc mean sums in block order after a
doc_id range sort; round-8 absorbs any residual jitter (the
tfidf_top3 precedent).

(Reference analogue: SURVEY.md §2.7 grouped aggregates + joins; the
two-pass train/score split mirrors the coupled-metric pattern of
update_coupled_values, src/hoover.cpp:2819-2860.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..hashing import hash64_str_signed


def _bigram_rows(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> (doc_id, h1, h12) hashed bigram rows.
    Vectorized: one Arrow split per batch; pair arrays from the
    flattened values with a last-token-of-doc mask; one hash call per
    column."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(batch.column("text"), " ")
    nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    n = len(flat)
    doc = np.repeat(batch.column("doc_id").to_numpy(), nt)
    ends = np.cumsum(nt) - 1  # last flat index of each doc
    keep = np.ones(n, bool)
    if n:
        keep[ends] = False
    idx = np.flatnonzero(keep)
    w1 = pc.take(flat, pa.array(idx))
    w2 = pc.take(flat, pa.array(idx + 1))
    # separator " " is unambiguous (tokens are split ON spaces, so no
    # token contains one) and — unlike "\x00" — survives the C-string
    # hash: pandas hash_array stops at an embedded NUL byte, which
    # would merge every pair sharing a left token
    pair = pc.binary_join_element_wise(w1, w2, " ")
    return pa.table(
        {
            "doc_id": pa.array(doc[idx]),
            "h1": pa.array(hash64_str_signed(w1.to_numpy(zero_copy_only=False))),
            "h12": pa.array(hash64_str_signed(pair.to_numpy(zero_copy_only=False))),
        }
    )


def _token_hash_rows(batch: pa.Table) -> pa.Table:
    """documents(text) -> per-batch-distinct token hashes (V combiner)."""
    import pyarrow.compute as pc

    flat = pc.unique(pc.list_flatten(pc.split_pattern(batch.column("text"), " ")))
    return pa.table(
        {"th": pa.array(hash64_str_signed(flat.to_numpy(zero_copy_only=False)))}
    )


def _pair_count_partial(t: pa.Table) -> pa.Table:
    h12 = t.column("h12").to_numpy()
    h1 = t.column("h1").to_numpy()
    u, first, cnt = np.unique(h12, return_index=True, return_counts=True)
    return pa.table(
        {
            "h12": pa.array(u),
            "h1": pa.array(h1[first]),
            "_c": pa.array(cnt.astype(np.int64)),
        }
    )


def lm_score(docs: Dataset, num_partitions: int = 8) -> Dataset:
    """documents(doc_id, text) -> (doc_id, n_bigrams, lm_score)."""
    bg = docs.map_batches(_bigram_rows, batch_format="pyarrow").materialize()

    vocab = docs.map_batches(_token_hash_rows, batch_format="pyarrow")

    # exact distinct tokens by sorted run counting (equal hashes share a
    # sorted block), NOT groupby(th).count() — the one remaining
    # vocab-cardinality hash groupby in this op (round 5)
    def run_starts(t: pa.Table) -> pa.Table:
        th = t.column("th").to_numpy()
        n = int(np.count_nonzero(np.r_[True, th[1:] != th[:-1]])) if len(th) else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    v = float(
        sum(
            r["n"]
            for r in vocab.sort("th")
            .map_batches(run_starts, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
    )

    # every aggregate/join below keys on ~corpus-cardinality int64
    # hashes — the sortagg kernels (range sort + per-block run kernels)
    # replace hash groupby/join, which measured 90 s vs ~5 s for the C2
    # count at 2.9M bigrams / 1M pairs
    from .sortagg import attach_by_key, sorted_sum_by

    c2 = sorted_sum_by(
        bg.map_batches(
            _pair_count_partial, batch_format="pyarrow", batch_size=1 << 20
        ),
        key="h12",
        sum_cols={"_c": "c2"},
        # h1 is constant within an h12 group (same pair string)
        carry_cols=["h1"],
    ).materialize()
    # C1 = sum_w2 C2 — derived from the (pair-vocabulary-sized) C2
    # table, NOT by a second pass over the corpus-sized bigram rows;
    # attach_by_key broadcasts the per-h1 sum back onto the C2 rows
    c1 = sorted_sum_by(c2, key="h1", sum_cols={"c2": "c1"})
    stats = attach_by_key(
        c2.map_batches(
            lambda t: t.select(["h1", "h12", "c2"]), batch_format="pyarrow"
        ),
        c1,
        key="h1",
        stat_cols=["c1"],
        row_cols=["h12", "c2"],
    )

    # model stats broadcast onto the corpus-sized bigram rows: one
    # tagged-union sort on h12 (stats c2 rides along as float64)
    def stats_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h12": t.column("h12"),
                "c2": pa.array(
                    t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
                ),
                "c1": t.column("c1"),
            }
        )

    scored_rows = attach_by_key(
        bg.select_columns(["doc_id", "h12"]),
        stats.map_batches(stats_rows, batch_format="pyarrow"),
        key="h12",
        stat_cols=["c2", "c1"],
        row_cols=["doc_id"],
    )

    def lp_rows(t: pa.Table) -> pa.Table:
        lp = np.log(
            (t.column("c2").to_numpy() + 1.0) / (t.column("c1").to_numpy() + v)
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "_lp": pa.array(lp),
            }
        )

    agg = sorted_sum_by(
        scored_rows.map_batches(lp_rows, batch_format="pyarrow", batch_size=None),
        key="doc_id",
        sum_cols={"_lp": "_s"},
        count_col="n_bigrams",
    )

    all_docs = docs.select_columns(["doc_id"])
    out = all_docs.join(
        agg, join_type="left_outer", num_partitions=num_partitions,
        on=("doc_id",), right_on=("doc_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.fill_null(t.column("n_bigrams"), 0).to_numpy(zero_copy_only=False)
        s = pc.fill_null(t.column("_s"), 0.0).to_numpy(zero_copy_only=False)
        score = np.zeros(len(n))
        nz = n > 0
        score[nz] = np.round(s[nz] / n[nz], 8)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bigrams": pa.array(n.astype(np.int64)),
                "lm_score": pa.array(score),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _exact_vocab(docs: Dataset) -> float:
    """Exact distinct token count over all token positions, by sorted
    run counting over per-batch-unique token hashes (the lm_score V)."""
    vocab = docs.map_batches(_token_hash_rows, batch_format="pyarrow")

    def run_starts(t: pa.Table) -> pa.Table:
        th = t.column("th").to_numpy()
        n = int(np.count_nonzero(np.r_[True, th[1:] != th[:-1]])) if len(th) else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    return float(
        sum(
            r["n"]
            for r in vocab.sort("th")
            .map_batches(run_starts, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
    )


def _trigram_rows(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> hashed trigram rows
    (doc_id, h123, h12, h23, h2, h3): one row per trigram position.
    h12/h23/h2/h3 are the backoff-context hashes — all derived in the
    extracting batch so only int64 keys ever shuffle."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(batch.column("text"), " ")
    nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    n = len(flat)
    doc = np.repeat(batch.column("doc_id").to_numpy(), nt)
    ends = np.cumsum(nt) - 1
    keep = np.ones(n, bool)
    if n:
        keep[ends] = False  # no trigram starts at the last token...
        keep[np.maximum(ends - 1, 0)] = False  # ...or the one before it
        # docs with < 3 tokens contribute nothing (their 0-2 positions
        # are all within the masked tail)
    idx = np.flatnonzero(keep)
    w1 = pc.take(flat, pa.array(idx))
    w2 = pc.take(flat, pa.array(idx + 1))
    w3 = pc.take(flat, pa.array(idx + 2))
    g123 = pc.binary_join_element_wise(w1, w2, w3, " ")
    g12 = pc.binary_join_element_wise(w1, w2, " ")
    g23 = pc.binary_join_element_wise(w2, w3, " ")
    return pa.table(
        {
            "doc_id": pa.array(doc[idx]),
            "h123": pa.array(hash64_str_signed(g123.to_numpy(zero_copy_only=False))),
            "h12": pa.array(hash64_str_signed(g12.to_numpy(zero_copy_only=False))),
            "h23": pa.array(hash64_str_signed(g23.to_numpy(zero_copy_only=False))),
            "h2": pa.array(hash64_str_signed(w2.to_numpy(zero_copy_only=False))),
            "h3": pa.array(hash64_str_signed(w3.to_numpy(zero_copy_only=False))),
        }
    )


def _tri_count_partial(t: pa.Table) -> pa.Table:
    h123 = t.column("h123").to_numpy()
    u, first, cnt = np.unique(h123, return_index=True, return_counts=True)
    cols = {"h123": pa.array(u)}
    for c in ("h12", "h23", "h2", "h3"):
        cols[c] = pa.array(t.column(c).to_numpy()[first])
    cols["_c"] = pa.array(cnt.astype(np.int64))
    return pa.table(cols)


def lm3_score(
    docs: Dataset,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    num_partitions: int = 8,
) -> Dataset:
    """documents(doc_id, text) -> (doc_id, n_trigrams, lm3_score):
    interpolated (Jelinek-Mercer) trigram LM with add-one components,
    trained on the corpus itself and scoring every document by its mean
    trigram log-probability:

      p(w3|w1 w2) = l3*(C123+1)/(C12+V) + l2*(C23+1)/(C2+V)
                  + l1*(C3+1)/(T3+V)

    where C123 = trigram count, C12 = count of (w1,w2) as trigram left
    context (= sum over w3 of C123), C23 = count of (w2,w3) as trigram
    right pair, C2/C3 = middle/last-token trigram-position counts, T3 =
    total trigram positions, V = exact distinct tokens. Docs with < 3
    tokens score 0.0 with n_trigrams = 0. Round 8 at export (the
    lm_score precedent).

    All backoff count tables derive from the trigram-vocabulary-sized
    C123 table — never a second corpus pass; every aggregate/join is a
    sortagg kernel on int64 hashes (see lm_score's module docstring for
    the measured hash-groupby vs sort numbers)."""
    l3, l2, l1 = lambdas
    from ray.data.aggregate import Sum

    from .sortagg import attach_by_key, sorted_sum_by

    tg = docs.map_batches(_trigram_rows, batch_format="pyarrow").materialize()
    v = _exact_vocab(docs)

    c123 = sorted_sum_by(
        tg.map_batches(_tri_count_partial, batch_format="pyarrow", batch_size=1 << 20),
        key="h123",
        sum_cols={"_c": "c123"},
        carry_cols=["h12", "h23", "h2", "h3"],
    ).materialize()
    t3 = float(c123.aggregate(Sum("c123"))["sum(c123)"])

    # backoff tables from the vocab-sized c123 — each one sortagg fold,
    # then chained tagged-union attaches back onto c123
    stats = c123
    for key, out in (("h12", "c12"), ("h23", "c23"), ("h2", "c2"), ("h3", "c3")):
        fold = sorted_sum_by(
            c123.select_columns([key, "c123"]), key=key, sum_cols={"c123": out}
        )
        row_cols = [c for c in stats.schema().names if c != key]
        # int64 wire dtype: counts stay exact AND every row_col of the
        # next attach in the chain remains int64 (the union schema
        # zero-fills row_cols as int64)
        stats = attach_by_key(
            stats, fold, key=key, stat_cols=[out], row_cols=row_cols,
            stat_type=pa.int64(),
        )

    scored_rows = attach_by_key(
        tg.select_columns(["doc_id", "h123"]),
        stats.map_batches(
            lambda t: t.select(["h123", "c123", "c12", "c23", "c2", "c3"]),
            batch_format="pyarrow",
        ),
        key="h123",
        stat_cols=["c123", "c12", "c23", "c2", "c3"],
        row_cols=["doc_id"],
        stat_type=pa.int64(),
    )

    def lp_rows(t: pa.Table) -> pa.Table:
        c123_ = t.column("c123").to_numpy().astype(np.float64)
        c12_ = t.column("c12").to_numpy().astype(np.float64)
        c23_ = t.column("c23").to_numpy().astype(np.float64)
        c2_ = t.column("c2").to_numpy().astype(np.float64)
        c3_ = t.column("c3").to_numpy().astype(np.float64)
        p = (
            l3 * (c123_ + 1.0) / (c12_ + v)
            + l2 * (c23_ + 1.0) / (c2_ + v)
            + l1 * (c3_ + 1.0) / (t3 + v)
        )
        return pa.table({"doc_id": t.column("doc_id"), "_lp": pa.array(np.log(p))})

    agg = sorted_sum_by(
        scored_rows.map_batches(lp_rows, batch_format="pyarrow", batch_size=None),
        key="doc_id",
        sum_cols={"_lp": "_s"},
        count_col="n_trigrams",
    )

    out = docs.select_columns(["doc_id"]).join(
        agg, join_type="left_outer", num_partitions=num_partitions,
        on=("doc_id",), right_on=("doc_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.fill_null(t.column("n_trigrams"), 0).to_numpy(zero_copy_only=False)
        s = pc.fill_null(t.column("_s"), 0.0).to_numpy(zero_copy_only=False)
        score = np.zeros(len(n))
        nz = n > 0
        score[nz] = np.round(s[nz] / n[nz], 8)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_trigrams": pa.array(n.astype(np.int64)),
                "lm3_score": pa.array(score),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


class BigramRows:
    """Back-compat callable-class wrapper over ``_bigram_rows`` (emits
    hashed (doc_id, h1, h12) rows)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _bigram_rows(batch)


class TokenRows:
    """Back-compat callable-class wrapper over ``_token_hash_rows``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _token_hash_rows(batch)
