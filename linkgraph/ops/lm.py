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
int64 groupby keys shuffle ~20x faster than string pairs). C2 groups on
h12 (carrying h1 via a constant-per-group Min), C1 = sum_w2 C2 derived
from the pair-vocabulary-sized C2 table (never a second corpus pass),
the model stats join back to the corpus-sized bigram rows ONCE on h12,
and the per-doc mean is a sum/count combiner + groupby. V is an exact
distinct over per-batch-unique token hashes. Float note: per-doc mean
sums in shuffle order; round-8 absorbs the ~1e-15 reorder jitter (the
tfidf_top3 precedent).

(Reference analogue: SURVEY.md §2.7 grouped aggregates + joins; the
two-pass train/score split mirrors the coupled-metric pattern of
update_coupled_values, src/hoover.cpp:2819-2860.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Min, Sum

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
    v = float(vocab.groupby("th").count().count())

    c2 = (
        bg.map_batches(_pair_count_partial, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("h12")
        # h1 is constant within an h12 group (same pair string) — Min
        # carries it through the aggregate
        .aggregate(Sum("_c", alias_name="c2"), Min("h1", alias_name="h1"))
    ).materialize()
    # C1 = sum_w2 C2 — derived from the (pair-vocabulary-sized) C2
    # table, NOT by a second pass over the corpus-sized bigram rows
    c1 = c2.groupby("h1").aggregate(Sum("c2", alias_name="c1"))

    # model table (h12, c2, c1): pair-vocabulary sized — the
    # corpus-sized bg table joins ONCE against the merged stats
    stats = c2.join(
        c1, join_type="inner", num_partitions=num_partitions,
        on=("h1",), right_on=("h1",), right_suffix="_r",
    ).select_columns(["h12", "c2", "c1"])
    joined = bg.select_columns(["doc_id", "h12"]).join(
        stats, join_type="inner", num_partitions=num_partitions,
        on=("h12",), right_on=("h12",),
    )

    def score_partial(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy()
        lp = np.log(
            (t.column("c2").to_numpy().astype(np.float64) + 1.0)
            / (t.column("c1").to_numpy().astype(np.float64) + v)
        )
        order = np.argsort(doc, kind="stable")
        ds = doc[order]
        starts = np.flatnonzero(np.r_[True, ds[1:] != ds[:-1]])
        n = np.diff(np.r_[starts, len(ds)])
        s = np.add.reduceat(lp[order], starts) if len(ds) else np.array([], np.float64)
        return pa.table(
            {
                "doc_id": pa.array(ds[starts]),
                "_n": pa.array(n.astype(np.int64)),
                "_s": pa.array(s),
            }
        )

    agg = (
        joined.map_batches(score_partial, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("doc_id")
        .aggregate(Sum("_n", alias_name="n_bigrams"), Sum("_s", alias_name="_s"))
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


class BigramRows:
    """Back-compat callable-class wrapper over ``_bigram_rows`` (emits
    hashed (doc_id, h1, h12) rows)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _bigram_rows(batch)


class TokenRows:
    """Back-compat callable-class wrapper over ``_token_hash_rows``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _token_hash_rows(batch)
