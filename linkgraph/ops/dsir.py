"""DSIR-style importance weighting for training-data selection (Xie et
al. 2023, "Data Selection for Language Models via Importance
Resampling" — public method): score every document by how much more
likely its n-gram features are under a TARGET distribution (here: the
corpus slice with ``lang == target_lang``) than under the RAW corpus
distribution. High log-weights = looks like the target; the weight is
the resampling key.

Model (deterministic, ANSI-SQL-replayable — oracled in __ray_entry__):
  * features g = word unigrams + word bigrams (split on single spaces;
    a bigram feature is the two tokens joined by one space — tokens
    contain no space, so the two feature families cannot collide)
  * cr(g) = occurrences of g in the raw corpus (all docs),
    ct(g) = occurrences in target docs; Tr = sum cr, Tt = sum ct,
    V = number of distinct features
  * p_t(g) = (ct+1)/(Tt+V), p_r(g) = (cr+1)/(Tr+V)   (add-one)
  * dsir_logw(doc) = round(sum over the doc's feature OCCURRENCES of
    ln p_t(g) - ln p_r(g), 6); n_grams = that occurrence count

Distributed shape (the lm_score recipe — NO string ever shuffles):
feature rows carry (doc_id, gh, it) with gh a 64-bit hash of the
feature string and it the target flag; per-batch combiner pre-counts
(gh, cr, ct); one sortagg range sort folds the global counts; totals
Tr/Tt/V are ONE tiny aggregate over the feature-vocabulary-sized count
table; counts broadcast back onto the corpus-sized feature rows by a
tagged-union sort (attach_by_key), and the per-doc sum is one more
sorted run-sum. Everything keys on int64 hashes, so the hot path is
the sortagg kernels; nothing corpus-sized reaches the driver.

(Reference analogue: SURVEY.md §2.7 grouped aggregates + joins; the
train-then-score split mirrors update_coupled_values,
src/hoover.cpp:2819-2860.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..hashing import hash64_str_signed


def _feature_rows(batch: pa.Table, target_lang: str) -> pa.Table:
    """documents(doc_id, text, lang) -> (doc_id, gh, it) hashed feature
    rows: one row per unigram occurrence + one per bigram occurrence.
    Vectorized: one Arrow split, flat take for pairs, one hash call per
    feature family."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(batch.column("text"), " ")
    nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    n = len(flat)
    doc = np.repeat(batch.column("doc_id").to_numpy(), nt)
    is_t = np.repeat(
        pc.equal(batch.column("lang"), target_lang).to_numpy(zero_copy_only=False),
        nt,
    ).astype(np.int64)

    uh = hash64_str_signed(flat.to_numpy(zero_copy_only=False))

    ends = np.cumsum(nt) - 1  # last flat index of each doc
    keep = np.ones(n, bool)
    if n:
        keep[ends] = False
    idx = np.flatnonzero(keep)
    w1 = pc.take(flat, pa.array(idx))
    w2 = pc.take(flat, pa.array(idx + 1))
    pair = pc.binary_join_element_wise(w1, w2, " ")
    bh = hash64_str_signed(pair.to_numpy(zero_copy_only=False))

    return pa.table(
        {
            "doc_id": pa.array(np.concatenate([doc, doc[idx]])),
            "gh": pa.array(np.concatenate([uh, bh])),
            "it": pa.array(np.concatenate([is_t, is_t[idx]])),
        }
    )


def _count_partial(t: pa.Table) -> pa.Table:
    """Per-batch combiner: (gh, _cr, _ct) partial counts."""
    gh = t.column("gh").to_numpy()
    it = t.column("it").to_numpy()
    order = np.argsort(gh, kind="stable")
    g = gh[order]
    i = it[order]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]]) if len(g) else np.array([], np.int64)
    if len(g) == 0:
        return pa.table(
            {
                "gh": pa.array([], pa.int64()),
                "_cr": pa.array([], pa.int64()),
                "_ct": pa.array([], pa.int64()),
            }
        )
    cnt = np.diff(np.r_[starts, len(g)])
    tct = np.add.reduceat(i, starts)
    return pa.table(
        {
            "gh": pa.array(g[starts]),
            "_cr": pa.array(cnt.astype(np.int64)),
            "_ct": pa.array(tct.astype(np.int64)),
        }
    )


def dsir_weights(docs: Dataset, target_lang: str = "en", num_partitions: int = 8) -> Dataset:
    """documents(doc_id, text, lang) -> (doc_id, n_grams, dsir_logw)."""
    from ray.data.aggregate import Count, Sum

    from .sortagg import attach_by_key, sorted_sum_by

    feats = docs.map_batches(
        lambda t: _feature_rows(t, target_lang), batch_format="pyarrow"
    ).materialize()

    counts = sorted_sum_by(
        feats.map_batches(_count_partial, batch_format="pyarrow", batch_size=1 << 20),
        key="gh",
        sum_cols={"_cr": "cr", "_ct": "ct"},
    ).materialize()

    tot = counts.aggregate(Sum("cr"), Sum("ct"), Count())
    tr = float(tot["sum(cr)"])
    tt = float(tot["sum(ct)"])
    v = float(tot["count()"])

    def stats_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "gh": t.column("gh"),
                "cr": pa.array(t.column("cr").to_numpy().astype(np.float64)),
                "ct": pa.array(t.column("ct").to_numpy().astype(np.float64)),
            }
        )

    scored_rows = attach_by_key(
        feats.select_columns(["doc_id", "gh"]),
        counts.map_batches(stats_rows, batch_format="pyarrow"),
        key="gh",
        stat_cols=["cr", "ct"],
        row_cols=["doc_id"],
    )

    def lr_rows(t: pa.Table) -> pa.Table:
        lr = np.log((t.column("ct").to_numpy() + 1.0) / (tt + v)) - np.log(
            (t.column("cr").to_numpy() + 1.0) / (tr + v)
        )
        return pa.table({"doc_id": t.column("doc_id"), "_lr": pa.array(lr)})

    agg = sorted_sum_by(
        scored_rows.map_batches(lr_rows, batch_format="pyarrow", batch_size=None),
        key="doc_id",
        sum_cols={"_lr": "_s"},
        count_col="n_grams",
    )

    out = docs.select_columns(["doc_id"]).join(
        agg, join_type="left_outer", num_partitions=num_partitions,
        on=("doc_id",), right_on=("doc_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.fill_null(t.column("n_grams"), 0).to_numpy(zero_copy_only=False)
        s = pc.fill_null(t.column("_s"), 0.0).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(n.astype(np.int64)),
                "dsir_logw": pa.array(np.round(s, 6)),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
