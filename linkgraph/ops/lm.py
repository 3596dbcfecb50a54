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

Distributed shape: bigram rows carry (doc_id, w1, w2); counts come
from per-batch np.unique combiners feeding two groupbys (C2 keyed on
the pair, C1 on the left token); scoring is one hash join doc-bigrams x
C2 x C1 (the model is corpus-sized vocabulary — joined, never
broadcast), then a per-doc sum/count combiner. V is a distinct
aggregate (tiny scalar on the driver). Float note: per-doc mean is
summed in shuffle order; round-8 absorbs the ~1e-15 reorder jitter
(the tfidf_top3 precedent).

(Reference analogue: SURVEY.md §2.7 grouped aggregates + joins; the
two-pass train/score split mirrors the coupled-metric pattern of
update_coupled_values, src/hoover.cpp:2819-2860.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum


class BigramRows:
    """documents(doc_id, text) -> (doc_id, w1, w2) consecutive-pair
    rows. Vectorized: one Arrow split per batch, pair arrays built from
    the flattened values with a last-token-of-doc mask."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch.column("text"), " ")
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        n = len(flat)
        doc = np.repeat(batch.column("doc_id").to_numpy(), nt)
        # position i starts a bigram unless it is a doc's last token
        ends = np.cumsum(nt) - 1  # last flat index of each doc
        keep = np.ones(n, bool)
        if n:
            keep[ends] = False
        idx = np.flatnonzero(keep)
        sel = pa.array(idx)
        return pa.table(
            {
                "doc_id": pa.array(doc[idx]),
                "w1": pc.take(flat, sel),
                "w2": pc.take(flat, pa.array(idx + 1)),
            }
        )


class TokenRows:
    """documents(text) -> (token,) rows for the exact-V distinct count."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        # in-batch distinct combiner: V only needs each token once per batch
        return pa.table({"token": pc.unique(flat)})


def _pair_count_partial(t: pa.Table) -> pa.Table:
    g = (
        pa.table({"w1": t.column("w1"), "w2": t.column("w2")})
        .group_by(["w1", "w2"])
        .aggregate([([], "count_all")])
    )
    return g.rename_columns(["w1", "w2", "_c"])


def _left_count_partial(t: pa.Table) -> pa.Table:
    g = pa.table({"w1": t.column("w1")}).group_by("w1").aggregate([([], "count_all")])
    return g.rename_columns(["w1", "_c"])


def lm_score(docs: Dataset, num_partitions: int = 8) -> Dataset:
    """documents(doc_id, text) -> (doc_id, n_bigrams, lm_score)."""
    bg = docs.map_batches(
        BigramRows, batch_format="pyarrow", concurrency=(1, 8)
    ).materialize()

    vocab = docs.map_batches(TokenRows, batch_format="pyarrow", concurrency=(1, 8))
    v = float(vocab.groupby("token").count().count())

    c2 = (
        bg.map_batches(_pair_count_partial, batch_format="pyarrow", batch_size=1 << 20)
        .groupby(["w1", "w2"])
        .aggregate(Sum("_c", alias_name="c2"))
    )
    c1 = (
        bg.map_batches(_left_count_partial, batch_format="pyarrow", batch_size=1 << 20)
        .groupby("w1")
        .aggregate(Sum("_c", alias_name="c1"))
    )

    joined = bg.join(
        c2, join_type="inner", num_partitions=num_partitions,
        on=("w1", "w2"), right_on=("w1", "w2"),
    ).join(
        c1, join_type="inner", num_partitions=num_partitions,
        on=("w1",), right_on=("w1",),
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
