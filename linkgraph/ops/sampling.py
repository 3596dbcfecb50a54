"""Deterministic distributed sampling.

``sample_per_key`` keeps exactly min(k, group size) rows per key,
chosen by a deterministic arithmetic priority of the row id — the
order-statistics trick that makes distributed sampling embarrassingly
combiner-friendly: any subset's top-k by priority is a superset-safe
partial result, so each block pre-trims to k per key locally and the
per-key merge only ever sees <= k rows per key per block. No
reservoir state, no second pass, rerun-stable (pure function of ids).

The priority ((id * 2654435761 + 40503) mod 2147483647 — a Knuth
multiplicative hash kept inside int64 so DuckDB BIGINT arithmetic
reproduces it bit-exactly) is intentionally SQL-replicable: the
`sample_per_key` query has an exact row_number() oracle.

(Reference analogue: SURVEY.md §2.7 sampling / bounded batches.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_A, _B, _M = 2654435761, 40503, 2147483647


def sample_per_key(
    events: Dataset,
    key_col: str = "user_id",
    id_col: str = "event_id",
    k: int = 5,
    num_buckets: int = 64,
) -> Dataset:
    """events -> (key_col, id_col) of the k deterministically sampled
    rows per key. Bucket-and-vectorize merge (hash(key) % num_buckets
    groups, one vectorized sort + groupby-head per bucket) — never a
    Python function per key."""

    def _rank_topk(keyv, idv, p):
        order = np.lexsort((idv, p, keyv))
        keyv, idv, p = keyv[order], idv[order], p[order]
        starts = np.flatnonzero(np.r_[True, keyv[1:] != keyv[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(keyv)]))
        top = (np.arange(len(keyv)) - run_start) < k
        return keyv[top], idv[top], p[top]

    def combiner(t: pa.Table) -> pa.Table:
        keyv = t.column(key_col).to_numpy()
        idv = t.column(id_col).to_numpy()
        # reduce id mod _M FIRST so the product stays < 2**63 for
        # every 64-bit id (max (_M-1)*_A ~= 5.7e18) — the naive
        # id*_A silently wraps int64 for ids >= ~3.47e9 while
        # DuckDB BIGINT arithmetic errors/diverges, breaking the
        # row_number() oracle parity. Mirrored in *_sql below.
        p = ((idv % _M) * _A + _B) % _M
        keyv, idv, p = _rank_topk(keyv, idv, p)
        return pa.table(
            {
                key_col: pa.array(keyv),
                id_col: pa.array(idv),
                "_p": pa.array(p),
                "_b": pa.array(keyv % num_buckets),
            }
        )

    def bucket_merge(t: pa.Table) -> pa.Table:
        keyv, idv, _ = _rank_topk(
            t.column(key_col).to_numpy(),
            t.column(id_col).to_numpy(),
            t.column("_p").to_numpy(),
        )
        return pa.table({key_col: pa.array(keyv), id_col: pa.array(idv)})

    return (
        events.select_columns([key_col, id_col])
        .map_batches(combiner, batch_format="pyarrow", batch_size=131072)
        .groupby("_b")
        .map_groups(bucket_merge, batch_format="pyarrow")
    )


def sample_per_key_sql(
    table: str = "events",
    key_col: str = "user_id",
    id_col: str = "event_id",
    k: int = 5,
) -> str:
    """The exact DuckDB equivalent (same priority arithmetic)."""
    return (
        f"SELECT {key_col}, {id_col} FROM ("
        f"SELECT {key_col}, {id_col}, row_number() OVER ("
        f"PARTITION BY {key_col} "
        f"ORDER BY (({id_col} % {_M}) * {_A} + {_B}) % {_M}, {id_col}) AS rn "
        f"FROM {table}) WHERE rn <= {k}"
    )


def lang_temperature(
    docs: "Dataset",
    alpha: float = 0.7,
    budget: int | None = None,
) -> "Dataset":
    """Temperature-scaled sampling quotas per language — the standard
    multilingual-pretraining mix (public recipe from the mBERT/XLM-R /
    multilingual-T5 line of work): a language with n docs gets sampling
    weight n^alpha / sum_l n_l^alpha, flattening the head and boosting
    the tail (alpha=1 is proportional, alpha=0 uniform).

    documents(doc_id, lang) -> one row per language:
      (lang, n_docs, weight, quota)
    with weight rounded to 8 dp and quota = round(weight * budget, 6)
    expected docs (budget defaults to the corpus size, i.e. a pure
    reweighting). Shape at 100 TB: ONE pre-aggregated groupby over
    per-batch (lang, count) partials — #languages rows ever shuffle —
    then the normalization is driver-side over the language-cardinality
    table (tens of rows).

    (Reference analogue: SURVEY.md §2.7 grouped + global aggregates —
    the coupled-metric fold of update_coupled_values.)"""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(t.column("lang"))
        return pa.table(
            {
                "lang": vc.field("values"),
                "_c": vc.field("counts"),
            }
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=1 << 18)
        .groupby("lang")
        .aggregate(Sum("_c", alias_name="n_docs"))
    )

    # language-cardinality table: tens of rows — the normalization is a
    # deliberate driver-side step (same class as PageRank's dangling
    # scalar), NOT a corpus materialization
    rows = counts.take_all()
    n_total = sum(int(r["n_docs"]) for r in rows)
    b = float(budget if budget is not None else n_total)
    denom = sum(float(r["n_docs"]) ** alpha for r in rows)
    langs = sorted(rows, key=lambda r: r["lang"])
    w = [float(r["n_docs"]) ** alpha / denom for r in langs]
    out = pa.table(
        {
            "lang": pa.array([r["lang"] for r in langs], pa.string()),
            "n_docs": pa.array([int(r["n_docs"]) for r in langs], pa.int64()),
            "weight": pa.array(np.round(w, 8)),
            "quota": pa.array(np.round([x * b for x in w], 6)),
        }
    )
    import ray.data

    return ray.data.from_arrow(out)
