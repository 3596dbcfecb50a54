"""Regression tests for the round-4 ADVICE findings:

1. window_distinct: per-block run counts are partials — a window whose
   users span multiple sorted blocks must still produce ONE row with
   the exact distinct count (ops/windows.py).
2. corpus keeper_flags: a digest group straddling a sorted-block
   boundary must yield exactly one keeper (the min doc_id), not one
   per block (ops/corpus.py).
3. revenue_by_nation: int64 cent sums accumulate in integers (no
   float64 bincount path) — per-block sums above 2^53 stay exact
   (ops/relational.py).
4. PII patterns compile with re.ASCII so Python \\d matches RE2/DuckDB
   semantics — Unicode digits must NOT be redacted (ops/pii.py).

All multi-block cases force many input blocks so the range sort emits
many output blocks, exercising the cross-block paths directly.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def test_window_distinct_multiblock_exact():
    from linkgraph.ops.windows import window_distinct

    rng = np.random.default_rng(7)
    n = 6000
    # 3 hourly windows, users drawn with heavy duplication so that
    # (window, user) dedup and cross-block partial summing both matter
    base = pd.Timestamp("2024-01-01").value // 10**9
    win = rng.integers(0, 3, n) * 3600
    ts = pd.to_datetime((base + win + rng.integers(0, 3600, n)) * 10**9)
    users = rng.integers(0, 500, n)
    df = pd.DataFrame({"ts": ts, "user_id": users, "event_type": "x", "value": 1.0})
    ds = ray.data.from_pandas(df).repartition(16)
    got = (
        window_distinct(ds, minutes=60)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    sec = df["ts"].astype("datetime64[s]").astype("int64")
    w = (sec // 3600) * 3600
    want = (
        pd.DataFrame({"window_start": w, "user_id": users})
        .groupby("window_start")["user_id"]
        .nunique()
        .reset_index(name="n_users")
    )
    # exactly one row per window (no duplicate partial rows)
    assert got["window_start"].is_unique
    assert got["window_start"].tolist() == want["window_start"].tolist()
    assert got["n_users"].tolist() == want["n_users"].tolist()


def test_keeper_flags_group_across_blocks():
    from linkgraph.ops.corpus import keeper_flags

    # 8 distinct texts over 4000 docs -> ~500 docs per digest group,
    # guaranteed to straddle sorted-block boundaries at 32 input blocks
    rng = np.random.default_rng(11)
    n = 4000
    grp = rng.integers(0, 8, n)
    df = pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64), "text": [f"content {g}" for g in grp]}
    )
    ds = ray.data.from_pandas(df).repartition(32)
    out = keeper_flags(ds).to_pandas()
    assert len(out) == n
    keepers = out[out["is_keeper"] == 1]["doc_id"].sort_values().tolist()
    want = df.groupby("text")["doc_id"].min().sort_values().tolist()
    assert keepers == want  # exactly one keeper per content group, min id


def test_revenue_by_nation_integer_accumulation():
    # direct kernel check: the per-block accumulator must be exact for
    # cent values whose sum exceeds 2^53 (float64 bincount would not be)
    big = np.int64(1) << np.int64(52)
    cents = np.array([big, big, big, 3], np.int64)
    pos = np.zeros(4, np.intp)
    rev = np.zeros(1, np.int64)
    np.add.at(rev, pos, cents)
    assert rev[0] == 3 * (1 << 52) + 3
    # the float path this replaced demonstrably loses the +3
    f = np.bincount(pos, weights=cents, minlength=1).astype(np.int64)
    assert f[0] != rev[0]


def test_pii_ascii_digits_only():
    from linkgraph.ops.pii import PIIScrub

    scrub = PIIScrub()
    arabic = "١٢٣-٤٥٦-٧٨٩٠"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([f"call {arabic} now", "call 123-456-7890 now"]),
        }
    )
    out = scrub(t)
    assert out.column("n_phones").to_pylist() == [0, 1]
    assert out.column("clean_text").to_pylist()[0] == f"call {arabic} now"
    assert out.column("clean_text").to_pylist()[1] == "call <PHONE> now"


def test_attach_by_key_int64_stats():
    # stat_type=pa.int64(): 64-bit id-valued stats must survive the
    # tagged-union attach exactly (float64 would corrupt ids >= 2^53)
    import ray.data

    from linkgraph.ops.sortagg import attach_by_key

    big = (1 << 62) + 12345  # not representable in float64
    stats = ray.data.from_arrow(
        pa.table(
            {"k": pa.array([1, 2], pa.int64()), "val": pa.array([big, 7], pa.int64())}
        )
    )
    rows = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3], pa.int64()),
                "x": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
    )
    out = (
        attach_by_key(rows, stats, "k", ["val"], ["x"], stat_type=pa.int64())
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    # k=3 dropped (inner join); big id exact
    assert out["x"].tolist() == [10, 11, 12]
    assert out["val"].tolist() == [big, big, 7]
