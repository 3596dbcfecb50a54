"""Sequence packing and deterministic corpus splits — the last two
stages of a training-data pipeline before tokens hit the trainer.

``pack_sequences``: next-fit packing of documents into fixed
token-capacity bins (the "sample packing" step that turns a ragged
corpus into dense training sequences). Packing is inherently a
sequential scan, so it is parallelized the way production pipelines
do it: documents are grouped (here by ``source``; at 10^12 docs, by
(source, shard) so each group is one block's worth), each group is
packed independently in doc_id order, and bin ids are group-local.
Inside a group the scan is vectorized per BIN, not per row: one
``np.searchsorted`` over the token-count cumsum finds each bin's
boundary, so a group of n docs costs O(#bins) numpy calls.

``hash_split``: deterministic train/val/test assignment by splitmix64
of the doc id — stable across runs, machines and repartitions, the
property a resumable 100-TB pipeline needs (a random split would
reshuffle on every retry).

Both have exact DuckDB oracles: packing via a recursive CTE replaying
the same next-fit recurrence, the split via the shared splitmix64 SQL
chain (bit-exact vs linkgraph.hashing.splitmix64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64

# next-fit rule: doc i joins the current bin iff fill + n_i <= capacity,
# else it opens a new bin (even when n_i alone exceeds capacity — an
# oversize doc gets a bin of its own and the next doc starts fresh).
PACK_CAPACITY = 512

SPLIT_SEED = 2024
# bucket = splitmix64(doc_id + SPLIT_SEED) % 100
SPLIT_EDGES = (80, 90)  # <80 train, <90 val, else test
SPLIT_NAMES = ("train", "val", "test")


def _pack_group(tokens: np.ndarray, capacity: int) -> np.ndarray:
    """Next-fit bin ids for docs (already in pack order). O(#bins)."""
    n = len(tokens)
    bins = np.empty(n, np.int64)
    cum = np.cumsum(tokens, dtype=np.int64)
    start, base, b = 0, 0, 0
    while start < n:
        idx = int(np.searchsorted(cum, base + capacity, side="right"))
        if idx <= start:  # oversize doc: own bin
            idx = start + 1
        bins[start:idx] = b
        base = int(cum[idx - 1])
        b += 1
        start = idx
    return bins


def pack_sequences(
    docs,
    capacity: int = PACK_CAPACITY,
    group_col: str = "source",
    token_re: str = "[A-Za-z0-9]+",
):
    """(doc_id, text, group_col) -> (doc_id, <group_col>, n_tokens, bin_id).

    One shuffle (the groupby on ``group_col``); token counting happens
    in the upstream map so only (doc_id, group, n_tokens) moves.
    """
    import re as _re

    def count_tokens(t: pa.Table) -> pa.Table:
        pat = _re.compile(token_re)
        texts = t.column("text").to_pylist()
        n = np.fromiter((len(pat.findall(x)) for x in texts), np.int64, len(texts))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                group_col: t.column(group_col),
                "n_tokens": pa.array(n),
            }
        )

    def pack(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        toks = t.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        bins = np.empty(len(ids), np.int64)
        bins[order] = _pack_group(toks[order], capacity)
        return t.append_column("bin_id", pa.array(bins))

    counted = docs.map_batches(count_tokens, batch_format="pyarrow")
    return counted.groupby(group_col).map_groups(pack, batch_format="pyarrow")


def pack_sql(capacity: int = PACK_CAPACITY, group_col: str = "source") -> str:
    """Recursive-CTE replay of the next-fit recurrence. The recursive
    term advances every group by one row per step (DuckDB keeps only
    the frontier), so cost is depth x groups, not n^2."""
    return (
        "WITH RECURSIVE toks AS (SELECT doc_id, "
        f"{group_col}, CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) "
        "AS n_tokens FROM documents), "
        "ord AS (SELECT *, row_number() OVER "
        f"(PARTITION BY {group_col} ORDER BY doc_id) AS rn FROM toks), "
        f"rec(g, rn, doc_id, n_tokens, bin_id, fill) AS ("
        f"SELECT {group_col}, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens "
        "FROM ord WHERE rn = 1 "
        "UNION ALL "
        f"SELECT o.{group_col}, o.rn, o.doc_id, o.n_tokens, "
        f"CASE WHEN r.fill + o.n_tokens <= {capacity} THEN r.bin_id ELSE r.bin_id + 1 END, "
        f"CASE WHEN r.fill + o.n_tokens <= {capacity} THEN r.fill + o.n_tokens ELSE o.n_tokens END "
        f"FROM rec r JOIN ord o ON o.{group_col} = r.g AND o.rn = r.rn + 1) "
        f"SELECT doc_id, g AS {group_col}, n_tokens, bin_id FROM rec"
    )


def hash_split(docs, seed: int = SPLIT_SEED):
    """(doc_id, ...) -> (doc_id, bucket, split). Pure map, zero shuffle."""

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (splitmix64(ids + np.uint64(seed)) % np.uint64(100)).astype(np.int64)
        split = np.where(
            bucket < SPLIT_EDGES[0],
            SPLIT_NAMES[0],
            np.where(bucket < SPLIT_EDGES[1], SPLIT_NAMES[1], SPLIT_NAMES[2]),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "bucket": pa.array(bucket),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow")


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap


def chunk_documents(
    docs,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    token_re: str = "[A-Za-z0-9]+",
):
    """RAG-prep chunking: split each doc into fixed-token windows with
    overlap -> (doc_id, chunk_id, start_tok, n_toks, chunk_text).

    Pure per-doc flat map (zero shuffle, read prunable to doc_id+text);
    chunk_text is the space-joined token slice, so the SQL oracle
    (array_to_string over the shared tokenization) checks it
    byte-for-byte. Final partial window is kept iff it starts inside
    the doc and adds new tokens (start_tok < n and start_tok > 0 only
    when the previous window didn't already cover the tail).
    """
    import re as _re

    import pyarrow as pa

    def chunks(t: pa.Table) -> pa.Table:
        pat = _re.compile(token_re)
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out_id, out_ck, out_st, out_n, out_tx = [], [], [], [], []
        for d, x in zip(ids, texts):
            toks = pat.findall(x)
            n = len(toks)
            if n == 0:
                continue
            ck = 0
            for s in range(0, n, stride):
                if s > 0 and s + 1 > n:  # stride stepped past the end
                    break
                w = toks[s : s + chunk_tokens]
                out_id.append(d)
                out_ck.append(ck)
                out_st.append(s)
                out_n.append(len(w))
                out_tx.append(" ".join(w))
                ck += 1
                if s + chunk_tokens >= n:  # this window reached the tail
                    break
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_id": pa.array(out_ck, pa.int64()),
                "start_tok": pa.array(out_st, pa.int64()),
                "n_toks": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_tx, pa.string()),
            }
        )

    return docs.map_batches(chunks, batch_format="pyarrow", batch_size=2048)


def chunk_sql(chunk_tokens: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE) -> str:
    """DuckDB replay of chunk_documents: windows start at multiples of
    the stride; a window is emitted iff it starts at 0 or its
    predecessor did not already reach the tail (start < n_toks and
    start - stride + chunk_tokens < n_toks)."""
    return (
        "WITH t AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS ts "
        "FROM documents), "
        "n AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS nt FROM t WHERE len(ts) > 0), "
        f"w AS (SELECT doc_id, ts, nt, unnest(range(0, nt, {stride})) AS s FROM n), "
        f"k AS (SELECT * FROM w WHERE s = 0 OR s - {stride} + {chunk_tokens} < nt), "
        "r AS (SELECT doc_id, s, "
        "CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS BIGINT) AS chunk_id, "
        f"CAST(least(nt - s, {chunk_tokens}) AS BIGINT) AS n_toks, "
        f"array_to_string(ts[s + 1 : s + {chunk_tokens}], ' ') AS chunk_text FROM k) "
        "SELECT doc_id, chunk_id, CAST(s AS BIGINT) AS start_tok, n_toks, chunk_text FROM r"
    )


SHUFFLE_SEED = 4242
SHUFFLE_SHARDS = 8


def shuffle_shards(docs, n_shards: int = SHUFFLE_SHARDS, seed: int = SHUFFLE_SEED):
    """Deterministic epoch shuffle: (doc_id) -> (doc_id, shard, pos).

    The training-data ordering primitive: key = splitmix64(doc_id +
    seed) is a bijection on uint64 (distinct ids -> distinct keys, no
    ties), shard = key % n_shards, pos = rank of key within the shard.
    Reproducible across runs/machines/repartitions and new epochs are
    just a new seed. One groupby(shard) shuffle moving (doc_id, key);
    in-shard ranking is one argsort per group. At 10^12 docs n_shards
    is sized so a shard is one trainer file (~10^6 docs), keeping the
    per-group sort bounded.
    """
    def key_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(ids + np.uint64(seed))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "shard": pa.array((h % np.uint64(n_shards)).astype(np.int64)),
                "_key": pa.array(h),  # uint64 column: order matches SQL UBIGINT
            }
        )

    def rank(t: pa.Table) -> pa.Table:
        k = t.column("_key").to_numpy(zero_copy_only=False)
        pos = np.empty(len(k), np.int64)
        pos[np.argsort(k, kind="stable")] = np.arange(len(k))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "shard": t.column("shard"),
                "pos": pa.array(pos),
            }
        )

    keyed = docs.map_batches(key_rows, batch_format="pyarrow")
    return keyed.groupby("shard").map_groups(rank, batch_format="pyarrow")
