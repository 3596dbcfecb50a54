"""Deduplication family over the ``documents`` table.

All stages are Ray-Data-first: vectorized map_batches for per-doc
signatures, groupby shuffles only over combiner-reduced candidate rows
(never all-pairs), exact verification last. The reference's analogue is
edge/clique dedup (reference src/hoover.cpp:485 idempotent edge upsert,
test/community_detection.cpp:246-260 clique dedup); the MinHash/SimHash
ops are the standard large-scale web-corpus extensions (SURVEY build
brief) built on the same groupby-bucket pattern.

Scale notes: candidate generation is bucketed (LSH bands / simhash
chunks / shared shingles), so cost tracks the number of true near-dup
collisions, not n^2. The exact shingle-Jaccard op is the small-scale
oracle-checkable path; MinHash-LSH is the 100 TB path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..segops import pair_unique
from ray.data.aggregate import Count, Min, Sum

from ..hashing import hash64_str, splitmix64
from .text import md5_digest_series

_TOKEN = re.compile(r"[a-z0-9]+")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array -> int64."""
    if hasattr(np, "bitwise_count"):  # numpy >= 2
        return np.bitwise_count(x).astype(np.int64)
    b = x.view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(b, axis=1).sum(axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: Dataset) -> Dataset:
    """Exact duplicate groups by content hash -> (doc_id=min kept id, n_copies).

    hash-partition + per-group first (md5 digest matches DuckDB's md5())."""

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "digest": md5_digest_series(df["text"])}
        )

    d = docs.map_batches(digest, batch_format="pandas", batch_size=8192)
    return (
        d.groupby("digest")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
        .select_columns(["doc_id", "n_copies"])
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def _doc_shingles(text: str, k: int) -> list[str]:
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        # docs shorter than k tokens have NO shingles — parity with the
        # SQL oracle (WHERE len(t) >= k), which drops them entirely
        return []
    return list({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


class _ShingleRows:
    """Per-doc distinct shingle rows, plus the doc's shingle count
    repeated per row (``n_sh`` — so per-doc counts come straight off
    the rows with NO groupby shuffle: a doc's rows are emitted whole by
    one call, contiguous within the block). ``hashed=True`` (the
    default wire format, round-5) ships the 64-bit shingle hash as
    int64 ``sh`` instead of the string — same exactness stance as
    ngram_contamination's hashed grams."""

    def __init__(self, k: int, hashed: bool = False):
        self.k = k
        self.hashed = hashed

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_sh, out_n = [], [], []
        for i, t in zip(ids, texts):
            shs = _doc_shingles(t, self.k)
            out_id.extend([i] * len(shs))
            out_sh.extend(shs)
            out_n.extend([len(shs)] * len(shs))
        cols = {"doc_id": pa.array(out_id, pa.int64())}
        if self.hashed:
            h = (
                hash64_str(np.asarray(out_sh, object)).view(np.int64)
                if out_sh
                else np.empty(0, np.int64)
            )
            cols["sh"] = pa.array(h)
        else:
            cols["shingle"] = pa.array(out_sh, pa.string())
        cols["n_sh"] = pa.array(out_n, pa.int64())
        return pa.table(cols)


def shingle_jaccard_pairs(
    docs: Dataset,
    k: int = 3,
    threshold: float = 0.7,
    num_partitions: int = 4,
    max_df: int | None = None,
    replay_strings: bool = False,
) -> Dataset:
    """Exact k-shingle Jaccard near-dup pairs (a < b, J >= threshold).

    shingle rows -> inverted index bucket shuffle -> co-occurrence
    pairs (combiner-counted) -> join per-doc shingle counts ->
    J = inter / (na + nb - inter). ``max_df`` optionally drops
    ubiquitous shingles (the skew cap).

    Round-5 scale shape: per-doc counts come straight off the shingle
    rows (docs are whole within a block — NO count groupby; was 13.6s
    of 70s at 20k docs), and the default wire format is the int64
    shingle HASH (``replay_strings=True`` ships the strings for a
    zero-collision-assumption replay — same stance as
    ngram_contamination)."""
    hashed = not replay_strings
    shcol = "sh" if hashed else "shingle"
    rows = docs.map_batches(
        _ShingleRows(k, hashed=hashed), batch_format="pyarrow", batch_size=8192
    )

    def local_counts(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy()
        if len(d) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "n_sh": z})
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(d[starts]),
                "n_sh": pa.array(t.column("n_sh").to_numpy()[starts]),
            }
        )

    counts = rows.map_batches(local_counts, batch_format="pyarrow", batch_size=None)

    # bucket shingles by hash so the shuffle has B groups, not one per
    # shingle; pair generation loops only over collision segments
    B = 64

    def add_part(t: pa.Table) -> pa.Table:
        if hashed:
            part = (t.column("sh").to_numpy().view(np.uint64) % np.uint64(B)).astype(
                np.int64
            )
        else:
            part = hash64_str(t.column("shingle").to_pylist()).view(np.int64) % B
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                shcol: t.column(shcol),
                "part": pa.array(part),
            }
        )

    def pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if hashed:
            codes = t.column("sh").to_numpy()
        else:
            codes = pc.dictionary_encode(
                t.column("shingle").combine_chunks()
            ).indices.to_numpy()
        order = np.argsort(codes, kind="stable")
        codes = codes[order]
        ids = t.column("doc_id").to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)]
        outs = []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2 or (max_df is not None and k > max_df):
                continue
            seg = np.sort(ids[s:e])
            i, j = np.triu_indices(k, 1)
            outs.append(np.stack([seg[i], seg[j]], axis=1))
        if not outs:
            e_ = pa.array([], pa.int64())
            return pa.table({"a": e_, "b": e_})
        p = np.concatenate(outs)
        return pa.table(
            {
                "a": pa.array(p[:, 0].astype(np.int64)),
                "b": pa.array(p[:, 1].astype(np.int64)),
            }
        )

    cand = (
        rows.map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
    ).materialize()  # materialize first: the count probe is then free
    if cand.count() == 0:
        return cand
    inter = (
        cand.map_batches(_pair_partial_counts, batch_format="pyarrow", batch_size=131072)
        .groupby(["a", "b"])
        .aggregate(Sum("_c", alias_name="inter"))
    )
    j1 = inter.join(
        counts, join_type="inner", num_partitions=num_partitions,
        on=("a",), right_on=("doc_id",),
    )
    j1 = _rename(j1, {"n_sh": "na"})
    j2 = j1.join(
        counts, join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=("doc_id",),
    )
    j2 = _rename(j2, {"n_sh": "nb"})

    def verify(t: pa.Table) -> pa.Table:
        inter_ = t.column("inter").to_numpy().astype(np.float64)
        na = t.column("na").to_numpy().astype(np.float64)
        nb = t.column("nb").to_numpy().astype(np.float64)
        jac = inter_ / (na + nb - inter_)
        keep = jac >= threshold
        return pa.table(
            {
                "a": pa.array(t.column("a").to_numpy()[keep]),
                "b": pa.array(t.column("b").to_numpy()[keep]),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow")


def _pair_partial_counts(t: pa.Table) -> pa.Table:
    g = t.group_by(["a", "b"]).aggregate([([], "count_all")])
    return g.rename_columns(["a", "b", "_c"])


def _rename(ds: Dataset, mapping: dict) -> Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class _MinHashSig:
    """Per-doc MinHash signature over k-shingles, vectorized per batch:
    shingle string hashes ^ per-permutation keys -> splitmix64 -> min."""

    def __init__(self, k: int, num_perm: int, seed: int = 0x5EED):
        self.k = k
        self.keys = splitmix64(
            np.arange(num_perm, dtype=np.uint64) + np.uint64(seed)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        sigs = np.empty((len(ids), len(self.keys)), np.uint64)
        for r, t in enumerate(texts):
            sh = _doc_shingles(t, self.k)
            if not sh:
                sigs[r] = np.uint64(0xFFFFFFFFFFFFFFFF)
                continue
            h = hash64_str(sh)  # (m,)
            sigs[r] = splitmix64(h[None, :] ^ self.keys[:, None]).min(axis=1)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(list(sigs), pa.list_(pa.uint64())),
            }
        )


def minhash_signatures(docs: Dataset, k: int = 3, num_perm: int = 128) -> Dataset:
    return docs.map_batches(
        _MinHashSig(k, num_perm), batch_format="pyarrow", concurrency=None
    )


def minhash_dedup_pairs(
    docs: Dataset,
    k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.7,
) -> Dataset:
    """MinHash+LSH near-dup candidate pairs verified by signature-estimated
    Jaccard >= threshold. Returns (a, b, est_jaccard).

    shingle -> minhash -> band rows (band_id, band_hash, doc_id) ->
    groupby band bucket -> candidate pairs -> verify via signature
    agreement. The 100 TB dedup path (cost ~ collisions, not n^2)."""
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs = minhash_signatures(docs, k, num_perm).materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sig = np.stack(t.column("sig").to_numpy(zero_copy_only=False))  # (n, P)
        n = len(ids)
        banded = sig.reshape(n, bands, r)
        bh = banded[:, :, 0].copy()
        for i in range(1, r):
            bh = splitmix64(bh ^ banded[:, :, i])
        band_id = np.tile(np.arange(bands, dtype=np.int64), n)
        bh64 = bh.reshape(-1).view(np.int64)
        return pa.table(
            {
                "band_id": pa.array(band_id),
                "band_hash": pa.array(bh64),
                "doc_id": pa.array(np.repeat(ids, bands)),
            }
        )

    rows = sigs.map_batches(band_rows, batch_format="pyarrow", batch_size=65536)

    def bucket_pairs(t: pa.Table) -> pa.Table:
        # segment by (band_id, band_hash) inside the hash bucket; pairs
        # only from collision segments (vectorized sort + boundaries)
        bi = t.column("band_id").to_numpy()
        bv = t.column("band_hash").to_numpy()
        ids = t.column("doc_id").to_numpy()
        order = np.lexsort((ids, bv, bi))
        bi, bv, ids = bi[order], bv[order], ids[order]
        new = np.r_[True, (bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(bi)]
        outs = []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            seg = np.unique(ids[s:e])
            if len(seg) < 2:
                continue
            i, j = np.triu_indices(len(seg), 1)
            outs.append(np.stack([seg[i], seg[j]], axis=1))
        if not outs:
            e_ = pa.array([], pa.int64())
            return pa.table({"a": e_, "b": e_})
        cat = np.concatenate(outs)
        ua, ub = pair_unique(cat[:, 0], cat[:, 1])  # in-bucket combiner
        return pa.table(
            {
                "a": pa.array(ua.astype(np.int64)),
                "b": pa.array(ub.astype(np.int64)),
            }
        )

    # range sort co-locates equal (band_id, band_hash) collision groups
    # in one block (cheaper than the bucket-hash groupby machinery);
    # bucket_pairs segments by the pair key inside each block. The
    # cross-block distinct is the same sort+mask as distinct_edges.
    from ..edges import distinct_pairs

    cand = rows.sort(["band_id", "band_hash"]).map_batches(
        bucket_pairs, batch_format="pyarrow", batch_size=None
    )
    cand = distinct_pairs(cand, "a", "b").materialize()
    if cand.count() == 0:
        return cand

    # verify: estimated Jaccard = fraction of agreeing minhash slots.
    # Fully distributed — candidates join the signature table twice via
    # hash-bucketed map_groups (once on a, once on b); no driver-side
    # signature dict, no whole-dataset materialization (the round-1
    # driver sig_map was the one scale-killer here). Signatures travel
    # as fixed-size binary blobs (num_perm uint64s).
    sigs_bin = sigs.map_batches(
        _SigToBinary(num_perm), batch_format="pyarrow", batch_size=65536
    )
    withsig_a = _attach_sig(cand, sigs_bin, key="a", sig_name="sig_a", num_perm=num_perm)
    withsig_b = _attach_sig(withsig_a, sigs_bin, key="b", sig_name="sig_b", num_perm=num_perm)

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        sa = _bin_to_mat(t.column("sig_a"), num_perm)
        sb = _bin_to_mat(t.column("sig_b"), num_perm)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "a": pa.array(t.column("a").to_numpy()[keep]),
                "b": pa.array(t.column("b").to_numpy()[keep]),
                "est_jaccard": pa.array(est[keep]),
            }
        )

    return withsig_b.map_batches(verify, batch_format="pyarrow", batch_size=65536)


class _SigToBinary:
    """(doc_id, sig: list<uint64>) -> (doc_id, sig: binary) rows."""

    def __init__(self, num_perm: int):
        self.num_perm = num_perm

    def __call__(self, t: pa.Table) -> pa.Table:
        M = np.stack(t.column("sig").to_numpy(zero_copy_only=False)).astype(np.uint64)
        w = self.num_perm * 8
        fsb = pa.Array.from_buffers(
            pa.binary(w), len(t), [None, pa.py_buffer(M.tobytes())]
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                # cast fsb -> binary only materializes the offsets buffer
                "sig": fsb.cast(pa.binary()),
            }
        )


def _bin_to_mat(col, num_perm: int) -> np.ndarray:
    """Fixed-width signature blobs -> (n, num_perm) uint64 matrix read
    straight off the Arrow data buffer — no per-row to_pylist/join (the
    round-2 MinHash-verify hot-path anti-pattern)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, num_perm), np.uint64)
    w = num_perm * 8
    fsb = arr.cast(pa.binary(w))  # validates uniform width, zero-copy data
    return np.frombuffer(
        fsb.buffers()[1], np.uint64, n * num_perm, offset=fsb.offset * w
    ).reshape(n, num_perm)


def _attach_sig(
    cand: Dataset, sigs_bin: Dataset, key: str, sig_name: str, num_perm: int, B: int = 64
) -> Dataset:
    """Bucketed equi-join: attach the signature of doc column ``key`` to
    each candidate row. Both sides hash into B buckets on the doc id
    (tagged-union rows -> ONE groupby shuffle); inside a bucket the
    lookup is a vectorized searchsorted against the bucket's signature
    rows. No side is ever collected to the driver."""
    pass_cols = [c for c in cand.schema().names if c != key]

    def tag_cand(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy()
        cols = {
            "part": pa.array(splitmix64(k.astype(np.uint64)).view(np.int64) % B),
            "kind": pa.array(np.ones(len(t), np.int8)),
            "key": pa.array(k.astype(np.int64)),
            "sig": pa.nulls(len(t), pa.binary()),
        }
        for c in pass_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    def tag_sig(t: pa.Table) -> pa.Table:
        k = t.column("doc_id").to_numpy()
        cols = {
            "part": pa.array(splitmix64(k.astype(np.uint64)).view(np.int64) % B),
            "kind": pa.array(np.zeros(len(t), np.int8)),
            "key": pa.array(k.astype(np.int64)),
            "sig": t.column("sig"),
        }
        for c in pass_cols:
            cols[c] = pa.nulls(len(t), pa.int64() if c in ("a", "b") else pa.binary())
        return pa.table(cols)

    tagged = cand.map_batches(tag_cand, batch_format="pyarrow", batch_size=65536).union(
        sigs_bin.map_batches(tag_sig, batch_format="pyarrow", batch_size=65536)
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tc = t.combine_chunks()
        kind = tc.column("kind").to_numpy()
        keyv = tc.column("key").to_numpy()
        is_sig = kind == 0
        sig_rows = np.flatnonzero(is_sig)
        cand_rows = np.flatnonzero(~is_sig)
        sk = keyv[sig_rows]
        order = np.argsort(sk, kind="stable")
        sk, sig_rows = sk[order], sig_rows[order]
        if len(cand_rows) and len(sk):
            ck = keyv[cand_rows]
            pos = np.clip(np.searchsorted(sk, ck), 0, len(sk) - 1)
            ok = sk[pos] == ck
            sel = cand_rows[ok]
            sig_sel = sig_rows[pos[ok]]
        else:
            sel = sig_sel = np.zeros(0, np.int64)
        # Arrow take keeps the sig column as zero-copy-sliceable binary —
        # no pandas object boxing of the signature blobs
        cols = {key: pc.take(tc.column("key"), pa.array(sel))}
        for p in pass_cols:
            cols[p] = pc.take(tc.column(p), pa.array(sel))
        cols[sig_name] = pc.take(tc.column("sig"), pa.array(sig_sel))
        return pa.table(cols)

    return tagged.groupby("part").map_groups(join_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_dedup_pairs(
    docs: Dataset, max_hamming: int = 3, n_chunks: int = 4,
    token_hash: str = "sip",
) -> Dataset:
    """SimHash near-dup pairs (a < b, hamming(sig) <= max_hamming).

    64-bit token-set simhash; candidates via pigeonhole chunking (a pair
    within hamming<=3 agrees on >=1 of 4 16-bit chunks — exhaustive, so
    the pair set equals the all-pairs scan) -> bucket groupby -> exact
    hamming verify. Returns (a, b, hamming).

    ``token_hash``: "sip" (default) = pandas' keyed siphash, fully
    vectorized — the production path; "md5" = DuckDB's
    ``md5_number_lower()`` per unique token — cross-engine reproducible,
    used by the driver's hard SQL oracle (hashed once per *unique*
    token per batch, so cost tracks vocabulary, not token count)."""

    def _md5_low64(uniq: np.ndarray) -> np.ndarray:
        import hashlib

        return np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
                for s in uniq
            ),
            np.uint64,
            len(uniq),
        )

    def sig_rows(t: pa.Table) -> pa.Table:
        # whole-batch vectorized: concatenate every doc's token hashes,
        # per-doc bit-vote via add.reduceat, sign matrix -> np.packbits
        # (bit i of sig = vote[i] > 0, identical to the per-doc spec)
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        tok_lists = [sorted(set(_TOKEN.findall(txt.lower()))) for txt in texts]
        m = np.array([len(tl) for tl in tok_lists], np.int64)
        sigs = np.zeros(len(ids), np.uint64)
        nonempty = np.flatnonzero(m > 0)
        if len(nonempty):
            flat = [tok for i in nonempty for tok in tok_lists[i]]
            if token_hash == "md5":
                uniq, inv = np.unique(np.asarray(flat, object), return_inverse=True)
                h = _md5_low64(uniq)[inv]
            else:
                h = hash64_str(flat)  # (M,) uint64
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int32
            )
            starts = np.r_[0, np.cumsum(m[nonempty])[:-1]]
            colsum = np.add.reduceat(bits, starts, axis=0)  # (n_nonempty, 64)
            vote = 2 * colsum - m[nonempty][:, None]
            sign = (vote > 0).astype(np.uint8)
            packed = np.packbits(sign, axis=1, bitorder="little")  # (n, 8) bytes
            sigs[nonempty] = packed.view(np.uint64).reshape(-1)
        return pa.table({"doc_id": pa.array(ids), "sig": pa.array(sigs)})

    sigs = docs.map_batches(sig_rows, batch_format="pyarrow", batch_size=4096).materialize()

    def chunk_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sg = t.column("sig").to_numpy()
        w = 64 // n_chunks
        mask = np.uint64((1 << w) - 1)
        out_c, out_v, out_d, out_s = [], [], [], []
        for c in range(n_chunks):
            val = ((sg >> np.uint64(c * w)) & mask).astype(np.int64)
            out_c.append(np.full(len(ids), c, np.int64))
            out_v.append(val)
            out_d.append(ids)
            out_s.append(sg.view(np.int64))
        val = np.concatenate(out_v)
        chunk = np.concatenate(out_c)
        return pa.table(
            {
                "chunk": pa.array(chunk),
                "val": pa.array(val),
                "doc_id": pa.array(np.concatenate(out_d)),
                "sig": pa.array(np.concatenate(out_s)),
                "part": pa.array((val * np.int64(n_chunks) + chunk) % np.int64(64)),
            }
        )

    rows = sigs.map_batches(chunk_rows, batch_format="pyarrow", batch_size=65536)

    def bucket_pairs(t: pa.Table) -> pa.Table:
        ch = t.column("chunk").to_numpy()
        val = t.column("val").to_numpy()
        ids = t.column("doc_id").to_numpy()
        sg = t.column("sig").to_numpy().view(np.uint64)
        order = np.lexsort((ids, val, ch))
        ch, val, ids, sg = ch[order], val[order], ids[order], sg[order]
        new = np.r_[True, (ch[1:] != ch[:-1]) | (val[1:] != val[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(ch)]
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, 1)
            a, b = ids[s:e][i], ids[s:e][j]
            x = sg[s:e][i] ^ sg[s:e][j]
            ham = _popcount64(x)
            keep = (ham <= max_hamming) & (a != b)
            out_a.append(np.minimum(a[keep], b[keep]))
            out_b.append(np.maximum(a[keep], b[keep]))
            out_h.append(ham[keep])
        if not out_a:
            e_ = pa.array([], pa.int64())
            return pa.table({"a": e_, "b": e_, "hamming": e_})
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "hamming": pa.array(np.concatenate(out_h).astype(np.int64)),
            }
        )

    pairs = rows.groupby("part").map_groups(bucket_pairs, batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        return pairs
    return (
        pairs.groupby(["a", "b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    embeddings: Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    max_broadcast_rows: int = 1_000_000,
    fallback: str = "error",
) -> Dataset:
    """Near-dup pairs by embedding cosine >= threshold (a < b). EXACT.

    Brute-force per batch against the broadcast normalized matrix
    (ray.put once, read in every task) — exact baseline; the scale path
    is LSH bucketing on random hyperplanes (see simhash) or IVF.

    Size guard: this exact path collects the full (id, embedding)
    matrix to the driver, which is only valid at oracle scale. Above
    ``max_broadcast_rows`` the behavior is ``fallback``:

    - ``"error"`` (default): raise ValueError — this function's
      contract is exact recall, and silently returning approximate
      pairs would break callers relying on it (round-3 ADVICE).
    - ``"lsh"``: divert to :func:`embedding_dup_lsh` (the distributed
      scale path, recall >= 0.9 in tests) with a warning; the result
      then carries (a, b) only and is NOT exact."""
    import ray

    n = embeddings.count()
    if n > max_broadcast_rows:
        if fallback != "lsh":
            raise ValueError(
                f"embedding_dup_pairs is exact-by-broadcast and {n} rows "
                f"exceeds max_broadcast_rows={max_broadcast_rows}; pass "
                "fallback='lsh' to opt into the approximate distributed "
                "path (embedding_dup_lsh), or call it directly"
            )
        import warnings

        warnings.warn(
            f"embedding_dup_pairs: {n} rows exceeds the exact-path broadcast "
            f"budget ({max_broadcast_rows}); diverting to embedding_dup_lsh "
            "(approximate — recall is no longer exact)",
            stacklevel=2,
        )
        pairs = embedding_dup_lsh(embeddings, threshold=threshold, id_col=id_col)
        # LSH path reports (a, b) only — match this op's schema
        return pairs.select_columns(["a", "b"])

    mat_t = embeddings.select_columns([id_col, "embedding"]).to_pandas()
    ids_all = mat_t[id_col].to_numpy().astype(np.int64)
    M = np.stack(mat_t["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids_all, M))

    class Sim:
        def __init__(self, ref):
            self.ids, self.M = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            bid = t.column(id_col).to_numpy().astype(np.int64)
            B = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
            B /= np.linalg.norm(B, axis=1, keepdims=True)
            sims = B @ self.M.T  # (b, n)
            ii, jj = np.nonzero(sims >= threshold)
            a = bid[ii]
            b = self.ids[jj]
            keep = a < b
            return pa.table(
                {"a": pa.array(a[keep]), "b": pa.array(b[keep])}
            )

    return embeddings.map_batches(
        Sim, batch_format="pyarrow", concurrency=(1, 2), fn_constructor_args=(ref,)
    )


def embedding_dup_lsh(
    embeddings: Dataset,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    num_buckets: int = 64,
) -> Dataset:
    """Near-dup pairs by cosine >= threshold — the 100 TB scale path.

    Random-hyperplane LSH: each vector lands in one (table, plane-sign
    code) bucket per table (map_batches, planes built once per actor);
    ONE groupby(part) shuffle; exact vectorized cosine among bucket
    members; cross-table dedup via a tiny (a, b) groupby. Cost tracks
    bucket collisions (never n^2) and nothing touches the driver —
    unlike :func:`embedding_dup_pairs`, the exact small-scale oracle
    path, which broadcasts the full normalized matrix. Approximate:
    recall vs the exact op grows with n_tables (pytest asserts >= 0.9
    on the driver tables)."""
    from .knn import _embedding_dim, _LshBucketRows

    dim = _embedding_dim(embeddings)
    rows = embeddings.map_batches(
        _LshBucketRows,
        batch_format="pyarrow",
        batch_size=32768,
        concurrency=(1, 4),
        fn_constructor_args=(n_tables, n_planes, dim, id_col, num_buckets),
    )

    def pairs_bucket(t: pa.Table) -> pa.Table:
        tb = t.column("table").to_numpy()
        cd = t.column("code").to_numpy()
        ids = t.column("vid").to_numpy()
        emb = t.column("emb").combine_chunks()
        # fixed-dim list column: one zero-copy flatten + reshape, no
        # per-row object boxing
        M = emb.flatten().to_numpy().reshape(len(emb), -1).astype(np.float64)
        order = np.lexsort((ids, cd, tb))
        tb, cd, ids, M = tb[order], cd[order], ids[order], M[order]
        new = np.r_[True, (tb[1:] != tb[:-1]) | (cd[1:] != cd[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(tb)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            sims = M[s:e] @ M[s:e].T
            ii, jj = np.nonzero(np.triu(sims >= threshold, 1))
            if len(ii):
                a = ids[s:e][ii]
                b = ids[s:e][jj]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))
        if not out_a:
            e_ = pa.array([], pa.int64())
            return pa.table({"a": e_, "b": e_})
        p = np.unique(
            np.stack([np.concatenate(out_a), np.concatenate(out_b)], axis=1), axis=0
        )  # in-bucket combiner (same pair can collide in several tables)
        return pa.table(
            {
                "a": pa.array(p[:, 0].astype(np.int64)),
                "b": pa.array(p[:, 1].astype(np.int64)),
            }
        )

    pairs = rows.groupby("part").map_groups(pairs_bucket, batch_format="pyarrow")
    # cross-bucket dedup: a pair found in tables that hash to different
    # bucket groups appears once per group (sort+mask distinct)
    from ..edges import distinct_pairs

    return distinct_pairs(pairs, "a", "b")


# ---------------------------------------------------------------------------
# Cross-document duplicated spans (substring-level dedup)
# ---------------------------------------------------------------------------


class _SpanWindows:
    """(doc_id, text) -> distinct (h, doc_id) per doc, where h is the
    polynomial hash (base 257, wrapping uint64) of each win-char window
    at stride-aligned character positions. ASCII fast path: one
    sliding_window_view + matmul over the byte array per doc; non-ASCII
    falls back to per-window slices hashed over their UTF-8 bytes with
    the same polynomial, so decisions are path-independent."""

    def __init__(self, win: int, stride: int):
        self.win = win
        self.stride = stride
        with np.errstate(over="ignore"):
            self.coeff = np.uint64(257) ** np.arange(win, dtype=np.uint64)

    def _poly(self, b: bytes) -> np.uint64:
        a = np.frombuffer(b, np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            c = np.uint64(257) ** np.arange(len(a), dtype=np.uint64)
            return (a * c).sum(dtype=np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        hs, ds = [], []
        for i, txt in enumerate(texts):
            if len(txt) < self.win:
                continue
            b = txt.encode()
            if len(b) == len(txt):  # pure ASCII: char pos == byte pos
                a = np.frombuffer(b, np.uint8).astype(np.uint64)
                wins = np.lib.stride_tricks.sliding_window_view(a, self.win)
                wins = wins[:: self.stride]
                with np.errstate(over="ignore"):
                    h = (wins * self.coeff).sum(axis=1, dtype=np.uint64)
            else:
                h = np.fromiter(
                    (
                        self._poly(txt[p : p + self.win].encode())
                        for p in range(0, len(txt) - self.win + 1, self.stride)
                    ),
                    np.uint64,
                )
            h = np.unique(h)  # one vote per distinct window per doc
            hs.append(h)
            ds.append(np.full(len(h), ids[i], np.int64))
        if not hs:
            return pa.table(
                {"h": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "h": pa.array(np.concatenate(hs).view(np.int64)),
                "doc_id": pa.array(np.concatenate(ds)),
            }
        )


def dup_span_pairs(
    docs: Dataset,
    win: int = 32,
    stride: int = 4,
    min_shared: int = 2,
    max_df: int = 64,
) -> Dataset:
    """Cross-document duplicated-span pairs (substring-level dedup, the
    Lee et al. 2022 "Deduplicating Training Data" family): (a, b,
    n_shared) where n_shared = number of distinct win-char windows (at
    stride-aligned positions) the two docs share, windows appearing in
    more than max_df docs dropped as boilerplate.

    100-TB shape: the window table is O(chars/stride) rows but ONE
    range sort co-locates equal hashes (the distinct_pairs argument);
    pair emission is capped at C(max_df, 2) per window group, so cost
    tracks true duplication, never n^2. Hash collisions (wrapping
    base-257 polynomial over >8 bytes) can merge distinct windows with
    probability ~2^-64 per pair — the same class of assumption
    exact_dedup makes about md5 groups.

    (Reference analogue: SURVEY.md §2.7 dedup/set ops; complements the
    exact/MinHash/SimHash/shingle/embedding families with span-level
    semantics.)"""
    from ..segops import pair_unique_counts

    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        _SpanWindows(win, stride), batch_format="pyarrow"
    )

    def group_pairs(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy()
        d = t.column("doc_id").to_numpy()
        if len(h) == 0:
            e_ = pa.array([], pa.int64())
            return pa.table({"a": e_, "b": e_, "cnt": e_})
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        ends = np.r_[starts[1:], len(h)]
        sizes = ends - starts
        outs_a, outs_b = [], []
        for s, e, m in zip(starts, ends, sizes):
            if m < 2 or m > max_df:
                continue
            seg = d[s:e]  # distinct docs (per-doc unique upstream), sorted
            ii, jj = np.triu_indices(len(seg), 1)
            outs_a.append(seg[ii])
            outs_b.append(seg[jj])
        if not outs_a:
            e_ = pa.array([], pa.int64())
            return pa.table({"a": e_, "b": e_, "cnt": e_})
        a, b, cnt = pair_unique_counts(np.concatenate(outs_a), np.concatenate(outs_b))
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b), "cnt": pa.array(cnt)}
        )

    partial = rows.sort("h").map_batches(
        group_pairs, batch_format="pyarrow", batch_size=None
    )

    def merge_counts(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        c = t.column("cnt").to_numpy()
        if len(a) == 0:
            e_ = pa.array([], pa.int64())
            return pa.table({"a": e_, "b": e_, "n_shared": e_})
        new = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        gid = np.cumsum(new) - 1
        tot = np.bincount(gid, weights=c).astype(np.int64)
        keep = tot >= min_shared
        st = np.flatnonzero(new)
        return pa.table(
            {
                "a": pa.array(a[st][keep]),
                "b": pa.array(b[st][keep]),
                "n_shared": pa.array(tot[keep]),
            }
        )

    # equal (a, b) from different window-hash blocks land in one sorted
    # block (range sort), so one adjacent-sum pass finalizes the counts
    return partial.sort(["a", "b"]).map_batches(
        merge_counts, batch_format="pyarrow", batch_size=None
    )


def dedup_clusters(
    docs: Dataset,
    k: int = 3,
    threshold: float = 0.7,
    num_parts: int = 4,
) -> Dataset:
    """The production dedup pass end-to-end: exact shingle-Jaccard
    near-dup pairs -> connected components over the pair graph ->
    canonical keeper (min doc_id of the cluster; CC's min-label IS the
    keeper) -> (doc_id, keeper, cluster_size) for EVERY document
    (singletons keep themselves, size 1). Filter keeper == doc_id to
    materialize the surviving corpus.

    Scale shape: the pair graph is tiny next to the corpus (it holds
    only near-duplicates), so the engine runs on few partitions; the
    corpus-wide steps are one combiner-backed groupby-min (attach
    keeper) and one count groupby + hash join (sizes). No driver-side
    graph, no outer join.

    (Reference analogue: SURVEY.md §2.7 dedup family composed with the
    §2.5 connected-components app — the keeper rule matches
    exact_dedup's min-doc_id convention above.)"""
    from ..algos.cc import connected_components

    pairs = shingle_jaccard_pairs(
        docs.select_columns(["doc_id", "text"]), k=k, threshold=threshold
    )

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("a"), "dst": t.column("b")})

    edges = pairs.map_batches(as_edges, batch_format="pyarrow")
    cc_out, _, eng = connected_components(edges, num_parts=num_parts)
    cc_out = cc_out.materialize()
    eng.shutdown()

    def clustered(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("v"), "keeper": t.column("label")})

    def own(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"), "keeper": t.column("doc_id")})

    both = cc_out.map_batches(clustered, batch_format="pyarrow").union(
        docs.select_columns(["doc_id"]).map_batches(own, batch_format="pyarrow")
    )
    # clustered docs carry label <= doc_id, own-rows carry doc_id:
    # min() == the CC label where one exists, doc_id otherwise.
    # Both corpus-wide folds are sortagg range sorts, not hash groupbys
    # (round 5: the per-group hash machinery was the dominant cost at
    # #docs-cardinality keys), and the size attach is the tagged-union
    # sort join.
    from .sortagg import attach_by_key, sorted_sum_by

    keepers = sorted_sum_by(both, "doc_id", min_cols={"keeper": "keeper"})
    sizes = sorted_sum_by(
        keepers.select_columns(["keeper"]), "keeper", count_col="cluster_size"
    )
    out = attach_by_key(
        rows=keepers,
        stats=sizes,
        key="keeper",
        stat_cols=["cluster_size"],
        row_cols=["doc_id"],
    )

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "keeper": t.column("keeper"),
                "cluster_size": pa.array(
                    t.column("cluster_size").to_numpy().astype(np.int64)
                ),
            }
        )

    return out.map_batches(cast, batch_format="pyarrow")


def minhash_dedup_between(
    corpus: Dataset,
    incoming: Dataset,
    k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.7,
    corpus_sigs: Dataset | None = None,
) -> Dataset:
    """Near-dups of an INCOMING batch against an existing CORPUS — the
    incremental-crawl dedup path. Returns (corpus_id, incoming_id,
    est_jaccard), cross-side pairs only.

    Same banding/verify machinery as :func:`minhash_dedup_pairs`, but
    the collision segments emit only corpus x incoming pairs, so a
    mostly-clean incoming batch costs its own banding + the few
    collision verifies — never a corpus self-join. In production the
    corpus side is a STORED signature table (pass ``corpus_sigs`` with
    columns (doc_id, sig: list<uint64>) to skip re-shingling the
    corpus); appending the incoming batch's signatures to that table
    after the pass makes the op a fold over crawl batches.

    Doc ids must be globally distinct across the two sides (true for
    content-hash ids; the derived test split guarantees it).
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    sigs_c = (
        corpus_sigs if corpus_sigs is not None
        else minhash_signatures(corpus, k, num_perm)
    ).materialize()
    sigs_i = minhash_signatures(incoming, k, num_perm).materialize()

    def band_rows(side: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            sig = np.stack(t.column("sig").to_numpy(zero_copy_only=False))
            n = len(ids)
            banded = sig.reshape(n, bands, r)
            bh = banded[:, :, 0].copy()
            for i in range(1, r):
                bh = splitmix64(bh ^ banded[:, :, i])
            return pa.table(
                {
                    "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                    "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
                    "doc_id": pa.array(np.repeat(ids, bands)),
                    "side": pa.array(np.full(n * bands, side, np.int8)),
                }
            )

        return fn

    rows = sigs_c.map_batches(
        band_rows(0), batch_format="pyarrow", batch_size=65536
    ).union(
        sigs_i.map_batches(band_rows(1), batch_format="pyarrow", batch_size=65536)
    )

    def cross_pairs(t: pa.Table) -> pa.Table:
        bi = t.column("band_id").to_numpy()
        bv = t.column("band_hash").to_numpy()
        ids = t.column("doc_id").to_numpy()
        sd = t.column("side").to_numpy()
        order = np.lexsort((ids, sd, bv, bi))
        bi, bv, ids, sd = bi[order], bv[order], ids[order], sd[order]
        new = np.r_[True, (bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(bi)]
        outs = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            cs = np.unique(ids[s:e][sd[s:e] == 0])
            ns = np.unique(ids[s:e][sd[s:e] == 1])
            if len(cs) == 0 or len(ns) == 0:
                continue
            outs.append(
                np.stack(
                    [np.repeat(cs, len(ns)), np.tile(ns, len(cs))], axis=1
                )
            )
        if not outs:
            e_ = pa.array([], pa.int64())
            return pa.table({"a": e_, "b": e_})
        cat = np.concatenate(outs)
        ua, ub = pair_unique(cat[:, 0], cat[:, 1])
        return pa.table({"a": pa.array(ua), "b": pa.array(ub)})

    from ..edges import distinct_pairs

    cand = rows.sort(["band_id", "band_hash"]).map_batches(
        cross_pairs, batch_format="pyarrow", batch_size=None
    )
    cand = distinct_pairs(cand, "a", "b").materialize()
    empty = pa.table(
        {
            "corpus_id": pa.array([], pa.int64()),
            "incoming_id": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }
    )
    if cand.count() == 0:
        import ray as _ray

        return _ray.data.from_arrow(empty)

    sigs_c_bin = sigs_c.map_batches(
        _SigToBinary(num_perm), batch_format="pyarrow", batch_size=65536
    )
    sigs_i_bin = sigs_i.map_batches(
        _SigToBinary(num_perm), batch_format="pyarrow", batch_size=65536
    )
    wa = _attach_sig(cand, sigs_c_bin, key="a", sig_name="sig_a", num_perm=num_perm)
    wb = _attach_sig(wa, sigs_i_bin, key="b", sig_name="sig_b", num_perm=num_perm)

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        sa = _bin_to_mat(t.column("sig_a"), num_perm)
        sb = _bin_to_mat(t.column("sig_b"), num_perm)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "corpus_id": pa.array(t.column("a").to_numpy()[keep]),
                "incoming_id": pa.array(t.column("b").to_numpy()[keep]),
                "est_jaccard": pa.array(est[keep]),
            }
        )

    return wb.map_batches(verify, batch_format="pyarrow", batch_size=65536)
