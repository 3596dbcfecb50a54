"""Training-data ops vs in-test oracles (documents / embeddings / events
tables at sf0.001)."""

import hashlib
import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pdf():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb_pdf():
    return pq.read_table(f"{SF}/embeddings.parquet").to_pandas()


@pytest.fixture(scope="module")
def emb_ds():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def _shingles(text, k=3):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _true_jaccard_pairs(docs_pdf, k=3, threshold=0.7):
    sh = {r.doc_id: _shingles(r.text, k) for r in docs_pdf.itertuples()}
    ids = sorted(sh)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter:
                j = inter / (len(sh[a]) + len(sh[b]) - inter)
                if j >= threshold:
                    out[(a, b)] = j
    return out


def test_exact_dedup(docs_ds, docs_pdf):
    from linkgraph.ops import exact_dedup

    got = exact_dedup(docs_ds).to_pandas()
    md5 = docs_pdf["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    want = (
        docs_pdf.assign(d=md5)
        .groupby("d")["doc_id"]
        .agg(doc_id="min", n_copies="size")
        .reset_index(drop=True)
    )
    assert sorted(map(tuple, got.values.tolist())) == sorted(map(tuple, want.values.tolist()))


def test_shingle_jaccard_exact(docs_ds, docs_pdf):
    from linkgraph.ops import shingle_jaccard_pairs

    got = shingle_jaccard_pairs(docs_ds.select_columns(["doc_id", "text"]), k=3, threshold=0.7)
    got_pairs = {(r["a"], r["b"]) for r in got.take_all()}
    want = set(_true_jaccard_pairs(docs_pdf, 3, 0.7))
    assert got_pairs == want
    assert len(want) > 0


def test_minhash_lsh_recall_precision(docs_ds, docs_pdf):
    from linkgraph.ops import minhash_dedup_pairs

    got = minhash_dedup_pairs(docs_ds.select_columns(["doc_id", "text"]), threshold=0.7)
    rows = got.take_all()
    got_pairs = {(r["a"], r["b"]) for r in rows}
    truth = _true_jaccard_pairs(docs_pdf, 3, 0.0)  # all overlapping pairs w/ jaccard
    high = {p for p, j in truth.items() if j >= 0.9}
    # recall: every strong near-dup found
    assert high <= got_pairs
    # precision: everything reported has substantial true similarity
    for p in got_pairs:
        assert truth.get(p, 0.0) >= 0.5, (p, truth.get(p, 0.0))
    # estimates close to truth
    for r in rows:
        assert abs(r["est_jaccard"] - truth[(r["a"], r["b"])]) < 0.2


def test_simhash_hamming(docs_ds, docs_pdf):
    from linkgraph.ops import simhash_dedup_pairs

    rows = simhash_dedup_pairs(docs_ds.select_columns(["doc_id", "text"]), max_hamming=3).take_all()
    assert all(r["hamming"] <= 3 and r["a"] < r["b"] for r in rows)
    # exact duplicates must collide at hamming 0
    md5 = docs_pdf["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    groups = docs_pdf.assign(d=md5).groupby("d")["doc_id"].apply(list)
    dup_pairs = {
        (min(a, b), max(a, b))
        for ids in groups
        if len(ids) > 1
        for a in ids
        for b in ids
        if a < b
    }
    got = {(r["a"], r["b"]) for r in rows}
    assert dup_pairs <= got


def test_embedding_dup_exact(emb_ds, emb_pdf):
    from linkgraph.ops import embedding_dup_pairs

    thr = 0.4
    got = {(r["a"], r["b"]) for r in embedding_dup_pairs(emb_ds, threshold=thr).take_all()}
    M = np.stack(emb_pdf["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ids = emb_pdf["vec_id"].to_numpy()
    sims = M @ M.T
    i, j = np.triu_indices(len(ids), 1)
    want = {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
        for a, b in zip(i[sims[i, j] >= thr], j[sims[i, j] >= thr])
    }
    assert got == want and len(want) > 0


def test_knn_exact(emb_ds, emb_pdf):
    from linkgraph.ops import knn_cosine

    k, queries = 5, [0, 1, 2]
    got = knn_cosine(emb_ds, queries, k=k).to_pandas()
    M = np.stack(emb_pdf["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ids = emb_pdf["vec_id"].to_numpy()
    idx = {int(v): i for i, v in enumerate(ids)}
    for q in queries:
        sims = M[idx[q]] @ M.T
        order = sorted(
            (int(v) for v in ids if v != q), key=lambda v: (-sims[idx[v]], v)
        )[:k]
        g = got[got["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        assert g == order


def test_knn_lsh_overlaps_exact(emb_ds, emb_pdf):
    from linkgraph.ops.knn import knn_cosine, knn_cosine_lsh

    exact = knn_cosine(emb_ds, [0], k=10).to_pandas()
    approx = knn_cosine_lsh(emb_ds, [0], k=10, n_tables=16, n_planes=6).to_pandas()
    inter = set(exact["neighbor_id"]) & set(approx["neighbor_id"])
    assert len(inter) >= 5  # decent recall on 500 vectors


def test_langid_on_synth_pages():
    from linkgraph import synth
    from linkgraph.ops import LangId

    n = 200
    recs = [synth.page_record(k, n, 8) for k in range(n)]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": r["text"]} for i, r in enumerate(recs)]
    )
    got = {r["doc_id"]: r["lang_pred"] for r in ds.map_batches(LangId, batch_format="pyarrow", concurrency=2).take_all()}
    correct = sum(got[i] == r["lang"] for i, r in enumerate(recs))
    assert correct / n >= 0.9


def test_token_and_char_counts(docs_ds, docs_pdf):
    from linkgraph.ops import CharClasses, TokenCount

    tok = {
        r["doc_id"]: r["n_tokens"]
        for r in docs_ds.select_columns(["doc_id", "text"])
        .map_batches(TokenCount, batch_format="pyarrow", concurrency=2)
        .take_all()
    }
    for r in docs_pdf.itertuples():
        assert tok[r.doc_id] == len(re.findall(r"[A-Za-z0-9]+", r.text))
    cc = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(CharClasses, batch_format="pyarrow", concurrency=2)
        .to_pandas()
        .set_index("doc_id")
    )
    for r in docs_pdf.head(50).itertuples():
        assert cc.loc[r.doc_id, "n_chars"] == len(r.text)
        assert cc.loc[r.doc_id, "n_space"] == r.text.count(" ")


def test_fingerprint_deterministic(docs_ds):
    from linkgraph.ops import Fingerprint

    a = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(Fingerprint(), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    b = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(Fingerprint(), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (a["fp_full"].values == b["fp_full"].values).all()
    assert (a["fp_rolling_min"].values == b["fp_rolling_min"].values).all()


def test_windows_vs_pandas():
    from linkgraph.ops import sessionize, tumbling_window

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    pdf = pq.read_table(f"{SF}/events.parquet").to_pandas()

    got = tumbling_window(ev, minutes=60).to_pandas()
    want = (
        pdf.assign(w=pdf["ts"].dt.floor("60min"))
        .groupby(["w", "event_type"])
        .agg(n_events=("event_id", "size"), total_value=("value", "sum"))
        .reset_index()
    )
    got = got.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    want = want.sort_values(["w", "event_type"]).reset_index(drop=True)
    assert (got["n_events"].values == want["n_events"].values).all()
    assert np.allclose(got["total_value"].values, want["total_value"].values)

    got_s = sessionize(ev, gap_minutes=30).to_pandas().set_index("user_id")
    gap = pd.Timedelta(minutes=30)
    for uid, g in pdf.groupby("user_id"):
        ts = g["ts"].sort_values()
        want_n = int((ts.diff() > gap).sum()) + 1
        assert got_s.loc[uid, "n_sessions"] == want_n


def test_multimodal_plumbing():
    from linkgraph.ops.multimodal import (
        MediaDecoder,
        audio_features_wav,
        decode_features,
        decode_stub,
        synth_media_dataset,
        synth_wav,
    )

    with pytest.raises(NotImplementedError):
        decode_stub(b"xx", "image")
    out = decode_features(synth_media_dataset(32), concurrency=2).to_pandas()
    assert len(out) == 32
    assert set(out.columns) == {"media_id", "kind", "features", "decoded"}
    assert all(len(f) == MediaDecoder.DIM for f in out["features"])
    # every audio row REALLY decoded (stdlib wave), matching the scalar path
    audio = out[out["kind"] == "audio"]
    assert len(audio) and audio["decoded"].all()
    r = audio.iloc[0]
    assert np.allclose(
        list(r["features"]), audio_features_wav(synth_wav(int(r["media_id"])), 64)
    )
    # video rows stay fake by contract
    assert not out[out["kind"] == "video"]["decoded"].any()
    # deterministic across runs
    out2 = decode_features(synth_media_dataset(32), concurrency=2).to_pandas()
    m1 = {r.media_id: list(r.features) for r in out.itertuples()}
    m2 = {r.media_id: list(r.features) for r in out2.itertuples()}
    assert m1 == m2


def test_quality_score_vs_python_oracle(docs_ds, docs_pdf):
    from linkgraph.ops import QualityScore
    from linkgraph.ops.text import QUALITY_STOPWORDS

    qs = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(QualityScore, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
        .set_index("doc_id")
    )
    stop = set(QUALITY_STOPWORDS)
    for r in docs_pdf.head(80).itertuples():
        toks = re.findall(r"[A-Za-z0-9]+", r.text)
        n_alnum = sum(len(w) for w in toks)
        row = qs.loc[r.doc_id]
        assert row["n_tokens"] == len(toks)
        assert row["n_stop"] == sum(w.lower() in stop for w in toks)
        if toks:
            assert row["mean_tok_len"] == n_alnum / len(toks)
            assert row["stop_ratio"] == row["n_stop"] / len(toks)
        if len(r.text):
            assert row["punct_ratio"] == (
                len(r.text) - n_alnum - r.text.count(" ")
            ) / len(r.text)


def test_hopping_window_vs_pandas():
    from linkgraph.ops import hopping_window

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    pdf = pq.read_table(f"{SF}/events.parquet").to_pandas()

    got = (
        hopping_window(ev, minutes=60, hop_minutes=15)
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    sec = pdf["ts"].astype("datetime64[s]").astype("int64")
    frames = []
    for i in range(4):
        frames.append(
            pd.DataFrame(
                {
                    "w": (sec // 900) * 900 - i * 900,
                    "event_type": pdf["event_type"],
                    "value": pdf["value"],
                }
            )
        )
    allw = pd.concat(frames)
    want = (
        allw.groupby(["w", "event_type"])
        .agg(n_events=("value", "size"), total_value=("value", "sum"))
        .reset_index()
        .sort_values(["w", "event_type"])
        .reset_index(drop=True)
    )
    assert (got["window_start"].values == want["w"].values).all()
    assert (got["n_events"].values == want["n_events"].values).all()
    assert np.allclose(got["total_value"].values, want["total_value"].values)
    # every event is in exactly 4 windows
    assert got["n_events"].sum() == 4 * len(pdf)


def test_hll_distinct_tokens_error_bound(ray_session):
    """HLL estimate within 3% of the exact distinct-token count."""
    import re

    import pyarrow.parquet as pq

    from linkgraph.ops.hll import approx_distinct_tokens

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet").select_columns(
        ["doc_id", "text"]
    )
    est = int(approx_distinct_tokens(docs)["n_distinct_est"].iloc[0])
    tok = re.compile(r"[A-Za-z0-9]+")
    exact = len(
        {
            t
            for s in pq.read_table(f"{sf}/documents.parquet", columns=["text"])["text"].to_pylist()
            for t in tok.findall(s)
        }
    )
    assert abs(est - exact) / exact <= 0.03


def test_hll_sql_oracle_parity():
    """The DuckDB replay of the HLL estimator (md5-64 item hash, bin()
    leading-zero rho, both estimator branches) is bit-exact vs the
    numpy sketch — this is what lets approx_distinct_tokens carry a
    hard driver oracle instead of a rows-only check."""
    import duckdb

    from linkgraph.ops.hll import HyperLogLog

    sql = """
    WITH d AS (SELECT DISTINCT tok FROM toks),
    h AS (SELECT CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT) AS hv FROM d),
    rw AS (SELECT CAST(hv >> 52 AS BIGINT) AS idx,
           65 - length(bin(CAST((CAST(hv AS HUGEINT) % 4503599627370496) * 4096 + 2048
           AS UBIGINT))) AS rho FROM h),
    regs AS (SELECT idx, MAX(rho) AS r FROM rw GROUP BY idx),
    agg AS (SELECT COUNT(*) AS nz, SUM(POWER(2.0, -r)) AS s FROM regs),
    est AS (SELECT (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
            / (s + (4096 - nz)) AS e, 4096 - nz AS zeros FROM agg)
    SELECT CAST(ROUND(CASE WHEN e <= 2.5 * 4096 AND zeros > 0
                THEN 4096.0 * ln(4096.0 / zeros) ELSE e END) AS BIGINT) AS n
    FROM est
    """
    con = duckdb.connect()
    for n_items in (150, 30000):  # linear-counting branch / raw-estimate branch
        items = [f"tok{i}" for i in range(n_items)] + ["Hello", "42abc", "Z"]
        hll = HyperLogLog(12)
        hll.add_strings(items)
        con.execute("CREATE OR REPLACE TABLE toks AS SELECT unnest(?) AS tok", [items])
        assert con.sql(sql).fetchone()[0] == int(round(hll.estimate()))


def test_hll_merge_matches_single(ray_session):
    from linkgraph.ops.hll import HyperLogLog

    items = [f"x{i}" for i in range(10000)]
    one = HyperLogLog(12)
    one.add_strings(items)
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_strings(items[:7000])
    b.add_strings(items[4000:])  # overlapping halves
    a.merge(b)
    assert (a.reg == one.reg).all()


def test_decoder_adapter_seam(monkeypatch):
    # the default adapter is MediaDecoder everywhere (its audio path is
    # stdlib-real; its image path auto-degrades to the fake without PIL)
    import pyarrow as pa

    from linkgraph.ops import multimodal as mm

    assert mm.resolve_decoder() is mm.MediaDecoder
    assert mm.resolve_decoder(prefer="fake") is mm.FakeDecoder
    assert mm.resolve_decoder(prefer="pil") is mm.MediaDecoder
    assert mm.resolve_decoder(prefer="media") is mm.MediaDecoder
    with pytest.raises(ValueError):
        mm.resolve_decoder(prefer="libav")

    dec = mm.MediaDecoder()
    wav = mm.synth_wav(3)
    batch = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "kind": pa.array(["audio", "video", "audio"], pa.string()),
            "payload": pa.array([wav, bytes(range(16)), b"not a wav"], pa.binary()),
        }
    )
    out = dec(batch)
    feats = out.column("features").to_pylist()
    decoded = out.column("decoded").to_pylist()
    # real WAV decodes for real; video and malformed audio fall back to
    # the deterministic fake (flagged via the decoded column)
    assert decoded == [True, False, False]
    assert len(feats[0]) == mm.MediaDecoder.DIM
    assert np.allclose(feats[0], mm.audio_features_wav(wav, mm.MediaDecoder.DIM))
    assert np.allclose(feats[1], mm.FakeDecoder(mm.MediaDecoder.DIM).features_one(bytes(range(16))))


def test_audio_features_wav_golden():
    # golden per-format oracle: a faded tone's 64-segment RMS envelope
    # matches an independent numpy recompute and decreases with the fade
    from linkgraph.ops import multimodal as mm

    n, rate = 8000, 8000
    wav = mm.synth_wav(5, n_samples=n, rate=rate)
    got = mm.audio_features_wav(wav, 64)
    t = np.arange(n) / rate
    freq = 110.0 * (1 + (5 % 8))
    x = (np.sin(2 * np.pi * freq * t) * (1 - t / t[-1]) * 0.8 * 32767).astype(np.int16)
    want = np.array(
        [np.sqrt(np.mean((s / 32768.0) ** 2)) for s in np.array_split(x.astype(np.float64), 64)]
    )
    assert np.allclose(got, want)
    # fade-out: early segments carry more energy than late ones
    assert got[0] > got[-1] > 0
    # multi-channel + 8-bit path
    import io
    import wave as wavemod

    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(1)
        w.setframerate(100)
        w.writeframes(bytes([128, 255] * 50))  # L=silence, R=full scale
    f = mm.audio_features_wav(buf.getvalue(), 4)
    assert np.allclose(f, np.full(4, 127 / 2 / 128.0))


def test_image_features_pil_golden():
    pytest.importorskip("PIL")
    from linkgraph.ops import multimodal as mm

    png = mm.synth_png(7)
    dec = mm.MediaDecoder()
    f = dec._image_features(png)
    assert len(f) == mm.MediaDecoder.DIM
    assert (f >= 0).all() and (f <= 1).all()


def test_decode_features_explicit_decoder(ray_session):
    # decode_features(decoder=...) plumbs a forced adapter end to end
    from linkgraph.ops import multimodal as mm

    media = mm.synth_media_dataset(12)
    out = mm.decode_features(media, concurrency=1, decoder=mm.FakeDecoder).to_pandas()
    assert len(out) == 12
    assert set(out.columns) == {"media_id", "kind", "features"}
    assert all(len(f) == mm.FakeDecoder.DIM for f in out["features"])


def test_ngram_contamination_vs_python_oracle(docs_ds, docs_pdf):
    from linkgraph.ops import ngram_contamination

    got = (
        ngram_contamination(docs_ds, n=3, bench_mod=97)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tok = re.compile(r"[A-Za-z0-9]+")

    def grams(t, n=3):
        ts = tok.findall(t)
        return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)} if len(ts) >= n else set()

    g = {r.doc_id: grams(r.text) for r in docs_pdf.itertuples()}
    bench = set().union(*(g[d] for d in g if d % 97 == 0))
    assert len(got) == len(docs_pdf)
    for r in got.itertuples():
        want_n = len(g[r.doc_id])
        want_m = len(g[r.doc_id] & bench)
        assert (r.n_grams, r.n_matched) == (want_n, want_m), r.doc_id
        assert r.contam == (want_m / want_n if want_n else 0.0)
    # benchmark docs are fully self-contaminated; signal is non-trivial
    assert all(got[got.doc_id % 97 == 0]["contam"] == 1.0)
    assert (got[got.doc_id % 97 != 0]["n_matched"] > 0).any()
    # replay_strings mode (no hash-collision assumption) is identical
    rep = (
        ngram_contamination(docs_ds, n=3, bench_mod=97, replay_strings=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert rep.equals(got)


def test_ngram_contamination_short_docs(ray_session):
    from linkgraph.ops import ngram_contamination

    import pyarrow as pa

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["one two", "", "alpha beta gamma alpha beta gamma"]),
            }
        )
    )
    got = (
        ngram_contamination(docs, n=3, bench_mod=97)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 0 (benchmark, <3 tokens) and doc 1 (empty) report zero grams;
    # doc 2 has 4 positions but 3 DISTINCT grams, none in the bench set
    assert got["n_grams"].tolist() == [0, 0, 3]
    assert got["n_matched"].tolist() == [0, 0, 0]
    assert got["contam"].tolist() == [0.0, 0.0, 0.0]


def test_repetition_stats_vs_python_oracle(docs_ds, docs_pdf):
    from collections import Counter

    from linkgraph.ops.text import repetition_stats

    got = (
        repetition_stats(docs_ds, n=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tok = re.compile(r"[A-Za-z0-9]+")
    assert len(got) == len(docs_pdf)
    for r, (_, doc) in zip(got.itertuples(), docs_pdf.sort_values("doc_id").iterrows()):
        ts = tok.findall(doc["text"])
        grams = [" ".join(ts[j : j + 2]) for j in range(len(ts) - 1)] if len(ts) >= 2 else []
        c = Counter(grams)
        assert r.n_positions == len(grams)
        assert r.n_distinct == len(c)
        if grams:
            assert r.dup_ratio == 1.0 - len(c) / len(grams)
            # tie rule: max count, smallest gram
            mx = max(c.values())
            top = min(g for g, v in c.items() if v == mx)
            assert r.top_gram_frac == c[top] / len(grams)
        else:
            assert (r.dup_ratio, r.top_gram_frac) == (0.0, 0.0)


def test_repetition_stats_degenerate(ray_session):
    import pyarrow as pa

    from linkgraph.ops.text import repetition_stats

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["word", "go go go go"]),
            }
        )
    )
    got = repetition_stats(docs, n=2).to_pandas().sort_values("doc_id")
    # doc 0: <2 tokens; doc 1: 3 positions of the single gram "go go"
    assert got["n_positions"].tolist() == [0, 3]
    assert got["n_distinct"].tolist() == [0, 1]
    assert got["top_gram_frac"].tolist() == [0.0, 1.0]


def test_dedup_clusters_vs_python_oracle(docs_ds, docs_pdf):
    from linkgraph.ops import dedup_clusters

    got = (
        dedup_clusters(docs_ds, k=3, threshold=0.7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # python oracle: exact pairs -> union-find -> min keeper
    pairs = list(_true_jaccard_pairs(docs_pdf, 3, 0.7))
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    keeper = {d: find(d) if d in parent else d for d in docs_pdf["doc_id"]}
    from collections import Counter

    sizes = Counter(keeper.values())
    assert len(got) == len(docs_pdf)
    for r in got.itertuples():
        assert r.keeper == keeper[r.doc_id], r.doc_id
        assert r.cluster_size == sizes[keeper[r.doc_id]]
    # the synthetic corpus actually contains non-trivial clusters
    assert (got["cluster_size"] > 1).any()
    # survivors == one per cluster
    assert (got["keeper"] == got["doc_id"]).sum() == len(sizes)
