"""Benchmark harness (driver contract: prints ONE JSON line to stdout).

Headline pipeline: deterministic synthetic Common-Crawl-style pages
(power-law outlinks) -> text+link extraction -> hashed edge table ->
PageRank (10 fixed iterations), connected components (to convergence),
label propagation (5 iters), triangle count — plus the doc-ops track
(MinHash dedup, knn, windows) over $GRAFT_SF_DIR tables.

Scaling evidence (BASELINE.json: >=0.8 efficiency N -> 4N):
``python bench.py --scaling`` loads one RMAT graph and alternates the
session's CPU affinity between GRAFT_SCALE_NLOW and GRAFT_SCALE_NHIGH
hardware threads (default 8/32) each round, reporting best-pass
PageRank/CC edges/sec per width + efficiency + host steal telemetry
(see BASELINE.md for method + results; --scaling-subprocess keeps the
older taskset-pinned fresh-process variant).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# shared-host guard: under heavy neighbor CPU steal, worker-process
# spawn can exceed the default raylet registration timeout (the raylet
# then reaps the worker; a reaped partition actor aborts the run)
os.environ.setdefault("RAY_worker_register_timeout_seconds", "180")

# shared-host guard #2: retain worker heap pages across free (freed
# guest pages are reclaimed host-side on this box; re-faulting them is
# the dominant source of "steal"-correlated stage-time swings — see
# linkgraph/hostmem.py for the measurement)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from linkgraph.hostmem import tune_worker_malloc  # noqa: E402

tune_worker_malloc()

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "100000"))
N_SITES = 64
NUM_PARTS = int(os.environ.get("GRAFT_BENCH_PARTS", "32"))  # fixed across scaling runs
PR_ITERS = 10
LP_ITERS = 5

# a stage whose measurement window shows host CPU-steal above this
# share is re-run once (best attempt kept) — one noisy KVM window must
# not corrupt the round record (round-2 lesson: official bench ran at
# steal share 0.152 and recorded 2-8x regressions the clean session
# didn't have)
STEAL_RETRY_SHARE = float(os.environ.get("GRAFT_STEAL_RETRY_SHARE", "0.02"))
STEAL_MAX_RETRIES = int(os.environ.get("GRAFT_STEAL_MAX_RETRIES", "2"))


class _StageTimer:
    """Times a stage closure with per-window host-steal telemetry and
    retries it (keeping the fastest attempt) when the window was
    steal-polluted. `cleanup` undoes a side-effecting attempt (e.g.
    shuts down the engine a load stage created) before the retry."""

    def __init__(self, q: dict, extra: dict):
        self.q = q
        self.steal = extra.setdefault("stage_steal_share", {})

    def run(self, name: str, fn, cleanup=None, retries: int | None = None):
        # Selection rule (round-4, mirrors run_scaling's clean-arm
        # rule): an attempt at-or-below the steal gate wins outright
        # (the loop stops at the first clean attempt, so it is also the
        # fastest clean one); only when every attempt was steal-polluted
        # does the fastest dirty attempt stand, with its share recorded.
        retries = STEAL_MAX_RETRIES if retries is None else retries
        chosen = None      # first (hence fastest) clean attempt
        best_dirty = None  # fastest attempt above the gate
        for attempt in range(retries + 1):
            s0 = _steal_counter()
            t0 = time.perf_counter()
            val = fn()
            dt = time.perf_counter() - t0
            share = (_steal_counter() - s0) / max(dt * 100.0 * os.cpu_count(), 1e-9)
            if share <= STEAL_RETRY_SHARE:
                chosen = (dt, val, share)
                break
            if best_dirty is None or dt < best_dirty[0]:
                if best_dirty is not None and cleanup is not None:
                    cleanup(best_dirty[1])
                best_dirty = (dt, val, share)
            elif cleanup is not None:
                cleanup(val)
        if chosen is None:
            chosen = best_dirty
        elif best_dirty is not None and cleanup is not None:
            cleanup(best_dirty[1])
        self.q[name] = chosen[0]
        self.steal[name] = round(chosen[2], 4)
        return chosen[1]


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data

    from linkgraph import synth
    from linkgraph.algos.cc import CCProgram
    from linkgraph.algos.labelprop import LabelPropProgram
    from linkgraph.algos.pagerank import PageRankProgram
    from linkgraph.algos.triangles import triangle_count
    from linkgraph.edges import build_edges
    from linkgraph.engine import SuperstepEngine

    q: dict[str, float] = {}
    extra: dict[str, float] = {}
    t_all = time.perf_counter()
    steal0 = _steal_counter()
    st = _StageTimer(q, extra)

    # 1. pages -> extraction -> deduplicated hashed edge table
    def _extract():
        pages = synth.pages_dataset(N_PAGES, N_SITES, parallelism=NUM_CPUS * 4)
        e = build_edges(pages).materialize()
        return e, e.count()

    edges, n_edges = st.run("extract_edges", _extract)
    extra["n_pages"] = N_PAGES
    extra["n_edges"] = n_edges
    extra["pages_per_sec_extract"] = round(N_PAGES / q["extract_edges"], 1)

    # 2. graph load (hash shuffle into partition-pinned actors)
    eng_dir = st.run(
        "graph_load",
        lambda: SuperstepEngine(num_parts=NUM_PARTS).load_edges(edges),
        cleanup=lambda e: e.shutdown(),
    )

    # 3. PageRank, 10 fixed supersteps
    s = st.run("pagerank_10", lambda: eng_dir.run(PageRankProgram(tol=0.0), max_iters=PR_ITERS))
    extra["pagerank_edges_per_sec"] = round(s["edges_per_sec"], 1)
    eng_dir.shutdown()

    # 4. CC to convergence + LP on the symmetrized graph (one load, two programs)
    eng_sym = st.run(
        "graph_load_sym",
        lambda: SuperstepEngine(num_parts=NUM_PARTS, symmetrize=True).load_edges(edges),
        cleanup=lambda e: e.shutdown(),
    )
    s_cc = st.run("cc_converge", lambda: eng_sym.run(CCProgram(), max_iters=100))
    extra["cc_iterations"] = s_cc["iterations"]
    extra["cc_edges_per_sec"] = round(s_cc["edges_per_sec"], 1)
    st.run("labelprop_5", lambda: eng_sym.run(LabelPropProgram(), max_iters=LP_ITERS))
    eng_sym.shutdown()

    # 5. triangles (join pipeline)
    try:
        extra["n_triangles"] = st.run("triangles", lambda: triangle_count(edges))
    except Exception as ex:  # record and continue: partial bench > no bench
        extra.setdefault("errors", []).append(f"triangles: {ex}")

    # 5b. SCC on the directed page graph (forward-backward coloring,
    # two engines + state-ref handoff)
    try:
        from linkgraph.algos import strongly_connected_components

        _, s_scc = st.run(
            "scc", lambda: strongly_connected_components(edges, num_parts=NUM_PARTS)
        )
        extra["scc_rounds"] = s_scc["rounds"]
    except Exception as ex:
        extra.setdefault("errors", []).append(f"scc: {ex}")

    # 6. doc-ops track over the sf tables
    from linkgraph.ops import knn_cosine, minhash_dedup_pairs, tumbling_window

    try:
        # columns= prunes at the read: only the needed columns leave
        # storage (minhash reads 2 of documents' 5 columns, etc.)
        docs = ray.data.read_parquet(
            os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
        )
        st.run(
            "minhash_dedup",
            lambda: minhash_dedup_pairs(docs, threshold=0.7).count(),
        )

        emb = ray.data.read_parquet(
            os.path.join(SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"]
        )
        st.run("knn_cosine", lambda: knn_cosine(emb, [0, 1, 2, 3, 4], k=10).count())

        ev = ray.data.read_parquet(
            os.path.join(SF_DIR, "events.parquet"), columns=["ts", "event_type", "value"]
        )
        st.run("tumbling_window", lambda: tumbling_window(ev, minutes=60).count())

        from linkgraph.ops.knn import knn_graph_ivf

        st.run("knn_graph", lambda: knn_graph_ivf(emb, k=5, n_lists=16, nprobe=12).count())
    except Exception as ex:
        extra.setdefault("errors", []).append(f"doc-ops: {ex}")

    # 7. streaming CC: batched edge inserts with warm restarts (the
    # reference's update_rates metric shape: inserted edges/sec to
    # re-convergence)
    from linkgraph.synth import rmat_dataset

    try:
        _stream_cc(q, extra, SuperstepEngine, CCProgram, rmat_dataset)
    except Exception as ex:
        extra.setdefault("errors", []).append(f"streaming: {ex}")

    # 7b. dynamic-contact infection sim (in-loop implicit edge
    # discovery: radius_join Datasets feed delete/extend_edges directly,
    # nothing transits the driver). 20k actors x 4 timesteps; avg
    # contact degree ~ n*pi*r^2 ~ 6.
    try:
        from linkgraph.algos.spatial_sim import infection_sim

        sim_n, sim_steps = 20000, 4
        df_sim = st.run(
            "infection_sim",
            lambda: infection_sim(
                sim_n, 0.01, sim_steps, seeds=(0, 7), num_parts=NUM_PARTS
            ),
            retries=1,  # high-variance stage (4 engine rebuilds); one retry
        )
        extra["infection_sim_actors"] = sim_n
        extra["infection_sim_timesteps"] = sim_steps
        extra["infection_sim_n_infected"] = int(df_sim["infected"].sum())
    except Exception as ex:
        extra.setdefault("errors", []).append(f"infection_sim: {ex}")

    # 7c. round-4-session ops, timed as EXTRAS — reported in
    # extra_queries, NOT summed into the headline value (which stays
    # stage-comparable across the round): benchmark decontamination,
    # Luby MIS on the page graph, pointer-doubling redirect resolution
    # at 1M rows, bow-tie decomposition of the page graph.
    eq: dict = {}
    ste = _StageTimer(eq, extra)
    try:
        import numpy as np
        import pyarrow as pa

        from linkgraph.ops.text import ngram_contamination

        n_docs_sf = docs.count()
        ste.run("contamination", lambda: ngram_contamination(docs, n=3).count())
        extra["contamination_docs_per_sec"] = round(n_docs_sf / eq["contamination"], 1)

        from linkgraph.algos import maximal_independent_set

        out_mis, s_mis = ste.run(
            "mis_luby", lambda: maximal_independent_set(edges, num_parts=NUM_PARTS)
        )
        extra["mis_rounds"] = s_mis["rounds"]
        extra["mis_size"] = int(out_mis.sum("in_mis"))

        from linkgraph.ops.redirects import resolve_pointers

        def _redirect_1m():
            import pyarrow as pa

            n = 1_000_000

            def ptr(b):
                v = b["id"].to_numpy() if hasattr(b["id"], "to_numpy") else b["id"]
                v = np.asarray(v, np.int64)
                p = np.where(v % 5 < 2, (v * 13 + 5) % n, v)
                return pa.table({"v": pa.array(v), "p": pa.array(p.astype(np.int64))})

            ptrs = ray.data.range(n).map_batches(ptr, batch_format="pyarrow")
            return resolve_pointers(ptrs, max_hops=32, num_partitions=NUM_PARTS).count()

        ste.run("redirects_1m", _redirect_1m)
        extra["redirects_rows_per_sec"] = round(1_000_000 / eq["redirects_1m"], 1)

        from linkgraph.algos import bowtie as _bowtie

        out_bt, s_bt = ste.run(
            "bowtie", lambda: _bowtie(edges, num_parts=NUM_PARTS)
        )
        extra["bowtie_core"] = int(
            out_bt.map_batches(
                lambda t: t.filter(pa.compute.equal(t.column("cls"), "CORE")),
                batch_format="pyarrow",
            ).count()
        )

        # round-4 continuation ops: anchor-text index over the real
        # page markup, chunk-dedup + bigram-LM quality scoring over the
        # page text, TrustRank spam mass over the extracted edge graph
        # seeded at the first 4 sites' pages.
        from linkgraph.algos import spam_mass_engine as _spam_mass_engine
        from linkgraph.hashing import hash64_str_signed
        from linkgraph.ops import anchor_index_pages, lm_score, para_dedup_stats
        from linkgraph.synth import page_url

        pages2 = synth.pages_dataset(N_PAGES, N_SITES, parallelism=NUM_CPUS * 4)
        n_anchor = ste.run(
            "anchor_index", lambda: anchor_index_pages(pages2, k=3).count()
        )
        extra["anchor_index_rows"] = int(n_anchor)
        extra["anchor_pages_per_sec"] = round(N_PAGES / eq["anchor_index"], 1)

        def _doc_text(t):
            return pa.table(
                {
                    "doc_id": pa.array(
                        hash64_str_signed(t.column("url").to_pylist())
                    ),
                    "text": t.column("text"),
                }
            )

        # materialized once: para_dedup and lm_score otherwise each
        # re-run page synthesis + url hashing through the lazy lineage
        ptext = pages2.map_batches(_doc_text, batch_format="pyarrow").materialize()
        ste.run(
            "para_dedup_pages",
            lambda: para_dedup_stats(ptext, chunk_tokens=8).count(),
        )
        extra["para_dedup_pages_per_sec"] = round(
            N_PAGES / eq["para_dedup_pages"], 1
        )
        ste.run("lm_score_pages", lambda: lm_score(ptext).count())
        extra["lm_pages_per_sec"] = round(N_PAGES / eq["lm_score_pages"], 1)

        # round-5 session-4: interpolated trigram LM + DSIR importance
        # weights over the same materialized page text
        from linkgraph.ops.dsir import dsir_weights as _dsir_weights
        from linkgraph.ops.lm import lm3_score as _lm3_score

        ste.run("lm3_score_pages", lambda: _lm3_score(ptext).count())
        extra["lm3_pages_per_sec"] = round(N_PAGES / eq["lm3_score_pages"], 1)

        def _with_lang(t):
            import numpy as np

            return t.append_column(
                "lang",
                pa.array(
                    np.where(t.column("doc_id").to_numpy() % 3 == 0, "en", "xx")
                ),
            )

        ptext_l = ptext.map_batches(_with_lang, batch_format="pyarrow")
        ste.run("dsir_pages", lambda: _dsir_weights(ptext_l).count())
        extra["dsir_pages_per_sec"] = round(N_PAGES / eq["dsir_pages"], 1)

        # composed C4+Gopher keep/drop verdict over the page text (one
        # fused per-doc pass, zero shuffle)
        from linkgraph.ops import quality_filter as _quality_filter

        kept = ste.run(
            "quality_filter_pages",
            lambda: _quality_filter(ptext).sum("keep"),
        )
        extra["quality_filter_pages_per_sec"] = round(
            N_PAGES / eq["quality_filter_pages"], 1
        )
        extra["quality_filter_kept"] = int(kept)

        # BPE trainer: 3 merges over the page text (word-freq collapse
        # once, then vocab-sized pair censuses + fixpoint replaces)
        from linkgraph.ops.bpe import bpe_learn as _bpe_learn

        df_bpe = ste.run("bpe_merges_pages", lambda: _bpe_learn(ptext, 3))
        extra["bpe_pages_per_sec"] = round(N_PAGES / eq["bpe_merges_pages"], 1)
        extra["bpe_top_merge"] = str(df_bpe["merged"][0]) if len(df_bpe) else ""

        # the APPLY pass: tokenize every page with the learned merges
        from linkgraph.ops.bpe import bpe_encode_counts as _bpe_encode

        n_tok = ste.run(
            "bpe_encode_pages",
            lambda: _bpe_encode(ptext, merges=df_bpe).sum("n_tokens"),
        )
        extra["bpe_encode_pages_per_sec"] = round(
            N_PAGES / eq["bpe_encode_pages"], 1
        )
        extra["bpe_encode_total_tokens"] = int(n_tok)

        # BM25 ranked retrieval over the page text (tokenize -> compact
        # stats -> vectorized scoring + local top-k)
        from linkgraph.ops.bm25 import bm25_topk as _bm25

        ste.run(
            "bm25_pages",
            lambda: _bm25(ptext, ("data", "join", "dup"), k=10).count(),
        )
        extra["bm25_pages_per_sec"] = round(N_PAGES / eq["bm25_pages"], 1)

        # distributed k-means + SemDeDup over 200k synthetic 64-dim
        # vectors (splitmix64-derived, deterministic): the combiner-
        # reduced Lloyd's path and the within-cluster pair search.
        from linkgraph.hashing import splitmix64 as _sm64
        from linkgraph.ops import kmeans_assign as _kmeans_assign
        from linkgraph.ops import semdedup_pairs as _semdedup

        KM_N, KM_DIM, KM_K = 200_000, 64, 64

        def _vec_batch(b):
            ids = np.asarray(
                b["id"].to_numpy() if hasattr(b["id"], "to_numpy") else b["id"],
                np.int64,
            )
            keys = ids[:, None] * KM_DIM + np.arange(KM_DIM)[None, :]
            M = (
                _sm64(keys.astype(np.uint64).reshape(-1)).astype(np.float64)
                / 2**64
            ).astype(np.float32)
            return pa.table(
                {
                    "vec_id": pa.array(ids),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(M), KM_DIM
                    ),
                }
            )

        vecs = (
            ray.data.range(KM_N)
            .map_batches(_vec_batch, batch_format="pyarrow")
            .materialize()
        )
        ste.run(
            "kmeans_200k",
            lambda: _kmeans_assign(vecs, k=KM_K, iters=4).count(),
        )
        extra["kmeans_vecs_per_sec"] = round(KM_N / eq["kmeans_200k"], 1)
        n_sem = ste.run(
            "semdedup_200k",
            lambda: _semdedup(vecs, k=KM_K, iters=4, threshold=0.9).count(),
        )
        extra["semdedup_pairs"] = int(n_sem)

        # node2vec biased-walk corpus on a symmetric 4M-edge RMAT graph
        # (exact p/q via the rejection protocol; latency-bound rounds,
        # so P=16 like the other fixpoint-heavy stages)
        from linkgraph.algos.walks import node2vec_walks as _n2v

        n2v_edges = rmat_dataset(4_000_000, scale=20, seed=17).materialize()

        def _n2v_run():
            eng = SuperstepEngine(num_parts=16, symmetrize=True).load_edges(n2v_edges)
            n = _n2v(eng, walk_len=10, n_per_vertex=1, p=0.5, q=2.0, seed=7).count()
            eng.shutdown()
            return n

        n_visits = ste.run("node2vec_rmat4m", _n2v_run)
        extra["node2vec_visits_per_sec"] = round(n_visits / eq["node2vec_rmat4m"], 1)

        # seed array: every page of the first 4 sites (engine path — the
        # whitelist fits a driver array; the Dataset-seeded spam_mass is
        # the scale path and is driver-oracled at sf0.01)
        from linkgraph.hashing import hash64_str

        seed_ids = hash64_str(
            [page_url(k, N_SITES) for k in range(N_PAGES) if k % N_SITES < 4]
        )

        def _spam():
            out, eng = _spam_mass_engine(edges, seed_ids, iters=5, num_parts=NUM_PARTS)
            n = out.count()
            eng.shutdown()
            return n

        ste.run("spam_mass", _spam)

        # WARC ingest throughput: the Common-Crawl container path
        # (write once to /tmp as 32 gzipped members, then timed
        # read_warc -> build_edges). Fixture write is NOT in the timing.
        import tempfile

        from linkgraph.sources import read_warc, write_warc
        from linkgraph.synth import pages_table

        n_warc = min(N_PAGES, 40_000)
        wdir = tempfile.mkdtemp(prefix="lgwarc_")
        shard = n_warc // 32 or 1
        for i in range(0, n_warc, shard):
            write_warc(
                pages_table(np.arange(i, min(i + shard, n_warc)), N_PAGES, N_SITES),
                os.path.join(wdir, f"part-{i:07d}.warc.gz"),
            )
        ste.run(
            "warc_ingest",
            lambda: build_edges(read_warc(wdir)).count(),
        )
        extra["warc_pages_per_sec"] = round(n_warc / eq["warc_ingest"], 1)
        extra["warc_n_pages"] = n_warc
        import shutil

        shutil.rmtree(wdir, ignore_errors=True)

        # streaming PageRank: cold converge on 8M RMAT edges, insert a
        # 100k delta, warm restart (fixpoint equality proven in
        # tests/test_streaming.py). Finding recorded in BASELINE.md:
        # the warm start shrinks the initial L1 error ~70x but the
        # residual decays at the full damping rate, while the
        # uniform-start error lies in fast-mixing directions on RMAT —
        # so warm ITERATION counts are not lower; the streaming win is
        # the O(delta) index rebuild. Both iter counts + initial
        # deltas are reported so the tradeoff stays visible.
        b0 = rmat_dataset(8_000_000, scale=21, seed=41).materialize()
        b1 = rmat_dataset(100_000, scale=21, seed=42).materialize()

        def _stream_pr():
            eng = SuperstepEngine(num_parts=NUM_PARTS).provision()
            eng.load_edges(b0, streaming=True)
            s_cold = eng.run(PageRankProgram(tol=1e-8), max_iters=200)
            eng.extend_edges(b1)
            t1 = time.perf_counter()
            s_warm = eng.run(PageRankProgram(tol=1e-8), max_iters=200, warm_start=True)
            warm_sec = time.perf_counter() - t1
            eng.shutdown()
            return s_cold, s_warm, warm_sec

        s_cold, s_warm, warm_sec = ste.run("streaming_pagerank", _stream_pr)
        extra["streaming_pr_cold_iters"] = s_cold["iterations"]
        extra["streaming_pr_warm_iters"] = s_warm["iterations"]
        extra["streaming_pr_delta0_cold"] = float(f"{s_cold['history'][0]['delta']:.3e}")
        extra["streaming_pr_delta0_warm"] = float(f"{s_warm['history'][0]['delta']:.3e}")
        extra["streaming_pr_warm_reconverge_sec"] = round(warm_sec, 3)

        # corpus-prep ops over the page text: PII scrub (regex chain,
        # zero shuffle), sample packing into 512-token bins (one
        # groupby moving only (doc_id, group, n_tokens)), and
        # crawl-over-crawl churn (one (src,dst) range sort over the
        # tagged union of the extracted edges and a perturbed copy).
        from linkgraph.ops.packing import pack_sequences as _pack
        from linkgraph.ops.pii import pii_scrub as _pii
        from linkgraph.ops.snapshot import snapshot_churn as _churn

        ste.run("pii_scrub_pages", lambda: _pii(ptext).count())
        extra["pii_pages_per_sec"] = round(N_PAGES / eq["pii_scrub_pages"], 1)

        def _with_src(t):
            ids = t.column("doc_id").to_numpy()
            return t.append_column("source", pa.array((ids % 16).astype(np.int64)))

        psrc = ptext.map_batches(_with_src, batch_format="pyarrow")
        ste.run(
            "seq_pack_pages",
            lambda: _pack(psrc, capacity=512, group_col="source").count(),
        )
        extra["pack_pages_per_sec"] = round(N_PAGES / eq["seq_pack_pages"], 1)

        def _perturb(t):
            src = t.column("src").to_numpy()
            dst = t.column("dst").to_numpy()
            with np.errstate(over="ignore"):
                keep = (src * 31 + dst) % 11 != 0
            return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

        churn_new = edges.map_batches(_perturb, batch_format="pyarrow")
        ste.run(
            "snapshot_churn",
            lambda: _churn(edges, churn_new, host_mod=64).count(),
        )
        extra["churn_edges_per_sec"] = round(2 * n_edges / eq["snapshot_churn"], 1)

        # relational broadcast-join throughput: 5M synthetic fact rows
        # (deterministic splitmix custkeys) joined against the sf
        # customer/nation dimensions — the fact side never shuffles.
        from linkgraph.hashing import splitmix64 as _smx
        from linkgraph.ops.relational import revenue_by_nation as _rev

        cust_ds = ray.data.read_parquet(
            os.path.join(SF_DIR, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        )
        nat_ds = ray.data.read_parquet(
            os.path.join(SF_DIR, "nation.parquet"), columns=["n_nationkey", "n_name"]
        )
        n_cust = cust_ds.count()
        JOIN_N = 5_000_000

        def _fact(b):
            ids = np.asarray(
                b["id"].to_numpy() if hasattr(b["id"], "to_numpy") else b["id"],
                np.int64,
            )
            ck = (_smx(ids.astype(np.uint64)) % np.uint64(n_cust)).astype(np.int64)
            price = (ids % 9973).astype(np.float64) + 0.25
            return pa.table(
                {"o_custkey": pa.array(ck), "o_totalprice": pa.array(price)}
            )

        facts = ray.data.range(JOIN_N).map_batches(_fact, batch_format="pyarrow")
        ste.run(
            "revenue_join_5m", lambda: _rev(facts, cust_ds, nat_ds).count()
        )
        extra["join_rows_per_sec"] = round(JOIN_N / eq["revenue_join_5m"], 1)

        # round-5 session-2 graphstats: butterfly census (wedge volume is
        # the scale driver — recorded), co-citation top-k over the same
        # shared wedge stage, Elias-gamma adjacency compressibility.
        from linkgraph.ops import adjacency_gamma_bits, butterflies, cocitation_topk

        df_bf = ste.run("butterflies", lambda: butterflies(edges))
        extra["butterfly_wedges"] = int(df_bf["n_wedges"][0])
        extra["butterfly_count"] = int(df_bf["n_butterflies"][0])
        extra["butterfly_wedges_per_sec"] = round(
            extra["butterfly_wedges"] / eq["butterflies"], 1
        )
        ste.run("cocitation_top20", lambda: cocitation_topk(edges, k=20))
        df_gb = ste.run("adj_gamma_bits", lambda: adjacency_gamma_bits(edges))
        extra["adj_gamma_ratio"] = float(df_gb["ratio"][0])

        # windowed CC + temporal reachability over deterministically
        # stamped page edges (stamps shared with window_triangles)
        from linkgraph.ops.windows import window_cc as _wcc

        def _stamp(t):
            s = t.column("src").to_numpy()
            d = t.column("dst").to_numpy()
            return pa.table(
                {
                    "src": t.column("src"),
                    "dst": t.column("dst"),
                    "ts_sec": pa.array((s * 13 + d * 7) % 21600),
                }
            )

        stamped = edges.map_batches(_stamp, batch_format="pyarrow")
        df_wcc = ste.run(
            "window_cc", lambda: _wcc(stamped, minutes=60).to_pandas()
        )
        extra["window_cc_windows"] = int(len(df_wcc))

        from linkgraph.ops.windows import window_pagerank as _wpr

        df_wpr = ste.run(
            "window_pagerank",
            lambda: _wpr(stamped, minutes=60, iters=5, k=3).to_pandas(),
        )
        extra["window_pagerank_rows"] = int(len(df_wpr))

        from linkgraph.algos import temporal_reach as _treach

        src0 = int(edges.take(1)[0]["src"])  # ids are hashes; 0 may not exist

        def _tr():
            out, _, eng = _treach(edges, source=src0, num_parts=NUM_PARTS)

            def _cnt(t):
                n = int((t.column("arrival").to_numpy() >= 0).sum())
                return pa.table({"n": pa.array([n], pa.int64())})

            n_reached = int(
                out.map_batches(_cnt, batch_format="pyarrow").sum("n")
            )
            eng.shutdown()
            return n_reached

        n_reached = ste.run("temporal_reach", _tr)
        extra["temporal_reach_n_reached"] = int(n_reached)

        # round-5 session-5: maximal matching (engine, local-min edge
        # priorities), ntile curriculum phases (range sort + bounds
        # pass), hostrank (Dataset-native weighted PR over a 1024-host
        # collapse of the page graph)
        from linkgraph.algos import maximal_matching as _maxmatch

        def _mm():
            out, summ = _maxmatch(edges, num_parts=NUM_PARTS)
            n_matched = int(out.sum("matched"))
            return n_matched, summ["rounds"]

        n_matched, mm_rounds = ste.run("max_matching", _mm)
        extra["max_matching_matched"] = n_matched
        extra["max_matching_rounds"] = int(mm_rounds)

        from linkgraph.ops import curriculum_phases as _curr

        ste.run("curriculum_pages", lambda: _curr(ptext, n_phases=4).count())
        extra["curriculum_pages_per_sec"] = round(
            N_PAGES / eq["curriculum_pages"], 1
        )

        from linkgraph.algos.dataset_impl import weighted_pagerank_dataset
        from linkgraph.ops import host_graph as _hostg

        def _hosts(t):
            ids = t.column("doc_id").to_numpy()
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "host": pa.array(
                        np.char.add("h", (ids % 1024).astype("U4"))
                    ),
                }
            )

        hosts_ds = ptext.select_columns(["doc_id"]).map_batches(
            _hosts, batch_format="pyarrow"
        )

        def _hr():
            hg = _hostg(edges, hosts_ds).materialize()
            return weighted_pagerank_dataset(
                hg, src_col="src_host", dst_col="dst_host",
                weight_col="n_links", iters=5,
            ).count()

        extra["hostrank_hosts"] = int(ste.run("hostrank", _hr))

        from linkgraph.algos import spanning_forest as _msf

        def _msf_run():
            forest, _, summ = _msf(edges)
            return forest.count(), summ["rounds"]

        msf_edges, msf_rounds = ste.run("msf_forest", _msf_run)
        extra["msf_forest_edges"] = int(msf_edges)
        extra["msf_rounds"] = int(msf_rounds)
    except Exception as ex:
        extra.setdefault("errors", []).append(f"r4-extras: {ex}")
    extra["extra_queries"] = {k: round(v, 3) for k, v in eq.items()}

    total = time.perf_counter() - t_all
    # host CPU-steal share over the run (32-vCPU KVM guest on a shared
    # host): steal_jiffies / (wall * 100 jiffies/s * ncpu). >0.05 means
    # the numbers are depressed by neighbor load, not by this engine.
    steal = _steal_counter() - steal0
    extra["host_steal_share"] = round(steal / (total * 100.0 * os.cpu_count()), 4)
    # value = sum of the recorded (best-attempt) stage times: the clean
    # pipeline total. Steal-gated retries inflate raw wall time, which
    # is reported separately as wall_sec_incl_retries.
    extra["wall_sec_incl_retries"] = round(total, 3)
    result = {
        "metric": "linkgraph_bench_total",
        "value": round(sum(q.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in q.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "num_parts": NUM_PARTS,
        **extra,
    }
    ray.shutdown()
    return result


def _stream_cc(q, extra, SuperstepEngine, CCProgram, rmat_dataset):
    n_batches, batch_edges = 4, 1_000_000
    batches = [
        rmat_dataset(batch_edges, scale=21, seed=1 + b).materialize()
        for b in range(n_batches)
    ]
    passes, rebuilds = [], []
    for _ in range(2):  # best-of-2 (first pass pays worker warmup)
        # provision outside the window: the reference's PEs are running
        # processes before any edge arrives (srun launch precedes the
        # measured insert loop) — the metric times ingest+reconvergence
        eng_st = SuperstepEngine(num_parts=NUM_PARTS, symmetrize=True).provision()
        t0 = time.perf_counter()
        eng_st.load_edges(batches[0], streaming=True)
        # pipeline: batch b+1 routes (actor-side buffered appends) while
        # batch b converges — the reference's async ingest overlap
        eng_st.prefetch_edges(batches[1])
        eng_st.run(CCProgram(), max_iters=100)
        rb = []
        for b in range(1, n_batches):
            eng_st.extend_edges()
            rb.append(round(eng_st.last_rebuild["max_actor_sec"], 4))
            if b + 1 < n_batches:
                eng_st.prefetch_edges(batches[b + 1])
            eng_st.run(CCProgram(), max_iters=100, warm_start=True)
        passes.append(time.perf_counter() - t0)
        rebuilds.append(rb)
        eng_st.shutdown()
    dt = min(passes)
    q["streaming_cc"] = dt
    extra["streaming_edge_inserts_per_sec"] = round(n_batches * batch_edges / dt, 1)
    extra["streaming_passes_sec"] = [round(p, 2) for p in passes]
    # O(batch) evidence: per-extend incremental-rebuild actor seconds while
    # the stored graph grows 2M -> 8M edges (flat == delta-cost rebuild)
    extra["streaming_rebuild_sec_by_graph_size"] = rebuilds[passes.index(dt)]


SCALE_EDGES = int(os.environ.get("GRAFT_SCALE_EDGES", str(96_000_000)))
SCALE_SCALE = int(os.environ.get("GRAFT_SCALE_VERTEX_BITS", "24"))


def run_scaling_child() -> dict:
    """One scaling measurement at RAY_GRAFT_CPUS: RMAT graph (power-law,
    reference tools/generate_graph.c parity), fixed P, PageRank 10
    supersteps + CC to convergence. Same deterministic input at every
    CPU count."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from linkgraph.algos.cc import CCProgram
    from linkgraph.algos.pagerank import PageRankProgram
    from linkgraph.engine import SuperstepEngine
    from linkgraph.synth import rmat_dataset

    out: dict = {"num_cpus": NUM_CPUS, "n_edges_requested": SCALE_EDGES}
    steal0 = _steal_counter()
    t_child = time.perf_counter()
    t0 = time.perf_counter()
    edges = rmat_dataset(SCALE_EDGES, scale=SCALE_SCALE).materialize()
    out["gen_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    eng = SuperstepEngine(num_parts=NUM_PARTS, dedup=False).load_edges(edges)
    out["load_sec"] = round(time.perf_counter() - t0, 3)
    out["n_edges"] = eng.n_edges
    del edges

    # warm-up pass (page faults / numa), then best of 3 measured passes
    # (the sandbox host has noisy neighbors; best-of-N isolates engine
    # capability from transient contention)
    eng.run(PageRankProgram(tol=0.0), max_iters=3, burst_size=3)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        s = eng.run(PageRankProgram(tol=0.0), max_iters=10, burst_size=10)
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, s["edges_per_sec"])
    out["pagerank_sec"] = round(best[0], 3)
    out["pagerank_edges_per_sec"] = round(best[1], 1)

    # single-precision shipping variant: halves the bytes/edge of the
    # hot value gather (allclose 1e-6 vs double, tests/test_engine2.py)
    # — directly attacks the DRAM wall that caps 8->32 efficiency
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        s = eng.run(
            PageRankProgram(tol=0.0, precision="single"), max_iters=10, burst_size=10
        )
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, s["edges_per_sec"])
    out["pagerank_f32_sec"] = round(best[0], 3)
    out["pagerank_f32_edges_per_sec"] = round(best[1], 1)
    eng.shutdown()

    eng2 = SuperstepEngine(num_parts=NUM_PARTS, symmetrize=True, dedup=False).load_edges(
        rmat_dataset(SCALE_EDGES // 4, scale=SCALE_SCALE).materialize()
    )
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        s_cc = eng2.run(CCProgram(), max_iters=100, burst_size=8)
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, s_cc["edges_per_sec"], s_cc["iterations"])
    out["cc_sec"] = round(best[0], 3)
    out["cc_edges_per_sec"] = round(best[1], 1)
    out["cc_iterations"] = best[2]
    eng2.shutdown()

    # extraction: the compute-bound half of the headline pipeline
    # (generation + regex + hashing per page; dedup=False so the
    # measurement is the pure map pipeline, no shuffle floor), best of 2
    from linkgraph import synth
    from linkgraph.edges import build_edges

    n_pages = 60_000
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        build_edges(
            synth.pages_dataset(n_pages, 64, parallelism=NUM_CPUS * 4), dedup=False
        ).count()
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
    out["extract_pages_per_sec"] = round(n_pages / best, 1)
    out["steal_jiffies"] = _steal_counter() - steal0
    out["wall_sec"] = round(time.perf_counter() - t_child, 3)
    out["steal_share"] = round(
        out["steal_jiffies"] / max(out["wall_sec"] * 100.0 * os.cpu_count(), 1e-9), 4
    )

    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same job, same input, fresh processes at 8 and 32 CPUs, identical
    partition count P — the sandbox stand-in for N vs 4N nodes.

    Steal gating (round-2 lesson: two attempts were corrupted by
    44k-59k stolen jiffies per child): an arm whose measurement window
    shows host CPU-steal share above GRAFT_SCALE_STEAL_SHARE is retried
    up to GRAFT_SCALE_ARM_RETRIES times. Record selection: the FASTEST
    attempt among those at or below the gate; if none qualify, the
    fastest among attempts within 1.5x of the lowest observed steal
    (round-3 lesson: picking the single lowest-steal attempt once
    selected an arm that was slow for non-steal reasons — frequency /
    thermal variance — and flattered the ratio). Every attempt's
    jiffies are reported so the selection is auditable."""
    max_retries = int(os.environ.get("GRAFT_SCALE_ARM_RETRIES", "2"))
    gate = float(os.environ.get("GRAFT_SCALE_STEAL_SHARE", "0.01"))
    out = {}
    attempts_log: dict[int, list] = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        arms = []
        for attempt in range(max_retries + 1):
            # taskset pins the whole child (driver + raylet + actors) to
            # ncpu hardware threads: a REAL quarter-size machine, not
            # just a Ray scheduler hint (partition actors are num_cpus=0
            # and would otherwise use every core at both settings)
            r = subprocess.run(
                [
                    "taskset", "-c", f"0-{ncpu - 1}",
                    sys.executable, os.path.abspath(__file__), "--scaling-child",
                ],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            arm = json.loads(r.stdout.strip().splitlines()[-1])
            attempts_log.setdefault(ncpu, []).append(
                {"steal_jiffies": arm.get("steal_jiffies"),
                 "steal_share": arm.get("steal_share"),
                 "pagerank_edges_per_sec": arm.get("pagerank_edges_per_sec")}
            )
            arms.append(arm)
            if arm.get("steal_share", 0.0) <= gate:
                break
        clean = [a for a in arms if a.get("steal_share", 0.0) <= gate]
        if not clean:
            lo = min(a.get("steal_share", 0.0) for a in arms)
            clean = [a for a in arms if a.get("steal_share", 0.0) <= lo * 1.5]
        out[ncpu] = max(clean, key=lambda a: a.get("pagerank_edges_per_sec", 0.0))
    tp8 = out[8]["pagerank_edges_per_sec"]
    tp32 = out[32]["pagerank_edges_per_sec"]
    eff = (tp32 / tp8) / (32 / 8)
    cc8, cc32 = out[8]["cc_edges_per_sec"], out[32]["cc_edges_per_sec"]
    ex8, ex32 = out[8]["extract_pages_per_sec"], out[32]["extract_pages_per_sec"]
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "pagerank_edges_per_sec_8": tp8,
        "pagerank_edges_per_sec_32": tp32,
        "cc_edges_per_sec_8": cc8,
        "cc_edges_per_sec_32": cc32,
        "cc_scaling_efficiency": round((cc32 / cc8) / 4.0, 3),
        "pagerank_f32_edges_per_sec_8": out[8]["pagerank_f32_edges_per_sec"],
        "pagerank_f32_edges_per_sec_32": out[32]["pagerank_f32_edges_per_sec"],
        "pagerank_f32_scaling_efficiency": round(
            (out[32]["pagerank_f32_edges_per_sec"] / out[8]["pagerank_f32_edges_per_sec"])
            / 4.0,
            3,
        ),
        "extract_pages_per_sec_8": ex8,
        "extract_pages_per_sec_32": ex32,
        "extract_scaling_efficiency": round((ex32 / ex8) / 4.0, 3),
        "pagerank_sec_8": out[8]["pagerank_sec"],
        "pagerank_sec_32": out[32]["pagerank_sec"],
        "num_parts": NUM_PARTS,
        "n_edges": out[32]["n_edges"],
        "steal_jiffies": {"8": out[8].get("steal_jiffies"), "32": out[32].get("steal_jiffies")},
        "steal_share": {"8": out[8].get("steal_share"), "32": out[32].get("steal_share")},
        "arm_attempts": {str(k): v for k, v in attempts_log.items()},
    }


def _kernel_control_worker(barrier, out, wid, iters):
    """One worker of the Ray-free kernel control: the engine's
    per-superstep inner kernel (per-destination-partition gather +
    reduceat, then dense accumulate) on synthetic arrays of the bench
    shape. No communication, no Ray — pure hardware."""
    import os

    import numpy as np

    os.sched_setaffinity(0, {wid % 32})
    rng = np.random.default_rng(wid)
    E, n_local, P = 3_000_000, 130_000, 32
    src_idx = rng.integers(0, n_local, E).astype(np.int32)
    seg_starts = [
        np.sort(rng.choice(E // P, size=int(E // P * 0.65), replace=False))
        for _ in range(P)
    ]
    vv = rng.random(n_local)
    bounds = np.linspace(0, E, P + 1).astype(np.int64)
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(iters):
        us = []
        for q in range(P):
            a, b = bounds[q], bounds[q + 1]
            us.append(np.add.reduceat(vv[src_idx[a:b]], seg_starts[q]))
        dense = np.zeros(n_local)
        for q in range(P):
            idx = np.arange(len(us[q]), dtype=np.int64) % n_local
            dense[idx] += us[q]
    out[wid] = time.perf_counter() - t0


def kernel_scaling_control(n_lo: int = 8, n_hi: int = 32) -> dict:
    """Hardware ceiling for the engine's kernel class on THIS box:
    identical total work (32 actor-kernels) spread over n_lo vs n_hi
    processes via plain multiprocessing. The engine's measured 8->32
    efficiency should be compared to this number, not to an ideal 1.0 —
    a single box shares one DRAM system across both widths, unlike real
    N vs 4N nodes."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    res = {}
    for nprocs in (n_lo, n_hi):
        iters = 6
        barrier = ctx.Barrier(nprocs)
        out = ctx.Array("d", nprocs)
        mult = max(32 // nprocs, 1)
        ps = [
            ctx.Process(target=_kernel_control_worker, args=(barrier, out, w, iters * mult))
            for w in range(nprocs)
        ]
        [p.start() for p in ps]
        [p.join() for p in ps]
        wall = max(out[:])
        res[nprocs] = 32 * iters * 3.0 / wall  # M edge-units/s
    eff = (res[n_hi] / res[n_lo]) / (n_hi / n_lo)
    return {
        f"kernel_Meps_{n_lo}": round(res[n_lo], 1),
        f"kernel_Meps_{n_hi}": round(res[n_hi], 1),
        "kernel_control_efficiency": round(eff, 3),
    }


def _set_ray_affinity(n_cpus: int) -> int:
    """Pin every process of this Ray session (driver, raylet, workers,
    actors) to hardware threads 0..n_cpus-1. Lets one session measure
    two cluster sizes on the SAME loaded graph, interleaved — which
    cancels the KVM host's time-varying CPU-steal noise that separate
    sequential child runs are hostage to."""
    import os

    cpus = set(range(n_cpus))
    me = os.getpid()
    n = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
            if pid == str(me) or "ray" in cmd.lower():
                os.sched_setaffinity(int(pid), cpus)
                n += 1
        except (OSError, ValueError):
            continue
    return n


def _steal_counter() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run_scaling_interleaved() -> dict:
    """Scaling evidence robust to host noise: load the RMAT graph once,
    then alternate the session's CPU affinity between 8 and 32 threads,
    running the identical PageRank / CC passes at each width several
    times; report the best pass per width + steal-time telemetry.
    Also runs the Ray-free kernel control first (hardware ceiling)."""
    n_lo = int(os.environ.get("GRAFT_SCALE_NLOW", "8"))
    n_hi = int(os.environ.get("GRAFT_SCALE_NHIGH", "32"))
    control = kernel_scaling_control(n_lo, n_hi)

    import ray

    ray.init(
        address="local",
        num_cpus=32,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from linkgraph.algos.cc import CCProgram
    from linkgraph.algos.pagerank import PageRankProgram
    from linkgraph.engine import SuperstepEngine
    from linkgraph.synth import rmat_dataset
    from linkgraph.edges import build_edges
    from linkgraph import synth

    edges = rmat_dataset(SCALE_EDGES, scale=SCALE_SCALE).materialize()
    eng = SuperstepEngine(num_parts=NUM_PARTS, dedup=False).load_edges(edges)
    n_edges = eng.n_edges
    # CC runs on the SAME input graph as PageRank (symmetrized store)
    sym = SuperstepEngine(num_parts=NUM_PARTS, symmetrize=True, dedup=False).load_edges(edges)
    del edges
    eng.run(PageRankProgram(tol=0.0), max_iters=3, burst_size=3)  # warm

    best: dict = {}
    steal: dict = {}
    rounds = int(os.environ.get("GRAFT_SCALE_ROUNDS", "3"))
    for _ in range(rounds):
        for ncpu in (n_lo, n_hi):
            _set_ray_affinity(ncpu)
            s0 = _steal_counter()
            t0 = time.perf_counter()
            s = eng.run(PageRankProgram(tol=0.0), max_iters=10, burst_size=10)
            pr_dt = time.perf_counter() - t0
            # single-precision shipping: halves bytes/edge of the hot
            # value gather (allclose 1e-6 vs double, tests/test_engine2.py)
            t0 = time.perf_counter()
            s32 = eng.run(
                PageRankProgram(tol=0.0, precision="single"),
                max_iters=10, burst_size=10,
            )
            pr32_dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            scc = sym.run(CCProgram(), max_iters=100, burst_size=8)
            cc_dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_ex_pages = 360_000  # big enough that per-task Dataset
            # overhead doesn't dominate either arm (compute-bound regex)
            build_edges(
                synth.pages_dataset(n_ex_pages, 64, parallelism=256), dedup=False
            ).count()
            ex_dt = time.perf_counter() - t0
            steal.setdefault(ncpu, []).append(_steal_counter() - s0)
            k = ("pr", ncpu)
            if k not in best or pr_dt < best[k][0]:
                best[k] = (pr_dt, s["edges_per_sec"])
            k = ("pr32", ncpu)
            if k not in best or pr32_dt < best[k][0]:
                best[k] = (pr32_dt, s32["edges_per_sec"])
            k = ("cc", ncpu)
            if k not in best or cc_dt < best[k][0]:
                best[k] = (cc_dt, scc["edges_per_sec"])
            k = ("ex", ncpu)
            if k not in best or ex_dt < best[k][0]:
                best[k] = (ex_dt, n_ex_pages / ex_dt)
    _set_ray_affinity(32)
    eng.shutdown()
    sym.shutdown()
    ratio = n_hi / n_lo
    tp8, tp32 = best[("pr", n_lo)][1], best[("pr", n_hi)][1]
    cc8, cc32 = best[("cc", n_lo)][1], best[("cc", n_hi)][1]
    ex8, ex32 = best[("ex", n_lo)][1], best[("ex", n_hi)][1]
    # eff_vs_control: the engine's measured efficiency relative to the
    # Ray-free kernel control from the SAME session — the share of the
    # hardware-allowed scaling the Ray layer delivers. On this box both
    # widths contend for ONE shared DRAM system (unlike real N vs 4N
    # nodes), so the control, not 1.0, is the attainable ceiling.
    ctrl = control["kernel_control_efficiency"]
    result = {
        "metric": f"scaling_efficiency_{n_lo}_to_{n_hi}",
        "value": round((tp32 / tp8) / ratio, 3),
        "unit": "ratio",
        "eff_vs_control": round((tp32 / tp8) / ratio / ctrl, 3),
        "cc_eff_vs_control": round((cc32 / cc8) / ratio / ctrl, 3),
        "pagerank_f32_eff_vs_control": round(
            (best[("pr32", n_hi)][1] / best[("pr32", n_lo)][1]) / ratio / ctrl, 3
        ),
        f"pagerank_edges_per_sec_{n_lo}": round(tp8, 1),
        f"pagerank_edges_per_sec_{n_hi}": round(tp32, 1),
        f"cc_edges_per_sec_{n_lo}": round(cc8, 1),
        f"cc_edges_per_sec_{n_hi}": round(cc32, 1),
        "cc_scaling_efficiency": round((cc32 / cc8) / ratio, 3),
        f"pagerank_f32_edges_per_sec_{n_lo}": round(best[("pr32", n_lo)][1], 1),
        f"pagerank_f32_edges_per_sec_{n_hi}": round(best[("pr32", n_hi)][1], 1),
        "pagerank_f32_scaling_efficiency": round(
            (best[("pr32", n_hi)][1] / best[("pr32", n_lo)][1]) / ratio, 3
        ),
        f"extract_pages_per_sec_{n_lo}": round(ex8, 1),
        f"extract_pages_per_sec_{n_hi}": round(ex32, 1),
        "extract_scaling_efficiency": round((ex32 / ex8) / ratio, 3),
        f"pagerank_sec_{n_lo}": round(best[("pr", n_lo)][0], 3),
        f"pagerank_sec_{n_hi}": round(best[("pr", n_hi)][0], 3),
        "host_steal_jiffies": {str(k): v for k, v in steal.items()},
        **control,
        "num_parts": NUM_PARTS,
        "n_edges": n_edges,
        "method": "one session, affinity alternated %d<->%d per round, best-of-%d"
        % (n_lo, n_hi, rounds),
    }
    ray.shutdown()
    return result


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        print(json.dumps(run_scaling_child()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling_interleaved()))
    elif "--scaling-subprocess" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        _res = run_bench()
        # Verbose record first (per-stage throughputs, steal telemetry,
        # extra_queries); then the headline contract as the FINAL stdout
        # line, kept compact so it survives a bounded tail capture of the
        # process output (the r4 artifact lost the long combined line).
        print(json.dumps(_res))
        print(json.dumps({
            k: _res[k]
            for k in ("metric", "value", "unit", "queries", "sf", "num_cpus")
            if k in _res
        }))
