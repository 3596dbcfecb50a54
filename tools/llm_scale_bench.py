"""sf1-scale evidence for the top-5 LLM-data ops (round-4 VERDICT
item 9): run quality_filter, lm_score, contamination, corpus_select
and dedup_clusters at 100k and 1M synthetic documents and report
per-op docs/s at both scales — near-linear stage scaling means docs/s
stays roughly flat as the corpus grows 10x.

The corpus is generated deterministically IN PARALLEL (map_batches
over a range, per-id splitmix token draws — no driver-side text
build): ~60-token docs over a 20k-word vocab, 2% of docs exact-
duplicating their predecessor (a controlled duplicate rate, so
dedup_clusters' candidate-pair work scales linearly like a real
corpus, instead of the quadratic blowup a naively replicated corpus
would inject).

Run: python tools/llm_scale_bench.py [--scales 100000 1000000]
Emits one JSON line per (op, n_docs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402
import ray.data  # noqa: E402


def synth_docs(n: int, doc_len: int = 60, vocab: int = 20000) -> "ray.data.Dataset":
    from linkgraph.hashing import splitmix64

    def gen(b) -> pa.Table:
        ids = b["id"].astype(np.int64)
        # 2% of docs duplicate their predecessor's text exactly
        src = np.where((ids % 50 == 1) & (ids > 0), ids - 1, ids)
        pos = (
            src[:, None].astype(np.uint64) * np.uint64(doc_len)
            + np.arange(doc_len, dtype=np.uint64)[None, :]
        )
        w = (splitmix64(pos) % np.uint64(vocab)).astype(np.int64)
        texts = [" ".join(f"w{x}" for x in row) for row in w]
        return pa.table(
            {"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}
        )

    return ray.data.range(n, override_num_blocks=max(n // 16384, 8)).map_batches(
        gen, batch_format="numpy", batch_size=16384
    )


_DIGITS2ALPHA = str.maketrans("0123456789", "abcdefghij")


def _bpe_on_letterized(docs, n: int) -> int:
    """BPE over the corpus with token digits mapped to letters
    ('w123' -> 'wbcd'), since [a-z]+ runs are the trainer's word
    domain; the translate is a vectorized per-batch view, not a copy
    of the corpus on the driver."""
    import pandas as pd

    from linkgraph.ops.bpe import bpe_learn

    def letterize(t: pa.Table) -> pa.Table:
        s = pd.Series(t.column("text").to_pylist()).str.translate(_DIGITS2ALPHA)
        return pa.table({"text": pa.array(s.tolist(), pa.string())})

    return len(bpe_learn(docs.map_batches(letterize, batch_format="pyarrow"), 3))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[100_000, 1_000_000])
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from linkgraph.ops.corpus import corpus_select
    from linkgraph.ops.dedup import dedup_clusters
    from linkgraph.ops.dsir import dsir_weights
    from linkgraph.ops.lm import lm3_score, lm_score
    from linkgraph.ops.text import ngram_contamination, quality_filter

    for n in args.scales:
        docs = synth_docs(n).materialize()
        # alternating pseudo-language column for dsir (target = 'en')
        docs_l = docs.map_batches(
            lambda t: t.append_column(
                "lang",
                pa.array(
                    np.where(
                        t.column("doc_id").to_numpy() % 3 == 0, "en", "xx"
                    )
                ),
            ),
            batch_format="pyarrow",
        )
        ranks = ray.data.range(n).map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array(b["id"].astype(np.int64)),
                    "pr_rank": pa.array(np.full(len(b["id"]), 1.0 / n)),
                }
            ),
            batch_format="numpy",
        )
        ops = {
            "quality_filter": lambda: quality_filter(docs).count(),
            "lm_score": lambda: lm_score(docs).count(),
            "contamination": lambda: ngram_contamination(docs, n=3, bench_mod=97).count(),
            "corpus_select": lambda: corpus_select(docs, ranks).count(),
            "dedup_clusters": lambda: dedup_clusters(docs, k=3, threshold=0.7).count(),
            "bpe_merges_3": lambda: _bpe_on_letterized(docs, n),
            "lm3_score": lambda: lm3_score(docs).count(),
            "dsir_weights": lambda: dsir_weights(docs_l).count(),
        }
        for name, fn in ops.items():
            t0 = time.perf_counter()
            rows = fn()
            dt = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "op": name,
                        "n_docs": n,
                        "sec": round(dt, 2),
                        "docs_per_sec": round(n / dt),
                        "rows": rows,
                    }
                ),
                flush=True,
            )
    ray.shutdown()


if __name__ == "__main__":
    main()
