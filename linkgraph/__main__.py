"""CLI entry point — the `ray job submit` surface of the engine:

    python -m linkgraph build-edges --pages pages_dir --out edges_dir
    python -m linkgraph pagerank    --edges edges_dir --out ranks_dir \\
        [--checkpoint ck_dir --resume] [--tol 1e-8] [--parts 32]
    python -m linkgraph cc          --edges edges_dir --out labels_dir ...
    python -m linkgraph labelprop   --edges edges_dir --out labels_dir ...
    python -m linkgraph triangles   --edges edges_dir
    python -m linkgraph scc         --edges edges_dir --out scc_dir
    python -m linkgraph sssp        --edges edges_dir --source 0 --out d_dir
    python -m linkgraph hits        --edges edges_dir --iters 5 --out h_dir
    python -m linkgraph mis         --edges edges_dir --out mis_dir
    python -m linkgraph coloring    --edges edges_dir --out col_dir
    python -m linkgraph bowtie      --edges edges_dir --out bt_dir
    python -m linkgraph redirects   --pointers ptr_dir --out final_dir
    python -m linkgraph katz        --edges edges_dir --out k_dir
    python -m linkgraph spam-mass   --edges edges_dir --seeds seeds_dir --out sm_dir
    python -m linkgraph anchors     --pages pages_dir --out idx_dir
    python -m linkgraph lm-score    --docs docs_dir --out lm_dir
    python -m linkgraph para-dedup  --docs docs_dir --out pd_dir
    python -m linkgraph quality-filter --docs docs_dir --out qf_dir
    python -m linkgraph walks       --edges edges_dir --walk-len 10 [--p 0.5 --q 2] --out w_dir
    python -m linkgraph kmeans      --embeddings emb_dir --k 64 --out km_dir
    python -m linkgraph semdedup    --embeddings emb_dir --k 64 --threshold 0.9 --out sd_dir
    python -m linkgraph synth-pages --n 100000 --out pages_dir

Owns its Ray session (guarded init), writes partitioned parquet +
MANIFEST via linkgraph.sources.write_partitioned.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="linkgraph")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, edges=True):
        if edges:
            p.add_argument("--edges", required=True)
        p.add_argument("--out", default=None)
        p.add_argument("--parts", type=int, default=32)
        p.add_argument("--checkpoint", default=None)
        p.add_argument("--resume", action="store_true")
        p.add_argument("--max-iters", type=int, default=100)
        p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("build-edges")
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument(
        "--format", choices=("parquet", "warc"), default="parquet",
        help="'warc' ingests Common-Crawl-style WARC file(s)/dir",
    )
    p.add_argument(
        "--canonicalize",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="RFC 3986 url canonicalization before hashing "
        "(default: ON for --format warc — real crawl urls need ../ and "
        "case/port normalization — OFF for parquet corpora, which are "
        "already canonical; --no-canonicalize forces it off)",
    )
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("synth-pages")
    p.add_argument("--n", type=int, required=True)
    p.add_argument("--sites", type=int, default=64)
    p.add_argument("--out", required=True)
    p.add_argument("--num-cpus", type=int, default=None)

    for name in ("pagerank", "cc", "labelprop"):
        sp = sub.add_parser(name)
        common(sp)
        if name in ("pagerank", "cc"):
            sp.add_argument(
                "--node-groups", type=int, default=None,
                help="two-level node-topology exchange: one relay per "
                "contiguous partition group (bit-exact vs flat; see "
                "BASELINE.md)",
            )
        if name == "pagerank":
            sp.add_argument("--tol", type=float, default=1e-8)
            sp.add_argument("--damping", type=float, default=0.85)
            sp.add_argument(
                "--staleness", type=int, default=0,
                help="bounded-staleness message application (async "
                "slack; 0 = BSP, the default)",
            )
    p = sub.add_parser("triangles")
    common(p)

    p = sub.add_parser("scc")
    common(p)

    p = sub.add_parser("sssp")
    common(p)
    p.add_argument("--source", type=int, required=True)

    p = sub.add_parser("hits")
    common(p)
    p.add_argument("--iters", type=int, default=5)

    p = sub.add_parser("betweenness")
    common(p)
    p.add_argument("--k-sources", type=int, default=4)
    p.add_argument("--normalize", action="store_true")

    p = sub.add_parser("mis")
    common(p)

    p = sub.add_parser("matching")
    common(p)

    p = sub.add_parser("msf")
    common(p)

    p = sub.add_parser("coloring")
    common(p)

    p = sub.add_parser("bowtie")
    common(p)

    p = sub.add_parser("redirects")
    p.add_argument("--pointers", required=True, help="parquet dir of (v, p) rows")
    p.add_argument("--out", default=None)
    p.add_argument("--max-hops", type=int, default=32)
    p.add_argument("--parts", type=int, default=None)
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("katz")
    common(p)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--alpha", type=float, default=0.05)

    p = sub.add_parser("spam-mass")
    common(p)
    p.add_argument("--seeds", required=True, help="parquet dir of (v) trusted ids")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--damping", type=float, default=0.85)

    p = sub.add_parser("anchors")
    p.add_argument("--pages", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--num-cpus", type=int, default=None)

    for name in (
        "lm-score", "para-dedup", "quality-filter", "pii-scrub", "pack", "split", "chunk"
    ):
        sp = sub.add_parser(name)
        sp.add_argument("--docs", required=True, help="parquet dir of (doc_id, text)")
        sp.add_argument("--out", default=None)
        sp.add_argument("--num-cpus", type=int, default=None)
        if name == "para-dedup":
            sp.add_argument("--chunk-tokens", type=int, default=16)
        if name == "pack":
            sp.add_argument("--capacity", type=int, default=512)
            sp.add_argument("--group-col", default="source")
        if name == "chunk":
            sp.add_argument("--chunk-tokens", type=int, default=64)
            sp.add_argument("--stride", type=int, default=48)

    p = sub.add_parser("walks")
    p.add_argument("--edges", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--walk-len", type=int, default=10)
    p.add_argument("--n-per-vertex", type=int, default=1)
    p.add_argument("--p", type=float, default=None, help="node2vec return param")
    p.add_argument("--q", type=float, default=None, help="node2vec in-out param")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--parts", type=int, default=32)
    p.add_argument("--num-cpus", type=int, default=None)

    for name in ("kmeans", "semdedup"):
        sp = sub.add_parser(name)
        sp.add_argument(
            "--embeddings", required=True, help="parquet dir of (vec_id, embedding)"
        )
        sp.add_argument("--out", default=None)
        sp.add_argument("--k", type=int, default=64)
        sp.add_argument("--iters", type=int, default=4)
        sp.add_argument("--num-cpus", type=int, default=None)
        if name == "semdedup":
            sp.add_argument("--threshold", type=float, default=0.9)

    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        from .hostmem import tune_worker_malloc

        tune_worker_malloc()
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", **kw)
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from .sources import read_edges, read_pages, write_partitioned

    try:
        if args.cmd == "redirects":
            import ray.data

            from .ops.redirects import resolve_pointers

            ptrs = ray.data.read_parquet(args.pointers, columns=["v", "p"])
            res = resolve_pointers(
                ptrs, max_hops=args.max_hops, num_partitions=args.parts
            )
            if args.out:
                out = write_partitioned(res, args.out, tag="redirects")
            else:
                out = None
                res = res.materialize()
            print(json.dumps({"out": out, "max_hops": args.max_hops}))
            return 0

        if args.cmd == "anchors":
            import ray.data

            from .ops.anchors import anchor_index_pages

            res = anchor_index_pages(
                read_pages(args.pages, columns=["url", "html"]), k=args.k
            )
            if args.out:
                out = write_partitioned(res, args.out, tag="anchors")
            else:
                out = None
                res = res.materialize()
            print(json.dumps({"out": out, "k": args.k}))
            return 0

        if args.cmd in (
            "lm-score", "para-dedup", "quality-filter", "pii-scrub", "pack", "split",
            "chunk",
        ):
            import ray.data

            cols = ["doc_id", "text"]
            if args.cmd == "pack":
                cols = ["doc_id", "text", args.group_col]
            elif args.cmd == "split":
                cols = ["doc_id"]
            docs = ray.data.read_parquet(args.docs, columns=cols)
            if args.cmd == "chunk":
                from .ops.packing import chunk_documents

                res = chunk_documents(
                    docs, chunk_tokens=args.chunk_tokens, stride=args.stride
                )
                tag = "chunks"
            elif args.cmd == "pii-scrub":
                from .ops.pii import pii_scrub

                res, tag = pii_scrub(docs), "pii_scrub"
            elif args.cmd == "pack":
                from .ops.packing import pack_sequences

                res = pack_sequences(
                    docs, capacity=args.capacity, group_col=args.group_col
                )
                tag = "pack"
            elif args.cmd == "split":
                from .ops.packing import hash_split

                res, tag = hash_split(docs), "split"
            elif args.cmd == "lm-score":
                from .ops.lm import lm_score

                res = lm_score(docs)
                tag = "lm_score"
            elif args.cmd == "para-dedup":
                from .ops.paradedup import para_dedup_stats

                res = para_dedup_stats(docs, chunk_tokens=args.chunk_tokens)
                tag = "para_dedup"
            else:
                from .ops.text import quality_filter

                res = quality_filter(docs)
                tag = "quality_filter"
            if args.out:
                out = write_partitioned(res, args.out, tag=tag)
            else:
                out = None
                res = res.materialize()
            print(json.dumps({"out": out}))
            return 0

        if args.cmd == "walks":
            from .algos.walks import assemble_walks, node2vec_walks, random_walks
            from .engine import SuperstepEngine

            biased = args.p is not None or args.q is not None
            eng = SuperstepEngine(num_parts=args.parts, symmetrize=biased).load_edges(
                read_edges(args.edges)
            )
            if biased:
                visits = node2vec_walks(
                    eng,
                    walk_len=args.walk_len,
                    n_per_vertex=args.n_per_vertex,
                    p=args.p if args.p is not None else 1.0,
                    q=args.q if args.q is not None else 1.0,
                    seed=args.seed,
                )
            else:
                visits = random_walks(
                    eng,
                    walk_len=args.walk_len,
                    n_per_vertex=args.n_per_vertex,
                    seed=args.seed,
                )
            paths = assemble_walks(visits)
            if args.out:
                out = write_partitioned(paths, args.out, tag="walks")
            else:
                out = None
                paths = paths.materialize()
            eng.shutdown()
            print(json.dumps({"out": out, "biased": biased}))
            return 0

        if args.cmd in ("kmeans", "semdedup"):
            import ray.data

            emb = ray.data.read_parquet(
                args.embeddings, columns=["vec_id", "embedding"]
            )
            if args.cmd == "kmeans":
                from .ops.clustering import kmeans_assign

                res = kmeans_assign(emb, k=args.k, iters=args.iters)
                tag = "kmeans"
            else:
                from .ops.clustering import semdedup_pairs

                res = semdedup_pairs(
                    emb, k=args.k, iters=args.iters, threshold=args.threshold
                )
                tag = "semdedup"
            if args.out:
                out = write_partitioned(res, args.out, tag=tag)
            else:
                out = None
                res = res.materialize()
            print(json.dumps({"out": out, "k": args.k, "iters": args.iters}))
            return 0

        if args.cmd == "synth-pages":
            from .synth import pages_dataset

            out = write_partitioned(
                pages_dataset(args.n, args.sites), args.out, tag="pages"
            )
            print(json.dumps({"out": out, "n_pages": args.n}))
            return 0

        if args.cmd == "build-edges":
            from .edges import build_edges

            if args.format == "warc":
                from .sources import read_warc

                pages = read_warc(args.pages)
            else:
                pages = read_pages(args.pages, columns=["url", "html"])
            canon = (
                args.canonicalize
                if args.canonicalize is not None
                else args.format == "warc"
            )
            edges = build_edges(pages, canonicalize=canon)
            out = write_partitioned(edges, args.out, tag="edges")
            print(json.dumps({"out": out}))
            return 0

        edges = read_edges(args.edges)
        if args.cmd == "pagerank":
            from .algos import pagerank

            res, summary, eng = pagerank(
                edges,
                num_parts=args.parts,
                damping=args.damping,
                tol=args.tol,
                max_iters=args.max_iters,
                checkpoint_dir=args.checkpoint,
                resume=args.resume,
                node_groups=args.node_groups,
                staleness=args.staleness,
            )
            if args.out:
                write_partitioned(res, args.out, tag="pagerank")
            eng.shutdown()
            print(json.dumps({"out": args.out, **{k: summary[k] for k in ("iterations", "converged", "edges_per_sec")}}))
        elif args.cmd == "cc":
            from .algos import connected_components

            res, summary, eng = connected_components(
                edges,
                num_parts=args.parts,
                max_iters=args.max_iters,
                checkpoint_dir=args.checkpoint,
                resume=args.resume,
                node_groups=args.node_groups,
            )
            if args.out:
                write_partitioned(res, args.out, tag="cc")
            eng.shutdown()
            print(json.dumps({"out": args.out, "iterations": summary["iterations"]}))
        elif args.cmd == "labelprop":
            from .algos import label_propagation

            res, summary, eng = label_propagation(
                edges,
                num_parts=args.parts,
                max_iters=min(args.max_iters, 20),
                checkpoint_dir=args.checkpoint,
                resume=args.resume,
            )
            if args.out:
                write_partitioned(res, args.out, tag="labelprop")
            eng.shutdown()
            print(json.dumps({"out": args.out, "iterations": summary["iterations"]}))
        elif args.cmd == "triangles":
            from .algos import triangle_count

            print(json.dumps({"n_triangles": triangle_count(edges)}))
        elif args.cmd == "scc":
            from .algos import strongly_connected_components

            res, summary = strongly_connected_components(
                edges, num_parts=args.parts, max_iters=args.max_iters
            )
            if args.out:
                write_partitioned(res, args.out, tag="scc")
            print(json.dumps({"out": args.out, "rounds": summary["rounds"]}))
        elif args.cmd == "sssp":
            from .algos import sssp_weighted

            res, summary, eng = sssp_weighted(
                edges, args.source, num_parts=args.parts, max_iters=args.max_iters
            )
            if args.out:
                write_partitioned(res, args.out, tag="sssp")
            eng.shutdown()
            print(json.dumps({"out": args.out, "iterations": summary["iterations"]}))
        elif args.cmd == "betweenness":
            from .algos import betweenness

            res, summary, eng = betweenness(
                edges,
                k_sources=args.k_sources,
                num_parts=args.parts,
                normalize=args.normalize,
            )
            if args.out:
                write_partitioned(res, args.out, tag="betweenness")
            eng.shutdown()
            print(
                json.dumps({"out": args.out, "iterations": summary["iterations"]})
            )
        elif args.cmd == "mis":
            from .algos import maximal_independent_set

            res, summary = maximal_independent_set(
                edges, num_parts=args.parts, max_iters=args.max_iters
            )
            if args.out:
                write_partitioned(res, args.out, tag="mis")
            print(json.dumps({"out": args.out, "rounds": summary["rounds"]}))
        elif args.cmd == "matching":
            from .algos import maximal_matching

            res, summary = maximal_matching(
                edges, num_parts=args.parts, max_iters=args.max_iters
            )
            if args.out:
                write_partitioned(res, args.out, tag="matching")
            print(json.dumps({"out": args.out, "rounds": summary["rounds"]}))
        elif args.cmd == "msf":
            from .algos import spanning_forest

            forest, _, summary = spanning_forest(edges, num_partitions=args.parts)
            if args.out:
                write_partitioned(forest, args.out, tag="msf")
            print(json.dumps({"out": args.out, "rounds": summary["rounds"]}))
        elif args.cmd == "coloring":
            from .algos import greedy_coloring

            res, summary = greedy_coloring(
                edges, num_parts=args.parts, max_iters=max(args.max_iters, 400)
            )
            if args.out:
                write_partitioned(res, args.out, tag="coloring")
            print(json.dumps({"out": args.out, "colors": summary["colors"]}))
        elif args.cmd == "bowtie":
            from .algos import bowtie

            res, summary = bowtie(edges, num_parts=args.parts, max_iters=args.max_iters)
            if args.out:
                write_partitioned(res, args.out, tag="bowtie")
            print(json.dumps({"out": args.out, "core": summary["core"]}))
        elif args.cmd == "hits":
            from .algos import hits_dataset

            res = hits_dataset(edges, iters=args.iters)
            if args.out:
                write_partitioned(res, args.out, tag="hits")
            else:
                res = res.materialize()
            print(json.dumps({"out": args.out, "iters": args.iters}))
        elif args.cmd == "katz":
            from .algos import katz_dataset

            res = katz_dataset(edges, iters=args.iters, alpha=args.alpha)
            if args.out:
                write_partitioned(res, args.out, tag="katz")
            else:
                res = res.materialize()
            print(json.dumps({"out": args.out, "iters": args.iters, "alpha": args.alpha}))
        elif args.cmd == "spam-mass":
            import ray.data

            from .algos import spam_mass

            seeds = ray.data.read_parquet(args.seeds, columns=["v"])
            res = spam_mass(
                edges, seeds, iters=args.iters, damping=args.damping,
                num_partitions=args.parts,
            )
            if args.out:
                write_partitioned(res, args.out, tag="spam_mass")
            else:
                res = res.materialize()
            print(json.dumps({"out": args.out, "iters": args.iters}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
