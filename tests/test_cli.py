"""End-to-end CLI smoke (the `ray job submit` surface): synth pages ->
build edges -> pagerank -> cc through subprocesses, manifest-checked,
rerun-safe."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "linkgraph", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    pages = str(tmp_path / "pages")
    edges = str(tmp_path / "edges")
    ranks = str(tmp_path / "ranks")
    labels = str(tmp_path / "labels")

    run_cli("synth-pages", "--n", "500", "--out", pages, "--num-cpus", "4")
    assert json.load(open(os.path.join(pages, "MANIFEST.json")))["complete"]

    run_cli("build-edges", "--pages", os.path.join(pages, "data"), "--out", edges, "--num-cpus", "4")
    m = json.load(open(os.path.join(edges, "MANIFEST.json")))
    assert m["complete"] and m["columns"] == ["src", "dst"] and m["rows"] > 500

    out = run_cli(
        "pagerank", "--edges", os.path.join(edges, "data"), "--out", ranks,
        "--parts", "4", "--num-cpus", "4",
    )
    assert out["converged"]
    t = pq.read_table(os.path.join(ranks, "data"))
    assert abs(sum(t.column("rank").to_pylist()) - 1.0) < 1e-6

    out = run_cli(
        "cc", "--edges", os.path.join(edges, "data"), "--out", labels,
        "--parts", "4", "--num-cpus", "4",
    )
    assert out["iterations"] >= 1

    # rerun skips completed output (manifest)
    before = os.path.getmtime(os.path.join(ranks, "MANIFEST.json"))
    run_cli(
        "pagerank", "--edges", os.path.join(edges, "data"), "--out", ranks,
        "--parts", "4", "--num-cpus", "4",
    )
    assert os.path.getmtime(os.path.join(ranks, "MANIFEST.json")) == before


@pytest.mark.slow
def test_cli_round4_continuation_ops(tmp_path):
    """katz / anchors / lm-score / para-dedup / spam-mass subcommands
    over a tiny synthetic corpus."""
    pages = str(tmp_path / "pages")
    edges = str(tmp_path / "edges")

    run_cli("synth-pages", "--n", "400", "--out", pages, "--num-cpus", "4")
    run_cli("build-edges", "--pages", os.path.join(pages, "data"), "--out", edges, "--num-cpus", "4")

    kdir = str(tmp_path / "katz")
    out = run_cli(
        "katz", "--edges", os.path.join(edges, "data"), "--out", kdir,
        "--parts", "4", "--num-cpus", "4",
    )
    assert out["iters"] == 4
    t = pq.read_table(os.path.join(kdir, "data"))
    assert t.num_rows > 0 and min(t.column("katz").to_pylist()) >= 1.0

    adir = str(tmp_path / "anchors")
    run_cli(
        "anchors", "--pages", os.path.join(pages, "data"), "--out", adir,
        "--num-cpus", "4",
    )
    t = pq.read_table(os.path.join(adir, "data"))
    assert t.num_rows > 0 and max(t.column("term_rank").to_pylist()) <= 3

    # docs table for the text ops: (doc_id, text) derived from pages
    import pyarrow as pa
    import pyarrow.parquet as pqw

    pt = pq.read_table(os.path.join(pages, "data"))
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    pqw.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(pt.num_rows), pa.int64()),
                "text": pt.column("text"),
            }
        ),
        str(docs_dir / "docs.parquet"),
    )

    lmdir = str(tmp_path / "lm")
    run_cli("lm-score", "--docs", str(docs_dir), "--out", lmdir, "--num-cpus", "4")
    t = pq.read_table(os.path.join(lmdir, "data"))
    assert t.num_rows == pt.num_rows

    pdir = str(tmp_path / "pd")
    run_cli(
        "para-dedup", "--docs", str(docs_dir), "--out", pdir,
        "--chunk-tokens", "8", "--num-cpus", "4",
    )
    t = pq.read_table(os.path.join(pdir, "data"))
    assert t.num_rows == pt.num_rows

    # seeds = first 20 vertices of the edge table
    et = pq.read_table(os.path.join(edges, "data"))
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    pqw.write_table(
        pa.table({"v": pa.array(sorted(set(et.column("src").to_pylist()))[:20], pa.int64())}),
        str(seeds_dir / "seeds.parquet"),
    )
    smdir = str(tmp_path / "sm")
    run_cli(
        "spam-mass", "--edges", os.path.join(edges, "data"), "--seeds", str(seeds_dir),
        "--out", smdir, "--parts", "4", "--num-cpus", "4",
    )
    t = pq.read_table(os.path.join(smdir, "data"))
    assert t.num_rows > 0
    sm = t.column("spam_mass").to_pylist()
    # spam mass <= 1 always; NEGATIVE is legitimate for trusted pages
    # (trust rank can exceed plain PageRank near the seeds)
    import math

    assert all(math.isfinite(x) and x <= 1.0 + 1e-9 for x in sm)
    assert any(x > 0.5 for x in sm)  # far-from-seed pages carry spam mass


@pytest.mark.slow
def test_cli_clustering_and_quality_ops(tmp_path):
    """quality-filter / kmeans / semdedup subcommands over tiny inputs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pqw

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    good = (
        "The quick brown fox jumps over the lazy dog and it runs far away "
        "to the green hills where a small river flows by an old stone mill "
        "and this is that place for everyone to visit on a warm day in June"
    )
    pqw.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([good, "tiny doc"]),
            }
        ),
        str(docs_dir / "docs.parquet"),
    )
    qdir = str(tmp_path / "qf")
    run_cli("quality-filter", "--docs", str(docs_dir), "--out", qdir, "--num-cpus", "4")
    t = pq.read_table(os.path.join(qdir, "data"))
    by_id = dict(zip(t.column("doc_id").to_pylist(), t.column("keep").to_pylist()))
    assert by_id == {0: 1, 1: 0}

    emb_dir = tmp_path / "emb"
    emb_dir.mkdir()
    rng = np.random.default_rng(5)
    M = rng.normal(size=(60, 8)).astype(np.float32)
    M[1] = M[0] + 1e-4  # planted near-dup
    pqw.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(60), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(M.reshape(-1)), 8
                ),
            }
        ),
        str(emb_dir / "emb.parquet"),
    )
    kdir = str(tmp_path / "km")
    out = run_cli(
        "kmeans", "--embeddings", str(emb_dir), "--out", kdir,
        "--k", "4", "--iters", "2", "--num-cpus", "4",
    )
    assert out["k"] == 4
    t = pq.read_table(os.path.join(kdir, "data"))
    assert t.num_rows == 60 and set(t.column("cluster").to_pylist()) <= set(range(4))

    sdir = str(tmp_path / "sd")
    run_cli(
        "semdedup", "--embeddings", str(emb_dir), "--out", sdir,
        "--k", "4", "--iters", "2", "--threshold", "0.99", "--num-cpus", "4",
    )
    t = pq.read_table(os.path.join(sdir, "data"))
    pairs = set(zip(t.column("a").to_pylist(), t.column("b").to_pylist()))
    assert (0, 1) in pairs


@pytest.mark.slow
def test_cli_walks(tmp_path):
    """walks subcommand: uniform and node2vec paths over a tiny graph."""
    import pyarrow as pa
    import pyarrow.parquet as pqw

    edges_dir = tmp_path / "edges"
    edges_dir.mkdir()
    und = [(i, (i + 1) % 12) for i in range(12)] + [(i, (i + 3) % 12) for i in range(12)]
    pairs = sorted(set(und) | {(b, a) for a, b in und})
    pqw.write_table(
        pa.table(
            {
                "src": pa.array([a for a, _ in pairs], pa.int64()),
                "dst": pa.array([b for _, b in pairs], pa.int64()),
            }
        ),
        str(edges_dir / "edges.parquet"),
    )
    wdir = str(tmp_path / "w")
    out = run_cli(
        "walks", "--edges", str(edges_dir), "--out", wdir,
        "--walk-len", "5", "--parts", "3", "--num-cpus", "4",
    )
    assert out["biased"] is False
    t = pq.read_table(os.path.join(wdir, "data"))
    assert t.num_rows == 12 and all(len(p) == 6 for p in t.column("path").to_pylist())

    ndir = str(tmp_path / "n2v")
    out = run_cli(
        "walks", "--edges", str(edges_dir), "--out", ndir,
        "--walk-len", "5", "--p", "0.5", "--q", "2", "--parts", "3", "--num-cpus", "4",
    )
    assert out["biased"] is True
    t = pq.read_table(os.path.join(ndir, "data"))
    assert t.num_rows == 12 and all(len(p) == 6 for p in t.column("path").to_pylist())


@pytest.mark.slow
def test_cli_corpus_prep_ops(tmp_path):
    """pii-scrub / pack / split subcommands over a tiny corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pqw

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    pqw.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "mail a@b.io or dial 555-123-4567",
                        "three plain words here",
                        "host 10.0.0.1 up",
                    ]
                ),
                "source": pa.array(["s0", "s0", "s1"]),
            }
        ),
        str(docs_dir / "docs.parquet"),
    )

    pdir = str(tmp_path / "pii")
    run_cli("pii-scrub", "--docs", str(docs_dir), "--out", pdir, "--num-cpus", "4")
    t = pq.read_table(os.path.join(pdir, "data"))
    by_id = dict(zip(t.column("doc_id").to_pylist(), t.column("clean_text").to_pylist()))
    assert "<EMAIL>" in by_id[0] and "<PHONE>" in by_id[0]
    assert by_id[1] == "three plain words here"
    assert "<IP>" in by_id[2]

    kdir = str(tmp_path / "pk")
    run_cli(
        "pack", "--docs", str(docs_dir), "--out", kdir,
        "--capacity", "5", "--num-cpus", "4",
    )
    t = pq.read_table(os.path.join(kdir, "data"))
    rows = {
        d: (b, n)
        for d, b, n in zip(
            t.column("doc_id").to_pylist(),
            t.column("bin_id").to_pylist(),
            t.column("n_tokens").to_pylist(),
        )
    }
    # s0: doc0 has 9 tokens (oversize -> own bin 0), doc1 has 4 -> bin 1
    assert rows[0] == (0, 9) and rows[1] == (1, 4)
    assert rows[2][0] == 0  # s1's only doc opens bin 0

    sdir = str(tmp_path / "sp")
    run_cli("split", "--docs", str(docs_dir), "--out", sdir, "--num-cpus", "4")
    t = pq.read_table(os.path.join(sdir, "data"))
    assert set(t.column("split").to_pylist()) <= {"train", "val", "test"}
    assert t.num_rows == 3


@pytest.mark.slow
def test_cli_chunk(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pqw

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    pqw.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"]),
            }
        ),
        str(docs_dir / "docs.parquet"),
    )
    cdir = str(tmp_path / "ck")
    run_cli(
        "chunk", "--docs", str(docs_dir), "--out", cdir,
        "--chunk-tokens", "4", "--stride", "3", "--num-cpus", "4",
    )
    t = pq.read_table(os.path.join(cdir, "data"))
    assert t.num_rows == 3
    assert sorted(t.column("start_tok").to_pylist()) == [0, 3, 6]
