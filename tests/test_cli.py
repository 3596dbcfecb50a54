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
