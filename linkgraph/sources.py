"""Sources and sinks (SURVEY.md §2.6).

Readers are thin wrappers over Ray Data with column pruning; the sink
writes partitioned Parquet with an atomic MANIFEST so a rerun can skip
completed outputs — the batch meaning of "resumable" (the reference's
per-PE shard files + trace dumps, test/update_rates.cpp:137-160,
src/hoover.cpp:3577-3645).
"""

from __future__ import annotations

import json
import os

from ray.data import Dataset


def _resolve_dir(path: str) -> str:
    """A directory written by ``write_partitioned`` holds MANIFEST.json
    + data/; point parquet readers at the data/ subdir so the manifest
    doesn't trip them up."""
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "MANIFEST.json")):
        data = os.path.join(path, "data")
        if os.path.isdir(data):
            return data
    return path


def read_edges(path: str, src_col: str = "src", dst_col: str = "dst") -> Dataset:
    """Edge table from parquet/csv/json, pruned to the two id columns."""
    import ray.data

    if path.endswith(".mtx"):
        return read_matrix_market(path)
    if path.endswith(".csv"):
        ds = ray.data.read_csv(path)
    elif path.endswith(".json") or path.endswith(".jsonl"):
        ds = ray.data.read_json(path)
    else:
        return ray.data.read_parquet(_resolve_dir(path), columns=[src_col, dst_col])
    return ds.select_columns([src_col, dst_col])


def read_pages(path: str, columns: list[str] | None = None) -> Dataset:
    import ray.data

    return ray.data.read_parquet(_resolve_dir(path), columns=columns)


def read_matrix_market(path: str, symmetrize_symmetric: bool = True) -> Dataset:
    """Matrix-market coordinate file -> (src, dst) int64 edge Dataset
    (reference ingest: test/market_to_binary.c + test/mmio; used for the
    LAW / SNAP graphs replayed by update_rates, test/update_rates.cpp:11-16).

    The header (%% banner, % comments, dimension line) is parsed on the
    driver; the body is read distributed via ``read_text`` with the
    dimension line dropped by exact match. 1-based indices become
    0-based. ``symmetrize_symmetric`` mirrors entries of files declared
    ``symmetric`` (off-diagonal only), matching the usual adjacency
    interpretation."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    with open(path) as f:
        banner = f.readline()
        if not banner.startswith("%%MatrixMarket"):
            raise ValueError(f"not a MatrixMarket file: {path}")
        parts = banner.split()
        symmetric = len(parts) >= 5 and parts[4].lower() == "symmetric"
        dims_line = None
        for line in f:
            if not line.startswith("%"):
                dims_line = line.strip()
                break
    if dims_line is None:
        raise ValueError(f"no dimension line in {path}")
    mirror = symmetric and symmetrize_symmetric

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        srcs, dsts = [], []
        for ln in lines:
            ln = ln.strip()
            if not ln or ln.startswith("%") or ln == dims_line:
                continue
            toks = ln.split()
            i, j = int(toks[0]) - 1, int(toks[1]) - 1
            srcs.append(i)
            dsts.append(j)
            if mirror and i != j:
                srcs.append(j)
                dsts.append(i)
        return pa.table(
            {
                "src": pa.array(np.asarray(srcs, np.int64)),
                "dst": pa.array(np.asarray(dsts, np.int64)),
            }
        )

    return ray.data.read_text(path).map_batches(
        parse, batch_format="pyarrow", batch_size=262144
    )


def write_partitioned(ds: Dataset, out_dir: str, tag: str = "result", **kwargs) -> str:
    """Write a Dataset as a directory of parquet parts + MANIFEST.json
    (row count, schema, tag). If a complete manifest already exists the
    write is skipped — rerun-safe."""
    manifest_path = os.path.join(out_dir, "MANIFEST.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("complete"):
            return out_dir
    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    ds = ds.materialize()
    n = ds.count()
    ds.write_parquet(data_dir, **kwargs)
    schema = ds.schema()
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "complete": True,
                "tag": tag,
                "rows": n,
                "columns": list(schema.names),
            },
            f,
        )
    os.replace(tmp, manifest_path)
    return out_dir
