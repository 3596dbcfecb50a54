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
