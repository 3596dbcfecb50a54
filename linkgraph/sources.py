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


# --------------------------------------------------------------------------
# WARC — the Common-Crawl container format (ISO 28500)
# --------------------------------------------------------------------------

_WARC_MAGIC = b"WARC/1.0\r\n"


def parse_warc_records(raw: bytes) -> list[tuple[str, int, bytes]]:
    """Scalar WARC parser: concatenated WARC/1.0 records ->
    [(target_uri, timestamp_us, payload_bytes)] for response records.

    Minimal by design (no external deps in this environment): headers
    are latin-1 lines up to the blank line, the payload is exactly
    Content-Length bytes, records are separated by \\r\\n\\r\\n. Records
    without a WARC-Target-URI (warcinfo, request, metadata) are
    skipped. WARC-Date parses as ISO-8601 Zulu to microseconds since
    the epoch."""
    from datetime import datetime, timezone

    out: list[tuple[str, int, bytes]] = []
    i = 0
    n = len(raw)
    while True:
        i = raw.find(_WARC_MAGIC, i)
        if i < 0 or i >= n:
            break
        hdr_end = raw.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[i + len(_WARC_MAGIC): hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
        length = int(headers.get("content-length", "0"))
        body_start = hdr_end + 4
        body = raw[body_start: body_start + length]
        uri = headers.get("warc-target-uri")
        if uri and headers.get("warc-type", "response") == "response":
            ts = 0
            if "warc-date" in headers:
                dt = datetime.fromisoformat(
                    headers["warc-date"].replace("Z", "+00:00")
                ).astimezone(timezone.utc)
                ts = int(dt.timestamp() * 1_000_000)
            out.append((uri, ts, body))
        i = body_start + length
    return out


def read_warc(paths, parallelism: int = -1) -> Dataset:
    """WARC file(s) -> pages Dataset (url, warc_ts, html) — the
    Common-Crawl ingest path (BASELINE.json input_hint schema; the
    ``text``/``lang`` columns are downstream extraction products, see
    linkgraph.extract).

    Distributed by FILE via ``read_binary_files`` (Common Crawl ships
    ~1 GB segment files, so the file is the natural parallel unit;
    ``.gz`` members are decompressed with stdlib gzip inside the task).
    One task parses each file with the scalar record scanner — payload
    bytes are sliced, never copied per header line."""
    import gzip

    import pyarrow as pa
    import ray.data

    files = ray.data.read_binary_files(
        paths,
        override_num_blocks=None if parallelism == -1 else parallelism,
    )

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        htmls: list[bytes] = []
        for raw in batch.column("bytes").to_pylist():
            # read_binary_files already auto-decompresses by file
            # extension; the magic-byte check covers raw gzip members
            # arriving through paths that don't
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            for uri, ts, body in parse_warc_records(raw):
                urls.append(uri)
                tss.append(ts)
                htmls.append(body)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def write_warc(table, path: str) -> None:
    """Test/fixture sink: pages rows (url, warc_ts, html) -> one WARC
    file of response records (gzipped when ``path`` ends with .gz)."""
    import gzip

    from datetime import datetime, timezone

    chunks: list[bytes] = []
    urls = table.column("url").to_pylist()
    tss = table.column("warc_ts").to_pylist()
    htmls = table.column("html").to_pylist()
    for url, ts, html in zip(urls, tss, htmls):
        if hasattr(ts, "timestamp"):
            dt = ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)
        else:
            dt = datetime.fromtimestamp(ts / 1e6, tz=timezone.utc)
        date = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
        hdr = (
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(html)}\r\n"
        ).encode("latin-1")
        chunks.append(_WARC_MAGIC + hdr + b"\r\n" + html + b"\r\n\r\n")
    raw = b"".join(chunks)
    if path.endswith(".gz"):
        raw = gzip.compress(raw)
    with open(path, "wb") as f:
        f.write(raw)
