"""Matrix-market ingestion (reference test/market_to_binary.c parity)."""

from __future__ import annotations

from linkgraph.sources import read_matrix_market


GENERAL = """%%MatrixMarket matrix coordinate pattern general
% a comment
4 4 5
1 2
2 3
3 4
4 1
1 3
"""

SYMMETRIC = """%%MatrixMarket matrix coordinate real symmetric
3 3 3
1 2 1.0
2 3 2.5
3 3 9.0
"""


def test_read_matrix_market_general(ray_session, tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(GENERAL)
    df = read_matrix_market(str(p)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(map(tuple, df.to_numpy())) == [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0)]


def test_read_matrix_market_symmetric(ray_session, tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(SYMMETRIC)
    df = read_matrix_market(str(p)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    # off-diagonal entries mirrored; the diagonal one kept single
    assert list(map(tuple, df.to_numpy())) == [
        (0, 1), (1, 0), (1, 2), (2, 1), (2, 2),
    ]


def test_matrix_market_to_cc(ray_session, tmp_path):
    from linkgraph.algos import connected_components

    p = tmp_path / "g.mtx"
    p.write_text(GENERAL)
    edges = read_matrix_market(str(p))
    out, _, eng = connected_components(edges, num_parts=2)
    df = out.to_pandas()
    eng.shutdown()
    assert (df["label"] == 0).all()  # one ring component, min id 0


def test_warc_round_trip(tmp_path):
    """pages -> WARC (plain + gz) -> read_warc == original, and the
    extraction pipeline runs identically off the WARC ingest."""
    import numpy as np
    import ray.data

    from linkgraph.edges import build_edges
    from linkgraph.sources import parse_warc_records, read_warc, write_warc
    from linkgraph.synth import pages_table

    pt = pages_table(np.arange(120), 120, 6)
    half = pt.num_rows // 2
    write_warc(pt.slice(0, half), str(tmp_path / "a.warc"))
    write_warc(pt.slice(half), str(tmp_path / "b.warc.gz"))

    got = (
        read_warc([str(tmp_path / "a.warc"), str(tmp_path / "b.warc.gz")])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        pt.select(["url", "warc_ts", "html"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(got["url"]) == list(want["url"])
    assert list(got["html"]) == list(want["html"])
    assert (
        got["warc_ts"].astype("datetime64[us]").tolist()
        == want["warc_ts"].astype("datetime64[us]").tolist()
    )

    # scalar parser skips non-response records
    raw = open(tmp_path / "a.warc", "rb").read()
    extra = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://x/\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    recs = parse_warc_records(extra + raw)
    assert len(recs) == half

    # the edge pipeline off WARC matches the edge pipeline off parquet
    e_warc = (
        build_edges(read_warc([str(tmp_path / "a.warc"), str(tmp_path / "b.warc.gz")]))
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    e_direct = (
        build_edges(ray.data.from_arrow(pt))
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    assert e_warc.equals(e_direct)
