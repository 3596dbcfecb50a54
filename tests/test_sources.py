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
