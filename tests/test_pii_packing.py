"""PII scrub, sequence packing, hash split — semantics + DuckDB parity."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.ops.packing import (
    PACK_CAPACITY,
    _pack_group,
    hash_split,
    pack_sequences,
    pack_sql,
)
from linkgraph.ops.pii import pii_scrub, pii_sql_ctes

SF = "/root/testdata/sf0.001"


def _docs_table(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


class TestPIIScrub:
    def test_basic_redaction(self):
        docs = _docs_table(
            [
                (0, "mail me at bob.smith+x@corp.example.org today"),
                (1, "call 555-123-4567 or 555-000-1111"),
                (2, "server at 10.1.2.3 and 192.168.0.255"),
                (3, "clean text with no pii at all"),
                (4, "a@b.io then 555-111-2222 then 8.8.8.8"),
            ]
        )
        out = pii_scrub(docs).to_pandas().set_index("doc_id").sort_index()
        assert out.loc[0, "n_emails"] == 1 and "<EMAIL>" in out.loc[0, "clean_text"]
        assert "bob" not in out.loc[0, "clean_text"]
        assert out.loc[1, "n_phones"] == 2
        assert out.loc[1, "clean_text"].count("<PHONE>") == 2
        assert out.loc[2, "n_ips"] == 2
        assert (out.loc[3, ["n_emails", "n_phones", "n_ips"]] == 0).all()
        assert out.loc[3, "clean_text"] == "clean text with no pii at all"
        assert list(out.loc[4, ["n_emails", "n_phones", "n_ips"]]) == [1, 1, 1]

    def test_order_email_digits_not_phone(self):
        # digits inside an email must not count as phone/ip: the email
        # is redacted before later detectors scan the text.
        docs = _docs_table([(0, "x 555-123-4567@mail2.example.com y")])
        out = pii_scrub(docs).to_pandas()
        assert out.loc[0, "n_emails"] == 1
        assert out.loc[0, "n_phones"] == 0
        assert out.loc[0, "n_ips"] == 0

    def test_duckdb_parity_on_corpus(self):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        # inject deterministic PII the same way on both sides
        aug = (
            "aug AS (SELECT doc_id, text "
            "|| CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) "
            "|| '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' ELSE '' END "
            "|| CASE WHEN doc_id % 4 = 0 THEN ' call 555-' "
            "|| lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' "
            "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END "
            "|| CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) "
            "|| '.' || CAST((doc_id // 7) % 256 AS VARCHAR) "
            "|| '.' || CAST((doc_id // 11) % 256 AS VARCHAR) ELSE '' END AS t0 "
            "FROM documents)"
        )
        ctes, final = pii_sql_ctes("aug", "t0")
        sql = "WITH " + ", ".join([aug] + ctes) + " " + final
        want = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)

        base = pa.parquet.read_table(
            os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
        ).to_pandas()

        def augment(d, t):
            if d % 3 == 0:
                t += f" reach user{d}@mail{d % 7}.example.com"
            if d % 4 == 0:
                t += f" call 555-{d % 1000:03d}-{d % 10000:04d}"
            if d % 5 == 0:
                t += f" from 10.{d % 256}.{(d // 7) % 256}.{(d // 11) % 256}"
            return t

        base["text"] = [augment(d, t) for d, t in zip(base["doc_id"], base["text"])]
        got = (
            pii_scrub(ray.data.from_pandas(base))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "n_emails", "n_phones", "n_ips", "clean_text"]],
            want[["doc_id", "n_emails", "n_phones", "n_ips", "clean_text"]],
            check_dtype=False,
        )
        assert int(got["n_emails"].sum()) > 0
        assert int(got["n_phones"].sum()) > 0
        assert int(got["n_ips"].sum()) > 0


class TestPackGroup:
    def test_next_fit_rule(self):
        # cap 10: [4,5,2,9,1] -> bins [0,0,1,2,2]: 4+5=9 fits, +2 would
        # be 11 -> new bin; 2+9=11 -> new bin; 9+1=10 fits exactly.
        bins = _pack_group(np.array([4, 5, 2, 9, 1]), 10)
        assert bins.tolist() == [0, 0, 1, 2, 2]

    def test_oversize_doc_gets_own_bin(self):
        bins = _pack_group(np.array([3, 25, 4, 4]), 10)
        assert bins.tolist() == [0, 1, 2, 2]

    def test_matches_row_by_row_reference(self):
        rng = np.random.default_rng(7)
        toks = rng.integers(1, 40, size=500)
        cap = 64
        want, fill, b = [], 0, 0
        for i, n in enumerate(toks):
            if i == 0:
                fill = int(n)
            elif fill + n <= cap:
                fill += int(n)
            else:
                b += 1
                fill = int(n)
            want.append(b)
        assert _pack_group(toks, cap).tolist() == want


class TestPackingAndSplit:
    def test_pack_sequences_duckdb_parity(self):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = (
            con.execute(pack_sql()).df().sort_values("doc_id").reset_index(drop=True)
        )
        docs = ray.data.read_parquet(
            os.path.join(SF, "documents.parquet"),
            columns=["doc_id", "text", "source"],
        )
        got = (
            pack_sequences(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        cols = ["doc_id", "source", "n_tokens", "bin_id"]
        pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)
        # every bin except possibly each group's last is near capacity:
        # the fill of any non-final bin + the first doc of the next bin
        # must exceed capacity (next-fit invariant)
        g = got.sort_values(["source", "doc_id"])
        for _, grp in g.groupby("source"):
            fills = grp.groupby("bin_id")["n_tokens"].sum()
            firsts = grp.groupby("bin_id")["n_tokens"].first()
            for b in fills.index[:-1]:
                assert fills[b] + firsts[b + 1] > PACK_CAPACITY

    def test_hash_split_deterministic_and_parity(self):
        docs = ray.data.range(2000).map_batches(
            lambda t: pa.table({"doc_id": t.column("id")}), batch_format="pyarrow"
        )
        a = hash_split(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = hash_split(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        frac = a["split"].value_counts(normalize=True)
        assert 0.75 < frac["train"] < 0.85
        assert 0.05 < frac["val"] < 0.15
        assert 0.05 < frac["test"] < 0.15
        # bucket really is splitmix64(doc_id + seed) % 100
        from linkgraph.hashing import splitmix64

        ids = a["doc_id"].to_numpy().astype(np.uint64)
        want = (splitmix64(ids + np.uint64(2024)) % np.uint64(100)).astype(np.int64)
        assert (a["bucket"].to_numpy() == want).all()


class TestPhraseCount:
    def test_overlapping_and_counts(self):
        import duckdb

        from linkgraph.ops.text import phrase_count, phrase_count_sql

        docs = _docs_table(
            [
                (0, "a a a b"),          # "a a" overlaps: 2 matches
                (1, "x a a y a a"),      # 2 matches
                (2, "a b a b a"),        # 0
                (3, "aa a a"),           # 1 (token 'aa' != 'a')
            ]
        )
        out = phrase_count(docs, ("a", "a")).to_pandas().set_index("doc_id")
        assert out["n_matches"].to_dict() == {0: 2, 1: 2, 3: 1}

    def test_duckdb_parity_on_corpus(self):
        import duckdb
        import pandas as pd

        from linkgraph.ops.text import phrase_count, phrase_count_sql

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = (
            con.execute(phrase_count_sql(("table", "scan")))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = ray.data.read_parquet(
            os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
        )
        got = (
            phrase_count(docs, ("table", "scan"))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestChunkDocuments:
    def test_windows_and_tail_rule(self):
        from linkgraph.ops.packing import chunk_documents

        # 10 tokens, chunk 4, stride 3: windows at 0,3,6 (6+4 >= 10 stops)
        docs = _docs_table([(0, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")])
        out = (
            chunk_documents(docs, chunk_tokens=4, stride=3)
            .to_pandas()
            .sort_values("chunk_id")
            .reset_index(drop=True)
        )
        assert out["start_tok"].tolist() == [0, 3, 6]
        assert out["n_toks"].tolist() == [4, 4, 4]
        assert out.loc[2, "chunk_text"] == "t6 t7 t8 t9"
        # short doc: one partial window
        short = chunk_documents(
            _docs_table([(1, "a b")]), chunk_tokens=4, stride=3
        ).to_pandas()
        assert short["n_toks"].tolist() == [2]
        # empty doc: no rows
        assert (
            chunk_documents(_docs_table([(2, "!!!")]), 4, 3).to_pandas().empty
        )

    def test_duckdb_parity(self):
        from linkgraph.ops.packing import chunk_documents, chunk_sql

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = (
            con.execute(chunk_sql())
            .df()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        docs = ray.data.read_parquet(
            os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
        )
        got = (
            chunk_documents(docs)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        assert len(got) > 500  # docs are ~60-130 tokens: 1-3 chunks each
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False
        )


class TestShuffleShards:
    def test_deterministic_bijective_positions(self):
        from linkgraph.ops.packing import shuffle_shards

        docs = ray.data.range(3000).map_batches(
            lambda t: pa.table({"doc_id": t.column("id")}), batch_format="pyarrow"
        )
        a = shuffle_shards(docs).to_pandas()
        b = shuffle_shards(docs).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("doc_id").reset_index(drop=True),
            b.sort_values("doc_id").reset_index(drop=True),
        )
        # positions are a 0..k-1 bijection within each shard
        for s, grp in a.groupby("shard"):
            assert sorted(grp["pos"]) == list(range(len(grp)))
        # shards are roughly balanced
        sizes = a["shard"].value_counts()
        assert sizes.min() > 0.7 * sizes.max()

    def test_new_seed_new_order(self):
        from linkgraph.ops.packing import shuffle_shards

        docs = ray.data.range(500).map_batches(
            lambda t: pa.table({"doc_id": t.column("id")}), batch_format="pyarrow"
        )
        a = shuffle_shards(docs, seed=1).to_pandas().sort_values("doc_id")
        b = shuffle_shards(docs, seed=2).to_pandas().sort_values("doc_id")
        assert not (a["pos"].values == b["pos"].values).all()
