"""Guard the DuckDB-oracle parity in CI at sf0.001 (the driver runs the
full set at sf0.01; this keeps the contract from regressing between
rounds). Covers one representative per family."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SF = "/root/testdata/sf0.001"
CHECKED = [
    "doc_edges",
    "out_degree",
    "pagerank_5",
    "cc_labels",
    "labelprop_3",
    "triangle_count",
    "exact_dedup",
    "near_dup_shingle",
    "knn_cosine",
    "tumbling_1h",
    "top_tokens_100",
    "sessionize",
    "sssp_weighted",
    "temporal_reach",
    "widest_path",
    "bpe_pairs",
    "bpe_merges_3",
    "bpe_encode",
    "pca_cov",
    "hits_5",
    "ppr_5",
    "weighted_pagerank_5",
    "host_graph",
    "reciprocity",
    "butterfly_count",
    "adj_gamma_bits",
    "cocitation_topk",
    "clustering_coeff",
    "adamic_adar",
    "assortativity",
    "edge_jaccard",
    "tfidf_top3",
    "scc_labels",
    "kmeans_4",
    "semdedup",
    "quality_filter",
    "quality_by_source",
    "bm25_topk",
    "pii_scrub",
    "seq_pack",
    "data_split",
    "snapshot_churn",
    "corpus_select",
    "window_topk",
    "funnel",
    "shuffle_shards",
    "phrase_count",
    "chunk_rag",
    "window_distinct",
    "window_cc",
    "window_pagerank",
    "revenue_by_nation",
    "dangling_share",
    "q6_scan",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", CHECKED)
def test_oracle_parity(name, duck):
    import __ray_entry__ as entrymod
    from check_oracles import compare, to_pandas

    ray_df = to_pandas(entrymod.queries()[name](SF))
    sql_df = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    problems = compare(name, ray_df, sql_df)
    assert not problems, problems
