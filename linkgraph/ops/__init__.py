from .text import (
    TokenCount,
    CharClasses,
    LangId,
    Fingerprint,
    QualityScore,
    QualityFilter,
    quality_filter,
    top_k_tokens,
    tfidf_top_terms,
    ngram_contamination,
)
from .hll import HyperLogLog, approx_distinct_tokens
from .graphstats import (
    host_graph,
    reciprocity,
    clustering_coefficient,
    adamic_adar,
    degree_assortativity,
    edge_jaccard,
    quotient_graph,
    modularity,
    powerlaw_alpha,
    butterflies,
    adjacency_gamma_bits,
    cocitation_topk,
)
from .sampling import sample_per_key, sample_per_key_sql
from .pii import PIIScrub, pii_scrub
from .packing import pack_sequences, hash_split, chunk_documents, shuffle_shards
from .corpus import corpus_select, keeper_flags
from .snapshot import snapshot_churn
from .dedup import (
    exact_dedup,
    shingle_jaccard_pairs,
    minhash_dedup_pairs,
    minhash_dedup_between,
    simhash_dedup_pairs,
    embedding_dup_pairs,
    dup_span_pairs,
    dedup_clusters,
)
from .knn import knn_cosine, knn_cosine_ivf, knn_cosine_lsh
from .clustering import kmeans_fit, kmeans_assign, semdedup_pairs
from .windows import (
    tumbling_window,
    hopping_window,
    sessionize,
    window_topk,
    funnel_counts,
    window_cc,
    window_pagerank,
)
from .cms import CountMinSketch, sketch_edge_counts, edge_anomaly_scores
from .spatial import radius_join
from .anchors import (
    DocAnchorTerms,
    anchor_top_terms,
    anchor_index_pages,
    page_anchor_pairs,
)
from .paradedup import ChunkHashRows, para_dedup_stats
from .lm import BigramRows, lm_score
from .curriculum import curriculum_phases, global_rank, ntile_of
from .bpe import bpe_pair_counts, bpe_learn, bpe_encode_counts, word_freq
from .pca import pca_covariance, pca_fit, pca_project

__all__ = [
    "TokenCount",
    "CharClasses",
    "QualityScore",
    "LangId",
    "Fingerprint",
    "exact_dedup",
    "shingle_jaccard_pairs",
    "minhash_dedup_pairs",
    "simhash_dedup_pairs",
    "embedding_dup_pairs",
    "dup_span_pairs",
    "dedup_clusters",
    "ngram_contamination",
    "knn_cosine",
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "tumbling_window",
    "window_pagerank",
    "bpe_pair_counts",
    "bpe_learn",
    "bpe_encode_counts",
    "word_freq",
    "pca_covariance",
    "pca_fit",
    "pca_project",
    "hopping_window",
    "sessionize",
    "CountMinSketch",
    "sketch_edge_counts",
    "edge_anomaly_scores",
    "radius_join",
    "DocAnchorTerms",
    "anchor_top_terms",
    "anchor_index_pages",
    "page_anchor_pairs",
    "ChunkHashRows",
    "para_dedup_stats",
    "BigramRows",
    "lm_score",
    "curriculum_phases",
    "global_rank",
    "ntile_of",
]
