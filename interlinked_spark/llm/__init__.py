from .dedup import (
    exact_text_dedup,
    minhash_near_dup_pairs,
    simhash_signatures,
    simhash_near_dup_pairs,
    ngram_jaccard_pairs,
    near_dup_clusters,
)
from .similarity import cosine_top_k, lsh_similarity_join, embedding_near_dup_pairs
from .ranking import tf_idf, bm25_scores
from .embeddings import (
    ivf_probed_top_k,
    kmeans_assign,
    kmeans_fit,
    pca_project,
    semdedup_keep,
    semdedup_keep_assigned,
)
from .classify import nb_predict, nb_train
from .bpe import bpe_merges_sql, bpe_token_counts, bpe_token_counts_sql, bpe_train_merges
from .text import (
    token_stats,
    quality_scores,
    language_id,
    fingerprints,
)

__all__ = [
    "bpe_train_merges", "bpe_merges_sql", "bpe_token_counts", "bpe_token_counts_sql",
    "exact_text_dedup",
    "minhash_near_dup_pairs",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "near_dup_clusters",
    "cosine_top_k",
    "tf_idf",
    "bm25_scores",
    "pca_project",
    "ivf_probed_top_k",
    "kmeans_assign",
    "kmeans_fit",
    "semdedup_keep",
    "semdedup_keep_assigned",
    "nb_train",
    "nb_predict",
    "lsh_similarity_join",
    "embedding_near_dup_pairs",
    "token_stats",
    "quality_scores",
    "language_id",
    "fingerprints",
]
